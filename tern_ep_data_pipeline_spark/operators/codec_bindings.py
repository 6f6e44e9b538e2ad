"""Optional real-codec bindings behind the stdlib decode dispatch.

The container this repo ships in has no image/audio/video codec libraries,
so ``multimodal``/``avi`` implement the common formats (BMP/PPM/PNG/JPEG,
WAV PCM/float/G.711, MJPEG AVI) with stdlib+numpy codecs whose outputs are
byte-pinned in tests. Real corpora also carry H.264/VP9 video, MP3/AAC
audio, WebP/TIFF images — formats only a codec library can decode.

This module probes for two bindings at call time:

- **Pillow** (``PIL.Image``) for image containers the stdlib dispatch
  rejects;
- the **ffmpeg/ffprobe executables** (no Python package needed) for
  non-MJPEG video and non-WAV audio, decoded via a subprocess pipe to
  rawvideo/f64le.

Division of labour, deliberately: the stdlib codecs stay PRIMARY for the
formats they implement — their outputs are deterministic and pinned, and a
library swap would perturb pixel-exact fixtures — while the bindings
extend the dispatch only at the ``NotImplementedError`` seams. When a
binding is absent every helper returns ``None`` and the caller raises the
same honest error as before; at the batch seam those rows quarantine into
``decode_error`` as always. So a mixed corpus degrades gracefully without
the libraries and decodes fully with them, with zero hard dependencies.
"""

from __future__ import annotations

import io
import json
import shutil
import subprocess
import tempfile

import numpy as np

_PROBE_TIMEOUT = 60


def pil_image():
    """The ``PIL.Image`` module, or None when Pillow is not installed."""
    try:
        from PIL import Image

        return Image
    except ImportError:
        return None


def ffmpeg_paths() -> tuple[str, str] | None:
    """(ffmpeg, ffprobe) executable paths, or None when either is absent."""
    ff = shutil.which("ffmpeg")
    fp = shutil.which("ffprobe")
    return (ff, fp) if ff and fp else None


def decode_image_pil(content: bytes) -> "np.ndarray | None":
    """HxWx3 uint8 RGB via Pillow, or None when Pillow is absent.

    Raises whatever Pillow raises on corrupt payloads — the caller's
    quarantine seam handles those exactly like stdlib decode errors.
    """
    image_mod = pil_image()
    if image_mod is None:
        return None
    with image_mod.open(io.BytesIO(content)) as im:
        return np.asarray(im.convert("RGB"), dtype=np.uint8)


def _ffprobe_stream(path: str, ffprobe: str, select: str) -> dict:
    out = subprocess.run(
        [
            ffprobe, "-v", "error", "-select_streams", select,
            "-show_entries",
            "stream=width,height,sample_rate,avg_frame_rate",
            "-of", "json", path,
        ],
        capture_output=True,
        timeout=_PROBE_TIMEOUT,
        check=True,
    )
    streams = json.loads(out.stdout or b"{}").get("streams") or []
    if not streams:
        raise ValueError(f"ffprobe found no {select!r} stream")
    return streams[0]


def decode_video_ffmpeg(content: bytes) -> "tuple[list[np.ndarray], float] | None":
    """(frames HxWx3 uint8 RGB, fps) via the ffmpeg executable, or None
    when ffmpeg/ffprobe are absent."""
    paths = ffmpeg_paths()
    if paths is None:
        return None
    ffmpeg, ffprobe = paths
    # ffprobe needs a seekable input for container parsing; spool to disk
    with tempfile.NamedTemporaryFile(suffix=".video") as tmp:
        tmp.write(content)
        tmp.flush()
        st = _ffprobe_stream(tmp.name, ffprobe, "v:0")
        w, h = int(st["width"]), int(st["height"])
        num, _, den = (st.get("avg_frame_rate") or "0/1").partition("/")
        try:  # ffprobe may report '25' (no slash) or '0/0' (unknown)
            fps = float(num) / float(den) if den else float(num)
        except (ValueError, ZeroDivisionError):
            fps = 0.0
        raw = subprocess.run(
            [ffmpeg, "-v", "error", "-i", tmp.name,
             "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1"],
            capture_output=True,
            timeout=_PROBE_TIMEOUT,
            check=True,
        ).stdout
    frame_bytes = w * h * 3
    n = len(raw) // frame_bytes
    arr = np.frombuffer(raw[: n * frame_bytes], np.uint8).reshape(n, h, w, 3)
    return [arr[i].copy() for i in range(n)], fps


def decode_audio_ffmpeg(content: bytes) -> "tuple[np.ndarray, int] | None":
    """(mono float64 samples in [-1, 1], sample_rate) via the ffmpeg
    executable, or None when ffmpeg/ffprobe are absent."""
    paths = ffmpeg_paths()
    if paths is None:
        return None
    ffmpeg, ffprobe = paths
    with tempfile.NamedTemporaryFile(suffix=".audio") as tmp:
        tmp.write(content)
        tmp.flush()
        st = _ffprobe_stream(tmp.name, ffprobe, "a:0")
        rate = int(st["sample_rate"])
        raw = subprocess.run(
            [ffmpeg, "-v", "error", "-i", tmp.name,
             "-f", "f64le", "-ac", "1", "pipe:1"],
            capture_output=True,
            timeout=_PROBE_TIMEOUT,
            check=True,
        ).stdout
    return np.frombuffer(raw, "<f8"), rate
