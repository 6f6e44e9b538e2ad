"""MJPEG-in-AVI video codec — stdlib + numpy, via ``operators/jpeg.py``.

Upgrades the video seam in ``operators/multimodal.py`` from an honest
stub to a real byte path for the one mainstream video layout that needs
no codec library: Motion-JPEG inside a RIFF/AVI container (the classic
camera/webcam/capture format — every frame is a standalone baseline or
progressive JPEG, which ``decode_jpeg`` already handles).

Scope: RIFF 'AVI ' containers, stream 0 video chunks (``00dc``/``00db``)
compressed as MJPG. Inter-frame codecs (H.264, VP9, ...) genuinely
require a codec library and raise ``NotImplementedError`` with the fourcc
named — a production run would bind ffmpeg behind the same dispatch;
nothing Spark-side changes.

The writer emits a minimal spec-conformant AVI (hdrl with avih + one
vids/MJPG strl, a movi list, word-aligned chunks) so encode->decode
round-trips pin the container walk against the independently round-trip-
tested JPEG layer: every decoded frame must be pixel-identical to the
standalone decode of the same JPEG bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from .jpeg import decode_jpeg, encode_jpeg


def _chunk(fourcc: bytes, payload: bytes) -> bytes:
    pad = b"\x00" if len(payload) % 2 else b""
    return fourcc + struct.pack("<I", len(payload)) + payload + pad


def _list(fourcc: bytes, payload: bytes) -> bytes:
    return _chunk(b"LIST", fourcc + payload)


def encode_video_mjpeg(
    frames, fps: int = 10, quality: int = 85, subsampling: str = "420"
) -> bytes:
    """Encode an iterable of HxWx3 (or HxW) uint8 frames as an MJPEG AVI.

    All frames must share one shape; each becomes an independent baseline
    JPEG ``00dc`` chunk (the defining property of MJPEG — no inter-frame
    state, so frame sampling seeks in O(1))."""
    frames = [np.asarray(f) for f in frames]
    if not frames:
        raise ValueError("no frames")
    h, w = frames[0].shape[:2]
    if any(f.shape[:2] != (h, w) for f in frames):
        raise ValueError("frames must share one shape")
    jpegs = [
        encode_jpeg(f, quality=quality, subsampling=subsampling if f.ndim == 3 else "444")
        for f in frames
    ]

    avih = struct.pack(
        "<10I4I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        sum(len(j) for j in jpegs) * fps // max(len(jpegs), 1),
        0,  # dwPaddingGranularity
        0,  # dwFlags: no idx1 chunk is written, so AVIF_HASINDEX (0x10)
        #    must stay clear — advertising an index the file lacks makes
        #    strict players seek into nothing
        len(jpegs),
        0,
        1,  # one stream
        max(len(j) for j in jpegs),
        w,
        h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIii4H",
        b"vids",
        b"MJPG",
        0, 0, 0, 0,
        1,  # dwScale
        fps,  # dwRate
        0,
        len(jpegs),  # dwLength (frames)
        max(len(j) for j in jpegs),
        -1,  # dwQuality
        0,
        0, 0, w, h,  # rcFrame
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, w, h, 1, 24, b"MJPG",
        max(len(j) for j in jpegs),
        0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl",
        _chunk(b"avih", avih)
        + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf)),
    )
    movi = _list(b"movi", b"".join(_chunk(b"00dc", j) for j in jpegs))
    body = b"AVI " + hdrl + movi
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _walk_chunks(buf: bytes, start: int, end: int):
    """Yield (fourcc, payload_start, payload_len) over a chunk region."""
    p = start
    while p + 8 <= end:
        fourcc = buf[p : p + 4]
        size = struct.unpack_from("<I", buf, p + 4)[0]
        yield fourcc, p + 8, size
        p += 8 + size + (size % 2)


def decode_video(content: bytes) -> tuple[list[np.ndarray], float]:
    """Decode a video to (frames, fps) — see :func:`decode_video_tagged`
    (this is its frames-only form)."""
    frames, fps, _dec = decode_video_tagged(content)
    return frames, fps


def decode_video_tagged(
    content: bytes,
) -> tuple[list[np.ndarray], float, str]:
    """Decode a video to (frames, fps, decoder_identity). Frames are
    HxWx3 uint8 RGB.

    MJPEG AVI decodes with the in-repo codec (pinned deterministic,
    identity ``mjpeg``). Anything else — inter-frame codecs
    (H.264/VP9/...) or non-AVI containers (MP4/WebM/...) — dispatches to
    the ffmpeg executable when one is installed (identity ``ffmpeg`` —
    environment-dependent pixels, which is why callers record it), and
    otherwise raises ``NotImplementedError`` naming the fourcc
    (``ValueError`` for a non-AVI container)."""
    from .codec_bindings import decode_video_ffmpeg

    if content[:4] != b"RIFF" or content[8:12] != b"AVI ":
        decoded = decode_video_ffmpeg(content)
        if decoded is not None:
            return decoded[0], decoded[1], "ffmpeg"
        raise ValueError("not an AVI payload (missing RIFF/AVI signature)")
    try:
        frames, fps = _decode_video_mjpeg_avi(content)
        return frames, fps, "mjpeg"
    except NotImplementedError:
        decoded = decode_video_ffmpeg(content)
        if decoded is not None:
            return decoded[0], decoded[1], "ffmpeg"
        raise


def _decode_video_mjpeg_avi(content: bytes) -> tuple[list[np.ndarray], float]:
    end = min(len(content), 8 + struct.unpack_from("<I", content, 4)[0])
    handler = None
    us_per_frame = 0
    frames: list[np.ndarray] = []

    def walk_list(start: int, stop: int) -> None:
        nonlocal handler, us_per_frame
        for fourcc, off, size in _walk_chunks(content, start, stop):
            if fourcc == b"LIST":
                walk_list(off + 4, off + size)
            elif fourcc == b"avih":
                us_per_frame = struct.unpack_from("<I", content, off)[0]
            elif fourcc == b"strh":
                fcc_type = content[off : off + 4]
                if fcc_type == b"vids":
                    handler = content[off + 4 : off + 8]
            elif fourcc in (b"00dc", b"00db"):
                if handler not in (None, b"MJPG", b"mjpg"):
                    raise NotImplementedError(
                        f"video codec {handler!r} requires a codec library"
                    )
                payload = content[off : off + size]
                if payload[:2] != b"\xff\xd8":
                    raise ValueError("non-JPEG bytes in MJPG stream")
                frames.append(decode_jpeg(payload))

    walk_list(12, end)
    if handler is not None and handler not in (b"MJPG", b"mjpg"):
        raise NotImplementedError(
            f"video codec {handler!r} requires a codec library"
        )
    fps = 1_000_000 / us_per_frame if us_per_frame else 0.0
    return frames, fps


def sample_frame_indices(n_frames: int, k: int) -> list[int]:
    """k evenly-spaced frame indices (midpoint rule — stable for any k,
    duplicates only when k > n_frames)."""
    if n_frames <= 0:
        return []
    return [min((2 * i + 1) * n_frames // (2 * k), n_frames - 1) for i in range(k)]
