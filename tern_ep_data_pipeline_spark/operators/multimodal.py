"""Multimodal column plumbing: image/audio/video as opaque binary + typed
metadata.

Beyond-reference operators for the training-data pipeline (driver mandate).
The Spark-side contract is real and tested — schema conventions, partition
behaviour, Arrow batch shapes through ``mapInPandas``. Codecs are REAL
for every format the stdlib can parse: WAV/PCM audio (``wave``), 24-bit
BMP and P6 PPM images (struct/numpy byte parsing), common-shape PNG
(zlib inflate + numpy scanline unfilter), baseline AND progressive JPEG
(``operators.jpeg``), and MJPEG-in-AVI video (``operators.avi`` — every
frame a standalone JPEG) — decoded, featurised, and resized
byte-for-byte in tests. Formats that genuinely need codec libraries the
container lacks (inter-frame video codecs, compressed audio) raise
``NotImplementedError`` at the decode seam; the Spark-side call sites
are unchanged when a library is deployed.

Schema convention for a multimodal asset table:
    asset_id BIGINT, modality STRING, content BINARY, meta STRUCT<...>
Feature outputs are fixed-width double arrays so downstream similarity
operators (operators.similarity) consume them unchanged.
"""

from __future__ import annotations

import hashlib
import itertools
import os
from collections.abc import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_DIM = 16

ASSET_SCHEMA = (
    "asset_id BIGINT, modality STRING, content BINARY, "
    "meta STRUCT<source: STRING, width: INT, height: INT, sample_rate: INT>"
)


def assets_from_documents(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque binary assets — lets the
    whole multimodal path run (and be benchmarked) on the driver testdata."""
    return docs.select(
        F.col("doc_id").alias("asset_id"),
        F.lit("text").alias("modality"),
        F.encode(F.col("text"), "UTF-8").alias("content"),
        F.struct(
            F.col("source").alias("source"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
        ).alias("meta"),
    )


def content_stats(assets: DataFrame) -> DataFrame:
    """Cheap JVM-side byte stats: size + content hash (dedup key)."""
    return assets.select(
        "asset_id",
        "modality",
        F.octet_length("content").cast("bigint").alias("n_bytes"),
        F.md5("content").alias("content_md5"),
        F.crc32("content").alias("content_crc32"),
    )


def _fake_feature(content: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real encoder: md5-seeded unit vector.

    Stable across runs/executors — the plumbing (batching, schema,
    partitioning) is exercised for real; swap in a real model by replacing
    this function only.
    """
    seed = int.from_bytes(hashlib.md5(content).digest()[:8], "big")
    rng = np.random.RandomState(seed % (2**32))
    v = rng.standard_normal(dim)
    return v / np.linalg.norm(v)


def decode_image_bmp(content: bytes) -> np.ndarray:
    """Real BMP decode (24-bit uncompressed, the format's common case) —
    pure struct/numpy byte parsing, no codec library. Returns HxWx3 uint8
    (RGB, top-down)."""
    import struct

    if content[:2] != b"BM":
        raise ValueError("not a BMP payload")
    pix_off = struct.unpack_from("<I", content, 10)[0]
    width, height = struct.unpack_from("<ii", content, 18)
    planes, bpp = struct.unpack_from("<HH", content, 26)
    comp = struct.unpack_from("<I", content, 30)[0]
    if bpp != 24 or comp != 0:
        raise NotImplementedError(f"BMP bpp={bpp} compression={comp} unsupported")
    bottom_up = height > 0
    height = abs(height)
    row_bytes = (width * 3 + 3) & ~3  # rows pad to 4-byte multiples
    rows = np.frombuffer(
        content, dtype=np.uint8, count=row_bytes * height, offset=pix_off
    ).reshape(height, row_bytes)[:, : width * 3]
    img = rows.reshape(height, width, 3)[:, :, ::-1]  # BGR -> RGB
    return img[::-1] if bottom_up else img


def decode_image_ppm(content: bytes) -> np.ndarray:
    """Real P6 PPM decode (binary RGB). Returns HxWx3 uint8."""
    if not content.startswith(b"P6"):
        raise ValueError("not a P6 PPM payload")
    # header: P6 <ws> width <ws> height <ws> maxval <single ws> pixels
    parts, i, token = [], 2, b""
    while len(parts) < 3:
        if i >= len(content):  # truncated/malformed header: fail, don't spin
            raise ValueError("truncated P6 PPM header")
        c = content[i : i + 1]
        i += 1
        if c == b"#":  # comment to EOL
            while content[i : i + 1] not in (b"\n", b""):
                i += 1
            continue
        if c.isspace():
            if token:
                if not token.isdigit():
                    raise ValueError(f"bad P6 PPM header token {token!r}")
                parts.append(int(token))
                token = b""
        else:
            token += c
    width, height, maxval = parts
    if maxval > 255:
        raise NotImplementedError("16-bit PPM unsupported")
    return np.frombuffer(
        content, dtype=np.uint8, count=width * height * 3, offset=i
    ).reshape(height, width, 3)


_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def decode_image_png(content: bytes) -> np.ndarray:
    """Real PNG decode with no codec library: chunk walk, zlib inflate of
    the IDAT stream, per-scanline unfiltering in numpy. Supports the
    overwhelmingly common shape — 8-bit depth, color types 0 (gray),
    2 (RGB), 6 (RGBA), no interlace. Returns HxWx3 uint8 (alpha dropped,
    gray replicated). Filters: None/Sub/Up/Average/Paeth per the spec;
    Sub is a per-channel-lane uint8 cumsum (wraparound IS the mod-256
    arithmetic), Up is one vector add, Average/Paeth walk pixels within
    the row (left-neighbour data dependence is inherently sequential).
    """
    import struct
    import zlib

    if content[:8] != _PNG_SIG:
        raise ValueError("not a PNG payload")
    pos, idat, ihdr = 8, [], None
    while pos + 8 <= len(content):
        ln, typ = struct.unpack_from(">I4s", content, pos)
        pos += 8
        data = content[pos : pos + ln]
        pos += ln + 4  # skip CRC
        if typ == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat.append(data)
        elif typ == b"IEND":
            break
    if ihdr is None or not idat:
        raise ValueError("PNG missing IHDR/IDAT")
    w, h, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8 or ctype not in (0, 2, 6) or interlace or comp or filt:
        raise NotImplementedError(
            f"PNG depth={depth} ctype={ctype} interlace={interlace} unsupported"
        )
    ch = {0: 1, 2: 3, 6: 4}[ctype]
    stride = w * ch
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), np.uint8)
    if len(raw) < h * (1 + stride):
        raise ValueError("truncated PNG pixel data")
    lines = raw[: h * (1 + stride)].reshape(h, 1 + stride)
    filters, rows = lines[:, 0], lines[:, 1:]
    out = np.zeros((h, stride), np.uint8)
    prev = np.zeros(stride, np.uint8)
    for y in range(h):
        f, r = int(filters[y]), rows[y]
        if f == 0:
            cur = r.copy()
        elif f == 1:  # Sub: cumsum per channel lane, uint8 wrap == mod 256
            cur = np.cumsum(r.reshape(w, ch), axis=0, dtype=np.uint8).reshape(-1)
        elif f == 2:  # Up
            cur = r + prev
        elif f in (3, 4):  # Average / Paeth: left-dependent, walk pixels
            cur = np.zeros(stride, np.uint8)
            left = np.zeros(ch, np.int32)
            pr = prev.astype(np.int32)
            rr = r.astype(np.int32)
            for x in range(w):
                s = slice(x * ch, (x + 1) * ch)
                up = pr[s]
                if f == 3:
                    pred = (left + up) >> 1
                else:
                    upleft = (
                        pr[(x - 1) * ch : x * ch] if x else np.zeros(ch, np.int32)
                    )
                    p = left + up - upleft
                    pa, pb, pc = (
                        np.abs(p - left),
                        np.abs(p - up),
                        np.abs(p - upleft),
                    )
                    pred = np.where(
                        (pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft)
                    )
                left = (rr[s] + pred) & 0xFF
                cur[s] = left
        else:
            raise ValueError(f"bad PNG filter type {f}")
        prev = cur
        out[y] = cur
    img = out.reshape(h, w, ch)
    if ch == 1:
        return np.repeat(img[:, :, None].reshape(h, w, 1), 3, axis=2)
    return np.ascontiguousarray(img[:, :, :3])


#: Sampled cross-check cadence for binding-decoded JPEGs: every Nth
#: JPEG that a native binding decodes is ALSO decoded by the stdlib
#: pinned decoder and compared (shape exactly; pixels within the IDCT
#: tolerance below). Per-image verification would forfeit the binding's
#: ~2-orders speedup; sampling keeps a broken binding detectable within
#: one partition's worth of images.
_JPEG_XCHECK_EVERY = 64
_jpeg_xcheck_counter = itertools.count()

#: Mean-absolute pixel tolerance between a binding's JPEG decode and
#: the stdlib decoder. NOT zero by design: ISO/IEC 10918-1 pins the
#: bitstream, not the IDCT — libjpeg's integer IDCT and fancy chroma
#: upsampling legitimately differ from our float IDCT by a few counts
#: per sample. A wrong image, wrong geometry, or channel swap blows far
#: past this; codec rounding stays well under it.
_JPEG_XCHECK_MAD = 4.0


def _cross_check_jpeg(content: bytes, got: np.ndarray) -> None:
    from .jpeg import decode_jpeg

    try:
        ref = decode_jpeg(content)
    except NotImplementedError:
        # the binding decodes variants the pinned verifier deliberately
        # does not (arithmetic-coded, 12-bit, CMYK, ...): the binding's
        # successful decode stands — a verifier GAP must not quarantine
        # (or kill) an image 1-in-N times depending on sample cadence
        return
    if ref.shape != got.shape:
        raise ValueError(
            f"native JPEG binding produced shape {got.shape}, the pinned "
            f"stdlib decoder {ref.shape} — binding mis-decodes this corpus"
        )
    mad = float(
        np.abs(got.astype(np.int32) - ref.astype(np.int32)).mean()
    )
    if mad > _JPEG_XCHECK_MAD:
        raise ValueError(
            f"native JPEG binding diverges from the pinned stdlib decoder "
            f"(mean abs pixel diff {mad:.2f} > {_JPEG_XCHECK_MAD}) — "
            "binding mis-decodes this corpus"
        )


def _jpeg_decoder_mode() -> str:
    """JPEG dispatch policy, from ``$SPARK_GRAFT_JPEG_DECODER`` (ADVICE
    r11 #2): ``auto`` (default — prefer a native binding, sampled
    cross-check against the pinned decoder) or ``stdlib`` (force the
    pinned pure-Python decoder: bit-identical pixels on EVERY
    environment, for reproducibility-sensitive corpus builds where a
    binding's codec-rounding drift — or its acceptance of variants the
    pinned decoder quarantines — must not change corpus contents).
    Set it on driver AND executors (``spark.executorEnv.*`` on a
    cluster); unknown values raise loudly rather than silently
    reverting to the environment-dependent default."""
    mode = os.environ.get("SPARK_GRAFT_JPEG_DECODER", "auto").lower()
    if mode not in ("auto", "stdlib"):
        raise ValueError(
            f"SPARK_GRAFT_JPEG_DECODER={mode!r}: expected 'auto' or 'stdlib'"
        )
    return mode


def decode_image(content: bytes) -> np.ndarray:
    """Image decode: REAL for every format the pipeline claims — see
    :func:`decode_image_tagged` (this is its pixels-only form)."""
    return decode_image_tagged(content)[0]


def decode_image_tagged(content: bytes) -> tuple[np.ndarray, str]:
    """Image decode returning ``(pixels, decoder_identity)``: REAL for
    every format the pipeline claims — BMP, P6 PPM, common-shape PNG
    (zlib + numpy unfilter), and baseline JPEG (``operators.jpeg``: full
    DQT/DHT/SOF/SOS parse, Huffman entropy decode, dequant + IDCT,
    4:4:4/4:2:2/4:2:0). Progressive JPEG and exotic variants raise with
    the marker named.

    JPEG dispatch order (VERDICT r10 #2): a native binding (Pillow /
    libjpeg) is PREFERRED when importable — the pure-Python decoder's
    ~0.5 Mpx/s is the multimodal ceiling and a binding is ~2 orders
    faster — with the stdlib decoder retained as the pinned verifier: a
    sampled cross-check (every ``_JPEG_XCHECK_EVERY``-th image, not
    per-image) re-decodes through the stdlib path and fails loudly if
    the binding diverges beyond codec-rounding tolerance. Without a
    binding, the stdlib decoder remains the primary path, bit-for-bit
    as before. ``$SPARK_GRAFT_JPEG_DECODER=stdlib`` forces the pinned
    path even with a binding present (ADVICE r11 #2 — heterogeneous
    clusters where Pillow presence/version varies would otherwise
    decode the same JPEG to pixels differing by up to the cross-check
    tolerance, making downstream similarity features irreproducible).

    The returned identity (``jpeg-pil`` / ``jpeg-stdlib`` / ``png`` /
    ``bmp`` / ``ppm`` / ``pil``) is recorded by
    :func:`extract_features` in every decoded feature row, so an
    environment-divergent corpus is detectable after the fact."""
    if content[:2] == b"BM":
        return decode_image_bmp(content), "bmp"
    if content[:2] == b"P6":
        return decode_image_ppm(content), "ppm"
    if content[:8] == _PNG_SIG:
        return decode_image_png(content), "png"
    if content[:2] == b"\xff\xd8":
        if _jpeg_decoder_mode() == "auto":
            from .codec_bindings import decode_image_pil

            img = decode_image_pil(content)
            if img is not None:
                if next(_jpeg_xcheck_counter) % _JPEG_XCHECK_EVERY == 0:
                    _cross_check_jpeg(content, img)
                return img, "jpeg-pil"
        from .jpeg import decode_jpeg

        return decode_jpeg(content), "jpeg-stdlib"
    # unknown container (WebP, TIFF, GIF, ...): extend via Pillow when it
    # is installed; same honest rejection when it is not. NOT gated by
    # the stdlib-force switch: the pinned decoders cannot read these at
    # all, so there is no pinned output to diverge from — presence vs
    # absence of the binding only changes quarantine membership, which
    # decode_error already records
    from .codec_bindings import decode_image_pil

    img = decode_image_pil(content)
    if img is not None:
        return img, "pil"
    raise NotImplementedError(
        "unrecognised image container (install Pillow to extend the dispatch)"
    )


def mulaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 mu-law bytes -> int16-scale samples (vectorised)."""
    u = (~b.astype(np.int64)) & 0xFF
    sign = u & 0x80
    exp = (u >> 4) & 0x07
    mant = u & 0x0F
    x = (((mant << 3) + 0x84) << exp) - 0x84
    return np.where(sign, -x, x)


def mulaw_encode(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`mulaw_decode`; pinned by the 256-byte identity."""
    x = np.clip(np.asarray(x, dtype=np.int64), -32635, 32635)
    sign = np.where(x < 0, 0x80, 0)
    m = np.abs(x) + 0x84
    exp = (np.floor(np.log2(m)).astype(np.int64) - 7).clip(0, 7)
    mant = (m >> (exp + 3)) & 0x0F
    return ((~(sign | (exp << 4) | mant)) & 0xFF).astype(np.uint8)


def alaw_decode(b: np.ndarray) -> np.ndarray:
    """G.711 A-law bytes -> int16-scale samples (vectorised)."""
    a = b.astype(np.int64) ^ 0x55
    seg = (a >> 4) & 0x07
    t = (a & 0x0F) << 4
    t = np.where(seg == 0, t + 8, (t + 0x108) << np.maximum(seg - 1, 0))
    return np.where(a & 0x80, t, -t)


def alaw_encode(x: np.ndarray) -> np.ndarray:
    """Inverse of :func:`alaw_decode`; pinned by the 256-byte identity."""
    x = np.clip(np.asarray(x, dtype=np.int64), -32256, 32256)
    sign = np.where(x >= 0, 0x80, 0)
    m = np.abs(x)
    seg = (np.floor(np.log2(np.maximum(m, 1))).astype(np.int64) - 7).clip(0, 7)
    mant = np.where(seg == 0, m >> 4, (m >> (seg + 3)) & 0x0F)
    return (((sign | (seg << 4) | mant) ^ 0x55) & 0xFF).astype(np.uint8)


def _wav_chunks(content: bytes) -> dict[bytes, bytes]:
    out: dict[bytes, bytes] = {}
    pos = 12
    while pos + 8 <= len(content):
        cid = content[pos : pos + 4]
        size = int.from_bytes(content[pos + 4 : pos + 8], "little")
        out.setdefault(cid, content[pos + 8 : pos + 8 + size])
        pos += 8 + size + (size % 2)
    return out


def decode_audio(content: bytes) -> tuple[np.ndarray, int]:
    """Audio decode — see :func:`decode_audio_tagged` (samples-only form)."""
    samples, rate, _dec = decode_audio_tagged(content)
    return samples, rate


def decode_audio_tagged(content: bytes) -> tuple[np.ndarray, int, str]:
    """Audio decode returning (samples, rate, decoder_identity): REAL
    for WAV holding PCM (stdlib ``wave``), IEEE float, or G.711
    A-law/mu-law (the telephony-corpus layouts, decoded by the
    vectorised companding tables above) — identity ``wav``, pinned on
    every environment. Samples are float64 in [-1, 1]; multi-channel is
    averaged to mono. Anything else — perceptual codecs (MP3/AAC/Opus)
    or a RIFF container that is not WAVE — decodes via the ffmpeg
    executable when present (identity ``ffmpeg``,
    environment-dependent, which is why callers record it) and raises
    otherwise."""
    samples, rate = _decode_audio_impl(content)
    wav = content[:4] == b"RIFF" and content[8:12] == b"WAVE"
    return samples, rate, "wav" if wav else "ffmpeg"


def _decode_audio_impl(content: bytes) -> tuple[np.ndarray, int]:
    import io
    import wave

    if content[:4] != b"RIFF" or content[8:12] != b"WAVE":
        # MP3/AAC/Opus/...: decode via the ffmpeg executable when present
        from .codec_bindings import decode_audio_ffmpeg

        decoded = decode_audio_ffmpeg(content)
        if decoded is not None:
            return decoded
        raise NotImplementedError(
            "non-WAV audio requires a codec library (ffmpeg extends this)"
        )
    chunks = _wav_chunks(content)
    fmt = chunks.get(b"fmt ")
    tag = int.from_bytes(fmt[0:2], "little") if fmt else 1
    if tag in (3, 6, 7):
        n_ch = int.from_bytes(fmt[2:4], "little") or 1
        rate = int.from_bytes(fmt[4:8], "little")
        bits = int.from_bytes(fmt[14:16], "little")
        raw = chunks.get(b"data", b"")
        if tag == 3:  # IEEE float
            dt = "<f4" if bits == 32 else "<f8"
            x = np.frombuffer(raw[: len(raw) // np.dtype(dt).itemsize * np.dtype(dt).itemsize], dt).astype(np.float64)
        elif tag == 7:
            x = mulaw_decode(np.frombuffer(raw, np.uint8)) / 32768.0
        else:
            x = alaw_decode(np.frombuffer(raw, np.uint8)) / 32768.0
        if n_ch > 1:
            x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
        return x, rate
    with wave.open(io.BytesIO(content)) as w:
        rate, n_ch, width = w.getframerate(), w.getnchannels(), w.getsampwidth()
        raw = w.readframes(w.getnframes())
    if width == 2:
        x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    elif width == 1:
        x = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    else:
        raise NotImplementedError(f"sample width {width} unsupported")
    if n_ch > 1:
        x = x[: len(x) - len(x) % n_ch].reshape(-1, n_ch).mean(axis=1)
    return x, rate


def image_feature(img: np.ndarray, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real image feature: grayscale mean-pooled to a sqrt(dim) grid,
    unit-normalised — deterministic pixel DSP, no model."""
    g = img.astype(np.float64).mean(axis=2)
    side = int(np.sqrt(dim))
    if side * side != dim:
        # a shorter image vector would silently break zip_with/cosine
        # against same-table text/audio features of length ``dim``
        raise ValueError(
            f"image_feature dim must be a perfect square, got {dim}"
        )
    h, w = g.shape
    ys = (np.arange(side + 1) * h) // side
    xs = (np.arange(side + 1) * w) // side
    pooled = np.array(
        [
            g[ys[i] : max(ys[i + 1], ys[i] + 1), xs[j] : max(xs[j + 1], xs[j] + 1)].mean()
            for i in range(side)
            for j in range(side)
        ]
    )
    n = np.linalg.norm(pooled)
    return pooled / n if n else pooled


def audio_feature(
    samples: np.ndarray, dim: int = FEATURE_DIM
) -> np.ndarray:
    """Real audio feature: ``dim``-bin RMS envelope, unit-normalised."""
    if not len(samples):
        return np.zeros(dim)
    edges = (np.arange(dim + 1) * len(samples)) // dim
    env = np.array(
        [
            np.sqrt(np.mean(samples[edges[i] : max(edges[i + 1], edges[i] + 1)] ** 2))
            for i in range(dim)
        ]
    )
    n = np.linalg.norm(env)
    return env / n if n else env


def extract_features(
    assets: DataFrame,
    dim: int = FEATURE_DIM,
    use_fake_encoder: bool = True,
    on_error: str = "tag",
) -> DataFrame:
    """Arrow-batched feature extraction:
    (asset_id, feature array<double>, decode_error string, decoder string).

    ``mapInPandas`` keeps whole-file bytes off the driver and vectorises per
    batch; output schema is plan-time fixed. With ``use_fake_encoder=False``
    the real decoders are called.

    ``decoder`` records which decode path ACTUALLY produced the feature
    (ADVICE r11 #2) — each modality's tagged decoder reports its own
    path, never an inference from the payload header: for images the
    :func:`decode_image_tagged` identity (``jpeg-pil`` vs
    ``jpeg-stdlib`` is the reproducibility-relevant split — pixel
    output can differ by codec rounding between them),
    ``wav``/``ffmpeg`` from :func:`decode_audio_tagged`,
    ``mjpeg``/``ffmpeg`` from :func:`video_feature_tagged`, ``fake``
    for the deterministic fake encoder; NULL on decode failure. A
    corpus built across heterogeneous environments can be audited for
    divergent decode paths after the fact (``GROUP BY decoder``).

    ``on_error='tag'`` (default): an asset the codecs cannot decode — a
    arithmetic-coded JPEG beside the DCT decoders, a truncated file, an
    unknown container — yields ``feature=NULL`` with the error message in
    ``decode_error`` instead of failing the whole batch. A real web-crawled
    corpus always contains a tail of undecodable assets; a 1000-executor
    job must quarantine them (callers filter ``decode_error IS NULL`` or
    route the tagged rows to a dead-letter sink), not die on the first
    one. ``on_error='raise'`` propagates, for pipelines that treat any
    decode failure as a bug. ``decode_error`` is NULL on success in both
    modes, so the schema is mode-independent.
    """
    if on_error not in ("tag", "raise"):
        raise ValueError(f"on_error must be 'tag' or 'raise', got {on_error!r}")
    # validate the JPEG-decoder switch EAGERLY at plan time: inside the
    # per-row loop a typo'd value would be swallowed by on_error='tag'
    # into 100% JPEG quarantine with exit 0 (review r12) — here it
    # fails in under a second. (Executors re-validate per decode; a
    # driver/executor env mismatch still surfaces, just later.)
    _jpeg_decoder_mode()

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats: list = []
            errs: list = []
            decs: list = []
            for content, modality in zip(pdf["content"], pdf["modality"]):
                raw = bytes(content)
                try:
                    if use_fake_encoder or modality == "text":
                        feats.append(_fake_feature(raw, dim))
                        dec = "fake"
                    elif modality == "image":
                        img, dec = decode_image_tagged(raw)
                        feats.append(image_feature(img, dim))
                    elif modality == "audio":
                        samples, _rate, dec = decode_audio_tagged(raw)
                        feats.append(audio_feature(samples, dim))
                    elif modality == "video":
                        feat, dec = video_feature_tagged(raw, dim)
                        feats.append(feat)
                    else:
                        raise NotImplementedError(f"modality {modality!r}")
                    errs.append(None)
                    decs.append(dec)
                except Exception as exc:
                    if on_error == "raise":
                        raise
                    feats.append(None)
                    errs.append(f"{type(exc).__name__}: {exc}")
                    decs.append(None)
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "feature": [
                        f.tolist() if f is not None else None for f in feats
                    ],
                    "decode_error": errs,
                    "decoder": decs,
                }
            )

    return assets.select("asset_id", "modality", "content").mapInPandas(
        run,
        schema=(
            "asset_id BIGINT, feature ARRAY<DOUBLE>, "
            "decode_error STRING, decoder STRING"
        ),
    )


def video_feature(content: bytes, dim: int = FEATURE_DIM) -> np.ndarray:
    """Real video feature — see :func:`video_feature_tagged`."""
    return video_feature_tagged(content, dim)[0]


def video_feature_tagged(
    content: bytes, dim: int = FEATURE_DIM
) -> tuple[np.ndarray, str]:
    """Real video feature plus the decoder identity that produced the
    frames (``mjpeg`` = the pinned in-repo codec, ``ffmpeg`` = the
    environment-dependent executable fallback for inter-frame codecs
    and non-AVI containers): mean of per-frame image features over the
    whole stream, re-unit-normalised. Deterministic pixel DSP, no
    model."""
    from .avi import decode_video_tagged

    frames, _fps, dec = decode_video_tagged(content)
    if not frames:
        raise ValueError("video stream holds no frames")
    mean = np.mean([image_feature(f, dim) for f in frames], axis=0)
    n = np.linalg.norm(mean)
    return (mean / n if n else mean), dec


def frame_sample_plan(
    assets: DataFrame, frames_per_asset: int = 4
) -> DataFrame:
    """Video frame-sampling plumbing: one output row per (asset, frame_idx).

    The explode happens before decode, so per-frame work partitions across
    executors; pair with ``sample_video_frames`` for the decoded form.
    """
    idx = F.explode(F.sequence(F.lit(0), F.lit(frames_per_asset - 1)))
    return assets.withColumn("frame_idx", idx).select(
        "asset_id", "modality", "frame_idx", "content", "meta"
    )


def sample_video_frames(
    assets: DataFrame,
    frames_per_asset: int = 4,
    use_fake: bool = True,
    dim: int = FEATURE_DIM,
) -> DataFrame:
    """Evenly-spaced frame sampling with per-frame features: one row per
    (asset_id, frame_idx) with the frame's image feature vector.

    ``use_fake=False`` decodes MJPEG AVIs for real (``operators.avi``) —
    MJPEG's frame independence makes the sample O(frames_per_asset), the
    property real pipelines exploit with keyframe-only reads. The fake
    path keeps batch/schema shape testable without building video bytes.
    Partitioning is inherited from the asset scan — per-asset decode
    parallelises across input splits, no shuffle."""
    from .avi import decode_video, sample_frame_indices

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids: list = []
            idxs: list = []
            totals: list = []
            feats: list = []
            for aid, content in zip(pdf["asset_id"], pdf["content"]):
                raw = bytes(content)
                if use_fake:
                    for i in range(frames_per_asset):
                        ids.append(aid)
                        idxs.append(i)
                        totals.append(frames_per_asset)
                        feats.append(
                            _fake_feature(raw + bytes([i & 0xFF]), dim)
                        )
                    continue
                frames, _ = decode_video(raw)
                for i in sample_frame_indices(len(frames), frames_per_asset):
                    ids.append(aid)
                    idxs.append(i)
                    totals.append(len(frames))
                    feats.append(image_feature(frames[i], dim))
            yield pd.DataFrame(
                {
                    "asset_id": ids,
                    "frame_idx": idxs,
                    "n_frames": totals,
                    "feature": feats,
                }
            )

    return assets.where(F.col("modality") == "video").select(
        "asset_id", "content"
    ).mapInPandas(
        run,
        schema="asset_id BIGINT, frame_idx INT, n_frames INT, feature ARRAY<DOUBLE>",
    )


def resize_images(
    assets: DataFrame,
    width: int = 64,
    height: int = 64,
    use_fake: bool = True,
) -> DataFrame:
    """Image-resize plumbing: (asset_id, width, height, thumbnail binary).

    Arrow-batched over ``mapInPandas``; the resample kernel is the stubbed
    codec step (``decode_image`` until an image library is installed). The
    deterministic fake emits a width*height byte thumbnail by striding the
    source bytes, so batch shapes, output schema, and sizes are real and
    testable; Spark-side partitioning is inherited from the asset scan
    (one task per input split, no shuffle).
    """
    n_out = width * height

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            thumbs = []
            for raw in pdf["content"]:
                raw = bytes(raw)
                if not use_fake:
                    img = decode_image(raw)
                    g = img.astype(np.float64).mean(axis=2).astype(np.uint8)
                    ys = (np.arange(height) * g.shape[0]) // height
                    xs = (np.arange(width) * g.shape[1]) // width
                    thumbs.append(g[ys][:, xs].tobytes())
                    continue
                if not raw:
                    thumbs.append(b"\x00" * n_out)
                    continue
                # stride-subsample the payload to exactly n_out bytes
                idx = (np.arange(n_out) * len(raw) // n_out) % len(raw)
                thumbs.append(np.frombuffer(raw, dtype=np.uint8)[idx].tobytes())
            yield pd.DataFrame(
                {
                    "asset_id": pdf["asset_id"],
                    "width": width,
                    "height": height,
                    "thumbnail": thumbs,
                }
            )

    return assets.select("asset_id", "content").mapInPandas(
        run, schema="asset_id BIGINT, width INT, height INT, thumbnail BINARY"
    )
