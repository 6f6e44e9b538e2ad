"""Baseline JPEG codec with no image library — stdlib + numpy only.

Closes the last honestly-stubbed image seam in ``operators/multimodal.py``
the same way the netCDF-3 / xlsx / PNG codecs closed theirs: a real byte
path, validated by encode->decode round-trips.

Scope (documented, enforced): **baseline sequential DCT** (SOF0/SOF1),
8-bit samples, grayscale or YCbCr with sampling factors 1-2 (4:4:4,
4:2:2, 4:2:0), restart intervals. Progressive (SOF2), arithmetic coding,
and 12-bit precision raise ``NotImplementedError`` with the marker named.

The encoder (used by tests and fixture builders) writes 4:4:4 or
grayscale JFIF with the Annex-K quantisation and Huffman tables; the
decoder reads the tables from the stream, so a round-trip exercises the
full DQT/DHT/SOF/SOS path rather than trusting shared constants.

Performance note: entropy decode is a per-symbol Python loop — correct
and deterministic, sized for fixture-scale images inside Arrow batches.
A production 100 TB image pipeline would swap ``decode_jpeg`` for a
libjpeg-turbo binding behind the same ``multimodal.decode_image``
dispatch; nothing Spark-side changes.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- tables

#: zigzag scan: ZIGZAG[i] = raster index of the i-th zigzag coefficient
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

STD_LUM_QT = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64)

STD_CHR_QT = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64)

# Annex-K Huffman specs: (bits[1..16] code-length histogram, symbol list)
DC_LUM_SPEC = (
    [0, 1, 5, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0, 0, 0],
    list(range(12)),
)
DC_CHR_SPEC = (
    [0, 3, 1, 1, 1, 1, 1, 1, 1, 1, 1, 0, 0, 0, 0, 0],
    list(range(12)),
)
AC_LUM_SPEC = (
    [0, 2, 1, 3, 3, 2, 4, 3, 5, 5, 4, 4, 0, 0, 1, 0x7D],
    [
        0x01, 0x02, 0x03, 0x00, 0x04, 0x11, 0x05, 0x12,
        0x21, 0x31, 0x41, 0x06, 0x13, 0x51, 0x61, 0x07,
        0x22, 0x71, 0x14, 0x32, 0x81, 0x91, 0xA1, 0x08,
        0x23, 0x42, 0xB1, 0xC1, 0x15, 0x52, 0xD1, 0xF0,
        0x24, 0x33, 0x62, 0x72, 0x82, 0x09, 0x0A, 0x16,
        0x17, 0x18, 0x19, 0x1A, 0x25, 0x26, 0x27, 0x28,
        0x29, 0x2A, 0x34, 0x35, 0x36, 0x37, 0x38, 0x39,
        0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48, 0x49,
        0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58, 0x59,
        0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68, 0x69,
        0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78, 0x79,
        0x7A, 0x83, 0x84, 0x85, 0x86, 0x87, 0x88, 0x89,
        0x8A, 0x92, 0x93, 0x94, 0x95, 0x96, 0x97, 0x98,
        0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5, 0xA6, 0xA7,
        0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4, 0xB5, 0xB6,
        0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3, 0xC4, 0xC5,
        0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2, 0xD3, 0xD4,
        0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA, 0xE1, 0xE2,
        0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9, 0xEA,
        0xF1, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
AC_CHR_SPEC = (
    [0, 2, 1, 2, 4, 4, 3, 4, 7, 5, 4, 4, 0, 1, 2, 0x77],
    [
        0x00, 0x01, 0x02, 0x03, 0x11, 0x04, 0x05, 0x21,
        0x31, 0x06, 0x12, 0x41, 0x51, 0x07, 0x61, 0x71,
        0x13, 0x22, 0x32, 0x81, 0x08, 0x14, 0x42, 0x91,
        0xA1, 0xB1, 0xC1, 0x09, 0x23, 0x33, 0x52, 0xF0,
        0x15, 0x62, 0x72, 0xD1, 0x0A, 0x16, 0x24, 0x34,
        0xE1, 0x25, 0xF1, 0x17, 0x18, 0x19, 0x1A, 0x26,
        0x27, 0x28, 0x29, 0x2A, 0x35, 0x36, 0x37, 0x38,
        0x39, 0x3A, 0x43, 0x44, 0x45, 0x46, 0x47, 0x48,
        0x49, 0x4A, 0x53, 0x54, 0x55, 0x56, 0x57, 0x58,
        0x59, 0x5A, 0x63, 0x64, 0x65, 0x66, 0x67, 0x68,
        0x69, 0x6A, 0x73, 0x74, 0x75, 0x76, 0x77, 0x78,
        0x79, 0x7A, 0x82, 0x83, 0x84, 0x85, 0x86, 0x87,
        0x88, 0x89, 0x8A, 0x92, 0x93, 0x94, 0x95, 0x96,
        0x97, 0x98, 0x99, 0x9A, 0xA2, 0xA3, 0xA4, 0xA5,
        0xA6, 0xA7, 0xA8, 0xA9, 0xAA, 0xB2, 0xB3, 0xB4,
        0xB5, 0xB6, 0xB7, 0xB8, 0xB9, 0xBA, 0xC2, 0xC3,
        0xC4, 0xC5, 0xC6, 0xC7, 0xC8, 0xC9, 0xCA, 0xD2,
        0xD3, 0xD4, 0xD5, 0xD6, 0xD7, 0xD8, 0xD9, 0xDA,
        0xE2, 0xE3, 0xE4, 0xE5, 0xE6, 0xE7, 0xE8, 0xE9,
        0xEA, 0xF2, 0xF3, 0xF4, 0xF5, 0xF6, 0xF7, 0xF8,
        0xF9, 0xFA,
    ],
)
for _bits, _vals in (DC_LUM_SPEC, DC_CHR_SPEC, AC_LUM_SPEC, AC_CHR_SPEC):
    assert sum(_bits) == len(_vals), "huffman spec histogram mismatch"


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8-point DCT-II basis: F = M @ f @ M.T."""
    k = np.arange(8).reshape(-1, 1)
    n = np.arange(8).reshape(1, -1)
    m = np.sqrt(2.0 / 8.0) * np.cos(np.pi * (2 * n + 1) * k / 16.0)
    m[0] /= np.sqrt(2.0)
    return m


_DCT_M = _dct_matrix()


def _canonical_codes(bits: list[int], vals: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length) per the JPEG canonical-code construction."""
    out: dict[int, tuple[int, int]] = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[vals[idx]] = (code, length)
            code += 1
            idx += 1
        code <<= 1
    return out


def _decode_table(bits: list[int], vals: list[int]) -> dict[tuple[int, int], int]:
    """(length, code) -> symbol lookup for the bit-serial decoder."""
    return {
        (length, code): sym
        for sym, (code, length) in _canonical_codes(bits, vals).items()
    }


def _quality_scale(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling of an Annex-K table."""
    quality = min(max(int(quality), 1), 100)
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((table * scale + 50) // 100, 1, 255).astype(np.int64)


# ---------------------------------------------------------------- bit IO

class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self._acc = 0
        self._n = 0

    def write(self, value: int, length: int) -> None:
        self._acc = (self._acc << length) | (value & ((1 << length) - 1))
        self._n += length
        while self._n >= 8:
            byte = (self._acc >> (self._n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.out.append(0x00)
            self._n -= 8
        self._acc &= (1 << self._n) - 1

    def flush(self) -> None:
        if self._n:
            self.write(0x7F, 8 - self._n)  # pad with 1s per spec convention


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    ``sync_restart`` consumes an RSTn marker and realigns."""

    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self._acc = 0
        self._n = 0

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartPending()
            else:
                # EOI or another marker: treat as endless 0 padding (some
                # encoders truncate the final EOB tail)
                self._acc = (self._acc << 8)
                self._n += 8
                return
        else:
            self.pos += 1
        self._acc = (self._acc << 8) | b
        self._n += 8

    def bit(self) -> int:
        if self._n == 0:
            self._fill()
        self._n -= 1
        return (self._acc >> self._n) & 1

    def receive(self, length: int) -> int:
        v = 0
        for _ in range(length):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        self._acc = 0
        self._n = 0
        while self.data[self.pos] != 0xFF or not (
            0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        self.pos += 2


class _RestartPending(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a ``size``-bit magnitude code to its signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader: _BitReader, table: dict[tuple[int, int], int]) -> int:
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


# ---------------------------------------------------------------- decode

def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline JPEG to HxWx3 uint8 RGB (grayscale replicated)."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    restart = 0
    i = 2
    while True:
        if i + 1 >= len(content):
            raise ValueError("truncated JPEG stream (no SOS before EOF)")
        if content[i] != 0xFF:
            i += 1  # fill bytes / padding between segments
            continue
        marker = content[i + 1]
        i += 2
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            continue
        if marker == 0xD9:  # EOI before SOS
            raise ValueError("no scan data before EOI")
        seg_len = struct.unpack_from(">H", content, i)[0]
        seg = content[i + 2 : i + seg_len]
        if marker == 0xDB:  # DQT
            p = 0
            while p < len(seg):
                prec, tid = seg[p] >> 4, seg[p] & 0x0F
                p += 1
                if prec == 0:
                    tbl = np.frombuffer(seg, np.uint8, 64, p).astype(np.int64)
                    p += 64
                else:
                    tbl = np.frombuffer(seg, ">u2", 64, p).astype(np.int64)
                    p += 128
                raster = np.zeros(64, dtype=np.int64)
                raster[ZIGZAG] = tbl
                qt[tid] = raster.reshape(8, 8)
        elif marker == 0xC4:  # DHT
            p = 0
            while p < len(seg):
                cls, tid = seg[p] >> 4, seg[p] & 0x0F
                bits = list(seg[p + 1 : p + 17])
                n = sum(bits)
                vals = list(seg[p + 17 : p + 17 + n])
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_table(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1):  # SOF0/1 baseline
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
        elif marker == 0xC2:
            raise NotImplementedError("progressive JPEG (SOF2) unsupported")
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8):
            raise NotImplementedError(f"SOF marker 0x{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            scan_sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                scan_sel[cid] = (tabs >> 4, tabs & 0x0F)
            return _decode_scan(
                content, i + seg_len, frame, scan_sel, qt, dc_tabs, ac_tabs,
                restart,
            )
        i += seg_len


def _decode_scan(data, start, frame, scan_sel, qt, dc_tabs, ac_tabs, restart):
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    if max_h > 2 or max_v > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    planes = {
        cid: np.zeros((mcus_y * 8 * cv, mcus_x * 8 * ch), dtype=np.float64)
        for cid, ch, cv, _ in comps
    }
    reader = _BitReader(data, start)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.sync_restart()
                pred = {cid: 0 for cid in pred}
            try:
                for cid, ch, cv, tq in comps:
                    dt = dc_tabs[scan_sel[cid][0]]
                    at = ac_tabs[scan_sel[cid][1]]
                    q = qt[tq]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = _decode_block(reader, dt, at)
                            pred[cid] += blk[0]
                            zz = np.zeros(64, dtype=np.float64)
                            zz[ZIGZAG] = blk
                            zz[0] = pred[cid]
                            coef = zz.reshape(8, 8) * q
                            pix = _DCT_M.T @ coef @ _DCT_M + 128.0
                            y0 = (my * cv + by) * 8
                            x0 = (mx * ch + bx) * 8
                            planes[cid][y0 : y0 + 8, x0 : x0 + 8] = pix
            except _RestartPending:
                raise ValueError("restart marker inside MCU (corrupt stream)")
            mcu_count += 1
    out = []
    for cid, ch, cv, _ in comps:
        p = planes[cid]
        if ch < max_h:
            p = np.repeat(p, max_h // ch, axis=1)
        if cv < max_v:
            p = np.repeat(p, max_v // cv, axis=0)
        out.append(p[:h, :w])
    if len(out) == 1:
        g = np.clip(np.round(out[0]), 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=-1)
    y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
    rgb = np.stack(
        [
            y + 1.402 * cr,
            y - 0.344136 * cb - 0.714136 * cr,
            y + 1.772 * cb,
        ],
        axis=-1,
    )
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _decode_block(reader, dc_table, ac_table) -> np.ndarray:
    """One 8x8 block in zigzag order; blk[0] is the DC *difference*."""
    blk = np.zeros(64, dtype=np.float64)
    s = _huff_decode(reader, dc_table)
    blk[0] = _extend(reader.receive(s), s) if s else 0
    k = 1
    while k < 64:
        rs = _huff_decode(reader, ac_table)
        run, size = rs >> 4, rs & 0x0F
        if size == 0:
            if run == 15:  # ZRL
                k += 16
                continue
            break  # EOB
        k += run
        if k > 63:
            raise ValueError("AC run past end of block")
        blk[k] = _extend(reader.receive(size), size)
        k += 1
    return blk


# ---------------------------------------------------------------- encode

def _size_cat(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(writer, blk, pred, dc_code, ac_code) -> int:
    """Entropy-code one zigzag block; returns the new DC predictor."""
    diff = int(blk[0]) - pred
    s = _size_cat(diff)
    code, length = dc_code[s]
    writer.write(code, length)
    if s:
        writer.write(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = int(np.max(np.nonzero(blk)[0])) if np.any(blk[1:]) else 0
    for k in range(1, 64):
        v = int(blk[k])
        if v == 0:
            if k > last_nz:
                break
            run += 1
            if run == 16:
                zc, zl = ac_code[0xF0]
                writer.write(zc, zl)
                run = 0
            continue
        s = _size_cat(v)
        code, length = ac_code[(run << 4) | s]
        writer.write(code, length)
        writer.write(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        ec, el = ac_code[0x00]
        writer.write(ec, el)
    return int(blk[0])


def encode_jpeg(
    img: np.ndarray, quality: int = 90, subsampling: str = "444"
) -> bytes:
    """Encode HxWx3 RGB (or HxW grayscale) uint8 as baseline JFIF.

    ``subsampling``: ``'444'`` (chroma at full resolution) or ``'420'``
    (chroma 2x2 box-averaged — the common camera/web layout, which also
    exercises the decoder's upsampling path)."""
    img = np.asarray(img)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    lum_q = _quality_scale(STD_LUM_QT, quality).reshape(8, 8)
    chr_q = _quality_scale(STD_CHR_QT, quality).reshape(8, 8)
    if gray:
        planes = [img.astype(np.float64)]
    else:
        r, g, b = (img[..., c].astype(np.float64) for c in range(3))
        planes = [
            0.299 * r + 0.587 * g + 0.114 * b,
            -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0,
            0.5 * r - 0.418688 * g - 0.081312 * b + 128.0,
        ]

    # (plane, quant, (h, v), dc spec, ac spec) per component
    if gray:
        comps = [(planes[0], lum_q, (1, 1), DC_LUM_SPEC, AC_LUM_SPEC)]
    elif subsampling == "444":
        comps = [
            (planes[0], lum_q, (1, 1), DC_LUM_SPEC, AC_LUM_SPEC),
            (planes[1], chr_q, (1, 1), DC_CHR_SPEC, AC_CHR_SPEC),
            (planes[2], chr_q, (1, 1), DC_CHR_SPEC, AC_CHR_SPEC),
        ]
    elif subsampling == "420":
        def down2(p: np.ndarray) -> np.ndarray:
            ph, pw = -(-p.shape[0] // 2) * 2, -(-p.shape[1] // 2) * 2
            q = np.pad(
                p, ((0, ph - p.shape[0]), (0, pw - p.shape[1])), mode="edge"
            )
            return q.reshape(ph // 2, 2, pw // 2, 2).mean(axis=(1, 3))

        comps = [
            (planes[0], lum_q, (2, 2), DC_LUM_SPEC, AC_LUM_SPEC),
            (down2(planes[1]), chr_q, (1, 1), DC_CHR_SPEC, AC_CHR_SPEC),
            (down2(planes[2]), chr_q, (1, 1), DC_CHR_SPEC, AC_CHR_SPEC),
        ]
    else:
        raise ValueError(f"subsampling must be '444' or '420', got {subsampling!r}")

    max_h = max(c[2][0] for c in comps)
    max_v = max(c[2][1] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))

    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0"
        + struct.pack(">H", 16)
        + b"JFIF\x00\x01\x01\x00\x00\x01\x00\x01\x00\x00"
    )
    for tid, q in ((0, lum_q), *(((1, chr_q),) if not gray else ())):
        # DQT stores zigzag order: position i carries raster[ZIGZAG[i]]
        zz = q.reshape(64)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">HB", 67, tid) + bytes(int(v) for v in zz)
    nc = len(comps)
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, (_, _, (ch, cv), _, _) in enumerate(comps):
        out += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])
    specs = [(0x00, DC_LUM_SPEC), (0x10, AC_LUM_SPEC)]
    if not gray:
        specs += [(0x01, DC_CHR_SPEC), (0x11, AC_CHR_SPEC)]
    for tc, (bits, vals) in specs:
        out += (
            b"\xff\xc4"
            + struct.pack(">HB", 19 + len(vals), tc)
            + bytes(bits)
            + bytes(vals)
        )
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nc, nc)
    for ci in range(nc):
        out += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    out += b"\x00\x3f\x00"  # Ss/Se/AhAl

    # per component: pad to its MCU-covered size, block, DCT, quantise
    coefs, dc_codes, ac_codes = [], [], []
    for p, q, (ch, cv), dc_spec, ac_spec in comps:
        th, tw = mcus_y * 8 * cv, mcus_x * 8 * ch
        pad = np.pad(
            p, ((0, th - p.shape[0]), (0, tw - p.shape[1])), mode="edge"
        ) - 128.0
        blocks = pad.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ij,abjk,lk->abil", _DCT_M, blocks, _DCT_M)
        coefs.append(np.round(f / q).astype(np.int64))
        dc_codes.append(_canonical_codes(*dc_spec))
        ac_codes.append(_canonical_codes(*ac_spec))

    writer = _BitWriter()
    pred = [0] * nc
    for my in range(mcus_y):
        for mx in range(mcus_x):
            for ci, (_, _, (ch, cv), _, _) in enumerate(comps):
                for by in range(cv):
                    for bx in range(ch):
                        blk = coefs[ci][my * cv + by, mx * ch + bx]
                        zz = blk.reshape(64)[ZIGZAG]
                        pred[ci] = _encode_block(
                            writer, zz, pred[ci], dc_codes[ci], ac_codes[ci]
                        )
    writer.flush()
    out += writer.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
