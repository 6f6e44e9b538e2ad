"""Baseline JPEG codec with no image library — stdlib + numpy only.

Closes the last honestly-stubbed image seam in ``operators/multimodal.py``
the same way the netCDF-3 / xlsx / PNG codecs closed theirs: a real byte
path, validated by encode->decode round-trips.

Scope (documented, enforced): **baseline sequential DCT** (SOF0/SOF1)
and **progressive DCT** (SOF2 — spectral selection, successive
approximation, EOB runs, restart intervals per T.81 G.2), 8-bit samples,
grayscale or YCbCr with sampling factors 1-2 (4:4:4, 4:2:2, 4:2:0).
Arithmetic coding, hierarchical/lossless frames, and 12-bit precision
raise ``NotImplementedError`` with the marker named.

The encoder (used by tests and fixture builders) writes 4:4:4 or
grayscale JFIF with the Annex-K quantisation and Huffman tables — or,
with ``progressive=True``, an SOF2 stream over the libjpeg-shaped scan
script whose decode is bit-identical to the baseline encode's. The
decoder reads all tables from the stream, so a round-trip exercises the
full DQT/DHT/SOF/SOS path rather than trusting shared constants.

Performance note: entropy decode is table-driven (VERDICT r9 #2) — the
stream is pre-scanned once with numpy (bulk 0xFF classification:
unstuffing, restart segmentation, terminator location) and each Huffman
symbol then resolves with ONE 16-bit-window LUT probe plus one shift for
its magnitude bits, replacing the former per-bit accumulate/dict-probe
loop (measured >=5x on the checked-in micro-bench,
``tools/bench_jpeg_decode.py``). The remaining per-symbol Python loop is
irreducible without a native binding; a production 100 TB image pipeline
would swap ``decode_jpeg`` for a libjpeg-turbo binding behind the same
``multimodal.decode_image`` dispatch; nothing Spark-side changes.
"""

from __future__ import annotations

import struct

import numpy as np

#: decode-side sanity cap on declared frame pixels (2^16 x 2^16 is legal
#: JPEG but a 34 GB coefficient store; corrupt headers must not OOM a
#: quarantine batch). 100 MP covers every real photographic asset.
MAX_PIXELS = 100_000_000

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


def _decode_lut(bits: list[int], vals: list[int]) -> tuple[bytes, bytes]:
    """Table-driven decode LUT: for every 16-bit window ``w`` of the bit
    stream, ``sym[w]`` is the symbol whose canonical code prefixes the
    window and ``ln[w]`` its code length (0 = no valid code — corrupt
    stream). 2 x 64 KiB per DHT; one lookup replaces the former bit-serial
    walk's per-bit dict probes (VERDICT r9 #2)."""
    sym = bytearray(1 << 16)
    ln = bytearray(1 << 16)
    for s, (code, length) in _canonical_codes(bits, vals).items():
        lo = code << (16 - length)
        span = 1 << (16 - length)
        sym[lo : lo + span] = bytes([s]) * span
        ln[lo : lo + span] = bytes([length]) * span
    return bytes(sym), bytes(ln)


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
    """MSB-first reader over a scan's entropy-coded data.

    Construction pre-scans the region ONCE with numpy (vectorised — no
    per-byte Python walk): 0xFF bytes are classified in bulk into
    stuffing (0xFF00, removed), RSTn markers (segment boundaries) and
    the terminating marker (``end_pos``). Decoding then runs over the
    unstuffed per-segment byte strings with O(1) window peeks —
    ``huff`` resolves a whole symbol with one 16-bit-window LUT probe
    (:func:`_decode_lut`) instead of the former per-bit accumulate +
    dict-probe loop, and ``receive`` extracts its magnitude bits in one
    shift. Reads past a segment's end mean the decoder ran into a
    restart marker it did not expect (corrupt stream —
    ``_RestartPending``); past the LAST segment they yield endless 0
    padding (some encoders truncate the final EOB tail), bounded by the
    callers' block/MCU loops."""

    def __init__(self, data: bytes, start: int) -> None:
        n = len(data) - start
        arr = np.frombuffer(data, dtype=np.uint8, count=max(n, 0), offset=start)
        ff = np.flatnonzero(arr == 0xFF)
        # byte after each 0xFF; a trailing lone 0xFF terminates the scan
        nxt = np.where(ff + 1 < n, arr[np.minimum(ff + 1, max(n - 1, 0))], 0xD9)
        is_stuff = nxt == 0x00
        is_rst = (nxt >= 0xD0) & (nxt <= 0xD7)
        term = ff[~is_stuff & ~is_rst]
        # the endless-0-padding carve-out (truncated final EOB tail) only
        # applies to streams that DO end in a marker; data running to EOF
        # with no terminator is a truncation and must raise, not pad
        self._terminated = bool(term.size)
        end = int(term[0]) if term.size else n
        #: absolute offset of the marker terminating the entropy data
        self.end_pos = start + end
        rsts = ff[is_rst & (ff < end)]
        stuffs = ff[is_stuff & (ff < end)]
        self.segs: list[tuple[bytes, int]] = []
        seg_start = 0
        for bound in [*rsts.tolist(), end]:
            zeros = stuffs[(stuffs >= seg_start) & (stuffs < bound)] + 1
            seg = np.delete(arr[seg_start:bound], zeros - seg_start)
            # +4 zero-byte pad keeps the 32-bit window peek in bounds
            self.segs.append((seg.tobytes() + b"\0\0\0\0", seg.size * 8))
            seg_start = bound + 2  # skip the RSTn marker
        self.seg_i = 0
        self.seg, self.nbits = self.segs[0]
        self.bitpos = 0

    def _overrun(self) -> None:
        if self.seg_i + 1 < len(self.segs):
            raise _RestartPending()
        if not self._terminated:
            raise ValueError("truncated entropy stream (no terminating marker)")

    def bit(self) -> int:
        p = self.bitpos
        self.bitpos = p + 1
        if p >= self.nbits:
            self._overrun()
            return 0
        return (self.seg[p >> 3] >> (7 - (p & 7))) & 1

    def _window(self, p: int) -> int:
        bp = p >> 3
        s = self.seg
        if bp + 4 > len(s):  # deep in the zero-pad tail
            return 0
        return ((int.from_bytes(s[bp : bp + 4], "big") << (p & 7)) >> 16) & 0xFFFF

    def receive(self, length: int) -> int:
        if length == 0:
            return 0
        p = self.bitpos
        self.bitpos = p + length
        if self.bitpos > self.nbits:
            self._overrun()
        return self._window(p) >> (16 - length)

    def huff(self, lut: tuple[bytes, bytes]) -> int:
        p = self.bitpos
        if p >= self.nbits:
            self._overrun()
        w = self._window(p)
        ln = lut[1][w]
        if ln == 0:
            raise ValueError("invalid huffman code in entropy stream")
        if p + ln > self.nbits:
            # the code itself straddles the segment end: on a non-last
            # segment that means the decoder ran into a restart marker
            # mid-symbol (corrupt stream — the legacy bit-serial reader
            # raised here too); on the last segment it is the legal
            # zero-pad tail
            self._overrun()
        self.bitpos = p + ln
        return lut[0][w]

    def sync_restart(self) -> None:
        if self.seg_i + 1 >= len(self.segs):
            raise ValueError("expected restart marker (corrupt stream)")
        self.seg_i += 1
        self.seg, self.nbits = self.segs[self.seg_i]
        self.bitpos = 0


class _RestartPending(Exception):
    pass


def _extend(v: int, size: int) -> int:
    """JPEG EXTEND: map a ``size``-bit magnitude code to its signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def _huff_decode(reader: _BitReader, lut: tuple[bytes, bytes]) -> int:
    return reader.huff(lut)


# ---------------------------------------------------------------- decode

def decode_jpeg(content: bytes) -> np.ndarray:
    """Decode a baseline (SOF0/1) or progressive (SOF2) JPEG to HxWx3 uint8
    RGB (grayscale replicated across the three channels).

    Both paths share one coefficient store and one vectorised
    dequantise+IDCT reconstruction: baseline fills it in a single scan,
    progressive accumulates DC/AC first+refinement scans (T.81 G.2, with
    EOB-run and restart support) until EOI."""
    if content[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG payload (missing SOI)")
    qt: dict[int, np.ndarray] = {}
    dc_tabs: dict[int, dict] = {}
    ac_tabs: dict[int, dict] = {}
    frame = None
    progressive = False
    coefs = None  # cid -> (blocks_v, blocks_h, 64) zigzag-order int32
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
        if marker == 0xD9:  # EOI
            if progressive and coefs is not None:
                return _reconstruct(frame, coefs, qt)
            raise ValueError("no scan data before EOI")
        if i + 2 > len(content):
            raise ValueError("truncated JPEG stream (segment length cut)")
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
                (dc_tabs if cls == 0 else ac_tabs)[tid] = _decode_lut(bits, vals)
                p += 17 + n
        elif marker in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
            prec, h, w, nc = struct.unpack_from(">BHHB", seg, 0)
            if prec != 8:
                raise NotImplementedError(f"{prec}-bit precision unsupported")
            if h * w > MAX_PIXELS or h == 0 or w == 0:
                # a corrupted/adversarial SOF can declare 65535x65535 and
                # force a multi-GB coefficient allocation inside a
                # quarantine batch; fail the row instead
                raise ValueError(
                    f"frame {w}x{h} outside decoder limit ({MAX_PIXELS} px)"
                )
            comps = []
            for c in range(nc):
                cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append((cid, hv >> 4, hv & 0x0F, tq))
            frame = (h, w, comps)
            progressive = marker == 0xC2
            coefs = _alloc_coefs(frame)
        elif 0xC3 <= marker <= 0xCF and marker not in (0xC4, 0xC8):
            raise NotImplementedError(f"SOF marker 0x{marker:02X} unsupported")
        elif marker == 0xDD:  # DRI
            restart = struct.unpack_from(">H", seg, 0)[0]
        elif marker == 0xDA:  # SOS
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            order = []
            scan_sel = {}
            for c in range(ns):
                cid, tabs = seg[1 + 2 * c], seg[2 + 2 * c]
                order.append(cid)
                scan_sel[cid] = (tabs >> 4, tabs & 0x0F)
            ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
            ah, al = seg[3 + 2 * ns] >> 4, seg[3 + 2 * ns] & 0x0F
            if not progressive:
                _decode_baseline_scan(
                    content, i + seg_len, frame, scan_sel, dc_tabs, ac_tabs,
                    restart, coefs,
                )
                return _reconstruct(frame, coefs, qt)
            i = _decode_progressive_scan(
                content, i + seg_len, frame, order, scan_sel, ss, se, ah, al,
                dc_tabs, ac_tabs, restart, coefs,
            )
            continue
        i += seg_len


def _alloc_coefs(frame) -> dict[int, np.ndarray]:
    """Per-component zigzag coefficient store, padded to the MCU grid."""
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    if max_h > 2 or max_v > 2:
        raise NotImplementedError("sampling factors above 2 unsupported")
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    return {
        cid: np.zeros((mcus_y * cv, mcus_x * ch, 64), dtype=np.int32)
        for cid, ch, cv, _ in comps
    }


def _comp_blocks(frame, cid) -> tuple[int, int]:
    """True (non-interleaved) block-grid dims (rows, cols) of a component —
    ceil(comp_dim / 8) of the component's own sample dims, which is SMALLER
    than the MCU-padded store when the padded grid overshoots the image."""
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    _, ch, cv, _ = next(c for c in comps if c[0] == cid)
    cw = -(-w * ch // max_h)
    chh = -(-h * cv // max_v)
    return -(-chh // 8), -(-cw // 8)


def _decode_baseline_scan(
    data, start, frame, scan_sel, dc_tabs, ac_tabs, restart, coefs
) -> None:
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    mcus_x = -(-w // (8 * max_h))
    mcus_y = -(-h // (8 * max_v))
    reader = _BitReader(data, start)
    pred = {cid: 0 for cid, *_ in comps}
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                reader.sync_restart()
                pred = {cid: 0 for cid in pred}
            try:
                for cid, ch, cv, _ in comps:
                    dt = dc_tabs[scan_sel[cid][0]]
                    at = ac_tabs[scan_sel[cid][1]]
                    for by in range(cv):
                        for bx in range(ch):
                            blk = _decode_block(reader, dt, at)
                            pred[cid] += int(blk[0])
                            blk[0] = pred[cid]
                            coefs[cid][my * cv + by, mx * ch + bx] = blk
            except _RestartPending:
                raise ValueError("restart marker inside MCU (corrupt stream)")
            mcu_count += 1


def _decode_progressive_scan(
    data, start, frame, order, scan_sel, ss, se, ah, al,
    dc_tabs, ac_tabs, restart, coefs,
) -> int:
    """Decode one progressive scan in place; returns the offset of the next
    marker after the scan's entropy data.

    DC scans (Ss=0) may be interleaved; AC scans are single-component and
    walk the component's true block grid in raster order. ``Ah=0`` scans
    establish coefficient values shifted by ``Al``; ``Ah>0`` refinement
    scans append one magnitude bit (the libjpeg G.2 correction-bit walk)."""
    reader = _BitReader(data, start)
    pred = {cid: 0 for cid in order}
    eobrun = 0
    is_dc = ss == 0
    if is_dc and se != 0:
        raise ValueError("progressive DC scan must have Se=0")
    if not is_dc and len(order) != 1:
        raise ValueError("progressive AC scan must be single-component")

    def dc_unit(cid: int, by: int, bx: int) -> None:
        blk = coefs[cid][by, bx]
        if ah == 0:
            s = _huff_decode(reader, dc_tabs[scan_sel[cid][0]])
            diff = _extend(reader.receive(s), s) if s else 0
            pred[cid] += diff
            blk[0] = pred[cid] << al
        elif reader.bit():
            blk[0] |= 1 << al

    n = 0
    try:
        if len(order) == 1:
            cid = order[0]
            bh, bw = _comp_blocks(frame, cid)
            at = None if is_dc else ac_tabs[scan_sel[cid][1]]
            for by in range(bh):
                for bx in range(bw):
                    if restart and n and n % restart == 0:
                        reader.sync_restart()
                        pred[cid] = 0
                        eobrun = 0
                    if is_dc:
                        dc_unit(cid, by, bx)
                    elif ah == 0:
                        eobrun = _decode_ac_first(
                            reader, coefs[cid][by, bx], ss, se, al, at, eobrun
                        )
                    else:
                        eobrun = _decode_ac_refine(
                            reader, coefs[cid][by, bx], ss, se, al, at, eobrun
                        )
                    n += 1
        else:
            h, w, comps = frame
            by_id = {c[0]: c for c in comps}
            max_h = max(c[1] for c in comps)
            max_v = max(c[2] for c in comps)
            mcus_x = -(-w // (8 * max_h))
            mcus_y = -(-h // (8 * max_v))
            for my in range(mcus_y):
                for mx in range(mcus_x):
                    if restart and n and n % restart == 0:
                        reader.sync_restart()
                        for k in pred:
                            pred[k] = 0
                    for cid in order:
                        _, ch, cv, _ = by_id[cid]
                        for by in range(cv):
                            for bx in range(ch):
                                dc_unit(cid, my * cv + by, mx * ch + bx)
                    n += 1
    except _RestartPending:
        raise ValueError("restart marker inside scan unit (corrupt stream)")
    # the construction pre-scan already located the marker terminating
    # this scan's entropy data (past any padding/restart tail)
    return reader.end_pos


def _decode_ac_first(reader, blk, ss, se, al, ac_table, eobrun) -> int:
    """First AC scan for one block's band: values arrive shifted by Al;
    EOBn symbols start a run of ``2^n + ext - 1`` further all-zero bands."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _huff_decode(reader, ac_table)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                k += 16
                continue
            eobrun = (1 << r) - 1
            if r:
                eobrun += reader.receive(r)
            break
        k += r
        if k > se:
            raise ValueError("AC run past band end")
        blk[k] = _extend(reader.receive(s), s) << al
        k += 1
    return eobrun


def _decode_ac_refine(reader, blk, ss, se, al, ac_table, eobrun) -> int:
    """Refinement AC scan for one block's band — the correction-bit walk:
    history-nonzero coefficients each consume one magnitude bit; newly
    nonzero coefficients arrive as ±2^Al after their zero-run."""
    p1 = 1 << al
    m1 = -1 << al

    def correct(k: int) -> None:
        if reader.bit() and not (blk[k] & p1):
            blk[k] += p1 if blk[k] > 0 else m1

    k = ss
    if eobrun == 0:
        while k <= se:
            rs = _huff_decode(reader, ac_table)
            r, s = rs >> 4, rs & 0x0F
            val = 0
            if s:
                if s != 1:
                    raise ValueError("refinement magnitude must be 1")
                val = p1 if reader.bit() else m1
            elif r != 15:
                eobrun = 1 << r
                if r:
                    eobrun += reader.receive(r)
                break
            # advance past r zero-history coefficients, correcting the
            # nonzero-history ones passed along the way (ZRL: r=15 -> 16)
            while k <= se:
                if blk[k]:
                    correct(k)
                else:
                    r -= 1
                    if r < 0:
                        break
                k += 1
            if val and k <= se:
                blk[k] = val
            k += 1
    if eobrun > 0:
        while k <= se:
            if blk[k]:
                correct(k)
            k += 1
        eobrun -= 1
    return eobrun


def _reconstruct(frame, coefs, qt) -> np.ndarray:
    """Dequantise + IDCT every stored block (vectorised), upsample chroma,
    crop to frame dims, and convert to RGB."""
    h, w, comps = frame
    max_h = max(c[1] for c in comps)
    max_v = max(c[2] for c in comps)
    out = []
    for cid, ch, cv, tq in comps:
        c = coefs[cid].astype(np.float64)
        raster = np.zeros_like(c)
        raster[..., ZIGZAG] = c
        blocks = raster.reshape(c.shape[0], c.shape[1], 8, 8) * qt[tq]
        pix = np.einsum("ji,abjk,kl->abil", _DCT_M, blocks, _DCT_M) + 128.0
        p = pix.transpose(0, 2, 1, 3).reshape(c.shape[0] * 8, c.shape[1] * 8)
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
    blk = np.zeros(64, dtype=np.int32)
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


def _uniform_spec(symbols) -> tuple[list[int], list[int]]:
    """Huffman spec assigning every used symbol the same code length.

    Valid per T.81 (Kraft sum < 1 keeps the all-ones code reserved) and
    trivially canonical; compression is not the point — the progressive
    scans are fixture-scale and the DHT is regenerated per scan from the
    symbols actually emitted."""
    syms = sorted(set(symbols))
    n = len(syms)
    length = max(1, n.bit_length())  # 2^length >= n + 1
    bits = [0] * 16
    bits[length - 1] = n
    return bits, syms


#: libjpeg's default progressive scan script shape: DC first (Al=1), AC
#: first scans split into spectral bands, one AC refinement ladder per
#: component, DC refinement — every coefficient bit is transmitted, so a
#: progressive round-trip is pixel-identical to the baseline one.
def _scan_script(nc: int) -> list[tuple[tuple[int, ...], int, int, int, int]]:
    if nc == 1:
        return [
            ((0,), 0, 0, 0, 1),
            ((0,), 1, 5, 0, 2),
            ((0,), 6, 63, 0, 2),
            ((0,), 1, 63, 2, 1),
            ((0,), 0, 0, 1, 0),
            ((0,), 1, 63, 1, 0),
        ]
    return [
        ((0, 1, 2), 0, 0, 0, 1),
        ((0,), 1, 5, 0, 2),
        ((2,), 1, 63, 0, 1),
        ((1,), 1, 63, 0, 1),
        ((0,), 6, 63, 0, 2),
        ((0,), 1, 63, 2, 1),
        ((0, 1, 2), 0, 0, 1, 0),
        ((2,), 1, 63, 1, 0),
        ((1,), 1, 63, 1, 0),
        ((0,), 1, 63, 1, 0),
    ]


class _ACScanTokens:
    """Token stream for one progressive AC scan (first or refinement).

    Cross-block EOB runs accumulate (flushed as EOBn symbols with length
    extension bits, libjpeg G.1.2.2/G.1.2.3 ordering); refinement keeps
    the two correction-bit buffers that ordering requires — ``run_br``
    (bits owed to completed end-of-band blocks, emitted right after the
    EOBn symbol) and a per-block ``cur_br`` (bits owed since the block's
    last emitted symbol, emitted right after that symbol)."""

    def __init__(self, ss: int, se: int, al: int) -> None:
        self.ss, self.se, self.al = ss, se, al
        self.toks: list[tuple] = []
        self.eob_run = 0
        self.run_br: list[int] = []

    def _flush_eob(self) -> None:
        if not self.eob_run:
            return
        n = self.eob_run.bit_length() - 1
        self.toks.append(("s", n << 4))
        if n:
            self.toks.append(("b", self.eob_run - (1 << n), n))
        self.eob_run = 0
        for b in self.run_br:
            self.toks.append(("b", b, 1))
        self.run_br = []

    def block_first(self, blk) -> None:
        toks = self.toks
        r = 0
        for k in range(self.ss, self.se + 1):
            t = int(blk[k])
            mag = (t if t >= 0 else -t) >> self.al
            if mag == 0:
                r += 1
                continue
            self._flush_eob()
            while r > 15:
                toks.append(("s", 0xF0))
                r -= 16
            s = mag.bit_length()
            toks.append(("s", (r << 4) | s))
            toks.append(("b", mag if t > 0 else (1 << s) - 1 - mag, s))
            r = 0
        if r > 0:
            self.eob_run += 1
            if self.eob_run == 0x7FFF:
                self._flush_eob()

    def block_refine(self, blk) -> None:
        toks = self.toks
        vals = [int(blk[k]) for k in range(self.ss, self.se + 1)]
        mags = [(v if v >= 0 else -v) >> self.al for v in vals]
        eob_idx = -1
        for j, m in enumerate(mags):
            if m == 1:
                eob_idx = j
        r = 0
        cur_br: list[int] = []
        for j, m in enumerate(mags):
            if m == 0:
                r += 1
                continue
            # ZRLs not foldable into the EOB run; a correction coefficient
            # reached with r > 15 can only follow the last newly-nonzero
            # one, so the loop bound keeps r intact for the run fold
            while r > 15 and j <= eob_idx:
                self._flush_eob()
                toks.append(("s", 0xF0))
                r -= 16
                for b in cur_br:
                    toks.append(("b", b, 1))
                cur_br = []
            if m > 1:  # history-nonzero: owes one correction bit
                cur_br.append(m & 1)
                continue
            # newly nonzero (magnitude exactly 1 at this precision)
            self._flush_eob()
            toks.append(("s", (r << 4) | 1))
            toks.append(("b", 1 if vals[j] > 0 else 0, 1))
            for b in cur_br:
                toks.append(("b", b, 1))
            cur_br = []
            r = 0
        if r > 0 or cur_br:
            self.eob_run += 1
            self.run_br.extend(cur_br)
            if self.eob_run == 0x7FFF:
                self._flush_eob()

    def restart(self) -> None:
        """EOB runs may not cross a restart interval: flush, then mark."""
        self._flush_eob()
        self.toks.append(("r",))

    def finish(self) -> list[tuple]:
        self._flush_eob()
        return self.toks


def _tokens_dc_first(units, al: int, restart: int = 0) -> list[tuple]:
    """``units``: one list of (comp_index, zigzag_block) per MCU (or per
    block when non-interleaved). DC values are arithmetic-shifted by Al and
    difference-coded per component; an ``("r",)`` token (restart marker)
    resets the predictors every ``restart`` units."""
    toks: list[tuple] = []
    pred: dict[int, int] = {}
    for n, unit in enumerate(units):
        if restart and n and n % restart == 0:
            toks.append(("r",))
            pred = {}
        for ci, blk in unit:
            v = int(blk[0]) >> al
            diff = v - pred.get(ci, 0)
            pred[ci] = v
            s = _size_cat(diff)
            toks.append(("s", s))
            if s:
                toks.append(("b", diff if diff > 0 else diff + (1 << s) - 1, s))
    return toks


def _tokens_dc_refine(units, al: int, restart: int = 0) -> list[tuple]:
    """One raw magnitude bit per block — no Huffman coding in DC refines."""
    toks: list[tuple] = []
    for n, unit in enumerate(units):
        if restart and n and n % restart == 0:
            toks.append(("r",))
        for _, blk in unit:
            toks.append(("b", (int(blk[0]) >> al) & 1, 1))
    return toks


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
    img: np.ndarray,
    quality: int = 90,
    subsampling: str = "444",
    progressive: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """Encode HxWx3 RGB (or HxW grayscale) uint8 as JFIF.

    ``subsampling``: ``'444'`` (chroma at full resolution) or ``'420'``
    (chroma 2x2 box-averaged — the common camera/web layout, which also
    exercises the decoder's upsampling path).

    ``progressive=True`` writes an SOF2 stream with the libjpeg-shaped
    scan script (spectral-selection bands + successive-approximation
    refinement down to Al=0), so decoding it reproduces the baseline
    encode of the same image bit-for-bit — the round-trip pins the whole
    progressive entropy layer against the sequential one.

    ``restart_interval`` > 0 writes a DRI segment and RSTn markers every
    that many MCUs (camera/web streams use these for error resilience;
    here they exercise the decoder's resync path)."""
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
    sof = b"\xff\xc2" if progressive else b"\xff\xc0"
    out += sof + struct.pack(">HBHHB", 8 + 3 * nc, 8, h, w, nc)
    for ci, (_, _, (ch, cv), _, _) in enumerate(comps):
        out += bytes([ci + 1, (ch << 4) | cv, 0 if ci == 0 else 1])

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

    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)

    if progressive:
        out += _encode_progressive_scans(
            coefs, comps, h, w, mcus_x, mcus_y, restart_interval
        )
        out += b"\xff\xd9"  # EOI
        return bytes(out)

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

    writer = _BitWriter()
    pred = [0] * nc
    mcu_n = 0
    rst = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_n and mcu_n % restart_interval == 0:
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
                pred = [0] * nc
            mcu_n += 1
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


def _encode_progressive_scans(
    coefs, comps, h, w, mcus_x, mcus_y, restart: int = 0
) -> bytes:
    """Emit the full progressive scan sequence (per-scan DHT + SOS +
    entropy data) for the already-quantised coefficients. ``restart`` > 0
    inserts RSTn markers every that many MCUs (interleaved scans) or
    blocks (single-component scans)."""
    nc = len(comps)
    max_h = max(c[2][0] for c in comps)
    max_v = max(c[2][1] for c in comps)
    zz = [c.reshape(c.shape[0], c.shape[1], 64)[..., ZIGZAG] for c in coefs]

    def mcu_units(comp_idxs):
        for my in range(mcus_y):
            for mx in range(mcus_x):
                unit = []
                for ci in comp_idxs:
                    ch, cv = comps[ci][2]
                    for by in range(cv):
                        for bx in range(ch):
                            unit.append((ci, zz[ci][my * cv + by, mx * ch + bx]))
                yield unit

    def comp_units(ci):
        # non-interleaved scans walk the component's TRUE block grid,
        # which can be narrower than the MCU-padded coefficient store
        ch, cv = comps[ci][2]
        bh = -(-(-(-h * cv // max_v)) // 8)  # ceil(ceil(h*cv/max_v) / 8)
        bw = -(-(-(-w * ch // max_h)) // 8)
        for by in range(bh):
            for bx in range(bw):
                yield [(ci, zz[ci][by, bx])]

    out = bytearray()
    for comp_idxs, ss, se, ah, al in _scan_script(nc):
        if ss == 0:
            units = (
                mcu_units(comp_idxs)
                if len(comp_idxs) > 1
                else comp_units(comp_idxs[0])
            )
            if ah == 0:
                toks, tclass = _tokens_dc_first(units, al, restart), 0
            else:
                toks, tclass = _tokens_dc_refine(units, al, restart), None
        else:
            acc = _ACScanTokens(ss, se, al)
            for n, unit in enumerate(comp_units(comp_idxs[0])):
                if restart and n and n % restart == 0:
                    acc.restart()
                (acc.block_first if ah == 0 else acc.block_refine)(unit[0][1])
            toks, tclass = acc.finish(), 1
        codes: dict[int, tuple[int, int]] = {}
        syms = [t[1] for t in toks if t[0] == "s"]
        if tclass is not None and syms:
            bits, vals = _uniform_spec(syms)
            out += (
                b"\xff\xc4"
                + struct.pack(">HB", 19 + len(vals), tclass << 4)
                + bytes(bits)
                + bytes(vals)
            )
            codes = _canonical_codes(bits, vals)
        ns = len(comp_idxs)
        out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * ns, ns)
        for ci in comp_idxs:
            out += bytes([ci + 1, 0x00])
        out += bytes([ss, se, (ah << 4) | al])
        writer = _BitWriter()
        rst = 0
        for tok in toks:
            if tok[0] == "s":
                code, length = codes[tok[1]]
                writer.write(code, length)
            elif tok[0] == "b":
                writer.write(tok[1], tok[2])
            else:  # ("r",): byte-align, then the cycling restart marker
                writer.flush()
                writer.out += bytes([0xFF, 0xD0 + rst])
                rst = (rst + 1) % 8
        writer.flush()
        out += writer.out
    return bytes(out)
