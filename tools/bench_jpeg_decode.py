"""Micro-bench: table-driven vs legacy bit-serial JPEG entropy decode.

VERDICT r9 #2 evidence: the round-10 decoder pre-scans the entropy
stream with numpy and resolves each Huffman symbol with one
16-bit-window LUT probe (``jpeg._decode_lut`` / ``_BitReader.huff``).
This bench re-instantiates the LEGACY per-bit accumulate/dict-probe
entropy layer (the exact round-9 implementation, inlined below) by
monkeypatching the three seams the decode path flows through, and
times both on identical payloads — baseline 4:4:4, baseline 4:2:0
with restart markers, and progressive. It also asserts the two
decoders produce BYTE-IDENTICAL pixels, so the speedup claim and the
correctness claim ride the same run.

Run:  python tools/bench_jpeg_decode.py
Emits one JSON line: {"speedup": ..., "new_mpx_s": ..., "legacy_mpx_s": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from tern_ep_data_pipeline_spark.operators import jpeg  # noqa: E402


# ------------------------------------------------- legacy entropy layer
# The round-9 bit-serial reader, verbatim semantics: per-bit fill from
# the stuffed stream, (length, code) dict probes per bit.

class _LegacyBitReader:
    def __init__(self, data: bytes, start: int) -> None:
        self.data = data
        self.pos = start
        self._acc = 0
        self._n = 0
        self.end_pos = None  # computed lazily for progressive returns

    def _fill(self) -> None:
        b = self.data[self.pos]
        if b == 0xFF:
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise jpeg._RestartPending()
            else:
                self._acc = self._acc << 8
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


def _legacy_decode_table(bits, vals):
    out = {}
    code, idx = 0, 0
    for length in range(1, 17):
        for _ in range(bits[length - 1]):
            out[(length, code)] = vals[idx]
            code += 1
            idx += 1
        code <<= 1
    return out


def _legacy_huff_decode(reader, table):
    code, length = 0, 0
    while length < 17:
        code = (code << 1) | reader.bit()
        length += 1
        sym = table.get((length, code))
        if sym is not None:
            return sym
    raise ValueError("invalid huffman code in entropy stream")


def _legacy_end_scan(data: bytes, pos: int) -> int:
    while pos + 1 < len(data):
        if data[pos] == 0xFF and data[pos + 1] != 0x00 and not (
            0xD0 <= data[pos + 1] <= 0xD7
        ):
            break
        pos += 1
    return pos


class _patched_legacy:
    """Context manager swapping the entropy layer back to round-9's."""

    def __enter__(self):
        self._saved = (jpeg._BitReader, jpeg._decode_lut, jpeg._huff_decode)
        # progressive decode returns reader.end_pos; give the legacy
        # reader an equivalent computed the r9 way (forward marker scan)
        outer = self

        class Reader(_LegacyBitReader):
            @property
            def end_pos(self):  # type: ignore[override]
                return _legacy_end_scan(self.data, self.pos)

            @end_pos.setter
            def end_pos(self, v):  # __init__ assigns None; ignore
                pass

        jpeg._BitReader = Reader
        jpeg._decode_lut = _legacy_decode_table
        jpeg._huff_decode = _legacy_huff_decode
        return self

    def __exit__(self, *exc):
        jpeg._BitReader, jpeg._decode_lut, jpeg._huff_decode = self._saved
        return False


def _payloads() -> list[tuple[str, bytes, int]]:
    rng = np.random.default_rng(7)
    # photographic-ish content: smooth gradients + texture noise, so the
    # entropy stream carries realistic AC symbol density
    h, w = 512, 512
    yy, xx = np.mgrid[0:h, 0:w]
    base = (
        128
        + 80 * np.sin(xx / 37.0)
        + 60 * np.cos(yy / 23.0)
        + rng.normal(0, 18, (h, w))
    )
    img = np.clip(
        np.stack([base, base * 0.8 + 20, 255 - base * 0.6], axis=-1), 0, 255
    ).astype(np.uint8)
    return [
        ("baseline_444", jpeg.encode_jpeg(img, quality=85), h * w),
        (
            "baseline_420_rst",
            jpeg.encode_jpeg(img, quality=85, subsampling="420", restart_interval=8),
            h * w,
        ),
        ("progressive", jpeg.encode_jpeg(img, quality=85, progressive=True), h * w),
    ]


def _time_decode(payloads, reps: int) -> tuple[float, int]:
    t0 = time.perf_counter()
    px = 0
    for _ in range(reps):
        for _, enc, pixels in payloads:
            jpeg.decode_jpeg(enc)
            px += pixels
    return time.perf_counter() - t0, px


def main() -> None:
    payloads = _payloads()
    # pixel equality first: both entropy layers must reconstruct the
    # exact same images
    new_pix = [jpeg.decode_jpeg(enc) for _, enc, _ in payloads]
    with _patched_legacy():
        legacy_pix = [jpeg.decode_jpeg(enc) for _, enc, _ in payloads]
    for (name, _, _), a, b in zip(payloads, new_pix, legacy_pix):
        assert np.array_equal(a, b), f"pixel mismatch on {name}"

    _time_decode(payloads, 1)  # warm
    new_s, new_px = _time_decode(payloads, 3)
    with _patched_legacy():
        legacy_s, legacy_px = _time_decode(payloads, 1)
    new_rate = new_px / new_s / 1e6
    legacy_rate = legacy_px / legacy_s / 1e6
    print(
        json.dumps(
            {
                "metric": "jpeg_entropy_decode",
                "speedup": round(new_rate / legacy_rate, 2),
                "new_mpx_s": round(new_rate, 3),
                "legacy_mpx_s": round(legacy_rate, 3),
                "payloads": [p[0] for p in payloads],
                "pixels_identical": True,
            }
        )
    )


if __name__ == "__main__":
    main()
