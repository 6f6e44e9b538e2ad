"""Vectorised MD5 (RFC 1321) over batches of SHORT byte strings.

The package's portable hash idiom — the first 15 hex chars of
``md5(salt:key)`` read as a 60-bit int (``sampling.hash_bucket``, the
DuckDB-reproducible currency every oracle checks) — costs one Python
``hashlib.md5`` call per key when evaluated outside the JVM. That is
the r13 verdict's last row-at-a-time kernel in a streaming hot path
(the DSIR scorer's per-gram loop).

This module computes the SAME VALUES without per-key Python: messages
of <= 55 bytes fit a single 64-byte MD5 block, so the whole digest is
64 rounds of uint32 numpy arithmetic over an (n, 16) message-word
matrix — one vectorised pass for n keys. Longer messages (rare for
salted n-grams) fall back to ``hashlib`` element-wise, so the function
is total and byte-equal to ``hashlib.md5`` for every input; the pin
lives in tests/test_dsir.py (random strings straddling the 55-byte
boundary, plus the exact salted-gram corpus the scorer hashes).

Unlike the Rabin-Karp ``hash_mode='fast'`` family (a DIFFERENT hash
with pinned decision equality), this kernel is the portable hash — so
a model built with md5 buckets and a scorer running this kernel can
never disagree, which is exactly the contract the frozen DSIR ratio
artifact needs.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np

# per-round left-rotate amounts and sine-derived constants (RFC 1321)
_S = np.array(
    [7, 12, 17, 22] * 4 + [5, 9, 14, 20] * 4
    + [4, 11, 16, 23] * 4 + [6, 10, 15, 21] * 4,
    dtype=np.uint32,
)
_K = np.array(
    [int(abs(math.sin(i + 1)) * (1 << 32)) & 0xFFFFFFFF for i in range(64)],
    dtype=np.uint32,
)
_INIT = (0x67452301, 0xEFCDAB89, 0x98BADCFE, 0x10325476)

#: single-block capacity: 64-byte block minus 0x80 pad byte minus the
#: 8-byte bit-length trailer
MAX_FAST_LEN = 55


def _pack_blocks(msgs: list[bytes], lens: np.ndarray) -> np.ndarray:
    """(n, 16) little-endian uint32 message words for n padded single
    blocks — built by one scatter, no per-message Python."""
    n = len(msgs)
    flat = np.zeros(n * 64, dtype=np.uint8)
    total = int(lens.sum())
    if total:
        cat = np.frombuffer(b"".join(msgs), dtype=np.uint8)
        base = np.arange(n, dtype=np.int64) * 64  # block start per msg...
        np.cumsum(lens[:-1], out=base[1:])        # ...minus its cat offset
        base[1:] = np.arange(64, n * 64, 64, dtype=np.int64) - base[1:]
        target = np.repeat(base, lens)
        target += np.arange(total, dtype=np.int64)
        flat[target] = cat
    flat[np.arange(n, dtype=np.int64) * 64 + lens] = 0x80
    words = flat.view("<u4").reshape(n, 16)
    words[:, 14] = (lens * 8).astype(np.uint32)  # bit length, low word
    return words


def _digest_words(m: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """First two output words (A, B accumulators) of MD5 over one padded
    block per row — all the 60-bit prefix needs (digest bytes 0..7).
    The round loop reuses two scratch buffers with in-place ufuncs: the
    naive spelling allocates ~6 temporaries per round x 64 rounds,
    which made the kernel allocation-bound (slower than hashlib)."""
    mT = np.ascontiguousarray(m.T)  # (16, n): m[g] contiguous per round
    n = m.shape[0]
    a = np.full(n, _INIT[0], dtype=np.uint32)
    b = np.full(n, _INIT[1], dtype=np.uint32)
    c = np.full(n, _INIT[2], dtype=np.uint32)
    d = np.full(n, _INIT[3], dtype=np.uint32)
    f = np.empty(n, dtype=np.uint32)
    t = np.empty(n, dtype=np.uint32)
    for i in range(64):
        if i < 16:
            np.bitwise_and(b, c, out=f)       # f = (b & c) | (~b & d)
            np.bitwise_not(b, out=t)
            np.bitwise_and(t, d, out=t)
            np.bitwise_or(f, t, out=f)
            g = i
        elif i < 32:
            np.bitwise_and(d, b, out=f)       # f = (d & b) | (~d & c)
            np.bitwise_not(d, out=t)
            np.bitwise_and(t, c, out=t)
            np.bitwise_or(f, t, out=f)
            g = (5 * i + 1) & 15
        elif i < 48:
            np.bitwise_xor(b, c, out=f)       # f = b ^ c ^ d
            np.bitwise_xor(f, d, out=f)
            g = (3 * i + 5) & 15
        else:
            np.bitwise_not(d, out=f)          # f = c ^ (b | ~d)
            np.bitwise_or(b, f, out=f)
            np.bitwise_xor(c, f, out=f)
            g = (7 * i) & 15
        np.add(f, a, out=f)                   # x = a + f + K[i] + m[g]
        np.add(f, _K[i], out=f)
        np.add(f, mT[g], out=f)
        s = int(_S[i])
        np.left_shift(f, np.uint32(s), out=t)   # rotl(x, s)
        np.right_shift(f, np.uint32(32 - s), out=f)
        np.bitwise_or(t, f, out=f)
        a, d, c, b = d, c, b, a               # rotate registers
        np.add(c, f, out=b)                   # b(new) = c(=old b) + rotl
    return a + np.uint32(_INIT[0]), b + np.uint32(_INIT[1])


def md5_hex60(msgs: list[bytes]) -> np.ndarray:
    """int64 array: ``int(md5(m).hexdigest()[:15], 16)`` per message —
    the package's portable 60-bit hash, vectorised. Messages longer
    than ``MAX_FAST_LEN`` bytes route through hashlib element-wise
    (identical values, just not batched)."""
    n = len(msgs)
    out = np.empty(n, dtype=np.int64)
    if n == 0:
        return out
    lens = np.fromiter((len(m) for m in msgs), dtype=np.int64, count=n)
    fast = lens <= MAX_FAST_LEN
    if fast.any():
        idx = np.nonzero(fast)[0]
        sub = [msgs[i] for i in idx] if not fast.all() else msgs
        a, b = _digest_words(_pack_blocks(sub, lens[idx]))
        a64 = a.astype(np.uint64)
        b64 = b.astype(np.uint64)
        # hexdigest[:15] = digest bytes 0..6 + high nibble of byte 7;
        # bytes are the LITTLE-endian serialisation of words A then B
        val = (
            ((a64 & np.uint64(0xFF)) << np.uint64(52))
            | (((a64 >> np.uint64(8)) & np.uint64(0xFF)) << np.uint64(44))
            | (((a64 >> np.uint64(16)) & np.uint64(0xFF)) << np.uint64(36))
            | (((a64 >> np.uint64(24)) & np.uint64(0xFF)) << np.uint64(28))
            | ((b64 & np.uint64(0xFF)) << np.uint64(20))
            | (((b64 >> np.uint64(8)) & np.uint64(0xFF)) << np.uint64(12))
            | (((b64 >> np.uint64(16)) & np.uint64(0xFF)) << np.uint64(4))
            | ((b64 >> np.uint64(24)) >> np.uint64(4))
        )
        out[idx] = val.astype(np.int64)
    if not fast.all():
        for i in np.nonzero(~fast)[0]:
            out[i] = int(hashlib.md5(msgs[i]).hexdigest()[:15], 16)
    return out
