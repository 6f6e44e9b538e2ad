"""Checksummed file movement (SURVEY S26).

Parity target: the reference's guard before destructively archiving a
parsed TOB3 file — copy to the archive, compare sha256 of both copies,
and only then remove the source (ref
code/data_constructors/fast_file_converters.py:194-239). Driver-side by
design: these are per-file filesystem chores, not data-plane work.
"""

from __future__ import annotations

import hashlib
import os
import shutil


def sha256_file(path: str, chunk: int = 1 << 20) -> str:
    h = hashlib.sha256()
    with open(path, "rb") as fh:
        while block := fh.read(chunk):
            h.update(block)
    return h.hexdigest()


def checksummed_move(src: str, dest_dir: str, overwrite: bool = False) -> str:
    """Move ``src`` into ``dest_dir``, deleting the source only after the
    copy's sha256 matches. On mismatch the copy is removed and the source
    left untouched. Returns the destination path."""
    os.makedirs(dest_dir, exist_ok=True)
    dest = os.path.join(dest_dir, os.path.basename(src))
    if os.path.exists(dest) and not overwrite:
        raise FileExistsError(dest)
    want = sha256_file(src)
    shutil.copy2(src, dest)
    got = sha256_file(dest)
    if got != want:
        os.remove(dest)
        raise OSError(
            f"checksum mismatch moving {src} -> {dest}: {want[:12]} != {got[:12]}"
        )
    os.remove(src)
    return dest
