"""Versioned, object-store-capable frozen-model artifacts (r13 verdict
#3/#4).

The frozen-model artifacts (the streaming DSIR ratio table and the
quality-model weights) refresh on a cadence while live streams read
them. On a local filesystem a directory rename is atomic, so the
tmp-swap in ``write_dsir_ratio_artifact`` works; object stores have no
rename — at 100 TB, where the model lives on object storage, the
publication must be pointer-based:

  {base}/v=N/...      complete version payloads, IMMUTABLE once live
  {base}/_CURRENT     one small object naming the live version

A refresh writes ``v=N+1`` fully, then replaces ``_CURRENT`` — a
single-key write (tmp + rename on POSIX; one PUT on S3/GCS/ABFS, all
strongly consistent for single-object replace). Readers resolve
``_CURRENT`` once at stream construction and keep reading their
resolved ``v=K`` dir: an in-flight reader can never see a torn model
because version payloads are never mutated, and pruning retains the
previous ``keep`` versions so an old reader finishes on its old
version (the metastore compactors' reader-grace rule).

All IO goes through the Hadoop FileSystem of the path's scheme, so one
code path serves plain local paths, ``file://`` URIs and object-store
URIs alike. Concurrent PUBLISHERS are serialised by the local
lock-file lease where one exists (``dedup_index.index_lease`` — no-op
on ``://`` paths, where refresh cadence is a single scheduled task per
artifact by construction, the same stance the bucketed-table layout
takes on writer exclusion).
"""

from __future__ import annotations

import os

__all__ = [
    "current_artifact_version",
    "current_artifact_dir",
    "publish_artifact_version",
    "read_small_file",
]

_POINTER = "_CURRENT"


def _fs(spark, path: str):
    jvm = spark.sparkContext._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(
        spark.sparkContext._jsc.hadoopConfiguration()
    ), jvm


def _exists(spark, path: str) -> bool:
    fs, jvm = _fs(spark, path)
    return bool(fs.exists(jvm.org.apache.hadoop.fs.Path(path)))


def read_small_file(spark, path: str) -> bytes:
    """Whole contents of one small file through the path's Hadoop
    filesystem (pointer files, meta.json — never data)."""
    fs, jvm = _fs(spark, path)
    stream = fs.open(jvm.org.apache.hadoop.fs.Path(path))
    try:
        out = jvm.java.io.ByteArrayOutputStream()
        jvm.org.apache.hadoop.io.IOUtils.copyBytes(stream, out, 65536, False)
        return bytes(out.toByteArray())
    finally:
        stream.close()


def _write_small_file(spark, path: str, data: bytes) -> None:
    """Atomic single-file replace. Local schemes: write a sibling tmp
    and rename over (POSIX atomic). Object stores: one create(...,
    overwrite=True) — a single PUT, atomic per key on S3/GCS/ABFS
    (local create+overwrite would truncate-then-write, which is why
    the branch exists)."""
    fs, jvm = _fs(spark, path)
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    scheme = jpath.toUri().getScheme()
    if scheme in (None, "file"):
        local = jpath.toUri().getPath() or path
        tmp = local + ".tmp"
        os.makedirs(os.path.dirname(os.path.abspath(local)), exist_ok=True)
        with open(tmp, "wb") as fh:
            fh.write(data)
        os.replace(tmp, local)
        return
    stream = fs.create(jpath, True)
    try:
        stream.write(bytearray(data))
    finally:
        stream.close()


def current_artifact_version(spark, base: str) -> int | None:
    """The live version number, or None when the artifact has never
    been published (no ``_CURRENT`` pointer under ``base``)."""
    ptr = base.rstrip("/") + "/" + _POINTER
    if not _exists(spark, ptr):
        return None
    return int(read_small_file(spark, ptr).decode().strip())


def current_artifact_dir(spark, base: str) -> str:
    """The live version's payload directory; raises when unpublished."""
    v = current_artifact_version(spark, base)
    if v is None:
        raise FileNotFoundError(
            f"no published version under {base!r} (missing {_POINTER})"
        )
    return f"{base.rstrip('/')}/v={v}"


def publish_artifact_version(spark, base: str, writer, keep: int = 2) -> int:
    """Publish one new artifact version: ``writer(version_dir)`` fills a
    fresh ``v=N+1`` payload (any leftovers of a crashed previous attempt
    at that number are deleted first), the ``_CURRENT`` pointer flips in
    one single-file replace, and versions older than the newest ``keep``
    are pruned. Returns the published version number."""
    from ..operators.dedup_index import index_lease

    if keep < 1:
        raise ValueError("keep must be >= 1 (the live version)")
    base = base.rstrip("/")
    # the lease keys on a LOCAL path: a file:// URI must not slip
    # through index_lease's "://" no-op (two local publishers would
    # race to the same version number); true object-store schemes
    # still no-op — there, refresh cadence is one scheduled task per
    # artifact by construction (the bucketed-table layout's stance)
    fs, jvm = _fs(spark, base)
    juri = jvm.org.apache.hadoop.fs.Path(base).toUri()
    scheme = juri.getScheme()
    lease_key = (
        (juri.getPath() or base) if scheme in (None, "file") else base
    ) + "/" + _POINTER
    with index_lease(lease_key, "publish"):
        cur = current_artifact_version(spark, base)
        nxt = (cur or 0) + 1
        vdir = f"{base}/v={nxt}"
        fs, jvm = _fs(spark, base)
        jv = jvm.org.apache.hadoop.fs.Path(vdir)
        if fs.exists(jv):  # crashed attempt: never published, safe to drop
            fs.delete(jv, True)
        writer(vdir)
        _write_small_file(spark, base + "/" + _POINTER, str(nxt).encode())
        floor = nxt - keep + 1
        v = floor - 1
        while v >= 1:
            jold = jvm.org.apache.hadoop.fs.Path(f"{base}/v={v}")
            if not fs.exists(jold):
                break
            fs.delete(jold, True)
            v -= 1
        return nxt
