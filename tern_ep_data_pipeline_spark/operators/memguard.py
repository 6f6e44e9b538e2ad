"""Executor-memory pressure detection shared by the derating operators.

SPILL_r05 measured the curation suite dying at a 2 GiB heap (~1.0 GiB
unified memory) on two distinct fronts while 3 GiB completed:

- 32 threads: raw Java heap OOM materialising the connected-components
  lineage checkpoint;
- 8 threads: ``UNABLE_TO_ACQUIRE_MEMORY ... got 0`` — the execution pool
  starved because the persisted LSH staged frames pin the protected
  storage region while concurrent tasks contend for the rest.

Below the threshold, operators that keep resident state derate to
disk-backed forms (reliable checkpoints in ``graph.connected_components``,
``DISK_ONLY`` persists in ``dedup._stage``): slower, but the unified pool
stays free for execution and the run completes instead of dying. The
production fix remains the sizing invariant (SCALING.md: ~100 MB/core at
sf10 density); the derate is the graceful floor under it.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

#: Unified-pool size under which resident state must leave memory.
#: Calibrated to the SPILL_r05 grid: 2 GiB heap (~1.0 GiB unified) died on
#: both fronts, 3 GiB (~1.6 GiB) completed — the threshold sits above both
#: failing cells and below nothing that passed un-derated matters for.
TIGHT_UNIFIED_BYTES = 2 << 30
_JVM_RESERVED = 300 << 20  # Spark's RESERVED_SYSTEM_MEMORY_BYTES


def tight_memory(spark: SparkSession) -> bool:
    """True when the unified pool is too small to keep checkpoint/persist
    blocks resident. Only decidable in local mode, where the driver IS the
    executor; on a cluster the storage pressure is spread over executors
    and the standard sizing invariant applies instead."""
    master = spark.sparkContext.master or ""
    if not master.startswith("local"):
        return False
    try:
        heap = int(spark.sparkContext._jvm.java.lang.Runtime.getRuntime().maxMemory())
        fraction = float(spark.conf.get("spark.memory.fraction", "0.6"))
    except Exception:
        return False
    return max(0, heap - _JVM_RESERVED) * fraction < TIGHT_UNIFIED_BYTES
