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
#: both fronts, 3 GiB heap (~1.66 GiB unified = (3072-300 MiB)*0.6)
#: completed UN-derated — so the threshold must sit strictly between the
#: two, not above the passing cell (r6's 2 GiB value silently derated the
#: measured-passing 3 GiB config and every default 1g driver session —
#: ADVICE r6 #1). 1.25 GiB keeps the failing cell derated with margin and
#: leaves every measured-passing size at full speed.
TIGHT_UNIFIED_BYTES = (1 << 30) + (1 << 28)  # 1.25 GiB
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
