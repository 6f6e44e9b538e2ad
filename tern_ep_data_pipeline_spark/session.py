"""SparkSession construction tuned for the pipeline workload.

Single place where engine-level performance knobs live, so local tests and the
cluster deployment share one config story. Defaults are chosen for the
100 TB design point (AQE on, skew-join handling, Arrow for the few
pandas-interop edges) while remaining correct on ``local[*]``.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

#: SQL-conf defaults applied to every session we build. All of these are
#: runtime-settable (non-static) confs.
ENGINE_CONF: dict[str, str] = {
    # Adaptive execution: runtime re-planning, skew-join splitting, and
    # partition coalescing are the main levers at 100 TB.
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    # Arrow for the pandas-interop edges (toPandas, pandas UDFs).
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    # Per-call DataFrame debug-origin capture costs 2-3 extra py4j round
    # trips on EVERY Column/DataFrame API call (measured r15: doc_profile_b's
    # build alone makes 5399 py4j calls with it on, 2359 with it off).
    # Driver plan-build time is real wall time on every query (README
    # round-8 lesson); production turns the debug tracer off.
    "spark.python.sql.dataFrameDebugging.enabled": "false",
    # The driver testdata stores some timestamps as parquet TIMESTAMP(NANOS);
    # read them as long nanos and convert explicitly (sources.tables).
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # Naive local time everywhere (reference semantics) — session TZ fixed so
    # any tz-dependent function is deterministic across environments.
    "spark.sql.session.timeZone": "UTC",
}


def get_spark(
    app_name: str = "tern-ep-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with the engine defaults.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` locally; on a real
    cluster leave it unset and let spark-submit decide.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        cpus_env = os.environ.get("SPARK_GRAFT_CPUS")
        shuffle_partitions = int(cpus_env) if cpus_env else 32

    builder = SparkSession.builder.appName(app_name).master(master)
    builder = builder.config("spark.sql.shuffle.partitions", str(shuffle_partitions))
    builder = builder.config("spark.ui.enabled", "false")
    builder = builder.config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
    for k, v in ENGINE_CONF.items():
        builder = builder.config(k, v)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    return builder.getOrCreate()


def apply_engine_conf(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine confs to an externally-built session.

    Used when a host harness hands us its own SparkSession: every conf in
    ``ENGINE_CONF`` is runtime-settable, so this is safe on a live session.
    """
    for k, v in ENGINE_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:
            # A host session may mark some confs unmodifiable; the engine
            # degrades gracefully (loaders handle missing confs themselves).
            pass
    return spark
