"""The 10 Hz fast-data pipeline: TOB3 -> conditioned blocks -> TOA5 files.

Parity target: ``parse_main_fast_data`` end-to-end (SURVEY.md §3.3;
fast_file_converters.parse_TOB3_daily + DailyTOB3FileConverter):
binary decode -> lossless downcast / float rounding -> dedupe+sort ->
30-min block split -> one TOA5 file per block.

This is the pipeline the Spark rebuild exists for: every step is
distributed (decode per file, conditioning per partition, one write task
per block), so throughput scales with executors x files.
"""

from __future__ import annotations

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from ..operators import conditioning, downcast
from ..sources.tob import read_tob, read_tob_meta
from ..sources.toa5 import FileHeader
from ..sources.toa5_blocks import write_toa5_blocks


def run_fast_path(
    spark: SparkSession,
    tob_glob: str,
    out_dir: str,
    sample_path: str | None = None,
    minutes: int = 30,
    sig_digits: int = 7,
) -> int:
    """Decode + condition + block-write; returns the record count."""
    df = read_tob(spark, tob_glob, sample_path=sample_path)
    # dedupe: exact duplicate records collapse inside the keep-first window
    df = conditioning.keep_first_per_timestamp(
        df, ["TIMESTAMP"], [F.col("RECORD")]
    )
    # Persist BEFORE the downcast probe: the probe is the first action, so it
    # materialises the cache and the Python binary decode runs exactly once —
    # the count and the block write then read the cached conditioned frame.
    # MEMORY_AND_DISK: at scale the decoded frame spills to executor-local
    # disk, still far cheaper than a second mapInPandas decode pass.
    df = df.persist()
    # storage-width policy (fast_file_io.py:228-243): int when lossless,
    # float32 + significant-digit rounding otherwise
    stored = downcast.downcast_for_storage(df, exclude=["RECORD"], sig_digits=sig_digits)

    meta = read_tob_meta(sample_path) if sample_path else None
    if meta is None:
        # probe the first matched file for header metadata
        first = spark.read.format("binaryFile").load(tob_glob).select("content").limit(1).collect()
        meta = read_tob_meta(bytes(first[0][0]))
    header = FileHeader(
        file_type="TOA5",
        variables=["TIMESTAMP", "RECORD", *meta.field_names],
        units=dict(zip(meta.field_names, meta.units)),
        sampling=dict(zip(meta.field_names, meta.processing)),
        info=dict(
            zip(
                ("format", "station_name", "logger_type", "serial_num",
                 "OS_version", "program_name", "program_sig", "table_name"),
                ["TOA5"] + meta.info[1:],
            )
        ),
    )
    n = df.count()
    write_toa5_blocks(stored, out_dir, header, minutes=minutes)
    df.unpersist()
    return n
