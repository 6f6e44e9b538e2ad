"""The flagship L1 constructor: multi-file merge -> harmonise -> lake.

Parity target: the reference's ``construct_L1_nc`` end-to-end lifecycle
(SURVEY.md §3.1; nc_constructors.py L1DataConstructor + file_handler
merge_data :534-606):

1. catalog build = analysis (catalog.variables — plan-time validation),
2. per-file scan + conditioning (select/rename via the catalog translation,
   dedupe, grid regularisation),
3. N-way full outer time join (J1),
4. transform pipe: unit conversions (catalog worklist), variance->stdev
   with rename, range masking, QC flags,
5. sink: partitioned parquet lake (+ gated netCDF export).

Everything from step 2 on is ONE lazy Catalyst plan — the per-file
conditioning projections fuse into the scans, the merge is a chain of
sort-merge joins on DATETIME, and the masking/conversion/flag step is a
single fused projection.
"""

from __future__ import annotations

from collections.abc import Mapping, Sequence
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..catalog.variables import plausible_bounds, units_nonconforming
from ..functions.conversions import CONVERSION_REGISTRY, convert_variance_to_stdev
from ..operators import conditioning, masking, merge, regularise


@dataclass
class FileSpec:
    """One raw input: path(s) + site-name -> std-name column translation."""

    paths: list[str]
    translation: Mapping[str, str]  # {site_name: std_name}
    file_type: str | None = None


def condition_file(
    spark: SparkSession,
    spec: FileSpec,
    interval: str,
    ts_col: str = "DATETIME",
) -> DataFrame:
    """Step 2: scan one raw file set and condition it to the site grid
    (file_handler.get_conditioned_data :49-124)."""
    from ..sources.toa5 import read_delimited

    df = read_delimited(spark, spec.paths, usecols=dict(spec.translation))
    # exact-dup rows collapse inside the keep-first window (ordering on the
    # value columns keeps the pick deterministic) — one shuffle, not two
    df = conditioning.keep_first_per_timestamp(
        df, [ts_col], [F.col(c) for c in df.columns if c != ts_col]
    )
    return regularise.regularise_to_grid(df, ts_col, interval)


def construct_l1(
    spark: SparkSession,
    specs: Sequence[FileSpec],
    catalog: Mapping[str, Mapping],
    interval: str = "30 minutes",
    ts_col: str = "DATETIME",
) -> DataFrame:
    """Steps 2-4: conditioned per-file frames -> time merge -> harmonise."""
    frames = [condition_file(spark, spec, interval, ts_col) for spec in specs]
    merged = merge.merge_on_time(frames, ts_col)

    # unit conversions for non-conforming variables (step 5 of §3.1)
    worklist = units_nonconforming(catalog)
    converted = merged
    for std_name, (site_units, _std_units) in worklist.items():
        if std_name not in converted.columns:
            continue
        quantity = catalog[std_name].get("quantity", "").split("_")[0]
        builder = CONVERSION_REGISTRY.get(quantity)
        if builder is None:
            continue
        converted = converted.withColumn(std_name, builder(F.col(std_name)))

    # variance -> standard deviation with column rename (_Vr -> _Sd)
    for std_name in list(converted.columns):
        if catalog.get(std_name, {}).get("process") == "Vr":
            converted = converted.withColumn(
                std_name, convert_variance_to_stdev(F.col(std_name))
            ).withColumnRenamed(std_name, std_name[: -len("_Vr")] + "_Sd")

    # range masking from catalog plausible bounds, then QC flags
    bounds = {
        n: b for n, b in plausible_bounds(catalog).items() if n in converted.columns
    }
    masked = masking.apply_plausible_ranges(converted, bounds)
    value_cols = [c for c in masked.columns if c != ts_col]
    return masking.with_qc_flags(masked, value_cols)


def derive_missing(
    df: DataFrame,
    targets: Sequence[str],
    catalog: Mapping[str, Mapping] | None = None,
) -> DataFrame:
    """Auto-derive missing variables from available ones via the calc
    registry's signature introspection (the reference's humidity padding —
    nc_constructors.py:244-311, get_function dispatcher
    convert_calc_filter.py:364-384).

    For each target quantity (e.g. ``AH``) the registered function's
    parameter names (Ta, RH, ps, ...) are bound to columns whose catalog
    quantity (or name prefix) matches; targets whose inputs are absent are
    skipped silently, matching the reference's best-effort padding.
    """
    from ..functions.met import get_function

    def column_for(param: str) -> str | None:
        if catalog:
            for name, rec in catalog.items():
                if rec.get("quantity", "").split("_")[0] == param and name in df.columns:
                    return name
        for c in df.columns:
            if c == param or c.split("_")[0] == param:
                return c
        return None

    out = df
    for target in targets:
        if column_for(target):
            continue  # already present
        try:
            fn, params = get_function(target)
        except KeyError:
            continue
        bindings = {p: column_for(p) for p in params}
        if any(v is None for v in bindings.values()):
            continue
        out = out.withColumn(target, fn(*[F.col(bindings[p]) for p in params]))
    return out


def year_slice(df: DataFrame, year: int, interval_minutes: int, ts_col: str = "DATETIME") -> DataFrame:
    """P5: the reference's end-of-interval year convention — a year runs
    (Jan1 + step, nextJan1] (nc_constructors.py:498-518)."""
    start = F.expr(
        f"timestampadd(MINUTE, {interval_minutes}, TIMESTAMP_NTZ '{year}-01-01 00:00:00')"
    )
    end = F.expr(f"TIMESTAMP_NTZ '{year + 1}-01-01 00:00:00'")
    return df.filter((F.col(ts_col) >= start) & (F.col(ts_col) <= end))
