"""L1 product store: partitioned Parquet lake (canonical) + netCDF shim.

Parity targets:
- NetCDF L1 sink/scan (reference nc_constructors.py:461-554, nc_io.py:27-83):
  the reference's canonical product is per-year netCDF with CF attrs, QC
  flag companions, and a crs variable. Here the canonical store is a
  Parquet lake partitioned by (site, year) — real partition pruning at
  100 TB — with netCDF import/export as a driver-side xarray shim, gated
  because the container ships no xarray/netCDF libraries.
- Multi-file scan + attr merge (nc_constructors.py:796-825): a multi-path
  parquet read unions by name for free.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

try:  # pragma: no cover - not installed in this container
    import xarray  # noqa: F401

    HAS_XARRAY = True
except ImportError:
    HAS_XARRAY = False


def write_l1_lake(
    df: DataFrame,
    path: str,
    site: str,
    ts_col: str = "DATETIME",
    mode: str = "overwrite",
) -> None:
    """Write the merged L1 wide table partitioned by (site, year).

    Year follows the reference's end-of-interval label convention: the year
    bucket of a record is year(ts - 1 interval)... handled upstream by the
    year-slice predicate; here the physical partition is plain year(ts) so
    partition pruning matches query predicates.
    """
    (
        df.withColumn("site", F.lit(site))
        .withColumn("year", F.year(ts_col))
        .repartition("site", "year")
        .write.mode(mode)
        .partitionBy("site", "year")
        .parquet(path)
    )


def read_l1_lake(spark: SparkSession, path: str, site: str | None = None, year: int | None = None) -> DataFrame:
    """Scan the lake; site/year predicates prune partitions at plan time."""
    df = spark.read.parquet(path)
    if site is not None:
        df = df.filter(F.col("site") == site)
    if year is not None:
        df = df.filter(F.col("year") == year)
    return df


def export_netcdf(
    pdf,
    path: str,
    global_attrs: Mapping[str, str] | None = None,
    var_attrs: Mapping[str, Mapping[str, str]] | None = None,
    latitude: float = 0.0,
    longitude: float = 0.0,
    ts_col: str = "DATETIME",
) -> None:
    """Driver-side netCDF export of a collected year slice.

    Mirrors the reference cube shape — (time, latitude, longitude) with
    singleton lat/lon dims, per-variable attrs, 'seconds since 1800-01-01'
    time encoding (nc_constructors.py:521-643). Requires xarray+netCDF4.
    """
    if not HAS_XARRAY:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "netCDF export requires xarray + netCDF4 (not installed); "
            "the canonical store is the parquet lake (write_l1_lake)"
        )
    import xarray as xr  # pragma: no cover

    pdf = pdf.set_index(ts_col)  # pragma: no cover
    ds = xr.Dataset.from_dataframe(pdf)  # pragma: no cover
    ds = ds.expand_dims({"latitude": [latitude], "longitude": [longitude]})  # pragma: no cover
    ds.attrs.update(global_attrs or {})  # pragma: no cover
    for name, attrs in (var_attrs or {}).items():  # pragma: no cover
        if name in ds:
            ds[name].attrs.update(attrs)
    ds.to_netcdf(  # pragma: no cover
        path, encoding={ts_col: {"units": "seconds since 1800-01-01 00:00:00"}}
    )
