"""Byte-level netCDF-3 classic-format round-trip (S11/S20/R5).

The reference's canonical L1 product is per-year netCDF
(nc_constructors.py:461-720) read back by nc_io.py:27-83. These tests pin
the stdlib codec: write real bytes, re-read them, and check the golden
header prefix so the on-disk format (not just the round-trip) is stable.
"""

import datetime as dt
import struct

import numpy as np
import pandas as pd
import pytest

from tern_ep_data_pipeline_spark.sources.netcdf3 import (
    Variable,
    read_netcdf3,
    write_netcdf3,
)
from tern_ep_data_pipeline_spark.sources.nc import (
    export_netcdf,
    import_netcdf,
    netcdf_attrs,
    scan_netcdf,
)


def test_fixed_dims_roundtrip(tmp_path):
    p = str(tmp_path / "fixed.nc")
    t = np.arange(48, dtype="f8") * 1800.0
    ta = np.linspace(-5, 40, 48).reshape(48, 1, 1)
    write_netcdf3(
        p,
        {"time": 48, "latitude": 1, "longitude": 1},
        {
            "time": Variable(("time",), t, {"units": "seconds since 1800-01-01 00:00:00.0"}),
            "latitude": Variable(("latitude",), np.array([-35.65]), {"units": "degrees_north"}),
            "longitude": Variable(("longitude",), np.array([148.15]), {}),
            "Ta": Variable(("time", "latitude", "longitude"), ta,
                           {"units": "degC", "valid_range": [-50.0, 60.0], "height": "2m"}),
        },
        {"title": "golden", "nc_nrecs": 48, "site": "Calperum"},
    )
    f = read_netcdf3(p)
    assert f.dims == {"time": 48, "latitude": 1, "longitude": 1}
    assert f.attrs["title"] == "golden"
    assert f.attrs["nc_nrecs"] == 48
    assert np.allclose(f.variables["Ta"].data, ta)
    assert f.variables["Ta"].attrs["units"] == "degC"
    assert list(f.variables["Ta"].attrs["valid_range"]) == [-50.0, 60.0]
    assert np.allclose(f.variables["time"].data, t)


def test_golden_header_bytes(tmp_path):
    """The first bytes are the spec'd magic + numrecs + NC_DIMENSION tag —
    any conforming tool parses this file."""
    p = str(tmp_path / "hdr.nc")
    write_netcdf3(p, {"d": 2}, {"v": Variable(("d",), np.array([1.0, 2.0]))})
    raw = open(p, "rb").read()
    assert raw[:4] == b"CDF\x01"
    assert struct.unpack(">i", raw[4:8]) == (0,)  # numrecs
    assert struct.unpack(">ii", raw[8:16]) == (0x0A, 1)  # NC_DIMENSION, 1 dim


def test_record_dim_and_types(tmp_path):
    p = str(tmp_path / "rec.nc")
    write_netcdf3(
        p,
        {"time": None, "x": 3},
        {
            "a": Variable(("time", "x"), np.arange(12, dtype="f4").reshape(4, 3)),
            "b": Variable(("time",), np.array([1, 2, 3, 4], dtype="i2")),
            "fixed": Variable(("x",), np.array([9, 8, 7], dtype="i1")),
        },
    )
    f = read_netcdf3(p)
    assert f.dims["time"] is None and f.dims["x"] == 3
    assert np.allclose(f.variables["a"].data, np.arange(12).reshape(4, 3))
    assert list(f.variables["b"].data) == [1, 2, 3, 4]
    assert list(f.variables["fixed"].data) == [9, 8, 7]


def test_single_record_var_no_padding(tmp_path):
    """Spec special case: one record var of a <4-byte type packs without
    inter-record padding."""
    p = str(tmp_path / "one.nc")
    write_netcdf3(p, {"t": None}, {"v": Variable(("t",), np.arange(5, dtype="i2"))})
    f = read_netcdf3(p)
    assert list(f.variables["v"].data) == [0, 1, 2, 3, 4]


def test_export_import_reference_cube(tmp_path):
    """export_netcdf writes the reference cube (QC flags, crs, time
    encoding); import_netcdf recovers the dataframe per nc_io.py:66-83."""
    p = str(tmp_path / "site_2023_L1.nc")
    idx = pd.date_range("2023-01-01 00:30", periods=96, freq="30min")
    pdf = pd.DataFrame(
        {
            "DATETIME": idx,
            "Ta": np.linspace(5, 25, 96),
            "RH": np.linspace(30, 90, 96),
        }
    )
    pdf.loc[10, "Ta"] = np.nan
    export_netcdf(
        pdf,
        p,
        global_attrs={"site_name": "Calperum", "time_step": 30},
        var_attrs={"Ta": {"units": "degC", "instrument": ""}},
        latitude=-34.0,
        longitude=140.6,
    )

    f = read_netcdf3(p)
    # cube shape + companions
    assert f.variables["Ta"].data.shape == (96, 1, 1)
    assert "Ta_QCFlag" in f.variables and "RH_QCFlag" in f.variables
    assert "crs" in f.variables
    assert f.variables["crs"].attrs["grid_mapping_name"] == "latitude_longitude"
    # QC flag = 1 exactly where null (nc_constructors.py:703-720)
    qc = f.variables["Ta_QCFlag"].data.reshape(96)
    assert qc[10] == 1 and qc.sum() == 1
    # empty-string attrs dropped (nc_constructors.py:671-675)
    assert "instrument" not in f.variables["Ta"].attrs
    # time encoding epoch
    assert "1800-01-01" in f.variables["time"].attrs["units"]
    secs = f.variables["time"].data[0]
    assert dt.datetime(1800, 1, 1) + dt.timedelta(seconds=float(secs)) == idx[0]

    back = import_netcdf(p)
    assert list(back.columns) == ["Ta", "RH"]  # crs + QCFlags dropped
    assert back.index.name == "DATETIME"
    assert back.index.equals(idx)
    assert np.allclose(back["RH"].to_numpy(), pdf["RH"].to_numpy())
    assert np.isnan(back["Ta"].iloc[10])

    gattrs, vattrs = netcdf_attrs(p)
    assert gattrs["site_name"] == "Calperum"
    assert gattrs["nc_nrecs"] == 96
    assert vattrs["Ta"]["units"] == "degC"


def test_scan_netcdf_multi_file_union(tmp_path, spark):
    """Two year files with differing columns union by name, nulls filled —
    the NCMerger concat semantics (nc_constructors.py:796-825)."""
    p1, p2 = str(tmp_path / "y1.nc"), str(tmp_path / "y2.nc")
    idx1 = pd.date_range("2022-01-01 00:30", periods=4, freq="30min")
    idx2 = pd.date_range("2023-01-01 00:30", periods=4, freq="30min")
    export_netcdf(pd.DataFrame({"DATETIME": idx1, "Ta": [1.0, 2.0, 3.0, 4.0]}), p1)
    export_netcdf(
        pd.DataFrame({"DATETIME": idx2, "Ta": [5.0, 6.0, 7.0, 8.0], "RH": [50.0] * 4}), p2
    )
    df = scan_netcdf(spark, [p1, p2])
    rows = df.orderBy("DATETIME").collect()
    assert len(rows) == 8
    assert rows[0]["Ta"] == 1.0 and rows[0]["RH"] is None
    assert rows[7]["RH"] == 50.0


def test_int64_narrows_or_widens(tmp_path):
    p = str(tmp_path / "i64.nc")
    write_netcdf3(
        p,
        {"d": 3},
        {
            "small": Variable(("d",), np.array([0, 1, 2], dtype="i8")),
            "big": Variable(("d",), np.array([2**40, 0, -(2**40)], dtype="i8")),
        },
    )
    f = read_netcdf3(p)
    assert f.variables["small"].data.dtype.itemsize == 4
    assert np.allclose(f.variables["big"].data, [2**40, 0, -(2**40)])


def test_two_unlimited_dims_rejected(tmp_path):
    with pytest.raises(ValueError, match="UNLIMITED"):
        write_netcdf3(str(tmp_path / "x.nc"), {"a": None, "b": None}, {})
