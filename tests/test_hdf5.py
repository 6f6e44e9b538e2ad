"""Tests for the stdlib HDF5 / netCDF-4 codec (``sources/hdf5.py``).

The reference writes its L1 product through xarray's netCDF4 engine
(reference ``code/data_constructors/nc_constructors.py:461-495``), i.e.
netCDF-4/HDF5. No HDF5 library ships in this container, so parity is
pinned the same way the netCDF-3 codec's is: write->read byte round-trips
over the format features libnetcdf's default layout uses (old-style
groups, contiguous + chunked layouts, deflate/shuffle filters, dimension
scales with DIMENSION_LIST global-heap references), plus structural
assertions on the raw bytes (signature, superblock EOF, sentinel names).
"""

from __future__ import annotations

import datetime as dt
import os
import struct

import numpy as np
import pandas as pd
import pytest

from tern_ep_data_pipeline_spark.sources.hdf5 import (
    _PHANTOM_SENTINEL,
    H5File,
    read_hdf5,
    sniff_hdf5,
    write_hdf5_nc4,
)
from tern_ep_data_pipeline_spark.sources.nc import (
    export_netcdf,
    import_netcdf,
    netcdf_attrs,
    scan_netcdf,
)
from tern_ep_data_pipeline_spark.sources.netcdf3 import Variable


def _cube(tmp_path, **kw) -> str:
    rng = np.random.default_rng(5)
    p = str(tmp_path / "t.nc")
    t = np.arange(50, dtype="<f8") * 1800.0
    write_hdf5_nc4(
        p,
        {"time": 50, "layer": 3},
        {
            "time": Variable(
                ("time",), t, {"units": "seconds since 1800-01-01"}
            ),
            "Ta": Variable(
                ("time",),
                rng.normal(20, 5, 50).astype("<f4"),
                {"units": "degC", "valid_range": [-40.0, 60.0]},
            ),
            "counts": Variable(
                ("time", "layer"),
                rng.integers(0, 1000, (50, 3)).astype("<i4"),
                {},
            ),
            "qc": Variable(
                ("time",), rng.integers(0, 2, 50).astype("<i1"), {}
            ),
        },
        {"site": "Calperum", "version": 3, "elevation": 250.5},
        **kw,
    )
    return p


def test_signature_and_superblock_eof(tmp_path):
    p = _cube(tmp_path)
    assert sniff_hdf5(p)
    with open(p, "rb") as fh:
        buf = fh.read()
    # superblock v0: EOF address at offset 40 must equal the file size
    assert struct.unpack_from("<Q", buf, 40)[0] == os.path.getsize(p)


def test_contiguous_roundtrip(tmp_path):
    p = _cube(tmp_path)
    f = read_hdf5(p)
    assert f.dims == {"time": 50, "layer": 3}
    assert f.attrs == {"site": "Calperum", "version": 3, "elevation": 250.5}
    assert f.variables["Ta"].dims == ("time",)
    assert f.variables["counts"].dims == ("time", "layer")
    assert f.variables["counts"].data.dtype == np.dtype("<i4")
    assert f.variables["qc"].data.dtype == np.dtype("<i1")
    assert f.variables["Ta"].attrs["units"] == "degC"
    assert np.array_equal(
        np.asarray(f.variables["Ta"].attrs["valid_range"]), [-40.0, 60.0]
    )
    # phantom dim scale (layer has no coordinate variable) is NOT a variable
    assert "layer" not in f.variables
    with open(p, "rb") as fh:
        assert _PHANTOM_SENTINEL.encode() in fh.read()


@pytest.mark.parametrize(
    "kw",
    [
        dict(chunks=16),
        dict(chunks=16, deflate=6),
        dict(chunks=16, deflate=6, shuffle=True),
        dict(chunks=7, deflate=1, shuffle=True),  # ragged edge chunks
    ],
)
def test_chunked_filtered_roundtrip(tmp_path, kw):
    p_plain = _cube(tmp_path)
    ref = read_hdf5(p_plain)
    os.remove(p_plain)
    p = _cube(tmp_path, **kw)
    f = read_hdf5(p)
    for name, var in ref.variables.items():
        assert np.array_equal(f.variables[name].data, var.data), name
        assert f.variables[name].dims == var.dims


def test_deflate_actually_compresses(tmp_path):
    plain = os.path.getsize(_cube(tmp_path))
    rng = np.random.default_rng(0)
    p = str(tmp_path / "c.nc")
    # highly compressible content so deflate must win despite overheads
    write_hdf5_nc4(
        p,
        {"time": 5000},
        {"v": Variable(("time",), np.zeros(5000, dtype="<f8"))},
        {},
        chunks=1024,
        deflate=6,
        shuffle=True,
    )
    raw = 5000 * 8
    assert os.path.getsize(p) < raw // 4
    f = read_hdf5(p)
    assert np.array_equal(f.variables["v"].data, np.zeros(5000))


def test_filters_require_chunks(tmp_path):
    with pytest.raises(ValueError, match="chunk"):
        write_hdf5_nc4(
            str(tmp_path / "x.nc"),
            {"t": 1},
            {"v": Variable(("t",), np.zeros(1))},
            {},
            deflate=1,
        )


def test_not_hdf5_rejected(tmp_path):
    p = str(tmp_path / "bad")
    with open(p, "wb") as fh:
        fh.write(b"CDF\x01" + b"\x00" * 64)
    assert not sniff_hdf5(p)
    with pytest.raises(ValueError, match="signature"):
        read_hdf5(p)


def test_export_import_reference_cube_netcdf4(tmp_path):
    """The full nc.py cube (QC flags, crs, 1800 epoch) through the NETCDF4
    format: export -> sniff -> import recovers the dataframe exactly as
    the classic-format path does (same assertions as the netCDF-3 twin)."""
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
        fmt="NETCDF4",
    )
    assert sniff_hdf5(p)

    f = read_hdf5(p)
    assert f.variables["Ta"].data.shape == (96, 1, 1)
    assert f.variables["Ta"].dims == ("time", "latitude", "longitude")
    assert "Ta_QCFlag" in f.variables and "crs" in f.variables
    assert f.variables["crs"].attrs["grid_mapping_name"] == "latitude_longitude"
    qc = f.variables["Ta_QCFlag"].data.reshape(96)
    assert qc[10] == 1 and qc.sum() == 1
    assert "instrument" not in f.variables["Ta"].attrs
    secs = f.variables["time"].data[0]
    assert dt.datetime(1800, 1, 1) + dt.timedelta(seconds=float(secs)) == idx[0]

    back = import_netcdf(p)
    # old-style HDF5 groups carry no link-creation order, so variables come
    # back name-sorted (what libnetcdf itself does for such files)
    assert sorted(back.columns) == ["RH", "Ta"]
    assert back.index.equals(idx)
    assert np.allclose(back["RH"].to_numpy(), pdf["RH"].to_numpy())
    assert np.isnan(back["Ta"].iloc[10])

    gattrs, vattrs = netcdf_attrs(p)
    assert gattrs["site_name"] == "Calperum"
    assert vattrs["Ta"]["units"] == "degC"


def test_scan_mixed_formats_union(tmp_path, spark):
    """One classic year file + one netCDF-4 year file scan into a single
    frame — the format dispatch is per-file via magic bytes."""
    p1, p2 = str(tmp_path / "y1.nc"), str(tmp_path / "y2.nc")
    idx1 = pd.date_range("2022-01-01 00:30", periods=4, freq="30min")
    idx2 = pd.date_range("2023-01-01 00:30", periods=4, freq="30min")
    export_netcdf(
        pd.DataFrame({"DATETIME": idx1, "Ta": [1.0, 2.0, 3.0, 4.0]}), p1
    )
    export_netcdf(
        pd.DataFrame({"DATETIME": idx2, "Ta": [5.0, 6.0, 7.0, 8.0]}),
        p2,
        fmt="NETCDF4",
    )
    assert not sniff_hdf5(p1) and sniff_hdf5(p2)
    rows = scan_netcdf(spark, [p1, p2]).orderBy("DATETIME").collect()
    assert len(rows) == 8
    assert rows[0]["Ta"] == 1.0 and rows[7]["Ta"] == 8.0


def test_v2_object_header_named_rejection(tmp_path):
    """Files written with HDF5 1.10 'latest' format (OHDR v2 headers) are
    out of scope and must fail with the structure NAMED, not garbage."""
    p = str(tmp_path / "v2")
    # superblock v2 pointing at a fake OHDR block at offset 48
    sb = b"\x89HDF\r\n\x1a\n" + bytes([2, 8, 8, 0])
    sb += struct.pack("<QQQQ", 0, 48, 96, 48)
    sb += struct.pack("<I", 0)
    with open(p, "wb") as fh:
        fh.write(sb.ljust(48, b"\x00") + b"OHDR" + b"\x00" * 44)
    with pytest.raises(NotImplementedError, match="OHDR|v2|latest"):
        read_hdf5(p)


def test_string_and_array_gattrs(tmp_path):
    p = str(tmp_path / "a.nc")
    write_hdf5_nc4(
        p,
        {"t": 2},
        {"v": Variable(("t",), np.array([1.5, 2.5]))},
        {
            "title": "L1 product",
            "levels": [1.0, 2.0, 4.0],
            "ids": np.array([7, 8, 9], dtype="<i4"),
            "empty_ok": "",
        },
    )
    f = read_hdf5(p)
    assert f.attrs["title"] == "L1 product"
    assert np.allclose(np.asarray(f.attrs["levels"]), [1.0, 2.0, 4.0])
    assert list(np.asarray(f.attrs["ids"])) == [7, 8, 9]


def test_reference_list_backrefs(tmp_path):
    """Every dimension scale carries REFERENCE_LIST back-references
    (compound {dataset objref, dimension int32} per consuming data
    variable, the H5DS convention) whose addresses agree exactly with the
    forward DIMENSION_LIST references — proving the re-render-and-patch
    second pass resolved them."""
    from tern_ep_data_pipeline_spark.sources.hdf5 import (
        _MSG_ATTRIBUTE,
        _MSG_SYMBOL_TABLE,
        _Reader,
    )

    p = _cube(tmp_path)
    with open(p, "rb") as fh:
        buf = fh.read()
    r = _Reader(buf)
    root = r.superblock()
    msgs = r.messages(root)
    st = next(d for t, d in msgs if t == _MSG_SYMBOL_TABLE)
    entries = r.group_entries(
        int.from_bytes(st[:8], "little"), int.from_bytes(st[8:16], "little")
    )
    attrs = {
        name: dict(
            r.decode_attr(d)
            for t, d in r.messages(addr)
            if t == _MSG_ATTRIBUTE
        )
        for name, addr in entries.items()
    }

    # forward references: data var -> [dim-scale header addresses]
    fwd = {
        name: [refs[0] for refs in a["DIMENSION_LIST"]]
        for name, a in attrs.items()
        if "DIMENSION_LIST" in a
    }
    assert set(fwd) == {"Ta", "counts", "qc"}
    # back-references on the scales, parsed through the compound decoder
    back = {
        name: {(e["dataset"], e["dimension"]) for e in a["REFERENCE_LIST"]}
        for name, a in attrs.items()
        if "REFERENCE_LIST" in a
    }
    assert set(back) == {"time", "layer"}
    expected_time = {
        (entries["Ta"], 0), (entries["counts"], 0), (entries["qc"], 0)
    }
    assert back["time"] == expected_time
    assert back["layer"] == {(entries["counts"], 1)}
    # and the forward refs resolve to the scale headers themselves
    assert fwd["counts"] == [entries["time"], entries["layer"]]
    # non-zero: the patch pass actually ran (no placeholder zeros left)
    assert all(a for pairs in back.values() for a, _ in pairs)

    # the public reader stays clean: REFERENCE_LIST is plumbing, not an
    # exposed attribute, and the round-trip is unaffected
    f = read_hdf5(p)
    assert "REFERENCE_LIST" not in f.variables["time"].attrs
    assert f.dims == {"time": 50, "layer": 3}
