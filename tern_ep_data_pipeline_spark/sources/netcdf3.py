"""Dependency-free netCDF-3 ("classic format") writer and reader.

Parity target: the reference's canonical L1 product is a per-year netCDF
file (reference ``code/data_constructors/nc_constructors.py:461-720``,
``code/file_handling/nc_io.py:27-83``) written via xarray. This container
ships neither xarray nor netCDF4, so this module implements the public
Unidata *classic file format* (CDF-1/CDF-2) directly — it is a small,
fully documented binary layout (magic, dim/attr/var header lists, big-
endian IEEE data, 4-byte alignment) and needs only ``struct`` + numpy.

Scope: the full classic format — fixed and record (UNLIMITED) dimensions,
all six external types, global and per-variable attributes. CDF-2 (64-bit
offsets) is selected automatically when any variable's begin offset would
overflow an int32, so multi-GB year files are representable. The netCDF-4/
HDF5 sibling (the flavour the reference's xarray engine actually emits)
lives in ``sources/hdf5.py``; ``sources/nc.py`` dispatches per file on the
magic bytes.

The higher-level cube assembly (time/latitude/longitude dims, CF attrs,
QC flags, crs variable, ``seconds since 1800-01-01`` time encoding) lives
in ``sources/nc.py``; this module is only the byte format.
"""

from __future__ import annotations

import struct
from collections.abc import Mapping
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6

_TAG_DIM, _TAG_VAR, _TAG_ATT = 0x0A, 0x0B, 0x0C
_ABSENT = b"\x00\x00\x00\x00\x00\x00\x00\x00"

#: external type -> (big-endian numpy dtype, byte size)
_DTYPES = {
    NC_BYTE: (np.dtype(">i1"), 1),
    NC_CHAR: (np.dtype("S1"), 1),
    NC_SHORT: (np.dtype(">i2"), 2),
    NC_INT: (np.dtype(">i4"), 4),
    NC_FLOAT: (np.dtype(">f4"), 4),
    NC_DOUBLE: (np.dtype(">f8"), 8),
}

_KIND_TO_NC = {
    ("i", 1): NC_BYTE,
    ("i", 2): NC_SHORT,
    ("i", 4): NC_INT,
    ("f", 4): NC_FLOAT,
    ("f", 8): NC_DOUBLE,
}


def _nc_type_for(arr: np.ndarray) -> int:
    """Map a numpy array to its external netCDF-3 type.

    netCDF-3 has no 64-bit integer: int64 data narrows to NC_INT when the
    values fit (the reference's QC flags are 0/1), else widens to
    NC_DOUBLE.
    """
    if arr.dtype.kind in ("S", "U"):
        return NC_CHAR
    if arr.dtype.kind == "b":
        return NC_BYTE
    key = (arr.dtype.kind, arr.dtype.itemsize)
    if key in _KIND_TO_NC:
        return _KIND_TO_NC[key]
    if arr.dtype.kind in ("i", "u"):
        lo = int(arr.min()) if arr.size else 0
        hi = int(arr.max()) if arr.size else 0
        if -(2**31) <= lo and hi <= 2**31 - 1:
            return NC_INT
        return NC_DOUBLE
    return NC_DOUBLE


def _pad4(b: bytes) -> bytes:
    return b + b"\x00" * (-len(b) % 4)


def _name(s: str) -> bytes:
    raw = s.encode("utf-8")
    return struct.pack(">i", len(raw)) + _pad4(raw)


def _attr_values(value) -> tuple[int, bytes, int]:
    """Encode one attribute value -> (nc_type, padded bytes, nelems)."""
    if isinstance(value, str):
        raw = value.encode("utf-8")
        return NC_CHAR, _pad4(raw), len(raw)
    if isinstance(value, bytes):
        return NC_CHAR, _pad4(value), len(value)
    arr = np.atleast_1d(np.asarray(value))
    nct = _nc_type_for(arr)
    dt, _ = _DTYPES[nct]
    return nct, _pad4(arr.astype(dt).tobytes()), arr.size


def _attr_list(attrs: Mapping[str, object] | None) -> bytes:
    if not attrs:
        return _ABSENT
    out = [struct.pack(">ii", _TAG_ATT, len(attrs))]
    for k, v in attrs.items():
        nct, payload, nelems = _attr_values(v)
        out.append(_name(k) + struct.pack(">ii", nct, nelems) + payload)
    return b"".join(out)


@dataclass
class Variable:
    """One netCDF variable: dim names, numpy data, attributes."""

    dims: tuple[str, ...]
    data: np.ndarray
    attrs: dict = field(default_factory=dict)


def write_netcdf3(
    path: str,
    dims: Mapping[str, int | None],
    variables: Mapping[str, Variable],
    global_attrs: Mapping[str, object] | None = None,
) -> None:
    """Write a classic-format netCDF file.

    ``dims`` is ordered {name: length}; a ``None`` length marks the (single)
    UNLIMITED/record dimension. A variable whose first dim is the record dim
    is a record variable; its data's first axis is the record count. Version
    byte: CDF-1 normally, CDF-2 when any begin offset needs 64 bits.
    """
    dim_names = list(dims)
    dim_id = {n: i for i, n in enumerate(dim_names)}
    rec_dims = [n for n, ln in dims.items() if ln is None]
    if len(rec_dims) > 1:
        raise ValueError("classic format allows at most one UNLIMITED dim")
    rec_dim = rec_dims[0] if rec_dims else None

    # validate shapes; infer numrecs from record variables
    numrecs = 0
    for vn, var in variables.items():
        if len(var.dims) != var.data.ndim:
            raise ValueError(f"{vn}: rank {var.data.ndim} != dims {var.dims}")
        for ax, dn in enumerate(var.dims):
            if dn == rec_dim and ax == 0:
                numrecs = max(numrecs, var.data.shape[0])
            elif dims[dn] != var.data.shape[ax]:
                raise ValueError(
                    f"{vn}: axis {ax} ({dn}) is {var.data.shape[ax]}, "
                    f"dim declares {dims[dn]}"
                )

    fixed = {n: v for n, v in variables.items() if rec_dim not in v.dims[:1]}
    record = {n: v for n, v in variables.items() if n not in fixed}

    # per-variable external type, payload bytes, vsize (spec: product of
    # non-record dim lengths x type size, rounded up to a multiple of 4)
    enc: dict[str, tuple[int, bytes, int]] = {}
    for vn, var in variables.items():
        nct = _nc_type_for(var.data)
        dt, sz = _DTYPES[nct]
        if nct == NC_CHAR:
            payload = var.data.astype("S1").tobytes()
        else:
            payload = var.data.astype(dt).tobytes()
        n_per_rec = var.data.size if vn in fixed else (
            var.data[0].size if numrecs else int(np.prod(var.data.shape[1:]))
        )
        vsize = n_per_rec * sz
        vsize += -vsize % 4
        enc[vn] = (nct, payload, vsize)

    # the single-record-variable special case: no padding between records
    if len(record) == 1:
        vn = next(iter(record))
        nct, payload, _ = enc[vn]
        _, sz = _DTYPES[nct]
        n_per_rec = int(np.prod(record[vn].data.shape[1:])) if record[vn].data.ndim > 1 else 1
        enc[vn] = (nct, payload, n_per_rec * sz)

    def header(version: int, begins: Mapping[str, int]) -> bytes:
        off_fmt = ">i" if version == 1 else ">q"
        parts = [b"CDF", bytes([version]), struct.pack(">i", numrecs)]
        if dims:
            parts.append(struct.pack(">ii", _TAG_DIM, len(dims)))
            for n in dim_names:
                parts.append(_name(n) + struct.pack(">i", dims[n] or 0))
        else:
            parts.append(_ABSENT)
        parts.append(_attr_list(global_attrs))
        if variables:
            parts.append(struct.pack(">ii", _TAG_VAR, len(variables)))
            for vn, var in variables.items():
                nct, _, vsize = enc[vn]
                parts.append(_name(vn))
                parts.append(struct.pack(">i", len(var.dims)))
                parts.extend(struct.pack(">i", dim_id[d]) for d in var.dims)
                parts.append(_attr_list(var.attrs))
                parts.append(struct.pack(">ii", nct, vsize))
                parts.append(struct.pack(off_fmt, begins.get(vn, 0)))
        else:
            parts.append(_ABSENT)
        return b"".join(parts)

    def layout(version: int) -> dict[str, int]:
        begins: dict[str, int] = {}
        off = len(header(version, {v: 0 for v in variables}))
        for vn in fixed:
            begins[vn] = off
            off += enc[vn][2]
        for vn in record:
            begins[vn] = off
            off += enc[vn][2]
        return begins

    version = 1
    begins = layout(version)
    rec_size = sum(enc[vn][2] for vn in record)
    end = max(
        [begins[vn] + enc[vn][2] for vn in fixed]
        + [begins[vn] + numrecs * rec_size for vn in record]
        + [0]
    )
    if end > 2**31 - 1:
        version = 2
        begins = layout(version)

    with open(path, "wb") as fh:
        fh.write(header(version, begins))
        for vn in fixed:
            fh.write(_pad4(enc[vn][1]))
        if record:
            rdts = {
                vn: (enc[vn][2], _DTYPES[enc[vn][0]][1]) for vn in record
            }
            for r in range(numrecs):
                for vn, var in record.items():
                    vsize, _ = rdts[vn]
                    slab = var.data[r : r + 1]
                    nct = enc[vn][0]
                    dt, _ = _DTYPES[nct]
                    raw = (
                        slab.astype("S1").tobytes()
                        if nct == NC_CHAR
                        else slab.astype(dt).tobytes()
                    )
                    fh.write(raw + b"\x00" * (vsize - len(raw)))


@dataclass
class NetCDF3File:
    """Parsed classic-format file: dims, global attrs, variables."""

    dims: dict
    attrs: dict
    variables: dict  # name -> Variable


class _Parser:
    def __init__(self, buf: bytes):
        self.buf = buf
        self.pos = 0

    def i4(self) -> int:
        (v,) = struct.unpack_from(">i", self.buf, self.pos)
        self.pos += 4
        return v

    def i8(self) -> int:
        (v,) = struct.unpack_from(">q", self.buf, self.pos)
        self.pos += 8
        return v

    def name(self) -> str:
        n = self.i4()
        raw = self.buf[self.pos : self.pos + n]
        self.pos += n + (-n % 4)
        return raw.decode("utf-8")

    def attr_value(self, nct: int, nelems: int):
        dt, sz = _DTYPES[nct]
        raw = self.buf[self.pos : self.pos + nelems * sz]
        self.pos += nelems * sz + (-(nelems * sz) % 4)
        if nct == NC_CHAR:
            return raw.decode("utf-8", errors="replace")
        arr = np.frombuffer(raw, dtype=dt)
        return arr[0].item() if nelems == 1 else arr.astype(dt.newbyteorder("="))

    def attr_list(self) -> dict:
        tag, n = self.i4(), self.i4()
        if tag == 0 and n == 0:
            return {}
        if tag != _TAG_ATT:
            raise ValueError(f"bad attr-list tag {tag:#x}")
        out = {}
        for _ in range(n):
            k = self.name()
            nct, nelems = self.i4(), self.i4()
            out[k] = self.attr_value(nct, nelems)
        return out


def read_netcdf3(path: str) -> NetCDF3File:
    """Read a classic-format (CDF-1/CDF-2) netCDF file written by any
    conforming tool. Returns native-endian numpy arrays; NC_CHAR variables
    come back as ``bytes`` arrays of dtype S1 reshaped to the var shape."""
    with open(path, "rb") as fh:
        buf = fh.read()
    if buf[:3] != b"CDF" or buf[3] not in (1, 2):
        raise ValueError("not a netCDF classic-format file")
    version = buf[3]
    p = _Parser(buf)
    p.pos = 4
    numrecs = p.i4()

    tag, n = p.i4(), p.i4()
    dim_names: list[str] = []
    dims: dict[str, int | None] = {}
    if tag == _TAG_DIM:
        for _ in range(n):
            dn = p.name()
            ln = p.i4()
            dim_names.append(dn)
            dims[dn] = None if ln == 0 else ln
    elif (tag, n) != (0, 0):
        raise ValueError(f"bad dim-list tag {tag:#x}")

    gattrs = p.attr_list()

    tag, n = p.i4(), p.i4()
    variables: dict[str, Variable] = {}
    meta = []
    if tag == _TAG_VAR:
        for _ in range(n):
            vn = p.name()
            rank = p.i4()
            vdims = tuple(dim_names[p.i4()] for _ in range(rank))
            vattrs = p.attr_list()
            nct = p.i4()
            vsize = p.i4()
            begin = p.i4() if version == 1 else p.i8()
            meta.append((vn, vdims, vattrs, nct, vsize, begin))
    elif (tag, n) != (0, 0):
        raise ValueError(f"bad var-list tag {tag:#x}")

    rec_dim = next((d for d, ln in dims.items() if ln is None), None)
    rec_vars = [m for m in meta if m[1][:1] == (rec_dim,) and rec_dim is not None]

    for vn, vdims, vattrs, nct, vsize, begin in meta:
        dt, sz = _DTYPES[nct]
        is_rec = rec_dim is not None and vdims[:1] == (rec_dim,)
        if not is_rec:
            shape = tuple(dims[d] for d in vdims)
            count = int(np.prod(shape)) if shape else 1
            arr = np.frombuffer(buf, dtype=dt, count=count, offset=begin)
            data = arr.reshape(shape)
        else:
            per_rec_shape = tuple(dims[d] for d in vdims[1:])
            n_per_rec = int(np.prod(per_rec_shape)) if per_rec_shape else 1
            # record stride: sum of every record var's vsize (with the
            # single-record-var no-padding special case already reflected
            # in vsize by conforming writers)
            stride = sum(m[4] for m in rec_vars)
            out = np.empty((numrecs, n_per_rec), dtype=dt)
            for r in range(numrecs):
                off = begin + r * stride
                out[r] = np.frombuffer(buf, dtype=dt, count=n_per_rec, offset=off)
            data = out.reshape((numrecs, *per_rec_shape))
        if nct != NC_CHAR:
            data = data.astype(dt.newbyteorder("="))
        variables[vn] = Variable(vdims, data, vattrs)

    return NetCDF3File(dims=dims, attrs=gattrs, variables=variables)
