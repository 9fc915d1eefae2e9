"""Minimal netCDF-3 (classic / 64-bit-offset) codec, dependency-free.

Exodus II databases — the reference's mesh+results format
(``src/rd_exo.c``, ``src/wr_exo.c``) — are netCDF-3 files. The image has no
netCDF library, so this module implements the classic file format directly
(CDF-1 and CDF-2 magic, dims/attrs/vars, fixed + record variables).

Format reference: the public NetCDF classic format specification.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field

import numpy as np

NC_BYTE, NC_CHAR, NC_SHORT, NC_INT, NC_FLOAT, NC_DOUBLE = 1, 2, 3, 4, 5, 6
_TYPE_NP = {
    NC_BYTE: np.dtype(">i1"),
    NC_CHAR: np.dtype("S1"),
    NC_SHORT: np.dtype(">i2"),
    NC_INT: np.dtype(">i4"),
    NC_FLOAT: np.dtype(">f4"),
    NC_DOUBLE: np.dtype(">f8"),
}
_NP_TYPE = {
    np.dtype(np.int8): NC_BYTE,
    np.dtype("S1"): NC_CHAR,
    np.dtype(np.int16): NC_SHORT,
    np.dtype(np.int32): NC_INT,
    np.dtype(np.float32): NC_FLOAT,
    np.dtype(np.float64): NC_DOUBLE,
}
_SIZES = {NC_BYTE: 1, NC_CHAR: 1, NC_SHORT: 2, NC_INT: 4, NC_FLOAT: 4, NC_DOUBLE: 8}

_ABSENT = b"\x00" * 8
_NC_DIMENSION, _NC_VARIABLE, _NC_ATTRIBUTE = 0x0A, 0x0B, 0x0C


def _pad4(n: int) -> int:
    return (4 - n % 4) % 4


@dataclass
class Var:
    name: str
    dims: tuple[str, ...]
    nc_type: int
    data: np.ndarray | None = None
    attrs: dict = field(default_factory=dict)


@dataclass
class Dataset:
    dims: dict[str, int | None] = field(default_factory=dict)  # None = record dim
    attrs: dict = field(default_factory=dict)
    vars: dict[str, Var] = field(default_factory=dict)

    # ------------------------------------------------------------- building
    def create_dim(self, name: str, size: int | None):
        self.dims[name] = size

    def create_var(self, name: str, dims: tuple[str, ...], data, attrs=None):
        data = np.asarray(data)
        if data.dtype.kind == "U":
            data = data.astype("S")
        if data.dtype.kind == "S" and data.dtype.itemsize > 1:
            data = data.view("S1").reshape(data.shape + (data.dtype.itemsize,))
        if data.dtype == np.int64:
            data = data.astype(np.int32)
        nct = _NP_TYPE[np.dtype(data.dtype.str.lstrip("<>="))
                       if data.dtype.kind != "S" else np.dtype("S1")]
        self.vars[name] = Var(name, tuple(dims), nct, data, dict(attrs or {}))

    # -------------------------------------------------------------- writing
    def write(self, path: str):
        rec_dim = None
        for d, s in self.dims.items():
            if s is None:
                rec_dim = d
        dim_names = list(self.dims)
        dim_ids = {d: i for i, d in enumerate(dim_names)}

        def enc_name(s: str) -> bytes:
            b = s.encode()
            return struct.pack(">i", len(b)) + b + b"\x00" * _pad4(len(b))

        def enc_attrs(attrs: dict) -> bytes:
            if not attrs:
                return _ABSENT
            out = struct.pack(">ii", _NC_ATTRIBUTE, len(attrs))
            for k, v in attrs.items():
                out += enc_name(k)
                if isinstance(v, str):
                    b = v.encode()
                    out += struct.pack(">ii", NC_CHAR, len(b)) + b + b"\x00" * _pad4(len(b))
                else:
                    arr = np.atleast_1d(np.asarray(v))
                    if arr.dtype == np.int64:
                        arr = arr.astype(np.int32)
                    nct = _NP_TYPE[arr.dtype]
                    raw = arr.astype(_TYPE_NP[nct]).tobytes()
                    out += struct.pack(">ii", nct, arr.size) + raw + b"\x00" * _pad4(len(raw))
            return out

        # variable sizes & layout
        numrecs = 0
        fixed, record = [], []
        for v in self.vars.values():
            if rec_dim is not None and v.dims and v.dims[0] == rec_dim:
                record.append(v)
                numrecs = max(numrecs, v.data.shape[0] if v.data is not None else 0)
            else:
                fixed.append(v)

        def vsize(v: Var, with_rec=False) -> int:
            n = 1
            for d in v.dims:
                if d == rec_dim and not with_rec:
                    continue
                n *= self.dims[d] if self.dims[d] is not None else 1
            sz = n * _SIZES[v.nc_type]
            return sz + _pad4(sz)

        header = b"CDF\x02"  # 64-bit offset version
        header += struct.pack(">i", numrecs)
        # dims
        if self.dims:
            header += struct.pack(">ii", _NC_DIMENSION, len(self.dims))
            for d in dim_names:
                header += enc_name(d) + struct.pack(">i", self.dims[d] or 0)
        else:
            header += _ABSENT
        header += enc_attrs(self.attrs)

        # first pass to compute header size with dummy offsets
        def var_entry(v: Var, begin: int) -> bytes:
            out = enc_name(v.name)
            out += struct.pack(">i", len(v.dims))
            for d in v.dims:
                out += struct.pack(">i", dim_ids[d])
            out += enc_attrs(v.attrs)
            out += struct.pack(">i", v.nc_type)
            out += struct.pack(">i", vsize(v))
            out += struct.pack(">q", begin)  # CDF-2: 64-bit begin
            return out

        allvars = fixed + record
        if allvars:
            body = struct.pack(">ii", _NC_VARIABLE, len(allvars))
            entries = [var_entry(v, 0) for v in allvars]
            hdr_len = len(header) + len(body) + sum(len(e) for e in entries)
            # assign offsets
            begins = {}
            off = hdr_len
            for v in fixed:
                begins[v.name] = off
                off += vsize(v)
            rec_start = off
            recsize = sum(vsize(v) for v in record)
            for v in record:
                begins[v.name] = off
                off += vsize(v)
            body += b"".join(var_entry(v, begins[v.name]) for v in allvars)
            header += body
        else:
            header += _ABSENT
            begins, rec_start, recsize = {}, len(header), 0

        with open(path, "wb") as f:
            f.write(header)
            for v in fixed:
                raw = np.ascontiguousarray(v.data, dtype=_TYPE_NP[v.nc_type]).tobytes()
                f.seek(begins[v.name])
                f.write(raw + b"\x00" * _pad4(len(raw)))
            for r in range(numrecs):
                for v in record:
                    if v.data is None or r >= v.data.shape[0]:
                        continue
                    raw = np.ascontiguousarray(
                        v.data[r], dtype=_TYPE_NP[v.nc_type]
                    ).tobytes()
                    f.seek(begins[v.name] + r * recsize)
                    f.write(raw + b"\x00" * _pad4(len(raw)))

    # -------------------------------------------------------------- reading
    @classmethod
    def read(cls, path: str) -> "Dataset":
        with open(path, "rb") as f:
            buf = f.read()
        magic = buf[:4]
        if magic[:3] != b"CDF" or magic[3] not in (1, 2):
            raise ValueError("not a netCDF classic file")
        cdf2 = magic[3] == 2
        pos = 4
        ds = cls()

        def geti():
            nonlocal pos
            v = struct.unpack_from(">i", buf, pos)[0]
            pos += 4
            return v

        def getq():
            nonlocal pos
            v = struct.unpack_from(">q", buf, pos)[0]
            pos += 8
            return v

        def getname():
            nonlocal pos
            n = geti()
            s = buf[pos : pos + n].decode()
            pos += n + _pad4(n)
            return s

        def getattrs():
            nonlocal pos
            tag = geti()
            cnt = geti()
            out = {}
            if tag == 0 and cnt == 0:
                return out
            for _ in range(cnt):
                k = getname()
                nct = geti()
                ne = geti()
                sz = ne * _SIZES[nct]
                raw = buf[pos : pos + sz]
                pos += sz + _pad4(sz)
                if nct == NC_CHAR:
                    out[k] = raw.decode(errors="replace")
                else:
                    out[k] = np.frombuffer(raw, dtype=_TYPE_NP[nct]).copy()
            return out

        numrecs = geti()
        tag, cnt = geti(), geti()
        dim_names, dim_sizes = [], []
        if tag == _NC_DIMENSION:
            for _ in range(cnt):
                nm = getname()
                sz = geti()
                dim_names.append(nm)
                dim_sizes.append(sz)
                ds.dims[nm] = sz if sz > 0 else None
        ds.attrs = getattrs()
        tag, cnt = geti(), geti()
        rec_dim = next((d for d, s in ds.dims.items() if s is None), None)
        vars_meta = []
        if tag == _NC_VARIABLE:
            for _ in range(cnt):
                nm = getname()
                nd = geti()
                dids = [geti() for _ in range(nd)]
                attrs = getattrs()
                nct = geti()
                vsz = geti()
                begin = getq() if cdf2 else geti()
                vars_meta.append((nm, [dim_names[i] for i in dids], attrs, nct, vsz, begin))

        recsize = sum(
            m[4] for m in vars_meta if rec_dim is not None and m[1] and m[1][0] == rec_dim
        )
        for nm, dims, attrs, nct, vsz, begin in vars_meta:
            shape = []
            isrec = rec_dim is not None and dims and dims[0] == rec_dim
            for d in dims:
                s = ds.dims[d]
                shape.append(numrecs if s is None else s)
            count = int(np.prod([s for s in shape[1:]] if isrec else shape)) if shape else 1
            if isrec:
                rows = []
                for r in range(numrecs):
                    off = begin + r * recsize
                    raw = buf[off : off + count * _SIZES[nct]]
                    rows.append(np.frombuffer(raw, dtype=_TYPE_NP[nct]))
                data = (
                    np.stack(rows).reshape(shape)
                    if rows
                    else np.zeros(shape, dtype=_TYPE_NP[nct])
                )
            else:
                raw = buf[begin : begin + count * _SIZES[nct]]
                data = np.frombuffer(raw, dtype=_TYPE_NP[nct]).reshape(shape)
            v = Var(nm, tuple(dims), nct, data.copy(), attrs)
            ds.vars[nm] = v
        return ds

    def chars_to_strings(self, name: str) -> list[str]:
        a = self.vars[name].data
        return ["".join(x.decode() for x in row).rstrip("\x00 ").strip() for row in a]
