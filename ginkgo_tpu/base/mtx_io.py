"""MatrixMarket (+ simple binary) IO.

Analog of Ginkgo's ``include/ginkgo/core/base/mtx_io.hpp`` (``read_raw:33``,
``read_binary_raw:68``, ``write_raw:120``).  Parses on the host into
:class:`~ginkgo_tpu.base.matrix_data.MatrixData`; the binary format IS the
reference's on-disk layout (``core/base/mtx_io.cpp:762-905``), so files
interop with ``gko::read_binary_raw``/``write_binary_raw`` unmodified
(legacy npz files from older versions of this package still read).
"""

from __future__ import annotations

import io as _io

import numpy as np

from .matrix_data import MatrixData

_MM_HEADER = "%%MatrixMarket"


def read_mtx(source) -> MatrixData:
    """Read a MatrixMarket file/stream/str into MatrixData.

    Supports coordinate + array formats; real/integer/complex/pattern fields;
    general/symmetric/skew-symmetric/hermitian symmetries.
    """
    if isinstance(source, (str, bytes)):
        try:
            import os
            is_path = isinstance(source, str) and os.path.exists(source)
        except (ValueError, OSError):  # very long strings
            is_path = False
        if is_path:
            from ..native import read_mtx_native
            native = read_mtx_native(source)
            if native is not None:
                shape, rows, cols, vals, symmetry = native
                return _assemble(shape, rows, cols, vals, symmetry)
            with open(source, "r") as f:
                return read_mtx(f)
        text = source.decode() if isinstance(source, bytes) else source
        return read_mtx(_io.StringIO(text))

    header = source.readline().split()
    if len(header) < 5 or header[0] != _MM_HEADER or header[1] != "matrix":
        raise ValueError(f"invalid MatrixMarket header: {header}")
    fmt, field, symmetry = header[2].lower(), header[3].lower(), header[4].lower()

    line = source.readline()
    while line.startswith("%"):
        line = source.readline()
    dims = line.split()

    is_complex = field == "complex"
    vdtype = np.complex128 if is_complex else np.float64

    if fmt == "coordinate":
        nrows, ncols, nnz = int(dims[0]), int(dims[1]), int(dims[2])
        rows = np.empty(nnz, np.int64)
        cols = np.empty(nnz, np.int64)
        vals = np.empty(nnz, vdtype)
        for k in range(nnz):
            parts = source.readline().split()
            rows[k] = int(parts[0]) - 1
            cols[k] = int(parts[1]) - 1
            if field == "pattern":
                vals[k] = 1.0
            elif is_complex:
                vals[k] = complex(float(parts[2]), float(parts[3]))
            else:
                vals[k] = float(parts[2])
    elif fmt == "array":
        if symmetry != "general":
            raise NotImplementedError("array format only supports 'general'")
        nrows, ncols = int(dims[0]), int(dims[1])
        dense = np.empty((nrows, ncols), vdtype)
        # column-major order per the MM spec
        for j in range(ncols):
            for i in range(nrows):
                parts = source.readline().split()
                dense[i, j] = (complex(float(parts[0]), float(parts[1]))
                               if is_complex else float(parts[0]))
        rows, cols = np.nonzero(np.ones_like(dense, dtype=bool))
        vals = dense[rows, cols]
        nnz = vals.size
    else:
        raise ValueError(f"unsupported MatrixMarket format {fmt!r}")

    return _assemble((nrows, ncols), rows, cols, vals, symmetry)


def _assemble(shape, rows, cols, vals, symmetry) -> MatrixData:
    if symmetry in ("symmetric", "hermitian", "skew-symmetric"):
        off = rows != cols
        orow, ocol, oval = cols[off], rows[off], vals[off]
        if symmetry == "hermitian":
            oval = np.conj(oval)
        elif symmetry == "skew-symmetric":
            oval = -oval
        rows = np.concatenate([rows, orow])
        cols = np.concatenate([cols, ocol])
        vals = np.concatenate([vals, oval])

    idt = np.int32 if max(shape) < 2**31 else np.int64
    return MatrixData(shape, rows.astype(idt), cols.astype(idt),
                      vals).sort_row_major()


def write_mtx(dest, data) -> None:
    """Write a matrix as a general coordinate MatrixMarket file.

    Accepts MatrixData, any operator with ``to_matrix_data`` (gko::write
    analog), or a dense array."""
    if not isinstance(data, MatrixData):
        if hasattr(data, "to_matrix_data"):
            data = data.to_matrix_data()
        else:
            data = MatrixData.from_dense(np.asarray(data))
    close = False
    if isinstance(dest, str):
        dest = open(dest, "w")
        close = True
    try:
        is_complex = np.iscomplexobj(data.values)
        field = "complex" if is_complex else "real"
        dest.write(f"%%MatrixMarket matrix coordinate {field} general\n")
        dest.write(f"{data.shape[0]} {data.shape[1]} {data.nnz}\n")
        for r, c, v in zip(data.row_idx, data.col_idx, data.values):
            if is_complex:
                dest.write(f"{r + 1} {c + 1} {v.real:.17g} {v.imag:.17g}\n")
            else:
                dest.write(f"{r + 1} {c + 1} {v:.17g}\n")
    finally:
        if close:
            dest.close()


# Ginkgo's binary format (core/base/mtx_io.cpp:762-905): 32-byte header of
# four little-endian u64s — a magic whose bytes are b"GINKGO" + value-type
# char + index-type char, then num_rows, num_cols, num_entries — followed
# by num_entries packed (row, column, value) records.  Byte-compatible, so
# files move between the reference and this framework unmodified.
_BIN_VALUE_CHARS = {"float64": b"D", "float32": b"S", "complex128": b"Z",
                    "complex64": b"C", "float16": b"H", "bfloat16": b"B"}
_BIN_VALUE_DTYPES = {v: k for k, v in _BIN_VALUE_CHARS.items()}
_BIN_INDEX_CHARS = {"int32": b"I", "int64": b"L"}
_BIN_INDEX_DTYPES = {v: k for k, v in _BIN_INDEX_CHARS.items()}


def _bin_value_dtype(name):
    if name == "bfloat16":
        import ml_dtypes
        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def write_binary(path: str, data: MatrixData, index_dtype="int64") -> None:
    """Binary serialization in the reference's own format
    (``write_binary_raw``, ``core/base/mtx_io.cpp:762+``) — files round-trip
    with ``gko::read_binary_raw`` byte-for-byte."""
    vname = np.dtype(data.values.dtype).name
    if vname not in _BIN_VALUE_CHARS:
        raise ValueError(f"unsupported binary value type {vname}; one of "
                         f"{sorted(_BIN_VALUE_CHARS)}")
    iname = np.dtype(index_dtype).name
    if iname not in _BIN_INDEX_CHARS:
        raise ValueError(f"unsupported binary index type {iname}")
    imax = np.iinfo(iname).max
    if data.nnz and (int(np.max(data.row_idx)) > imax
                     or int(np.max(data.col_idx)) > imax):
        raise ValueError(
            f"indices exceed the {iname} range; use index_dtype='int64'")
    magic = (b"GINKGO" + _BIN_VALUE_CHARS[vname] + _BIN_INDEX_CHARS[iname])
    # '<'-prefixed: the format is unconditionally little-endian like the
    # header, regardless of host byte order
    rec = np.dtype([("r", np.dtype(iname).newbyteorder("<")),
                    ("c", np.dtype(iname).newbyteorder("<")),
                    ("v", _bin_value_dtype(vname).newbyteorder("<"))])
    entries = np.empty(data.nnz, rec)
    entries["r"] = data.row_idx
    entries["c"] = data.col_idx
    entries["v"] = data.values
    with open(path, "wb") as f:
        f.write(magic)
        f.write(np.asarray([data.shape[0], data.shape[1], data.nnz],
                           "<u8").tobytes())
        f.write(entries.tobytes())


def read_binary(path: str) -> MatrixData:
    """Reads both the reference's binary format (``read_binary_raw``) and
    this framework's legacy npz files."""
    with open(path, "rb") as f:
        head = f.read(8)
        if head[:6] != b"GINKGO":
            pass                      # fall through to the npz reader
        else:
            vchar, ichar = head[6:7], head[7:8]
            if vchar not in _BIN_VALUE_DTYPES or \
                    ichar not in _BIN_INDEX_DTYPES:
                raise ValueError(
                    f"unknown binary type tag {head[6:8]!r}")
            dims = np.frombuffer(f.read(24), "<u8")
            n, m, nnz = (int(x) for x in dims)
            iname = _BIN_INDEX_DTYPES[ichar]
            rec = np.dtype([
                ("r", np.dtype(iname).newbyteorder("<")),
                ("c", np.dtype(iname).newbyteorder("<")),
                ("v", _bin_value_dtype(
                    _BIN_VALUE_DTYPES[vchar]).newbyteorder("<"))])
            buf = f.read(nnz * rec.itemsize)
            if len(buf) != nnz * rec.itemsize:
                raise ValueError("truncated binary matrix file")
            entries = np.frombuffer(buf, rec)
            return MatrixData(
                (n, m), entries["r"].astype(np.int64),
                entries["c"].astype(np.int64),
                np.ascontiguousarray(entries["v"])).sort_row_major()
    with np.load(path) as z:
        return MatrixData((int(z["shape"][0]), int(z["shape"][1])),
                          z["row_idx"], z["col_idx"], z["values"])
