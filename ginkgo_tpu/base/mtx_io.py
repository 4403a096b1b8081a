"""MatrixMarket (+ simple binary) IO.

Analog of Ginkgo's ``include/ginkgo/core/base/mtx_io.hpp`` (``read_raw:33``,
``read_binary_raw:68``, ``write_raw:120``).  Parses on the host into
:class:`~ginkgo_tpu.base.matrix_data.MatrixData`; the binary format is a
little-endian numpy container (not Ginkgo's on-disk layout — the capability,
not the bytes, is the parity target).
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


def write_binary(path: str, data: MatrixData) -> None:
    """Binary serialization (``write_binary_raw`` capability analog).
    Writes exactly ``path`` (np.savez would append '.npz' to a bare name,
    breaking write/read round-trips)."""
    with open(path, "wb") as f:
        np.savez(f, shape=np.asarray(data.shape, np.int64),
                 row_idx=data.row_idx, col_idx=data.col_idx,
                 values=data.values)


def read_binary(path: str) -> MatrixData:
    with np.load(path) as z:
        return MatrixData((int(z["shape"][0]), int(z["shape"][1])),
                          z["row_idx"], z["col_idx"], z["values"])
