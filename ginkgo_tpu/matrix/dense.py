"""Dense row-major operator + multivector BLAS.

Analog of Ginkgo's ``matrix::Dense`` (``include/ginkgo/core/matrix/dense.hpp:88``,
BLAS ops :962-1121).  In JAX, plain arrays are the idiomatic multivector, so
the BLAS-1 surface here is free functions over (n, k) arrays (used by solvers
with per-column stopping masks); ``Dense`` itself is the dense *operator*
whose apply is an MXU matmul.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..base.linop import LinOp, linop_dataclass, static_field
from ..base.matrix_data import MatrixData


@linop_dataclass
class Dense(LinOp):
    data: jnp.ndarray  # (n, m)

    @property
    def shape(self):
        return self.data.shape

    def _apply(self, b):
        return jnp.dot(self.data, b.astype(self.data.dtype),
                       preferred_element_type=_acc_dtype(self.data.dtype))

    def _apply_advanced(self, alpha, b, beta, x):
        return alpha * self._apply(b) + beta * x

    # -- construction -------------------------------------------------------
    @classmethod
    def from_data(cls, data: MatrixData, dtype=None):
        dense = data.canonical().to_dense()
        return cls(data=jnp.asarray(dense, dtype=dtype))

    @classmethod
    def create(cls, array, dtype=None):
        return cls(data=jnp.asarray(array, dtype=dtype))

    # -- ops ------------------------------------------------------------------
    def to_dense(self):
        return self.data

    def transpose(self):
        return Dense(data=self.data.T)

    def conj_transpose(self):
        return Dense(data=self.data.conj().T)

    def extract_diagonal(self):
        from .diagonal import Diagonal
        return Diagonal(values=jnp.diagonal(self.data))

    # multivector BLAS as methods (dense.hpp:962-1121 parity spelling)
    def compute_dot(self, other):
        return compute_dot(self.data, _data_of(other))

    def compute_conj_dot(self, other):
        return compute_conj_dot(self.data, _data_of(other))

    def compute_norm2(self):
        return compute_norm2(self.data)

    def compute_norm1(self):
        return compute_norm1(self.data)

    def compute_mean(self):
        return compute_mean(self.data)

    def compute_squared_norm2(self):
        return compute_squared_norm2(self.data)

    def scale(self, alpha):
        return Dense(data=self.data * alpha)

    def inv_scale(self, alpha):
        return Dense(data=self.data / alpha)

    def add_scaled(self, alpha, other):
        return Dense(data=self.data + alpha * _data_of(other))

    def sub_scaled(self, alpha, other):
        return Dense(data=self.data - alpha * _data_of(other))

    def add_scaled_identity(self, alpha, beta):
        """``beta*self + alpha*I`` (ScaledIdentityAddable,
        ``lin_op.hpp:818-838``; functional: returns the new operator)."""
        n, m = self.shape
        eye = jnp.eye(n, m, dtype=self.data.dtype)
        return Dense(data=beta * self.data + alpha * eye)

    def compute_absolute(self):
        """|self| entrywise (AbsoluteComputable, ``dense.hpp:816-818``)."""
        return Dense(data=jnp.abs(self.data))

    def make_complex(self):
        """Promote to the matching complex value type (``dense.hpp:820+``)."""
        cdtype = jnp.result_type(self.data.dtype, jnp.complex64)
        return Dense(data=self.data.astype(cdtype))

    def get_real(self):
        return Dense(data=jnp.real(self.data))

    def get_imag(self):
        return Dense(data=jnp.imag(self.data))

    def fill(self, value):
        return Dense(data=jnp.full_like(self.data, value))

    def row_gather(self, rows):
        return Dense(data=self.data[jnp.asarray(rows)])

    def permute(self, perm, mode=None):
        from .permutation import _invert_perm, permute_mode
        perm = jnp.asarray(perm)
        mode = permute_mode.symmetric if mode is None else mode
        # forward rows: A'(i,:) = A(p[i],:) = d[perm]; the inverse flag
        # swaps in p⁻¹ (same convention as permute_data / Csr.permute)
        idx = _invert_perm(perm) if (mode & permute_mode.inverse) else perm
        d = self.data
        if mode & permute_mode.rows:
            d = d[idx]
        if mode & permute_mode.columns:
            d = d[:, idx]
        return Dense(data=d)

    def scale_permute(self, row_sp, mode=None, col_sp=None,
                      invert: bool = False):
        """Scaled permutation (``dense.hpp:505-560``): one ScaledPermutation
        + permute_mode, or a row/col pair with ``invert``.  Direct array
        ops (no triplet round-trip), so explicit zeros/NaNs pass through."""
        from .permutation import (_invert_perm, _normalize_scale_permute)
        (rp, rs), (cp, cs), do_rows, do_cols, inv_flag = \
            _normalize_scale_permute(row_sp, mode, col_sp, invert)
        d = self.data
        if do_rows:
            rs_ = jnp.asarray(rs, d.dtype)
            if inv_flag:
                # A' = S⁻¹A: A'(p[j], :) = A(j, :)/s[j]
                d = (d / rs_[:, None])[_invert_perm(np.asarray(rp))]
            else:
                # A'(i, :) = s[i] A(p[i], :)
                d = rs_[:, None] * d[np.asarray(rp)]
        if do_cols:
            cs_ = jnp.asarray(cs, d.dtype)
            if inv_flag:
                # A' = A S⁻ᵀ: A'(:, p[k]) = A(:, k)/s[k]
                d = (d / cs_[None, :])[:, _invert_perm(np.asarray(cp))]
            else:
                # A' = A Sᵀ: A'(:, j) = A(:, p[j]) s[j]
                d = d[:, np.asarray(cp)] * cs_[None, :]
        return Dense(data=d)

    def create_submatrix(self, rows: slice, cols: slice):
        return Dense(data=self.data[rows, cols])

    def to_matrix_data(self) -> MatrixData:
        import numpy as np
        return MatrixData.from_dense(np.asarray(self.data))


def _data_of(other):
    return other.data if isinstance(other, Dense) else jnp.asarray(other)


def _acc_dtype(dtype):
    """Accumulate bf16/f16 matmuls in f32 on the MXU."""
    if jnp.dtype(dtype) in (jnp.dtype(jnp.bfloat16), jnp.dtype(jnp.float16)):
        return jnp.float32
    return dtype


# ---------------------------------------------------------------------------
# Multivector BLAS-1 (columnwise), mirroring dense.hpp's op list.
# ---------------------------------------------------------------------------

def compute_dot(a, b):
    """Columnwise non-conjugated dot: (k,) for (n,k) inputs."""
    return jnp.sum(a * b, axis=0)


def compute_conj_dot(a, b):
    return jnp.sum(jnp.conj(a) * b, axis=0)


def compute_norm2(a):
    return jnp.sqrt(jnp.real(compute_conj_dot(a, a)))


def compute_norm1(a):
    return jnp.sum(jnp.abs(a), axis=0)


def compute_mean(a):
    return jnp.mean(a, axis=0)


def compute_squared_norm2(a):
    """Columnwise squared 2-norm (``dense.hpp:1088`` compute_squared_norm2)."""
    return jnp.real(compute_conj_dot(a, a))


def scale(alpha, a):
    return alpha * a


def inv_scale(alpha, a):
    return a / alpha


def add_scaled(alpha, x, y):
    """y + alpha*x (Ginkgo's add_scaled mutates y; we return)."""
    return y + alpha * x


def sub_scaled(alpha, x, y):
    return y - alpha * x
