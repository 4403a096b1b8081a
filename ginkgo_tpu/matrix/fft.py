"""DFT operators (Fft / Fft2 / Fft3).

Analog of ``include/ginkgo/core/matrix/fft.hpp:45,143,255`` — the discrete
Fourier transform as a LinOp, backed by cuFFT in the reference and by XLA's
native FFT here (``jnp.fft``; the schroedinger-splitting example capability).
Convention matches Ginkgo/FFTW: unnormalised forward, inverse = conjugate
transpose scaled by 1/N (Ginkgo exposes the inverse as a separate flag).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..base.linop import LinOp, linop_dataclass, static_field


@linop_dataclass
class Fft(LinOp):
    """1-D DFT over multivector rows: x = FFT(b) columnwise."""

    size: int = static_field()
    inverse: bool = static_field(default=False)

    @property
    def shape(self):
        return (self.size, self.size)

    def _apply(self, b):
        bc = b.astype(jnp.result_type(b.dtype, jnp.complex64))
        if self.inverse:
            return jnp.fft.ifft(bc, axis=0)
        return jnp.fft.fft(bc, axis=0)

    def transpose(self):
        return self

    def conj_transpose(self):
        return Fft(size=self.size, inverse=not self.inverse)


@linop_dataclass
class FftNd(LinOp):
    """N-D DFT on a flattened grid: rows index the grid row-major
    (``fft.hpp`` Fft2/Fft3 semantics)."""

    dims: tuple = static_field()
    inverse: bool = static_field(default=False)

    @property
    def shape(self):
        n = 1
        for d in self.dims:
            n *= d
        return (n, n)

    def _apply(self, b):
        k = b.shape[1]
        bc = b.astype(jnp.result_type(b.dtype, jnp.complex64))
        grid = bc.reshape(*self.dims, k)
        axes = tuple(range(len(self.dims)))
        out = (jnp.fft.ifftn(grid, axes=axes) if self.inverse
               else jnp.fft.fftn(grid, axes=axes))
        return out.reshape(self.shape[0], k)

    def conj_transpose(self):
        return FftNd(dims=self.dims, inverse=not self.inverse)


def Fft2(n1, n2=None, inverse=False):
    return FftNd(dims=(n1, n2 if n2 is not None else n1), inverse=inverse)


def Fft3(n1, n2=None, n3=None, inverse=False):
    n2 = n2 if n2 is not None else n1
    n3 = n3 if n3 is not None else n1
    return FftNd(dims=(n1, n2, n3), inverse=inverse)
