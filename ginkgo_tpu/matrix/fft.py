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
    """1-D DFT over multivector rows: x = scale * FFT(b) columnwise."""

    size: int = static_field()
    inverse: bool = static_field(default=False)
    scale: float = static_field(default=1.0)

    @property
    def shape(self):
        return (self.size, self.size)

    def _apply(self, b):
        bc = b.astype(jnp.result_type(b.dtype, jnp.complex64))
        out = (jnp.fft.ifft(bc, axis=0) if self.inverse
               else jnp.fft.fft(bc, axis=0))
        return out if self.scale == 1.0 else out * self.scale

    def transpose(self):
        return self          # the DFT matrix is symmetric

    def conj_transpose(self):
        # true adjoint: F^H = N * ifft (the op convention keeps ifft
        # normalised, so the adjoint carries the explicit N)
        if self.inverse:
            return Fft(size=self.size, inverse=False,
                       scale=self.scale / self.size)
        return Fft(size=self.size, inverse=True,
                   scale=self.scale * self.size)


@linop_dataclass
class FftNd(LinOp):
    """N-D DFT on a flattened grid: rows index the grid row-major
    (``fft.hpp`` Fft2/Fft3 semantics)."""

    dims: tuple = static_field()
    inverse: bool = static_field(default=False)
    scale: float = static_field(default=1.0)

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
        out = out.reshape(self.shape[0], k)
        return out if self.scale == 1.0 else out * self.scale

    def conj_transpose(self):
        n = self.shape[0]
        if self.inverse:
            return FftNd(dims=self.dims, inverse=False,
                         scale=self.scale / n)
        return FftNd(dims=self.dims, inverse=True, scale=self.scale * n)


def Fft2(n1, n2=None, inverse=False):
    return FftNd(dims=(n1, n2 if n2 is not None else n1), inverse=inverse)


def Fft3(n1, n2=None, n3=None, inverse=False):
    n2 = n2 if n2 is not None else n1
    n3 = n3 if n3 is not None else n1
    return FftNd(dims=(n1, n2, n3), inverse=inverse)
