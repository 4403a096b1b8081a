"""schroedinger-splitting example: Strang splitting for the free/potential
Schroedinger equation using the Fft2 LinOp (fft.hpp capability)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu import Fft2


def main(nx=32, steps=50, dt=1e-3):
    n = nx * nx
    F = Fft2(nx, nx)
    Fi = Fft2(nx, nx, inverse=True)
    k = np.fft.fftfreq(nx) * 2 * np.pi * nx
    k2 = (k[:, None] ** 2 + k[None, :] ** 2).reshape(n)
    kinetic = jnp.exp(-0.5j * dt * jnp.asarray(k2))
    xs = np.linspace(0, 1, nx, endpoint=False)
    V = 100 * ((xs[:, None] - 0.5) ** 2 + (xs[None, :] - 0.5) ** 2)
    potential = jnp.exp(-1j * dt * jnp.asarray(V.reshape(n)))

    psi = jnp.asarray(np.exp(
        -100 * ((xs[:, None] - 0.3) ** 2 + (xs[None, :] - 0.5) ** 2)
    ).reshape(n), jnp.complex128)
    psi = psi / jnp.linalg.norm(psi)

    for _ in range(steps):
        psi = potential * psi
        psi = Fi.apply(kinetic * F.apply(psi))
    norm = float(jnp.linalg.norm(psi))
    print(f"wavefunction norm after {steps} Strang steps: {norm:.6f}")
    assert abs(norm - 1.0) < 1e-8   # unitary evolution


if __name__ == "__main__":
    main()
