"""schroedinger-splitting example: Strang splitting for the free/potential
Schroedinger equation using the Fft2 LinOp (fft.hpp capability)."""

import os as _os, sys as _sys
_sys.path[:0] = [_d := _os.path.dirname(_os.path.abspath(__file__)),
                 _os.path.dirname(_d)]  # examples dir + repo root
import _example_setup  # noqa: F401  (x64 + shared policy)

import jax.numpy as jnp
import numpy as np

from ginkgo_tpu import Fft2


def _fft_supported() -> bool:
    """Some restricted TPU runtimes lack the FFT custom call entirely
    (jnp.fft.fftn raises UNIMPLEMENTED at execute time); probe once and
    fall back to the CPU device so the example runs everywhere."""
    import jax
    try:
        float(jnp.abs(jnp.fft.fft(jnp.ones(8, jnp.complex64))).sum())
        return True
    except Exception:
        return False


def main(nx=32, steps=50, dt=1e-3):
    import contextlib
    import jax
    if not _fft_supported():
        print("note: FFT unavailable on the default backend; "
              "running on the CPU device")
        dev_ctx = jax.default_device(jax.devices("cpu")[0])
    else:
        dev_ctx = contextlib.nullcontext()
    with dev_ctx:
        return _run(nx, steps, dt)


def _run(nx, steps, dt):
    n = nx * nx
    F = Fft2(nx, nx)
    Fi = Fft2(nx, nx, inverse=True)
    k = np.fft.fftfreq(nx) * 2 * np.pi * nx
    k2 = (k[:, None] ** 2 + k[None, :] ** 2).reshape(n)
    # phase factors computed on host in f64, shipped at the run dtype
    # (TPU has no c128 compute)
    kinetic_h = np.exp(-0.5j * dt * k2)
    xs = np.linspace(0, 1, nx, endpoint=False)
    V = 100 * ((xs[:, None] - 0.5) ** 2 + (xs[None, :] - 0.5) ** 2)
    potential_h = np.exp(-1j * dt * V.reshape(n))

    # TPU has no c128 compute; run the evolution in c64 there and keep
    # the c128 reference accuracy on CPU backends
    import jax
    on_tpu = jax.default_backend() not in ("cpu",)
    cdtype = jnp.complex64 if on_tpu else jnp.complex128
    tol = 1e-5 if on_tpu else 1e-8
    kinetic = jnp.asarray(kinetic_h, cdtype)
    potential = jnp.asarray(potential_h, cdtype)
    psi = jnp.asarray(np.exp(
        -100 * ((xs[:, None] - 0.3) ** 2 + (xs[None, :] - 0.5) ** 2)
    ).reshape(n), cdtype)
    psi = psi / jnp.linalg.norm(psi)

    for _ in range(steps):
        psi = potential * psi
        psi = Fi.apply(kinetic * F.apply(psi))
    norm = float(jnp.linalg.norm(psi))
    print(f"wavefunction norm after {steps} Strang steps: {norm:.6f}")
    assert abs(norm - 1.0) < tol    # unitary evolution
    return {"norm_drift": abs(norm - 1.0), "norm_drift_bound": tol}


if __name__ == "__main__":
    main()
