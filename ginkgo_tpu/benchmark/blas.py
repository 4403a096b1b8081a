"""Dense BLAS-1 benchmark (``benchmark/blas`` analog): axpy, scal, dot,
norm2, copy.

Chains are written so every iteration *depends on the previous one's
output* — otherwise XLA constant-folds the loop and the numbers are
fiction (see CLAUDE.md timing notes).  Reductions feed a tiny perturbation
back into the vector, which adds one write per element; the reported
bandwidth accounts for the actual access pattern of each chain body.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .runner import (base_parser, chain_k_for_backend, emit, load_cases,
                     time_chained)

OPS = ("axpy", "scal", "dot", "norm2", "copy")


def run_case(case, ops, args):
    n = int(case.get("n", 1 << 20))
    r = int(case.get("r", 1))         # rhs columns
    x = jnp.ones((n, r), jnp.float32)
    y = jnp.full((n, r), 0.5, jnp.float32)
    k1, k2 = chain_k_for_backend()
    result = {"problem": {"n": n, "r": r}, "blas": {}}
    for op in ops:
        entry = {"completed": False}
        try:
            if op == "axpy":
                # z <- a*x + z: read x, read z, write z = 3 accesses/el
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        return jax.lax.fori_loop(
                            0, K,
                            lambda i, z: x * (1.0 + 1e-9 * i) + z,
                            y).sum()
                    return f
                bytes_per = 3 * n * r * 4
            elif op == "scal":
                # z <- s_i * z with iteration-dependent scalar
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        return jax.lax.fori_loop(
                            0, K,
                            lambda i, z: z * (1.0 + 1e-9 * i), y).sum()
                    return f
                bytes_per = 2 * n * r * 4
            elif op == "copy":
                # z <- roll(z): pure data movement, read + write
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        return jax.lax.fori_loop(
                            0, K, lambda i, z: jnp.roll(z, 1 + i, axis=0),
                            y).sum()
                    return f
                bytes_per = 2 * n * r * 4
            elif op in ("dot", "norm2"):
                # dot: read x + read z + write z; norm2: read z + write z
                def mk(K, op=op):
                    @jax.jit
                    def f(x, y):
                        def body(i, carry):
                            z, acc = carry
                            d = (jnp.sum(x * z, axis=0) if op == "dot"
                                 else jnp.linalg.norm(z, axis=0))
                            return z * (1.0 + 1e-12 * d.sum()), acc + d
                        _, acc = jax.lax.fori_loop(
                            0, K, body, (y, jnp.zeros((r,))))
                        return acc.sum()
                    return f
                bytes_per = (3 if op == "dot" else 2) * n * r * 4
            else:
                raise ValueError(op)
            t = time_chained(mk, (x, y), k1, k2)
            entry.update(time=t, bandwidth=bytes_per / t, completed=True)
        except Exception as e:                      # noqa: BLE001
            entry["error"] = str(e)[:200]
        result["blas"][op] = entry
    return result


def main(argv=None):
    p = base_parser("ginkgo_tpu blas benchmark")
    p.add_argument("-operations", type=str, default=",".join(OPS))
    args = p.parse_args(argv)
    if args.input is None:
        cases = [{"n": 1 << 20, "r": 1}]
    else:
        cases = load_cases(args)
    ops = [o.strip() for o in args.operations.split(",") if o.strip()]
    results = [run_case(c, ops, args) for c in cases]
    emit(results, args)
    return results


if __name__ == "__main__":
    main()
