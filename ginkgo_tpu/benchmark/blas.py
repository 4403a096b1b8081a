"""Dense BLAS-1/2 benchmark (``benchmark/blas`` analog): axpy, scal, dot,
norm, gemv-style apply."""

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
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        return jax.lax.fori_loop(
                            0, K, lambda _, z: x * 1.0001 + z, y).sum()
                    return f
                bytes_moved, flops = 3 * n * r * 4, 2 * n * r
            elif op == "scal":
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        return jax.lax.fori_loop(
                            0, K, lambda _, z: z * 1.0001, y).sum()
                    return f
                bytes_moved, flops = 2 * n * r * 4, n * r
            elif op == "copy":
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        return jax.lax.fori_loop(
                            0, K, lambda _, z: z + 0.0, y).sum()
                    return f
                bytes_moved, flops = 2 * n * r * 4, 0
            elif op == "dot":
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        def body(_, c):
                            z, acc = c
                            return z, acc + jnp.sum(x * z, axis=0)
                        _, acc = jax.lax.fori_loop(0, K, body,
                                                   (y, jnp.zeros((r,))))
                        return acc.sum()
                    return f
                bytes_moved, flops = 2 * n * r * 4, 2 * n * r
            elif op == "norm2":
                def mk(K):
                    @jax.jit
                    def f(x, y):
                        def body(_, c):
                            z, acc = c
                            return z, acc + jnp.linalg.norm(z, axis=0)
                        _, acc = jax.lax.fori_loop(0, K, body,
                                                   (y, jnp.zeros((r,))))
                        return acc.sum()
                    return f
                bytes_moved, flops = n * r * 4, 2 * n * r
            else:
                raise ValueError(op)
            t = time_chained(mk, (x, y), k1, k2)
            entry.update(time=t, bandwidth=bytes_moved / t,
                         flops=flops / t, completed=True)
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
