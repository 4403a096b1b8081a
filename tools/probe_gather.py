"""Probe Mosaic dynamic_gather support + throughput on the real chip.

Checks whether jnp.take_along_axis lowers inside Pallas (lane/sublane),
whether int16 index streams work, and measures the select-accumulate
hierarchical gather throughput that the windowed-ELL SpMV kernel relies on.
"""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(f, *args, reps=3):
    jax.block_until_ready(f(*args))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def probe_lane_gather(shape=(8, 128), interpret=False):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=1)

    t = jnp.arange(shape[0] * shape[1], dtype=jnp.float32).reshape(shape)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, shape[1], shape), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )(t, idx)
    ref = np.take_along_axis(np.asarray(t), np.asarray(idx), axis=1)
    ok = np.array_equal(np.asarray(out), ref)
    return ok


def probe_sublane_gather(shape=(8, 128), interpret=False):
    def kernel(t_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(t_ref[:], i_ref[:], axis=0)

    t = jnp.arange(shape[0] * shape[1], dtype=jnp.float32).reshape(shape)
    rng = np.random.default_rng(0)
    idx = jnp.asarray(rng.integers(0, shape[0], shape), jnp.int32)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(shape, jnp.float32),
        interpret=interpret,
    )(t, idx)
    ref = np.take_along_axis(np.asarray(t), np.asarray(idx), axis=0)
    ok = np.array_equal(np.asarray(out), ref)
    return ok


def probe_i16(interpret=False):
    def kernel(c_ref, o_ref):
        o_ref[:] = (c_ref[:].astype(jnp.int32) & 127)

    c = jnp.asarray(np.random.default_rng(0).integers(0, 2048, (8, 128)),
                    jnp.int16)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32),
        interpret=interpret,
    )(c)
    return np.array_equal(np.asarray(out), np.asarray(c).astype(np.int32) & 127)


def bench_gather_select(H=4, W_iters=2000):
    """Core inner loop cost: per (8,128) idx vreg, H x (splat+gather+cmp+sel)."""
    def kernel(win_ref, sub_ref, lane_ref, o_ref):
        def body(i, acc):
            g = jnp.zeros((8, 128), jnp.float32)
            for h in range(H):
                row = win_ref[h, :][None, :]          # (1,128)
                tb = jnp.broadcast_to(row, (8, 128))
                gh = jnp.take_along_axis(tb, lane_ref[:], axis=1)
                g = jnp.where(sub_ref[:] == h, gh, g)
            return acc + g * (1.0 + i * 0.0)
        o_ref[:] = jax.lax.fori_loop(0, W_iters, body,
                                     jnp.zeros((8, 128), jnp.float32))

    win = jnp.ones((H, 128), jnp.float32)
    rng = np.random.default_rng(0)
    sub = jnp.asarray(rng.integers(0, H, (8, 128)), jnp.int32)
    lane = jnp.asarray(rng.integers(0, 128, (8, 128)), jnp.int32)
    f = jax.jit(lambda w, s, l: pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(w, s, l))
    t1 = timeit(f, win, sub, lane)
    # differencing: double iters
    def kernel2(win_ref, sub_ref, lane_ref, o_ref):
        def body(i, acc):
            g = jnp.zeros((8, 128), jnp.float32)
            for h in range(H):
                row = win_ref[h, :][None, :]
                tb = jnp.broadcast_to(row, (8, 128))
                gh = jnp.take_along_axis(tb, lane_ref[:], axis=1)
                g = jnp.where(sub_ref[:] == h, gh, g)
            return acc + g * (1.0 + i * 0.0)
        o_ref[:] = jax.lax.fori_loop(0, 2 * W_iters, body,
                                     jnp.zeros((8, 128), jnp.float32))
    f2 = jax.jit(lambda w, s, l: pl.pallas_call(
        kernel2,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.float32),
    )(w, s, l))
    t2 = timeit(f2, win, sub, lane)
    per_iter = (t2 - t1) / W_iters
    per_el = per_iter / 1024
    return per_iter * 1e9, per_el * 1e12  # ns/iter, ps/element


if __name__ == "__main__":
    print("backend:", jax.default_backend())
    for name, fn in [("lane (8,128)", probe_lane_gather),
                     ("sublane (8,128)",
                      probe_sublane_gather)]:
        try:
            ok = fn()
            print(f"{name}: compiled ok, correct={ok}")
        except Exception as e:  # noqa
            print(f"{name}: FAIL {type(e).__name__}: {str(e)[:200]}")
    # larger shapes
    for shape in [(32, 128), (8, 256), (8, 512), (16, 128)]:
        try:
            ok = probe_lane_gather(shape)
            print(f"lane {shape}: ok correct={ok}")
        except Exception as e:  # noqa
            print(f"lane {shape}: FAIL {str(e)[:120]}")
    for shape in [(32, 128), (16, 128)]:
        try:
            ok = probe_sublane_gather(shape)
            print(f"sublane {shape}: ok correct={ok}")
        except Exception as e:  # noqa
            print(f"sublane {shape}: FAIL {str(e)[:120]}")
    try:
        print("int16 stream:", probe_i16())
    except Exception as e:  # noqa
        print("int16: FAIL", str(e)[:120])
    for H in (1, 2, 4, 8, 16):
        ns, ps = bench_gather_select(H)
        print(f"H={H}: {ns:.1f} ns/vreg-iter, {ps:.2f} ps/element")
