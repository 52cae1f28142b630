"""Probe: does Mosaic support a fast per-lane dynamic gather from a
VMEM-resident table inside a Pallas kernel? If yes, feature-table builds
and grad permutations can run as chunked VMEM gathers at far better than
XLA's ~6-34 ns/row HBM gather.

Tries several formulations; prints which compile on TPU and their speed.
"""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def slope_time(make_run, k_lo=2, k_hi=8, reps=3):
    def wall(fn):
        float(np.asarray(fn()))
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            float(np.asarray(fn()))
            ts.append(time.perf_counter() - t0)
        return min(ts)
    t_lo = wall(make_run(k_lo))
    t_hi = wall(make_run(k_hi))
    return (t_hi - t_lo) / (k_hi - k_lo)


R = 1 << 15          # table rows (VMEM resident: R x 8 f32 = 1 MB)
I = 1 << 22          # gathers
BLK = 2048           # indices per grid step


def make_kernel(mode):
    def kernel(tab_ref, idx_ref, out_ref):
        idx = idx_ref[...].reshape(1, BLK)        # (1, BLK) i32
        if mode == "fancy_rows":
            # gather rows of (R, 8): out (BLK, 8)
            out_ref[0] = tab_ref[idx[0], :]
        elif mode == "take_rows":
            out_ref[0] = jnp.take(tab_ref[...], idx[0], axis=0)
        elif mode == "lane_gather":
            # table (8, R) lanes-major; gather along lanes: out (8, BLK)
            tab = tab_ref[...]
            out_ref[0] = jnp.take(tab, idx[0], axis=1)
        elif mode == "take_along":
            tab = tab_ref[...]                    # (8, R)
            ii = jnp.broadcast_to(idx, (8, BLK))
            out_ref[0] = jnp.take_along_axis(tab, ii, axis=1)
    return kernel


def try_mode(mode):
    rows_major = mode in ("fancy_rows", "take_rows")
    tab_shape = (R, 8) if rows_major else (8, R)
    out_shape = (BLK, 8) if rows_major else (8, BLK)
    rng = np.random.default_rng(0)
    tab = jnp.asarray(rng.standard_normal(tab_shape), jnp.float32)
    idx = jnp.asarray(rng.integers(0, R, (I // BLK, 8, BLK // 8)), jnp.int32)

    grid = (I // BLK,)
    fn = pl.pallas_call(
        make_kernel(mode),
        grid=grid,
        in_specs=[
            pl.BlockSpec(tab_shape, lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, BLK // 8), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1,) + out_shape, lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((I // BLK,) + out_shape, jnp.float32),
    )

    def wrapped(tab, idx):
        return fn(tab, idx)

    # correctness
    out = np.asarray(jax.jit(wrapped)(tab, idx))
    tnp = np.asarray(tab)
    inp = np.asarray(idx)
    if rows_major:
        ref = tnp[inp.reshape(-1)].reshape(I // BLK, BLK, 8)
    else:
        ref = tnp[:, inp.reshape(-1)].reshape(
            8, I // BLK, BLK).transpose(1, 0, 2)
    ok = np.allclose(out, ref)

    @functools.partial(jax.jit, static_argnames=("k",))
    def run(tab, idx, *, k):
        def body(acc, _):
            out = wrapped(tab + acc * 1e-20, idx)
            return acc + out.reshape(-1)[0] * 1e-9, ()
        acc, _ = jax.lax.scan(body, jnp.float32(0.0), None, length=k)
        return acc

    dt = slope_time(lambda k: (lambda: run(tab, idx, k=k)))
    ns_per = dt / I * 1e9
    print(f"{mode:12s} ok={ok} {dt*1e3:8.2f} ms for 2^22 gathers "
          f"({ns_per:.2f} ns/row)", flush=True)


if __name__ == "__main__":
    for mode in ("lane_gather", "take_along", "fancy_rows", "take_rows"):
        try:
            try_mode(mode)
        except Exception as e:
            print(f"{mode:12s} FAILED: {str(e)[:300]}", flush=True)
