"""Microbenchmarks part 2: gather/scatter/sort scaling laws on the chip.

Arrays are passed as jit ARGUMENTS (closure-captured device arrays get
embedded as HLO literals and blow the remote-compile size limit)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def log(msg):
    print(msg, file=sys.stderr, flush=True)


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


def main():
    import jax
    import jax.numpy as jnp
    from divshot_tpu.core.cache import enable_compile_cache

    enable_compile_cache()
    CAP = 1 << 23
    rng = np.random.default_rng(0)
    results = {}

    def report(name, sec):
        results[name] = sec * 1e3
        log(f"{name:46s} {sec*1e3:9.2f} ms")

    def timer(body, *arrays):
        """body(acc, *arrays) -> scalar; arrays passed as jit args."""
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(arrays, *, k):
            def sbody(acc, _):
                return body(acc, *arrays), ()
            acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=k)
            return acc
        return slope_time(lambda k: (lambda: run(arrays, k=k)))

    def di(acc):
        return jnp.int32(acc * 1e-20)

    # 1. gather: cap indices from (Nsrc, width) — source size sweep
    for nsrc_log in (16, 18, 20, 21):
        nsrc = 1 << nsrc_log
        idx = jnp.asarray(rng.integers(0, nsrc, CAP), jnp.int32)
        for width in (4, 8, 16):
            src = jnp.asarray(rng.standard_normal((nsrc, width)), jnp.float32)

            def f_g(acc, src, idx, nsrc=nsrc):
                r = jnp.take(src, jnp.clip(idx + di(acc), 0, nsrc - 1),
                             axis=0)
                return acc + r[0, 0] * 1e-9
            report(f"gather cap rows from (2^{nsrc_log},{width})f32",
                   timer(f_g, src, idx))

    # 2. perm row-gather: (cap,16) from (cap,16) — the bwd permutation
    perm = jnp.asarray(rng.permutation(CAP), jnp.int32)
    big = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)

    def f_perm(acc, big, perm):
        r = jnp.take(big, jnp.clip(perm + di(acc), 0, CAP - 1), axis=0)
        return acc + r[0, 0] * 1e-9
    report("perm row-gather (cap,16) from (cap,16)", timer(f_perm, big, perm))

    # 3. sort payload scaling at cap
    key = jnp.asarray(rng.integers(0, 1 << 31, CAP), jnp.uint32)
    pays = [jnp.asarray(rng.standard_normal(CAP), jnp.float32)
            for _ in range(12)]
    for npay in (4, 6, 8, 12):
        def f_s(acc, key, *pp):
            out = jax.lax.sort((key + jnp.uint32(di(acc)), *pp), num_keys=1)
            return acc + out[1][0] * 1e-9 + out[-1][0] * 1e-9
        report(f"sort key+{npay} f32 payloads (cap)",
               timer(f_s, key, *pays[:npay]))

    # 4. scatter of N rows to sorted positions in cap (+flags)
    N = 1 << 20
    rows = jnp.asarray(rng.standard_normal((N, 3)), jnp.float32)
    pos = jnp.sort(jnp.asarray(
        rng.choice(CAP, N, replace=False), jnp.int32))

    def f_scat(acc, rows, pos):
        r = jnp.zeros((CAP, 3), jnp.float32).at[pos + di(acc)].set(
            rows, mode="drop", indices_are_sorted=True, unique_indices=True)
        return acc + r[0, 0] * 1e-9
    report("scatter N rows->cap sorted+unique flags", timer(f_scat, rows, pos))

    def f_scat2(acc, rows, pos):
        r = jnp.zeros((CAP, 3), jnp.float32).at[pos + di(acc)].set(
            rows, mode="drop")
        return acc + r[0, 0] * 1e-9
    report("scatter N rows->cap no flags", timer(f_scat2, rows, pos))

    # 5. segment_sum over sorted ids: cap rows -> N segments
    ids_sorted = jnp.sort(jnp.asarray(rng.integers(0, N, CAP), jnp.int32))
    vals16 = jnp.asarray(rng.standard_normal((CAP, 16)), jnp.float32)

    def f_seg(acc, vals16, ids_sorted):
        r = jax.ops.segment_sum(vals16 + acc * 1e-20, ids_sorted,
                                num_segments=N, indices_are_sorted=True)
        return acc + r[0, 0] * 1e-9
    report("segment_sum sorted (cap,16)->(N,16)", timer(f_seg, vals16,
                                                        ids_sorted))

    # 6. cumsum (cap, 16) axis=0 vs (16, cap) axis=1
    def f_cs0(acc, vals16):
        r = jnp.cumsum(vals16 + acc * 1e-20, axis=0)
        return acc + r[-1, 0] * 1e-9
    report("cumsum (cap,16) axis=0", timer(f_cs0, vals16))

    # 7. fine gather: N rows from (cap, 16) big source
    fidx = jnp.asarray(rng.integers(0, CAP, N), jnp.int32)

    def f_fine(acc, big, fidx):
        r = jnp.take(big, jnp.clip(fidx + di(acc), 0, CAP - 1), axis=0)
        return acc + r[0, 0] * 1e-9
    report("fine gather N rows from (cap,16)", timer(f_fine, big, fidx))

    import json
    print(json.dumps({k: round(v, 3) for k, v in results.items()}, indent=1))


if __name__ == "__main__":
    main()
