"""A/B bench: r4 XLA-binning pallas path vs r5 integrated Pallas binning.

Measures fwd-only and fwd+bwd wall time at 1M@1080p (slope timing)."""

import functools
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


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
    from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras
    from divshot_tpu.raster.render import render

    enable_compile_cache()
    CAP = 1 << 23
    W, H = 1920, 1080
    rng = np.random.default_rng(0)
    params = random_scene(rng, 1_000_000, sh_degree=3, capacity=1 << 20,
                          scale_range=(0.004, 0.025))
    cam = orbit_cameras(1, width=W, height_px=H)[0]
    fields = {f: getattr(params, f)
              for f in ("means", "scales", "quats", "sh0", "shN", "opacity")}

    def timer(body):
        @functools.partial(jax.jit, static_argnames=("k",))
        def run(fields, *, k):
            def sbody(acc, _):
                return body(acc, fields), ()
            acc, _ = jax.lax.scan(sbody, jnp.float32(0.0), None, length=k)
            return acc
        return slope_time(lambda k: (lambda: run(fields, k=k)))

    for binning in ("pallas", "xla"):
        def fwd_body(acc, fl, binning=binning):
            p = params.replace(means=fl["means"] + acc * 1e-20,
                               **{f: fl[f] for f in fl if f != "means"})
            out = render(p, cam, backend="pallas", binning=binning,
                         instance_capacity=CAP, with_absgrad=False)
            return acc + out.image[0, 0, 0] * 1e-9 \
                + out.num_instances.astype(jnp.float32) * 1e-12

        def fb_body(acc, fl, binning=binning):
            def loss(fl2):
                p = params.replace(**fl2)
                out = render(p, cam, backend="pallas", binning=binning,
                             instance_capacity=CAP, with_absgrad=False)
                return jnp.sum(out.image[::8, ::8]) * 1e-9
            l, g = jax.value_and_grad(loss)(
                {**fl, "means": fl["means"] + acc * 1e-20})
            return acc + l + g["means"][0, 0] * 1e-9

        t_f = timer(fwd_body)
        print(f"{binning}: fwd {t_f*1e3:8.2f} ms", flush=True)
        t_fb = timer(fb_body)
        print(f"{binning}: fwd+bwd {t_fb*1e3:8.2f} ms "
              f"({1.0/t_fb:.2f} it/s raster-only)", flush=True)


if __name__ == "__main__":
    main()
