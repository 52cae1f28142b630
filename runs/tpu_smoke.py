"""On-chip smoke gate (VERDICT r4 #7): runs on the REAL TPU every round.

Checks, all on hardware (the pytest suite forces CPU + interpret mode):
1. Pallas raster fwd/bwd vs the XLA 'tiles' oracle at small scale —
   image parity and gradient parity;
2. r5 Pallas binning vs XLA binning — bit-exact counts + image parity;
3. one full train step produces finite loss and updated params;
4. one render_fast frame (fresh bins + cached bins, bit-identical).

Writes runs/TPU_SMOKE_r{round}.json with pass/fail + metrics.
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    assert jax.default_backend() == "tpu", "run this on the TPU host"
    from divshot_tpu.core.cache import enable_compile_cache
    enable_compile_cache()
    from divshot_tpu.gsio.synthetic import (random_scene, orbit_cameras,
                                            render_gt_images)
    from divshot_tpu.raster.render import render, render_fast
    from divshot_tpu.train.trainer import Dataset, TrainState, \
        make_train_step
    from divshot_tpu.train.optim import AdamState
    from divshot_tpu.train import strategy as S
    from divshot_tpu.core.config import TrainConfig

    out = {"backend": str(jax.devices()[0]), "checks": {}, "ok": True}

    def check(name, fn):
        t0 = time.time()
        try:
            info = fn() or {}
            out["checks"][name] = {"ok": True, "sec": round(time.time() - t0, 1),
                                   **info}
            print(f"PASS {name} ({time.time()-t0:.1f}s) {info}", flush=True)
        except Exception as e:
            out["checks"][name] = {"ok": False, "error": str(e)[:500]}
            out["ok"] = False
            print(f"FAIL {name}: {e}", flush=True)

    rng = np.random.default_rng(0)
    params = random_scene(rng, 5000, sh_degree=2)
    cam = orbit_cameras(1, width=256, height_px=192)[0]

    def parity():
        def loss_of(binning, backend):
            def f(fields):
                p = params.replace(**fields)
                o = render(p, cam, backend=backend, binning=binning,
                           instance_capacity=1 << 17)
                return jnp.sum(o.image ** 2) + jnp.sum(o.alpha), o.image
            fields = {f2: getattr(params, f2)
                      for f2 in ("means", "scales", "quats", "sh0",
                                 "opacity")}
            (l, img), g = jax.jit(jax.value_and_grad(
                f, has_aux=True))(fields)
            return float(l), np.asarray(img), jax.tree.map(np.asarray, g)

        l_p, img_p, g_p = loss_of("pallas", "pallas")
        l_x, img_x, g_x = loss_of("xla", "pallas")
        l_t, img_t, g_t = loss_of("xla", "tiles")
        img_err_bin = float(np.abs(img_p - img_x).max())
        img_err_oracle = float(np.abs(img_p - img_t).max())
        g_err = max(float(np.abs(g_p[k] - g_t[k]).max())
                    for k in g_p)
        assert img_err_bin < 3e-5, f"binning image err {img_err_bin}"
        assert img_err_oracle < 3e-3, f"oracle image err {img_err_oracle}"
        assert g_err < 3e-2, f"grad err vs tiles oracle {g_err}"
        return {"img_err_bin": img_err_bin,
                "img_err_oracle": img_err_oracle, "grad_err": g_err}

    check("pallas_vs_oracle_parity", parity)

    def train_step():
        gt = random_scene(rng, 3000, sh_degree=1)
        cams = orbit_cameras(4, width=128)
        images = render_gt_images(gt, cams, backend="pallas",
                                  instance_capacity=1 << 16)
        ds = Dataset.from_views(cams, images)
        cfg = TrainConfig(sh_degree=1)
        cfg.densify.cap_max = params.capacity
        step = jax.jit(make_train_step(
            cfg, ds, {"backend": "pallas", "instance_capacity": 1 << 17}),
            donate_argnums=(0,))
        st = TrainState(params=params, opt=AdamState.init(params),
                        dstate=S.DensifyState.init(params.capacity),
                        key=jax.random.PRNGKey(0))
        st, m = step(st, jnp.int32(0))
        l0 = float(m["loss"])
        for i in range(1, 6):
            st, m = step(st, jnp.int32(i % 4))
        l1 = float(m["loss"])
        assert np.isfinite(l0) and np.isfinite(l1)
        return {"loss0": round(l0, 5), "loss5": round(l1, 5)}

    check("train_step_finite", train_step)

    def fast_frame():
        img, alpha, bins = render_fast(params, cam,
                                       instance_capacity=1 << 18,
                                       params_token=0)
        img2, _, _ = render_fast(params, cam, bins=bins,
                                 instance_capacity=1 << 18, params_token=0)
        d = float(jnp.max(jnp.abs(img - img2)))
        assert d == 0.0, f"cached-bins frame differs by {d}"
        assert bool(jnp.isfinite(img).all())
        return {"cached_identical": True}

    check("render_fast_frame", fast_frame)

    rnd = sys.argv[1] if len(sys.argv) > 1 else "05"
    path = f"runs/TPU_SMOKE_r{rnd}.json"
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(("SMOKE OK " if out["ok"] else "SMOKE FAILED ") + path)
    sys.exit(0 if out["ok"] else 1)


if __name__ == "__main__":
    main()
