"""Device K-means for codebook quantization — the TPU-native replacement of
the reference's only open CUDA file (``external/tinygsplat/kmeans_cluster.cu``:
update-centers / update-ids kernels driving the reduced-PLY codebooks).

1-D scalar codebooks (what the reduced-PLY format uses): quantile init,
Lloyd iterations as pure JAX (argmin over a (M, K) distance matrix chunked
over M + segment-sum center update) — runs on TPU under jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from functools import partial


@partial(jax.jit, static_argnames=("k", "iters", "chunk"))
def kmeans_1d(values: jax.Array, *, k: int = 256, iters: int = 10,
              chunk: int = 1 << 16) -> tuple[jax.Array, jax.Array]:
    """values (M,) f32 -> (centers (k,), ids (M,) uint8/int32)."""
    m = values.shape[0]
    # quantile init over a sorted copy
    sv = jnp.sort(values)
    q = (jnp.arange(k, dtype=jnp.float32) + 0.5) / k
    centers = sv[jnp.clip((q * m).astype(jnp.int32), 0, m - 1)]

    m_pad = (m + chunk - 1) // chunk * chunk
    vpad = jnp.pad(values, (0, m_pad - m), constant_values=jnp.inf)
    vc = vpad.reshape(-1, chunk)

    def assign(centers):
        def one(vs):
            d = jnp.abs(vs[:, None] - centers[None, :])
            return jnp.argmin(d, axis=1).astype(jnp.int32)
        return jax.lax.map(one, vc).reshape(-1)[:m]

    def step(_, centers):
        ids = assign(centers)
        ssum = jnp.zeros((k,), jnp.float32).at[ids].add(values)
        cnt = jnp.zeros((k,), jnp.float32).at[ids].add(1.0)
        return jnp.where(cnt > 0, ssum / jnp.maximum(cnt, 1), centers)

    centers = jax.lax.fori_loop(0, iters, step, centers)
    ids = assign(centers)
    return centers, ids


def make_codebooks(d: dict[str, np.ndarray], *, k: int = 256,
                   iters: int = 10) -> dict[str, tuple[np.ndarray, np.ndarray]]:
    """Codebooks matching the reference dict keys
    (``tiny_gsplat.cpp:440-447``): feature_dc, feature_rest_0..14, opacity,
    scaling, rotation_re, rotation_im. Values -> (centers, ids)."""
    quats = d["quats"] / np.linalg.norm(d["quats"], axis=1,
                                        keepdims=True).clip(1e-12)
    jobs = {
        "feature_dc": d["sh0"].reshape(-1),
        "opacity": d["opacity"].reshape(-1),
        "scaling": d["scales"].reshape(-1),
        "rotation_re": quats[:, 0].copy(),
        "rotation_im": quats[:, 1:].reshape(-1),
    }
    n_sh = d["shN"].shape[1]
    for i in range(15):
        if i < n_sh:
            jobs[f"feature_rest_{i}"] = d["shN"][:, i, :].reshape(-1)
        else:
            jobs[f"feature_rest_{i}"] = np.zeros((1,), np.float32)
    out = {}
    for name, vals in jobs.items():
        c, ids = kmeans_1d(jnp.asarray(vals, jnp.float32), k=k, iters=iters)
        out[name] = (np.asarray(c), np.asarray(ids).astype(np.uint8))
    return out
