"""Render a turntable of an extracted mesh (the 2DGS mesh-export proof):
G-buffer raster + directional shading, N orbit views -> PNGs + contact
sheet. Usage: python runs/mesh_turntable.py mesh.obj outdir [n_views]"""

import os
import sys

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax.numpy as jnp
    from PIL import Image
    from divshot_tpu.gsio.mesh_io import load_mesh
    from divshot_tpu.gsio.synthetic import orbit_cameras
    from divshot_tpu.raster.mesh_raster import rasterize_mesh, shade_gbuffer

    mesh_path, outdir = sys.argv[1], sys.argv[2]
    n_views = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    os.makedirs(outdir, exist_ok=True)

    mesh = load_mesh(mesh_path)
    pos = np.asarray(mesh.positions, np.float32)
    faces = np.asarray(mesh.faces, np.int32)
    center = pos.mean(0)
    pos = pos - center
    extent = float(np.abs(pos).max())
    radius = 2.6 * extent
    print(f"mesh: {len(pos)} verts {len(faces)} faces extent {extent:.3f}")

    cams = orbit_cameras(n_views, radius=radius, width=512, height_px=512)
    frames = []
    for i, cam in enumerate(cams):
        gb = rasterize_mesh(jnp.asarray(pos), jnp.asarray(faces), cam)
        img = shade_gbuffer(gb)
        arr = np.asarray(jnp.clip(img, 0, 1) * 255).astype(np.uint8)
        Image.fromarray(arr).save(os.path.join(outdir, f"turn_{i:02d}.png"))
        frames.append(arr)
        print(f"view {i} done", flush=True)

    sheet = np.concatenate(
        [np.concatenate(frames[: n_views // 2], axis=1),
         np.concatenate(frames[n_views // 2:], axis=1)], axis=0)
    Image.fromarray(sheet).save(os.path.join(outdir, "turntable.png"))
    print(f"wrote {outdir}/turntable.png")


if __name__ == "__main__":
    main()
