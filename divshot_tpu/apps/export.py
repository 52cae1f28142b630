"""Export CLI: convert between splat formats and extract meshes (the
reference's Export menu: ply / compressed ply / splat / spz / dvsplat /
reduced ply / mesh — ``gaussian_model.cpp:440-470``).

  python -m divshot_tpu.apps.export --input m.ply --output m.spz
  python -m divshot_tpu.apps.export --input m.ply --output mesh.obj --views 24
"""

from __future__ import annotations

import argparse
import sys

import numpy as np


def main(argv=None):
    p = argparse.ArgumentParser("divshot-tpu export")
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--antialiased", action="store_true")
    p.add_argument("--views", type=int, default=24,
                   help="cameras for mesh extraction")
    p.add_argument("--mesh_resolution", type=int, default=128)
    ns = p.parse_args(argv)

    from divshot_tpu.gsio.io import load_model, save_model

    params, meta = load_model(ns.input)
    print(f"loaded {int(np.asarray(params.alive).sum())} splats")
    aa = ns.antialiased or meta.get("antialiased", False)

    if ns.output.endswith(".obj"):
        from divshot_tpu.viewer.mesh import extract_mesh
        from divshot_tpu.gsio.synthetic import orbit_cameras
        d = params.compact_numpy()
        extent = float(np.abs(d["means"] - d["means"].mean(0)).max())
        cams = orbit_cameras(ns.views, radius=max(2.5 * extent, 1.0),
                             width=512)
        verts, faces = extract_mesh(
            params, cams, resolution=ns.mesh_resolution, out_path=ns.output,
            render_kw={"instance_capacity": 1 << 20})
        print(f"wrote {ns.output}: {len(verts)} verts, {len(faces)} faces")
    else:
        save_model(ns.output, params, antialiased=aa)
        print(f"wrote {ns.output}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
