"""Headless splat editing CLI — the scriptable counterpart of the
reference editor's splat tools (selection / delete / crop / transform /
paint / merge, ``splat_edit_op.h:8-130``, ``gaussian_edit.cpp:313-515``).

Operations apply in order, each as ``op:arg1,arg2,...``:

  python -m divshot_tpu.apps.edit --input in.ply --output out.ply \\
      --op select_sphere:0,0,0,1.5 --op select_inverse --op delete \\
      --op crop_box:-2,-2,-2,2,2,2 \\
      --op transform_translate:0,1,0 --op transform_scale:2 \\
      --op transform_rotate_y:45 --op paint:1,0,0 --op compact

  # merge another model, export an HTML viewer
  python -m divshot_tpu.apps.edit --input a.ply --merge b.ply \\
      --output merged.spz --html view.html
"""

from __future__ import annotations

import sys

import numpy as np


def _floats(arg: str) -> list[float]:
    return [float(x) for x in arg.split(",")] if arg else []


def apply_op(sess, op: str) -> None:
    from divshot_tpu.edit.ops import OP_SET
    name, _, arg = op.partition(":")
    v = _floats(arg)
    if name == "select_all":
        sess.select_all()
    elif name == "select_none":
        sess.select_none()
    elif name == "select_inverse":
        sess.select_inverse()
    elif name == "select_sphere":
        sess.select_sphere(v[:3], v[3])
    elif name == "select_box":
        sess.select_box(v[:3], v[3:6])
    elif name == "delete":
        sess.delete_selected()
    elif name == "hide":
        sess.hide_selected()
    elif name == "unhide":
        sess.unhide_all()
    elif name == "paint":
        sess.paint_selected(v[:3])
    elif name == "crop_box":
        sess.apply_crop([{"type": "box", "lo": v[:3], "hi": v[3:6]}])
    elif name == "crop_sphere":
        sess.apply_crop([{"type": "sphere", "center": v[:3],
                          "radius": v[3]}])
    elif name == "transform_translate":
        m = np.eye(4, dtype=np.float32)
        m[:3, 3] = v[:3]
        sess.select_all()
        sess.transform_selected(m)
    elif name == "transform_scale":
        m = np.eye(4, dtype=np.float32)
        m[:3, :3] *= v[0]
        sess.select_all()
        sess.transform_selected(m)
    elif name in ("transform_rotate_x", "transform_rotate_y",
                  "transform_rotate_z"):
        th = np.radians(v[0])
        c, s = np.cos(th), np.sin(th)
        m = np.eye(4, dtype=np.float32)
        axis = name[-1]
        if axis == "x":
            m[1:3, 1:3] = [[c, -s], [s, c]]
        elif axis == "y":
            m[0, 0], m[0, 2], m[2, 0], m[2, 2] = c, s, -s, c
        else:
            m[0:2, 0:2] = [[c, -s], [s, c]]
        sess.select_all()
        sess.transform_selected(m)
    elif name == "compact":
        sess.compact()
    elif name == "undo":
        sess.undo()
    elif name == "redo":
        sess.redo()
    else:
        raise SystemExit(f"unknown op: {name}")


def main(argv=None) -> int:
    import argparse
    from divshot_tpu.gsio.io import load_model, save_model
    from divshot_tpu.edit.ops import EditSession

    p = argparse.ArgumentParser("divshot-tpu edit")
    p.add_argument("--input", required=True)
    p.add_argument("--output", default="")
    p.add_argument("--merge", action="append", default=[],
                   help="additional models to merge in")
    p.add_argument("--op", action="append", default=[],
                   help="edit op, e.g. select_sphere:0,0,0,1 delete")
    p.add_argument("--html", default="", help="export an HTML viewer")
    p.add_argument("--stats", action="store_true",
                   help="print splat statistics and exit")
    ns = p.parse_args(argv)

    params, meta = load_model(ns.input)
    sess = EditSession(params)
    for path in ns.merge:
        other, _ = load_model(path)
        sess.merge(other)
    for op in ns.op:
        apply_op(sess, op)

    vis = sess.visible_params()
    if ns.stats:
        m = np.asarray(vis.means)
        alive = int(np.asarray(vis.alive).sum())
        print(f"splats: {alive} (capacity {vis.capacity})")
        if alive:
            a = np.asarray(vis.alive)
            print(f"bounds: {m[a].min(0)} .. {m[a].max(0)}")
        return 0

    if ns.output:
        save_model(ns.output, vis,
                   antialiased=bool(meta.get("antialiased", False)))
        print(f"saved {ns.output}")
    if ns.html:
        from divshot_tpu.viewer.html_export import export_html
        export_html(ns.html, vis)
        print(f"saved {ns.html}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
