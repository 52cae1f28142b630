"""App-level CLIs: edit pipeline and HTML viewer export."""

import base64
import os
import re

import numpy as np

from divshot_tpu.gsio.synthetic import random_scene
from divshot_tpu.gsio.io import save_model, load_model


def test_edit_cli_pipeline(rng, tmp_path):
    from divshot_tpu.apps.edit import main
    p = random_scene(rng, 400, sh_degree=1)
    src = str(tmp_path / "in.ply")
    save_model(src, p)

    out = str(tmp_path / "out.ply")
    rc = main(["--input", src,
               "--op", "select_sphere:0,0,0,0.5", "--op", "delete",
               "--op", "transform_translate:0,1,0",
               "--op", "compact", "--output", out])
    assert rc == 0
    q, _ = load_model(out)
    alive = int(np.asarray(q.alive).sum())
    means = np.asarray(p.means)
    expect = int((np.linalg.norm(means, axis=1) > 0.5).sum())
    assert alive == expect
    # translation applied
    qm = np.asarray(q.means)[np.asarray(q.alive)]
    keep = np.linalg.norm(means, axis=1) > 0.5
    np.testing.assert_allclose(qm.mean(0), means[keep].mean(0) + [0, 1, 0],
                               atol=1e-3)


def test_edit_cli_merge_and_stats(rng, tmp_path, capsys):
    from divshot_tpu.apps.edit import main
    a = random_scene(rng, 100, sh_degree=0, capacity=300)
    b = random_scene(rng, 50, sh_degree=0)
    pa, pb = str(tmp_path / "a.ply"), str(tmp_path / "b.ply")
    save_model(pa, a)
    save_model(pb, b)
    rc = main(["--input", pa, "--merge", pb, "--stats"])
    assert rc == 0
    outtxt = capsys.readouterr().out
    assert "splats: 150" in outtxt


def test_html_export(rng, tmp_path):
    from divshot_tpu.viewer.html_export import export_html
    p = random_scene(rng, 123, sh_degree=0)
    out = str(tmp_path / "view.html")
    export_html(out, p)
    html = open(out).read()
    assert "webgl2" in html
    assert "drawArraysInstanced" in html
    m = re.search(r'SPLAT_B64 = "([^"]+)"', html)
    raw = base64.b64decode(m.group(1))
    assert len(raw) == 123 * 32          # antimatter15 .splat records
    # positions in the embedded buffer match the params
    f32 = np.frombuffer(raw, np.float32).reshape(123, 8)
    np.testing.assert_allclose(f32[:, 0:3], np.asarray(p.means), rtol=1e-6)
