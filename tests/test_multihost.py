"""Multi-host (DCN) training: 2 real OS processes, each with 4 virtual CPU
devices, coordinated via ``jax.distributed`` — the CI-able stand-in for an
N-host TPU pod (SURVEY §5.8, BASELINE config #5). Each process loads only
its own image shard; the global batch is assembled from process-local data
and the losses must agree bitwise across hosts (SPMD determinism)."""

import os
import socket
import subprocess
import sys

import numpy as np

_WORKER = r"""
import os, sys
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]

import numpy as np
from divshot_tpu.core.config import TrainConfig
from divshot_tpu.dist.multihost import (
    init_multihost, host_view_shard, MultiHostTrainer)
from divshot_tpu.train.trainer import Dataset
from divshot_tpu.gsio.synthetic import random_scene, orbit_cameras, \
    render_gt_images

init_multihost(f"localhost:{port}", num_processes=2, process_id=pid)
assert jax.process_count() == 2 and len(jax.devices()) == 8

rng = np.random.default_rng(0)            # same scene on every host
gt = random_scene(rng, 256, sh_degree=0)
cams = orbit_cameras(8, width=32)
# every host renders only ITS shard of gt images (host-local loading)
mine = host_view_shard(8)
assert len(mine) == 4 and (mine % 2 == pid).all()
local_images = {}
for v in mine:
    img = render_gt_images(gt, [cams[v]], backend="tiles")[0]
    local_images[int(v)] = (np.clip(img, 0, 1) * 255).astype(np.uint8)

# global dataset: cameras replicated, images placeholder (streamed path)
ph = np.zeros((8, 32, 32, 3), np.uint8)
ds = Dataset.from_views(cams, ph, stream=True)

cfg = TrainConfig(sh_degree=0, num_iters=4)
cfg.densify.cap_max = 256
cfg.densify.warmup_length = 100
params = random_scene(np.random.default_rng(1), 256, sh_degree=0,
                      capacity=256)
tr = MultiHostTrainer(cfg, ds, params, mine,
                      [local_images[int(v)] for v in mine],
                      render_kwargs={"backend": "tiles"})
for i in range(3):
    m = tr.step_once()
    print(f"LOSS {i} {float(m['loss']):.9f}", flush=True)
print("ALIVE", int(m["num_alive"]), flush=True)
"""


def test_two_process_training(tmp_path):
    wf = tmp_path / "worker.py"
    wf.write_text(_WORKER)
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["PYTHONPATH"] = os.pathsep.join(
        [os.path.dirname(os.path.dirname(os.path.abspath(__file__)))]
        + env.get("PYTHONPATH", "").split(os.pathsep))
    procs = [subprocess.Popen([sys.executable, str(wf), str(i), str(port)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, env=env, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=600)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out}"
    losses = []
    for out in outs:
        ls = [line.split()[2] for line in out.splitlines()
              if line.startswith("LOSS")]
        assert len(ls) == 3, out
        losses.append(ls)
        assert all(np.isfinite(float(x)) for x in ls)
    # SPMD: both hosts computed the identical global loss, step for step
    assert losses[0] == losses[1], losses
