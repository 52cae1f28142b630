#!/bin/bash
# Post-2DGS-leg artifact chain (single chip, serialized):
#   trained 2DGS PLY -> TSDF/marching-tetra mesh -> shaded turntable,
#   then the round's on-chip smoke gate (runs/TPU_SMOKE_r05.json).
set -x
cd /root/repo
export PYTHONPATH=/root/repo:/root/.axon_site
M=runs/tpu_bricks_2dgs2
python -m divshot_tpu.apps.export \
  --input $M/point_cloud.ply --output $M/mesh.obj \
  --views 24 --mesh_resolution 192 > $M/mesh_export.log 2>&1
python runs/mesh_turntable.py $M/mesh.obj $M/turntable 8 \
  >> $M/mesh_export.log 2>&1
python runs/tpu_smoke.py > runs/tpu_smoke_r05.log 2>&1
