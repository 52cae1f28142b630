#!/bin/bash
# Round-5 quality legs (single real chip, serialized).
# r5 trainer runs ~5.4 it/s at this scale (Pallas expansion binning);
# auto_instance_capacity grows buffers from measured demand — no
# hand-tuned mult needed.
cd /root/repo
export PYTHONPATH=/root/.axon_site:/root/repo
DATA=runs/data/tpu_bricks
ARGS="--source_path $DATA --eval_every 2000 --checkpoint_every 2000 --white_background 1 --cap_max 262144"
set -x
# 1. ADC+ with the r5 densification fixes (scale2d split off, absgrad
#    paired with the 4x grow threshold)
python -u runs/train_wrap.py $ARGS --model_path runs/tpu_bricks_adc2 \
  --densify_strategy 2 > runs/tpu_bricks_adc2.log 2>&1
# 2. 2DGS surfel (Pallas kernels + r5 binning); 24K iters fit the round
#    budget; mesh export follows
python -u runs/train_wrap.py $ARGS --model_path runs/tpu_bricks_2dgs2 \
  --model_type 1 --num_iters 24000 > runs/tpu_bricks_2dgs2.log 2>&1
# 3. mesh from the trained 2DGS model (SuGaR-analog TSDF + marching tetra)
python -m divshot_tpu.apps.export \
  --input runs/tpu_bricks_2dgs2/point_cloud.ply \
  --output runs/tpu_bricks_2dgs2/mesh.obj --views 24 --mesh_resolution 192
