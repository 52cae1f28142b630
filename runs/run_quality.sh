#!/bin/bash
# Quality-proof driver (VERDICT r2 item 2): 30K-iter runs on the
# tpu-bricks scene at 800^2, serialized on the single real TPU chip.
#
# cap_max 262144 with instance_capacity_mult 32 (instance buffers 2^23):
# measured tile-instance demand on this scene is ~5-8M — the default
# mult 8 (2^21) silently dropped ~70% of instances and diverged training.
cd /root/repo
DATA=runs/data/tpu_bricks
ARGS="--source_path $DATA --eval_every 2000 --white_background 1 --cap_max 262144 --instance_capacity_mult 32"
set -x
# 1. MCMC (reference CLI default strategy)
timeout 14000 python -u runs/train_wrap.py $ARGS \
  --model_path runs/tpu_bricks_mcmc > runs/tpu_bricks_mcmc.log 2>&1
# 2. 2DGS surfel (Pallas kernels), same scene
timeout 14000 python -u runs/train_wrap.py $ARGS \
  --model_path runs/tpu_bricks_2dgs --model_type 1 \
  > runs/tpu_bricks_2dgs.log 2>&1
# 3. ADC+ (absgrad + revised opacity)
timeout 14000 python -u runs/train_wrap.py $ARGS \
  --model_path runs/tpu_bricks_adc --densify_strategy 2 \
  > runs/tpu_bricks_adc.log 2>&1
echo DONE_ALL
