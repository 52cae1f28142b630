#!/bin/bash
# Quality-proof driver (VERDICT r2 item 2): 30K-iter runs on the
# tpu-bricks scene at 800^2, serialized on the single real TPU chip.
#
# cap_max 262144: the axon remote compiler scales superlinearly with
# buffer capacity (233 s compile at 2M instance capacity, ~hours at the
# 16M the default 2M-splat cap implies); 256K splats is ample for this
# lego-class scene and keeps the instance buffers at 2^21.
cd /root/repo
DATA=runs/data/tpu_bricks
ARGS="--source_path $DATA --eval_every 2000 --white_background 1 --cap_max 262144"
set -x
# 1. MCMC (reference CLI default strategy)
timeout 14000 python -u runs/train_wrap.py $ARGS \
  --model_path runs/tpu_bricks_mcmc > runs/tpu_bricks_mcmc.log 2>&1
# 2. ADC+ (absgrad + revised opacity)
timeout 14000 python -u runs/train_wrap.py $ARGS \
  --model_path runs/tpu_bricks_adc --densify_strategy 2 \
  > runs/tpu_bricks_adc.log 2>&1
echo DONE_ALL
