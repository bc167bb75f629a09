#!/bin/bash
# Round-5 master TPU queue (relaunch after session loss): full-budget
# quality arms first (VERDICT r4 #2/#3), then the production preset
# (#7), then the train batch-scaling crossover + multi-head Mosaic
# check (#1/#9 evidence). Serialized; retrying probes between stages
# (the axon tunnel wedges under compile load and recovers in ~10-20 min).
set -x
cd /root/repo

probe() {
  for i in 1 2 3 4 5 6 7 8; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe ok', float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" && return 0
    echo "probe attempt $i failed; waiting 300s for the tunnel to recover"
    sleep 300
  done
  echo "tunnel did not recover after 8 probes"; exit 1
}

COMBOS="sde:64,ode:8,ode:16,pc:32,dpm:8,dpm:16"

probe
timeout 5400 python tools/parity_image_ours.py --iters 100000 --batch 128 \
  --steps-per-dispatch 64 --seed 1 --out parity_image_ours_full_s1.json \
  > /tmp/r5_full_s1.log 2>&1
echo "full s1 exit $?"
probe
timeout 5400 python tools/parity_image_ours.py --iters 100000 --batch 128 \
  --steps-per-dispatch 64 --seed 2 --out parity_image_ours_full_s2.json \
  > /tmp/r5_full_s2.log 2>&1
echo "full s2 exit $?"
probe
timeout 3600 python tools/parity_image_ours.py --iters 100000 --batch 128 \
  --steps-per-dispatch 64 --seed 0 --arms msgm --ema-rate 0.999 \
  --out parity_image_ours_full_ema.json > /tmp/r5_full_ema.log 2>&1
echo "full ema exit $?"
probe
timeout 7200 python tools/parity_image_ours.py --archi dit --iters 100000 \
  --batch 128 --steps-per-dispatch 64 --seed 0 --eval "$COMBOS" \
  --out parity_image_ours_dit_full.json > /tmp/r5_dit_full.log 2>&1
echo "dit full exit $?"
probe
timeout 7200 python tools/parity_image_ours.py --iters 100000 --batch 128 \
  --steps-per-dispatch 64 --seed 0 --compute-dtype bfloat16 \
  --parameterization eps --ema-rate 0.999 --eval "pc:32,sde:64" \
  --out GRF16_PRODUCTION.json > /tmp/r5_production.log 2>&1
echo "production exit $?"
probe
timeout 2400 python tools/train_batch_scaling.py > /tmp/r5_batch_scaling.log 2>&1
echo "batch_scaling exit $?"
probe
timeout 1800 python tools/attnblock_multihead_check.py > /tmp/r5_multihead.log 2>&1
echo "multihead exit $?"
probe
timeout 1800 python bench.py > /tmp/r5_bench.log 2>&1
echo "bench exit $?"
echo "master queue done"
