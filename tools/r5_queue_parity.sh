#!/bin/bash
# Round-5 TPU measurement queue, phase 2: full-budget quality arms.
# - 3-seed full-budget image parity (VERDICT r4 #3): seeds 1,2 (seed 0 is
#   parity_image_ours_full.json) + one EMA-on MSGM arm.
# - DiT2D full-budget flagship arms w/ sampler-family eval (VERDICT r4 #2).
set -x
cd /root/repo

probe() {
  for i in 1 2 3 4 5 6; do
    timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe ok', float((jnp.ones((256,256))@jnp.ones((256,256))).sum()))" && return 0
    echo "probe attempt $i failed; waiting 300s for the tunnel to recover"
    sleep 300
  done
  echo "tunnel did not recover after 6 probes"; exit 1
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
echo "phase 2 done"
