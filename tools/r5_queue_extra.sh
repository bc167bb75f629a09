#!/bin/bash
# Round-5 follow-on TPU queue: waits for the master queue to exit, then
# (1) measures the production preset on the DiT2D architecture — the
# full-budget-proven flagship (parity_image_ours_dit_full.json) — and
# (2) adds seeds to the DiT full-budget arms. Serialized behind
# tools/r5_master_queue.sh via its pidfile; same retrying probe.
set -x
cd /root/repo

while [ -f /tmp/r5_master.pid ] && kill -0 "$(cat /tmp/r5_master.pid)" 2>/dev/null; do
  sleep 60
done

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

probe
timeout 7200 python tools/parity_image_ours.py --archi dit --iters 100000 \
  --batch 128 --steps-per-dispatch 64 --seed 0 --compute-dtype bfloat16 \
  --parameterization eps --ema-rate 0.999 --eval "pc:32,sde:64,dpm:8" \
  --out GRF16_PRODUCTION_DIT.json > /tmp/r5_production_dit.log 2>&1
echo "production_dit exit $?"
probe
timeout 7200 python tools/parity_image_ours.py --archi dit --iters 100000 \
  --batch 128 --steps-per-dispatch 64 --seed 1 \
  --eval "sde:64,pc:32" \
  --out parity_image_ours_dit_full_s1.json > /tmp/r5_dit_full_s1.log 2>&1
echo "dit full s1 exit $?"
probe
timeout 7200 python tools/parity_image_ours.py --archi dit --iters 100000 \
  --batch 128 --steps-per-dispatch 64 --seed 2 \
  --eval "sde:64,pc:32" \
  --out parity_image_ours_dit_full_s2.json > /tmp/r5_dit_full_s2.log 2>&1
echo "dit full s2 exit $?"
echo "extra queue done"
