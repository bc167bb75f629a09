#!/bin/bash
# Round-5 TPU measurement queue, phase 3: the grf16_production preset's
# end-to-end quality + throughput measurement (VERDICT r4 #7 evidence) and
# a bench.py validation run (DiT2D MFU now in the headline JSON).
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

probe
timeout 7200 python tools/parity_image_ours.py --iters 100000 --batch 128 \
  --steps-per-dispatch 64 --seed 0 --compute-dtype bfloat16 \
  --parameterization eps --ema-rate 0.999 --eval "pc:32,sde:64" \
  --out GRF16_PRODUCTION.json > /tmp/r5_production.log 2>&1
echo "production exit $?"
probe
timeout 1800 python bench.py > /tmp/r5_bench.log 2>&1
echo "bench exit $?"
probe
echo "phase 3 done"
