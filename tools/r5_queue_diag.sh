#!/bin/bash
# Round-5 TPU measurement queue, phase 1: train + forward diagnostics.
# Serialized (the axon tunnel wedges under parallel compile load); each
# stage timeout-wrapped and probed between stages.
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
timeout 2700 python tools/train_bf16_diag.py > /tmp/r5_train_diag.log 2>&1
echo "train_bf16_diag exit $?"
probe
timeout 2700 python tools/unet_bf16_diag.py > /tmp/r5_unet_diag.log 2>&1
echo "unet_bf16_diag exit $?"
probe
echo "phase 1 done"
