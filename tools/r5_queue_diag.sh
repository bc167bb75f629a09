#!/bin/bash
# Round-5 TPU measurement queue, phase 1: train + forward diagnostics.
# Serialized (the axon tunnel wedges under parallel compile load); each
# stage timeout-wrapped and probed between stages.
set -x
cd /root/repo

probe() {
  timeout 300 python -c "
import jax, jax.numpy as jnp
print('probe ok', (jnp.ones((256,256))@jnp.ones((256,256))).sum())" || exit 1
}

probe
timeout 2700 python tools/train_bf16_diag.py > /tmp/r5_train_diag.log 2>&1
echo "train_bf16_diag exit $?"
probe
timeout 2700 python tools/unet_bf16_diag.py > /tmp/r5_unet_diag.log 2>&1
echo "unet_bf16_diag exit $?"
probe
echo "phase 1 done"
