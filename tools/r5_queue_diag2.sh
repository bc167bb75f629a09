#!/bin/bash
# Round-5 TPU queue, phase 1b: re-measure the bf16 trainer after the
# attention-scale promotion fix, then the fused-kernel VMEM sweep.
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
timeout 2400 python tools/measure_perf.py --section bf16_trainer \
  > /tmp/r5_bf16_trainer.log 2>&1
echo "bf16_trainer exit $?"
probe
timeout 2400 python tools/attnblock_vmem_sweep.py \
  > /tmp/r5_vmem_sweep.log 2>&1
echo "vmem_sweep exit $?"
probe
echo "phase 1b done"
