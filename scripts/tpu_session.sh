#!/bin/bash
# Bank all queued TPU measurements in order, each bounded, results to stdout.
# Run when the tunnel recovers: bash scripts/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
# ONE TPU process at a time (CLAUDE.md measurement rules): this script is
# strictly sequential; do not run anything else against the chip meanwhile.
set -x
cd /root/repo
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))" || exit 1

# 0. scatter-context experiment: resolves the 6.5 ns/lane mystery
#    (H1 VMEM residency vs H2 loop-invariant-index hoisting) and probes
#    sorted/unique scatter lowering (docs/ROUND3_NOTES.md)
timeout 1500 python scripts/microbench_scatter_context.py 2>&1 | grep -E "case|error"

# 0b. structural half of the same question: what lowering does each
#     scatter flag combination get in TPU optimized HLO?
timeout 600 python scripts/scatter_hlo_inventory.py --dump 2>&1 | grep -vE "WARNING|^$"

# 1. kernel equality + step time at current defaults (cm ids, sweeps=3)
timeout 1500 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"

# 2. experiment battery: baseline x3, CC knob matrix incl. sweeps 4-6 /
#    deferred jumps, agg modes, substitution probes
timeout 3600 python scripts/tpu_experiments_r3.py

# 3. cm vs rm label A/B on the full program
for L in cm rm; do
  echo "=== labels=$L ==="
  CCT_LABEL=$L timeout 1200 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"
done

# 4. headline bench (current defaults)
timeout 1800 python bench.py

# 5. latency refresh -> LATENCY_r3.json
timeout 1500 python scripts/latency_model.py --batch 64

# 6. fresh device trace for the next optimization round
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python timeout 1200 python scripts/trace_table.py || true
