#!/bin/bash
# Bank all queued TPU measurements in order, each bounded, results to stdout.
# Run when the tunnel recovers: bash scripts/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
set -x
cd /root/repo
timeout 60 python -c "
import jax, jax.numpy as jnp, numpy as np
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))" || exit 1

# 1. kernel equality + step time at current code (hoisted sweep, sweeps=2)
timeout 1500 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"

# 2. inner-sweep count sweep
for S in 1 3; do
  echo "=== sweeps=$S ==="
  CCT_SWEEPS=$S timeout 1200 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"
done

# 3. headline bench + batch sweep
timeout 1500 python bench.py
CCT_BENCH_BATCH=512 timeout 1500 python bench.py

# 4. latency refresh
timeout 1500 python scripts/latency_model.py --batch 64

# 5. fresh device trace for the next optimization round
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python timeout 1200 python scripts/trace_table.py || true
