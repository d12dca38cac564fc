#!/bin/bash
# Bank all queued TPU measurements in order, each bounded, results to stdout
# and to /tmp/*.json for later banking into the repo.
# Run when the tunnel recovers: bash scripts/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
# ONE TPU process at a time (CLAUDE.md measurement rules): this script is
# strictly sequential; do not run anything else against the chip meanwhile.
set -x
cd /root/repo
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))" || exit 1

# 1. headline bench, method v2 (one-dispatch periodic scan + differencing,
#    publish slab included in the device rate, valid overlap measurement)
timeout 2400 python bench.py > /tmp/bench_r4v2.json 2>/tmp/bench_r4v2.err
cat /tmp/bench_r4v2.json

# 2. one-config contract re-measurement (the banked CONTRACT_r4.json
#    throughput counted degenerate replayed revolutions — r4 correction #2);
#    rewrites CONTRACT_r4.json and LATENCY_r4.json in-repo
timeout 3600 python scripts/contract_r4.py 2>/tmp/contract_r4v2.err | tee /tmp/contract_r4v2.out

# 3. knob battery re-run with valid measurements (confirm/refute the s1j2
#    defaults; the original battery's absolute rates were inflated by
#    degenerate replays, relative ordering probably held)
timeout 5400 python scripts/tpu_experiments_r4.py 2>/tmp/battery_r4v2.err | tee /tmp/battery_r4v2.out

# 4. kernel parity + step time at current defaults
timeout 1500 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"

# 5. fresh per-op device trace (feeds the next optimization pass: the
#    "everything else ~2.2 ms/step" bucket in docs/ROUND3_NOTES.md)
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python timeout 1200 python scripts/trace_table.py > /tmp/trace_r4v2.out 2>&1 || true
tail -60 /tmp/trace_r4v2.out
