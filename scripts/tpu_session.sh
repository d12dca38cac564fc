#!/bin/bash
# Bank all queued TPU measurements in order, each bounded, results to stdout
# and to /tmp/*.json for later banking into the repo.
# Run when the tunnel recovers: bash scripts/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
# ONE TPU process at a time (CLAUDE.md measurement rules): this script is
# strictly sequential; do not run anything else against the chip meanwhile.
#
# Round-4 final re-bank queue: the banked BENCH_builder_r4.json predates the
# transpose-free staging commit (f1bf390, host stage A 6.4 -> 9.2M on 1 core),
# so its host_insertion=4.32M headline cap is stale.  Re-measure bench +
# contract with the current tree, plus a kernel-parity smoke.
set -x
cd /root/repo
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))" || exit 1

# quiesce gate: never measure while CPU-heavy work runs on this (1-core) box
# (check-only pgrep, no killing — CLAUDE.md forbids pattern kills)
for i in $(seq 1 120); do
  busy=$(pgrep -c -f "pytest|cc_rounds_probe|cmake|ninja" || true)
  [ "${busy:-0}" -eq 0 ] && break
  echo "[session] waiting for $busy CPU-heavy processes ($i)"; sleep 30
done

# link-health preamble: 5 trivial round trips (healthy ~25-30 ms/RT).
# The tunnel FLAPS (it has passed a probe and died seconds later): abort
# the whole session on any preamble failure so the watcher re-enters its
# probe loop instead of burning every queue item against a dead tunnel.
probe_link() {
  timeout 180 python - <<'EOF'
import time, jax, jax.numpy as jnp
jax.config.update("jax_platforms", "tpu")
x = jnp.ones((8,))
jax.block_until_ready(x + 0)
for i in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(x + i)
    print(f"RT {i}: {(time.perf_counter()-t0)*1000:.1f} ms")
EOF
}
probe_link || exit 1

# 1. headline bench with the transpose-free staging path (expected: host
#    insertion no longer binds; headline ~= clutter device rate)
timeout 2400 python bench.py > /tmp/bench_r4v3.json 2>/tmp/bench_r4v3.err
cat /tmp/bench_r4v3.json

# 2. vscan A/B battery (CPU rounds probe says hs+vs cuts rounds ~20-33%;
#    this prices the per-round scan cost on the chip) — early in the queue:
#    it decides whether a defaults flip precedes the final bench/contract
probe_link || exit 1
timeout 3600 python scripts/tpu_experiments_r4c.py 2>/tmp/battery_r4c.err | tee /tmp/battery_r4c.out

# 3. one-config contract at the current tree (rewrites CONTRACT_r4.json and
#    LATENCY_r4.json in-repo)
probe_link || exit 1
timeout 3600 python scripts/contract_r4.py 2>/tmp/contract_r4v3.err | tee /tmp/contract_r4v3.out

# 4. kernel parity + step time at current defaults
probe_link || exit 1
timeout 1500 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"

# 5. fresh per-op device trace at the shipped defaults (feeds any further
#    optimization pass this session)
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python timeout 1200 python scripts/trace_table.py > /tmp/trace_r4v3.out 2>&1 || true
tail -60 /tmp/trace_r4v3.out
