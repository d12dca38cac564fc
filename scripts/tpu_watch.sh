#!/bin/bash
# Tunnel watcher: probe the TPU tunnel in a bounded subprocess until it
# answers, then bank the full queued measurement session ($1, default
# tpu_session.sh).
# Run detached:  setsid nohup bash scripts/tpu_watch.sh [session.sh] > /tmp/tpu_watch.log 2>&1 &
# Stop:          kill $(cat /tmp/tpu_watch.pid)
# ONE TPU process at a time (CLAUDE.md): do not run pytest/builds meanwhile.
set -o pipefail  # the session|tee pipeline must report the SESSION's status
echo $$ > /tmp/tpu_watch.pid
cd /root/repo
SESSION=${1:-scripts/tpu_session.sh}
n=0
while true; do
  n=$((n+1))
  echo "[watch] probe $n $(date -u +%H:%M:%S)"
  # tunnel FLAPS per-process (memory: tpu-tunnel-flapping): ONE successful
  # probe launches the session — its own probe_link retries (8x30s) absorb
  # flaps, so waiting for a second confirm here only burns brief windows
  if timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
assert jax.devices()[0].platform == 'tpu', jax.devices()
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))"; then
    echo "[watch] tunnel up after $n probes; starting session $(date -u +%H:%M:%S)"
    if bash "$SESSION" 2>&1 | tee -a /tmp/tpu_session.log; then
      echo "[watch] SESSION DONE $(date -u +%H:%M:%S)"
      break
    fi
    # the tunnel flapped mid-session: re-enter the probe loop and retry
    echo "[watch] session aborted (tunnel flap?); resuming probe loop $(date -u +%H:%M:%S)"
  fi
  sleep 180
done
