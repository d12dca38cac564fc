#!/bin/bash
# Round-5c TPU measurement queue: same-session confirm of the r5b battery
# finalists, then re-bank the headline bench + contract at the winner's
# knobs (which ship as the new source defaults iff the winner beats the
# shipped hsvsj0 anchor in this session).
# Run via the watcher: setsid nohup bash scripts/tpu_watch.sh scripts/tpu_session_r5c.sh > /tmp/tpu_watch.log 2>&1 &
# ONE TPU process at a time (CLAUDE.md): nothing else runs meanwhile.
set -x
cd /root/repo
touch /tmp/tpu_session.active
trap 'rm -f /tmp/tpu_session.active' EXIT
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))" || exit 1

# native lib preflight (does not survive container migrations)
timeout 600 python -m continuous_clustering_tpu.native.build || exit 1
python - <<'EOF' || exit 1
from continuous_clustering_tpu import native
assert native.available(), "native lib missing after build"
print("[session] native lib preflight OK")
EOF

quiesce() {
  for i in $(seq 1 120); do
    busy=$(pgrep -c -f "pytest|cc_rounds_probe|cmake|ninja|microbench|graft_entry|check_entry" || true)
    [ "${busy:-0}" -eq 0 ] && return 0
    echo "[session] waiting for $busy CPU-heavy processes ($i)"; sleep 30
  done
  return 0
}
quiesce

probe_link() {
  quiesce
  for a in 1 2 3 4 5 6 7 8; do
    timeout 180 python - <<'EOF' && return 0
import time, jax, jax.numpy as jnp
assert jax.devices()[0].platform == "tpu", jax.devices()
x = jnp.ones((8,))
jax.block_until_ready(x + 0)
ok = True
for i in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(x + i)
    ms = (time.perf_counter() - t0) * 1000
    print(f"RT {i}: {ms:.1f} ms")
    ok = ok and ms < 80
import sys; sys.exit(0 if ok else 1)
EOF
    echo "[session] probe_link attempt $a failed/degraded; retrying in 60s"
    sleep 60
  done
  return 1
}
probe_link || exit 1

# 1. same-session confirm battery (9 rows = 3 tags x 3 scenes); resumable
n_rows=$(grep -c '"pts_per_s"' /tmp/battery_r5c.out 2>/dev/null || true)
n_rows=${n_rows:-0}
if [ "$n_rows" -lt 9 ]; then
  timeout 3600 python scripts/tpu_experiments_r5c.py /tmp/battery_r5c.out 2>/tmp/battery_r5c.err | tee -a /tmp/battery_r5c.out
fi

# 2. winner knobs applied to everything downstream
wtag=$(python scripts/pick_knobs.py --tag /tmp/battery_r5c.out 2>/dev/null || true)
eval "$(python scripts/pick_knobs.py /tmp/battery_r5c.out)"
env | grep CCT_ || true
defaults_win=0
{ [ -z "$wtag" ] || [ "$wtag" = hsvsj0 ]; } && defaults_win=1

# 3. headline bench at the winner's knobs
if [ "$defaults_win" = 1 ] && [ -s /root/repo/BENCH_builder_r5.json ]; then
  echo "[session] shipped defaults confirmed; keeping banked bench"
else
  probe_link || exit 1
  timeout 2400 python bench.py > /tmp/bench_r5c.json 2>/tmp/bench_r5c.err
  cat /tmp/bench_r5c.json
fi

# 4. contract at the winner's knobs.  Re-run even when defaults win unless
#    the banked contract already carries steady head-hit >= 0.9 (the
#    adaptive-head fix post-dates the first banked run, which sat at 0.5).
need_contract=1
if [ "$defaults_win" = 1 ]; then
  if python - <<'EOF'
import json, sys
try:
    d = json.load(open("/root/repo/CONTRACT_r5.json"))
    cp = d.get("contract_point") or {}
    ok = d.get("met") and (cp.get("head_hit_rate_steady") or 0) >= 0.9
except Exception:
    ok = False
sys.exit(0 if ok else 1)
EOF
  then
    need_contract=0
    echo "[session] contract already banked with head_hit >= 0.9; skipping"
  fi
fi
if [ "$need_contract" = 1 ]; then
  probe_link || exit 1
  timeout 4500 python scripts/contract_r5.py 2>/tmp/contract_r5c.err | tee /tmp/contract_r5c.out
fi

# 5. pallas parity at the winner's knobs (cheap; skip when defaults hold)
if [ "$defaults_win" != 1 ]; then
  probe_link || exit 1
  timeout 1500 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match" | tee /tmp/pallas_r5c.out
fi

# 6. bank: new bench only when re-run this attempt
if [ "$defaults_win" != 1 ] && [ -s /tmp/bench_r5c.json ]; then
  cp -f /tmp/bench_r5c.json /root/repo/BENCH_builder_r5.json
fi
cp -f /tmp/battery_r5c.out /root/repo/docs/battery_r5c_tpu.jsonl 2>/dev/null || true

# artifact-complete exit status: the watcher retries until this passes
python - <<'EOF'
import json, os, sys
ok = True
rows = 0
try:
    with open("/tmp/battery_r5c.out") as f:
        rows = sum(1 for line in f if '"pts_per_s"' in line)
except Exception:
    pass
print(f"[session] r5c battery rows banked: {rows}/9")
if rows < 9:
    ok = False
try:
    b = json.load(open("/root/repo/BENCH_builder_r5.json"))
    assert b.get("value", 0) > 0
    print("[session] bench artifact OK:", b["value"])
except Exception as e:
    print("[session] bench artifact INVALID:", e); ok = False
try:
    d = json.load(open("/root/repo/CONTRACT_r5.json"))
    cp = d.get("contract_point") or {}
    print("[session] contract met:", d.get("met"),
          "head_hit:", cp.get("head_hit_rate_steady"))
    ok = ok and bool(d.get("met"))
except Exception as e:
    print("[session] contract INVALID:", e); ok = False
sys.exit(0 if ok else 1)
EOF
