#!/bin/bash
# Round-5 TPU measurement queue.  Bank all queued measurements in order,
# each bounded, results to stdout and to /tmp/*.json for later banking
# into the repo.
# Run when the tunnel recovers: bash scripts/tpu_session.sh 2>&1 | tee /tmp/tpu_session.log
# ONE TPU process at a time (CLAUDE.md measurement rules): this script is
# strictly sequential; do not run anything else against the chip meanwhile.
#
# Queue rationale (VERDICT r4 next-round items):
#   1. The r4c battery prices the vertical min-scan / gseg unroll / nocond
#      knobs on the chip (item #1) — it runs FIRST because its winner is
#      applied (via pick_knobs.py) to every subsequent measurement.
#   2. bench.py re-banks the headline at the winning knobs.
#   3. contract_r5.py banks the >=5M-AND-<10ms simultaneous point (#2, #3).
#   4. pallas parity + fresh trace feed the roofline (#6).
set -x
cd /root/repo
# lockfile: heavy CPU work (tests, builds) must not run while a measurement
# session is active on this 1-core box (CLAUDE.md measurement rules)
touch /tmp/tpu_session.active
trap 'rm -f /tmp/tpu_session.active' EXIT
timeout 120 python -c "
import jax, jax.numpy as jnp, numpy as np
print('tunnel OK', float(np.asarray(jnp.ones((8,8)).sum())))" || exit 1

# preflight: the native C++ lib does NOT survive container migrations
# (generated, not committed) and every measurement path asserts on it
# (bench_setup.capture_revolution needs pipe._host_ins).  The build is a
# fast no-op when current; bail out loudly if it cannot be produced.
timeout 600 python -m continuous_clustering_tpu.native.build || exit 1
python - <<'EOF' || exit 1
from continuous_clustering_tpu import native
assert native.available(), "native lib missing after build"
print("[session] native lib preflight OK")
EOF

# quiesce gate: never measure while CPU-heavy work runs on this (1-core) box
# (check-only pgrep, no killing — CLAUDE.md forbids pattern kills).
# Called before EVERY measurement stage (inside probe_link), not just at
# session start: the tunnel can recover hours in, and a pytest/build that
# started meanwhile would silently pollute banked rows (the battery skips
# already-banked rows forever, so polluted rows are sticky).
quiesce() {
  for i in $(seq 1 120); do
    busy=$(pgrep -c -f "pytest|cc_rounds_probe|cmake|ninja|microbench|graft_entry|check_entry" || true)
    [ "${busy:-0}" -eq 0 ] && return 0
    echo "[session] waiting for $busy CPU-heavy processes ($i)"; sleep 30
  done
  return 0
}
quiesce

# link-health preamble: 5 trivial round trips (healthy ~25-30 ms/RT).
# The tunnel FLAPS per-process (memory: tpu-tunnel-flapping — one process
# gets through, the next may not): retry the probe up to 8 times with
# sleeps before giving the session up, so brief windows still bank items.
probe_link() {
  quiesce
  for a in 1 2 3 4 5 6 7 8; do
    timeout 180 python - <<'EOF' && return 0
import time, jax, jax.numpy as jnp
# UNFORCED init: forcing jax_platforms=tpu initializes the raw local TPU
# plugin ("No jellyfish device found") on hosts where the chip is reached
# through the axon tunnel; the tunnel registers itself as the default
# backend, so let jax pick and assert what it found (2026-08-20 host).
assert jax.devices()[0].platform == "tpu", jax.devices()
x = jnp.ones((8,))
jax.block_until_ready(x + 0)
for i in range(5):
    t0 = time.perf_counter()
    jax.block_until_ready(x + i)
    print(f"RT {i}: {(time.perf_counter()-t0)*1000:.1f} ms")
EOF
    echo "[session] probe_link attempt $a failed; retrying in 30s"
    sleep 30
  done
  return 1
}
probe_link || exit 1

# 1. vscan/unroll/nocond A/B battery (CPU rounds probe says hs+vs cuts CC
#    rounds 21-33%; this prices the per-round scan cost on the chip).
#    RESUMABLE: already-banked (tag, scene) rows are skipped, so aborted
#    windows accumulate toward the full matrix (21 rows = 7 tags x 3
#    scenes; note between-session fixed-cost drift ~2-3% — prefer
#    same-session rows when margins are thin).
# NB: grep -c prints "0" AND exits 1 on zero matches, so `|| echo 0`
# would append a second line and break the -lt test (seen 2026-08-20:
# battery silently skipped).  Capture the count, default only if empty.
n_rows=$(grep -c '"pts_per_s"' /tmp/battery_r4c.out 2>/dev/null || true)
n_rows=${n_rows:-0}
if [ "$n_rows" -lt 21 ]; then
  timeout 3600 python scripts/tpu_experiments_r4c.py /tmp/battery_r4c.out 2>/tmp/battery_r4c.err | tee -a /tmp/battery_r4c.out
fi

# 2. apply the battery winner to everything that follows
wtag=$(python scripts/pick_knobs.py --tag /tmp/battery_r4c.out 2>/dev/null || true)
eval "$(python scripts/pick_knobs.py /tmp/battery_r4c.out)"
env | grep CCT_ || true
# defaults_win: the chip picked the shipped defaults (tag "hs") or nothing
# was eligible — default-knob measurements already banked by an earlier
# attempt of this queue are then still valid and need not be re-burned
defaults_win=0
{ [ -z "$wtag" ] || [ "$wtag" = hs ]; } && defaults_win=1

# 3. headline bench at the winning knobs
if [ "$defaults_win" = 1 ] && [ -s /tmp/bench_r5.json ]; then
  echo "[session] defaults won and bench banked; skipping bench re-run"
else
  probe_link || exit 1
  timeout 2400 python bench.py > /tmp/bench_r5.json 2>/tmp/bench_r5.err
  cat /tmp/bench_r5.json
fi

# 4. round-5 contract: >=5M throughput AND <10ms loaded local-attach p50
#    from ONE config (B=128), plus the B=32 low-latency point; writes
#    CONTRACT_r5.json + LATENCY_r5.json in-repo.  Re-run even when the
#    defaults win UNLESS the banked contract already carries a steady
#    head-hit >= 0.9 — the adaptive-head threshold fix (32-window check,
#    lane-rounded growth) post-dates the first banked run, which sat at 0.5.
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
    echo "[session] defaults won and contract banked with head_hit >= 0.9; skipping"
  fi
fi
if [ "$need_contract" = 1 ]; then
  probe_link || exit 1
  timeout 4500 python scripts/contract_r5.py 2>/tmp/contract_r5.err | tee /tmp/contract_r5.out
fi

if [ "$defaults_win" = 1 ]; then
  echo "[session] defaults won; keeping banked pallas/trace/roofline artifacts"
else

# 5. kernel parity + step time at the winning knobs
probe_link || exit 1
timeout 1500 python scripts/pallas_validate.py 2>&1 | grep -E "ms/step|match"

# 6. fresh per-op device trace (feeds the roofline, VERDICT item #6)
PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python timeout 1200 python scripts/trace_table.py > /tmp/trace_r5.out 2>&1 || true
tail -60 /tmp/trace_r5.out

# 7. HBM roofline with the TPU compiler's own cost model (bytes/point vs
#    819 GB/s), using the freshly-banked bench rate
rate=$(python -c "import json;print(json.load(open('/tmp/bench_r5.json'))['value'])" 2>/dev/null || echo 0)
timeout 1800 python scripts/roofline.py --platform tpu --rate "${rate:-0}" --json ROOFLINE_r5.json \
  || timeout 1800 python scripts/roofline.py --rate "${rate:-0}" --json ROOFLINE_r5.json || true

fi  # end winner-dependent re-measurement block

# 8. bank everything that still lives only in /tmp into the repo so a
#    completed session persists even if nobody is watching.  When the bench
#    was NOT re-run this attempt (defaults won), keep the already-banked
#    repo copy: the /tmp one may be from an attempt whose host-side stages
#    were polluted by concurrent activity on this 1-core box.
if [ "$defaults_win" != 1 ] || [ ! -s /root/repo/BENCH_builder_r5.json ]; then
  cp -f /tmp/bench_r5.json /root/repo/BENCH_builder_r5.json 2>/dev/null || true
  cp -f /tmp/trace_r5.out /root/repo/docs/trace_r5.txt 2>/dev/null || true
fi
cp -f /tmp/battery_r4c.out /root/repo/docs/battery_r4c_tpu.jsonl 2>/dev/null || true

# success means ARTIFACTS, not reaching the end of the script: the watcher
# stops retrying on exit 0, so a hollow run (crashed battery/bench writing
# empty files) must report failure and re-enter the probe loop.
python - <<'EOF'
import json, sys
ok = True
try:
    with open("/tmp/bench_r5.json") as f:
        b = json.load(f)
    assert b.get("value", 0) > 0, "bench value missing"
    print("[session] bench artifact OK:", b["value"])
except Exception as e:
    print("[session] bench artifact INVALID:", e); ok = False
rows = 0
try:
    with open("/tmp/battery_r4c.out") as f:
        rows = sum(1 for line in f if '"pts_per_s"' in line)
except Exception:
    pass
print(f"[session] battery rows banked: {rows}/21")
if rows < 21:
    ok = False
import os
ok = ok and os.path.exists("/root/repo/CONTRACT_r5.json")
print("[session] contract banked:", os.path.exists("/root/repo/CONTRACT_r5.json"))
sys.exit(0 if ok else 1)
EOF
rc=$?
echo "[session] all stages attempted $(date -u +%H:%M:%S), artifact-complete rc=$rc"
exit $rc
