"""One-config latency + throughput contract (VERDICT r3 item 3).

The reference delivers ~5 ms average publish latency WHILE sustaining the
VLS-128 stream (~2.2M pts/s) with one configuration
(/root/reference/README.md:11; launch/sensor_vls128_roof.launch) — latency
and throughput are a simultaneous contract, not two separately-tuned
numbers.  This script:

1. sweeps the firing batch size B over {32, 64, 128} at nth=1 and measures
   the device-scan rate (publish-slab readout INCLUDED) per B,
2. picks the smallest B whose rate clears the 2.2M baseline (stretch: 5M),
3. runs scripts/latency_model.py at that B (writes LATENCY_r4.json),
4. writes CONTRACT_r4.json carrying BOTH numbers from the single config.

Usage: python scripts/contract_r4.py [--smoke]
"""

import argparse
import json
import os
import subprocess
import sys

BASELINE = 2.2e6
STRETCH = 5.0e6

CHILD = r"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.environ["CCT_REPO"])
from continuous_clustering_tpu.tools import bench_setup
from continuous_clustering_tpu.utils.platform import ensure_backend

smoke = os.environ.get("CCT_SMOKE") == "1"
if smoke:
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    bench_setup.enable_compile_cache()
    ensure_backend()

import jax
import jax.numpy as jnp

num_rows = 16 if smoke else 64
num_cols = 128 if smoke else 2200
B = int(os.environ["CCT_CONTRACT_B"])

cfg, pipe = bench_setup.make_bench_pipe(
    num_rows=num_rows, num_cols=num_cols, batch=B, nth=1, ring_revs=4)
firings, n_points = bench_setup.make_bench_scene(num_rows, num_cols)
# one-dispatch periodic scan, rate from the 2N-vs-N difference; ALWAYS a
# fresh coherent stream (the previous per-revolution loop replayed
# already-consumed revolutions, whose steps degenerate — frontier stuck,
# zero clusters — and overstate the rate; bench_setup.measure_periodic_rate)
scene = bench_setup.capture_revolution(pipe, firings, num_cols)
res = bench_setup.measure_periodic_rate(
    cfg, pipe, scene, num_cols, n_points, N=2 if smoke else 8,
    pairs=1 if smoke else 3,
    slab_cols=pipe._slab_W, slab_head=pipe._slab_W1)
print(json.dumps({
    "batch": B,
    "pts_per_s": res["pts_per_s"],
    "raw_2n_pts_per_s": res["raw_2n_pts_per_s"],
    "diff_ok": res["diff_ok"],
    "ms_per_rev": res["ms_per_rev"],
    "overflow": res["overflow"],
    "cc_failed": res["cc_failed"],
}), flush=True)
"""


def run_rate(repo, B, smoke):
    env = dict(os.environ)
    env.update(CCT_REPO=repo, CCT_CONTRACT_B=str(B),
               CCT_SMOKE="1" if smoke else "0")
    p = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1500,
    )
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            return json.loads(line)
    sys.stderr.write(p.stderr[-1500:] + "\n")
    return None


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true")
    args = ap.parse_args()
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    sweep = []
    for B in (32, 64, 128):
        r = run_rate(repo, B, args.smoke)
        if r:
            sweep.append(r)
            print(json.dumps(r), flush=True)

    ok = [r for r in sweep
          if r["pts_per_s"] >= (0 if args.smoke else BASELINE)
          and not r["overflow"] and not r["cc_failed"]]
    if not ok:
        raise SystemExit("no batch size cleared the 2.2M baseline")
    pick = min(ok, key=lambda r: r["batch"])
    stretch_ok = [r for r in ok if r["pts_per_s"] >= STRETCH]
    note = ""
    if stretch_ok and stretch_ok[0]["batch"] < pick["batch"]:
        pick = stretch_ok[0]

    # latency at the chosen config (writes LATENCY_r4.json)
    lat_cmd = [sys.executable, os.path.join(repo, "scripts", "latency_model.py"),
               "--batch", str(pick["batch"])]
    if args.smoke:
        lat_cmd.append("--smoke")
    p = subprocess.run(lat_cmd, cwd=repo, capture_output=True, text=True,
                       timeout=1800)
    lat = None
    for line in reversed(p.stdout.strip().splitlines()):
        if line.startswith("{"):
            lat = json.loads(line)
            break
    if lat is None:
        sys.stderr.write(p.stderr[-1500:] + "\n")
        raise SystemExit("latency run failed at the contract config")

    out = {
        "metric": "contract_latency_and_throughput_single_config",
        "config": {"batch": pick["batch"], "nth": 1, "rows": 64, "cols": 2200},
        "throughput_pts_per_s": pick["pts_per_s"],
        "throughput_target": BASELINE,
        "throughput_stretch": STRETCH,
        "latency_p50_ms_as_measured": lat["value"],
        "latency_p50_ms_modeled_local_attach": lat["p50_modeled_local_attach_ms"],
        "latency_target_ms": 10.0,
        "sweep": sweep,
        "met": bool(
            pick["pts_per_s"] >= BASELINE
            and lat["p50_modeled_local_attach_ms"] <= 10.0
        ),
        "note": (
            "both numbers from ONE configuration (reference bar: README.md:11 "
            "~5 ms while sustaining the VLS-128 stream).  Throughput is the "
            "device-scan rate with the publish-slab readout included; "
            "latency decomposition and loaded-soak percentiles in "
            "LATENCY_r4.json." + note
        ),
    }
    print(json.dumps(out))
    if not args.smoke:
        with open(os.path.join(repo, "CONTRACT_r4.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
