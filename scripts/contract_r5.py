"""Round-5 contract: >=5M pts/s AND <10 ms loaded local-attach p50, ONE config.

VERDICT r4 missing #2/#3: round 4 contracted the 2.2M baseline at B=32
(2.94M, 2.82 ms modeled) but the 5M stretch point (B=128) had no latency
decomposition, and the loaded soak had no local-attach model.  This script:

1. sweeps B over {32, 64, 128, 192} at nth=1, device-scan rate with the
   publish-slab readout included (valid one-dispatch periodic method),
2. picks TWO configs: the smallest B clearing the 2.2M reference baseline
   (low-latency point) and the smallest B clearing the 5M north star
   (contract point),
3. runs scripts/latency_model.py at EACH (full decomposition + loaded soak
   with the adaptive slab head and the measured-transfer-replaced
   local-attach projection); the contract point's JSON goes to
   LATENCY_r5.json, the low-latency point's to LATENCY_r5_lowlat.json,
4. writes CONTRACT_r5.json with `met` = (contract point >= 5M AND its
   LOADED local-attach p50 < 10 ms) plus `met_baseline` for the 2.2M bar.

Reference bar: ~5 ms while sustaining the VLS-128 live stream
(/root/reference/README.md:11).

Usage: python scripts/contract_r5.py [--smoke]
"""

import argparse
import json
import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from contract_r4 import CHILD, run_rate  # noqa: E402  (same measurement child)

BASELINE = 2.2e6
STRETCH = 5.0e6


def run_latency(repo, B, smoke, out_name):
    cmd = [sys.executable, os.path.join(repo, "scripts", "latency_model.py"),
           "--batch", str(B), "--out", out_name]
    if smoke:
        cmd.append("--smoke")
    for attempt in (1, 2):  # tunnel flaps per-process; retry once
        try:
            p = subprocess.run(cmd, cwd=repo, capture_output=True, text=True,
                               timeout=2400)
        except subprocess.TimeoutExpired:
            print(json.dumps({"latency_batch": B, "timeout": True,
                              "attempt": attempt}), flush=True)
            continue
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
    for B in (32, 64, 128, 192):
        # the tunnel flaps PER-PROCESS (a dead child hangs in
        # block_until_ready until the 1500 s timeout): retry each point
        # once and skip it on a second failure rather than aborting the
        # whole contract (2026-08-20: a single B=32 hang killed the run)
        r = None
        for attempt in (1, 2):
            try:
                r = run_rate(repo, B, args.smoke)
            except subprocess.TimeoutExpired:
                print(json.dumps({"batch": B, "timeout": True,
                                  "attempt": attempt}), flush=True)
                r = None
            if r:
                break
        if r:
            sweep.append(r)
            print(json.dumps(r), flush=True)

    ok = [r for r in sweep
          if r["pts_per_s"] >= (0 if args.smoke else BASELINE)
          and not r["overflow"] and not r["cc_failed"]]
    if not ok:
        raise SystemExit("no batch size cleared the 2.2M baseline")
    lowlat = min(ok, key=lambda r: r["batch"])
    stretch_ok = [r for r in ok if r["pts_per_s"] >= STRETCH]
    contract = min(stretch_ok, key=lambda r: r["batch"]) if stretch_ok else None
    if args.smoke and contract is None:
        contract = max(ok, key=lambda r: r["batch"])

    lat_low = run_latency(repo, lowlat["batch"], args.smoke,
                          "LATENCY_r5_lowlat.json")
    lat_con = None
    if contract is not None:
        if contract["batch"] == lowlat["batch"]:
            lat_con = lat_low
        else:
            lat_con = run_latency(repo, contract["batch"], args.smoke,
                                  "LATENCY_r5.json")
    if lat_low is None:
        raise SystemExit("latency run failed at the low-latency config")

    def loaded_local(lat):
        if lat is None:
            return None
        return lat.get("loaded_soak", {}).get(
            "p50_modeled_local_attach_loaded_ms"
        )

    def loaded_p95_steady(lat):
        if lat is None:
            return None
        return lat.get("loaded_soak", {}).get(
            "p95_modeled_local_attach_loaded_steady_ms"
        )

    out = {
        "metric": "contract_throughput_and_loaded_latency_single_config",
        "throughput_target": BASELINE,
        "throughput_stretch": STRETCH,
        "latency_target_ms": 10.0,
        "sweep": sweep,
        "low_latency_point": {
            "config": {"batch": lowlat["batch"], "nth": 1, "rows": 64,
                       "cols": 2200},
            "throughput_pts_per_s": lowlat["pts_per_s"],
            "latency_p50_ms_as_measured": lat_low["value"],
            "latency_p50_ms_modeled_local_attach": lat_low[
                "p50_modeled_local_attach_ms"],
            "latency_p50_ms_modeled_local_attach_loaded": loaded_local(lat_low),
            "head_hit_rate_steady": lat_low.get("loaded_soak", {}).get(
                "head_hit_rate_steady"),
        },
        "contract_point": None if contract is None else {
            "config": {"batch": contract["batch"], "nth": 1, "rows": 64,
                       "cols": 2200},
            "throughput_pts_per_s": contract["pts_per_s"],
            "latency_p50_ms_as_measured": lat_con and lat_con["value"],
            "latency_p50_ms_modeled_local_attach": lat_con and lat_con[
                "p50_modeled_local_attach_ms"],
            "latency_p50_ms_modeled_local_attach_loaded": loaded_local(lat_con),
            "latency_p95_ms_modeled_local_attach_loaded_steady":
                loaded_p95_steady(lat_con),
            "head_hit_rate_steady": lat_con and lat_con.get(
                "loaded_soak", {}).get("head_hit_rate_steady"),
        },
        "met_baseline": bool(
            lowlat["pts_per_s"] >= BASELINE
            and lat_low["p50_modeled_local_attach_ms"] <= 10.0
        ),
        "met": bool(
            contract is not None and lat_con is not None
            and contract["pts_per_s"] >= STRETCH
            and (loaded_local(lat_con) or 1e9) <= 10.0
        ),
        "note": (
            "met = ONE configuration sustains >=5M pts/s (device scan, slab "
            "readout included, valid periodic method) with <10 ms p50 "
            "cluster-publish latency under load at local attach (loaded "
            "soak per-window wall time with the measured link transfer "
            "replaced by the same bytes at PCIe gen3 x16, composed with the "
            "analytic batching delay and the measured device step; adaptive "
            "slab head active).  met_baseline = the reference's 2.2M bar at "
            "the smallest-B point.  Reference: ~5 ms while sustaining the "
            "VLS-128 stream, /root/reference/README.md:11."
        ),
    }
    print(json.dumps(out))
    if not args.smoke:
        with open(os.path.join(repo, "CONTRACT_r5.json"), "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
