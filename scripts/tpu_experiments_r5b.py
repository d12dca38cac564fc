"""Round-5b TPU battery: compositions the r4c battery left untested.

r4c (docs/battery_r4c_tpu.jsonl) found two independent winners:
  * hsvsj0 (both segmented scans, jump-free)  min-over-scenes 6.26M
  * hs_u4  (ground-seg scan unroll 4)         min-over-scenes 6.22M
The CC knobs and the ground-seg unroll touch different stages, so their
composition is plausibly additive (+2-4% from u4 on every scene) — but it
was never measured.  This battery prices the compositions, with hsvsj0
re-measured in-session as the anchor (between-session fixed-cost drift is
~2-3%; same-session rows are the only trustworthy comparison,
docs/ROUND4_NOTES.md).

Method: identical to r4c — bench_setup.measure_single_rate, one-dispatch
periodic scan per knob, session-calibrated fixed-cost subtraction, never
replays consumed revolutions.  Resumable across tunnel flaps.

Usage: python scripts/tpu_experiments_r5b.py [resume_path]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuous_clustering_tpu.tools import bench_setup  # noqa: E402

bench_setup.enable_compile_cache()
from continuous_clustering_tpu.utils.platform import ensure_backend  # noqa: E402


KNOBS = {
    # same-session anchor: the r4c winner (and shipped round-5 default)
    "hsvsj0": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
               "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0",
               "CCT_GSEG_UNROLL": "1"},
    # + ground-seg unroll 4 (the r4c runner-up, independent stage)
    "hsvsj0_u4": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                  "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0",
                  "CCT_GSEG_UNROLL": "4"},
    # + unroll 8 (r4c showed u8 slightly behind u4 on hs; confirm composed)
    "hsvsj0_u8": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                  "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0",
                  "CCT_GSEG_UNROLL": "8"},
    # staggered column scan composed with jump-free + u4: hsvs1 won clutter
    # in r4c (6.30M) by skipping the scan on easy rounds
    "hsvs1j0_u4": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                   "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "1",
                   "CCT_GSEG_UNROLL": "4"},
    # ---- wave 2 (after the first 4 ran): hsvs1j0_u4 won min-over-scenes
    # 6.64M (+7.9% over the anchor).  Probe the remaining neighbors of the
    # winner: u8 (beat u4 on 2/3 scenes in wave 1) and staggering the ROW
    # scan too (the row scan also costs every round; round-0 may be cheap
    # enough to skip on easy steps for the same reason vs@1 won).
    "hsvs1j0_u8": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                   "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "1",
                   "CCT_GSEG_UNROLL": "8"},
    "hs1vs1j0_u4": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
                    "CCT_CC_HSCAN": "1", "CCT_CC_VSCAN": "1",
                    "CCT_GSEG_UNROLL": "4"},
}


def _already_measured(resume_path):
    done = set()
    if resume_path and os.path.exists(resume_path):
        with open(resume_path) as f:
            for line in f:
                line = line.strip()
                if not line.startswith("{"):
                    continue
                try:
                    r = json.loads(line)
                except json.JSONDecodeError:
                    continue
                if "tag" in r and "scene" in r and "pts_per_s" in r:
                    done.add((r["tag"], r["scene"]))
    return done


def run_battery(knobs, resume=""):
    """Measure every (tag, scene) in ``knobs`` with ONE session calibration.

    Shared by the r5b compositions and the r5c same-session confirm; rows
    already present in ``resume`` are skipped (tunnel-flap resumability).
    """
    done = _already_measured(resume)
    if done:
        print(json.dumps({"resume": sorted(map(list, done))}), flush=True)
    if len(done) >= len(knobs) * 3:
        print(json.dumps({"status": "battery complete (resumed)"}), flush=True)
        return 0

    ensure_backend()
    import jax

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from tpu_experiments_r4 import SCENES, link_ms, make_scene_firings

    rt = link_ms()
    print(json.dumps({"probe": "link_rt_ms", "value": round(rt, 1)}), flush=True)
    if rt > 80:
        print(json.dumps({"error": "tunnel degraded", "rt_ms": round(rt, 1)}),
              flush=True)
        return 3

    scenes = {}
    cfg = None
    for name in SCENES:
        cfg, pipe = bench_setup.make_bench_pipe(
            num_rows=64, num_cols=2200, batch=384, nth=1, ring_revs=10
        )
        firings, n_points = make_scene_firings(name)
        scene = bench_setup.capture_revolution(pipe, firings, 2200)
        scenes[name] = (pipe, scene, n_points)

    pipe0, scene0, n0 = scenes["standard"]
    cal = bench_setup.measure_periodic_rate(
        cfg, pipe0, scene0, 2200, n0, N=6, pairs=2
    )
    fixed_s = cal["fixed_call_s"]
    print(json.dumps({
        "probe": "fixed_call_ms", "value": round(fixed_s * 1000, 1),
        "diff_ok": cal["diff_ok"], "calibration_pts_per_s": cal["pts_per_s"],
    }), flush=True)

    for scene_name in scenes:
        pipe, scene, n_points = scenes[scene_name]
        for tag, env in knobs.items():
            if (tag, scene_name) in done:
                continue
            saved = {k: os.environ.get(k) for k in env}
            os.environ.update(env)
            try:
                jax.clear_caches()
                res = bench_setup.measure_single_rate(
                    cfg, pipe, scene, 2200, n_points,
                    N=10, calls=2, fixed_s=fixed_s,
                )
                res.update(tag=tag, scene=scene_name)
                print(json.dumps(res), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({"tag": tag, "scene": scene_name,
                                  "error": str(e)[:160]}), flush=True)
            finally:
                for k, v in saved.items():
                    if v is None:
                        os.environ.pop(k, None)
                    else:
                        os.environ[k] = v
    return 0


def main():
    resume = sys.argv[1] if len(sys.argv) > 1 else ""
    return run_battery(KNOBS, resume)


if __name__ == "__main__":
    raise SystemExit(main())
