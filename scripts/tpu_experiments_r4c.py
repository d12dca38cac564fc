"""Round-4c TPU battery: the vertical min-scan (CCT_CC_VSCAN) A/B against
the shipped defaults.

CPU rounds probe (scripts/cc_rounds_probe.py, 2026-08-19): composing the
column scan with the row scan cuts mean CC rounds per step
standard 3.0 -> 2.0, near_field 3.17 -> 2.5 (vscan alone loses: wide
components need the row scan).  This battery prices the extra
~log2(R)-step scan per round on the chip.

Method: bench_setup.measure_single_rate (one-dispatch periodic scan per
knob, session-calibrated fixed-cost subtraction); never replays consumed
revolutions.

Usage: python scripts/tpu_experiments_r4c.py
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuous_clustering_tpu.tools import bench_setup  # noqa: E402

bench_setup.enable_compile_cache()
from continuous_clustering_tpu.utils.platform import ensure_backend  # noqa: E402


KNOBS = {
    # shipped defaults (round 4b): one deferred jump + row scan from round 0
    "hs": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "1",
           "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "-1"},
    # + column scan from round 0
    "hsvs": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "1",
             "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0"},
    # staggered: the column scan only from round 1 on (easy steps converge
    # before paying it; per-knob gating is exact since the post(L, it)
    # refactor — ADVICE r4)
    "hsvs1": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "1",
              "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "1"},
    # both scans, jump-free: if the scans collapse enough, the jump's
    # gathers (~8 ms/rev in the r4 trace) can go entirely
    "hsvsj0": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0",
               "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0"},
    # ground-seg row-scan unroll (ops/ground_segmentation.py _gseg_unroll):
    # the r4 trace put the big unattributed while ops at ~25 ms/rev; if
    # that is scan machinery, unrolling amortizes it
    "hs_u4": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "1",
              "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "-1",
              "CCT_GSEG_UNROLL": "4"},
    "hs_u8": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "1",
              "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "-1",
              "CCT_GSEG_UNROLL": "8"},
    # post-scan applied without the lax.cond wrapper (provable no-op at
    # sweep fixpoint; trades one wasted final-round application for the
    # branch machinery on every round)
    "hs_nc": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "1",
              "CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "-1",
              "CCT_CC_POST_NOCOND": "1"},
}


def _already_measured(resume_path):
    """(tag, scene) pairs already banked in a previous (possibly aborted)
    run — the tunnel flaps, so the battery must be resumable across
    windows (each result line prints immediately with flush)."""
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


def main():
    resume = sys.argv[1] if len(sys.argv) > 1 else ""
    done = _already_measured(resume)
    if done:
        print(json.dumps({"resume": sorted(map(list, done))}), flush=True)
    if len(done) >= len(KNOBS) * 3:
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
        for tag, env in KNOBS.items():
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


if __name__ == "__main__":
    raise SystemExit(main())
