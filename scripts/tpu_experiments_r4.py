"""Round-4 TPU battery: CC-knob re-derivation (post jump-clamp fix) and the
scene deficit (VERDICT r3 items 1b and 5).

The r3 battery (with the fixed j=0) showed the round-3 defaults (s=3,
after=2) LOSING to simpler settings — s=1 j=2 measured 5.13M vs baseline
4.8-4.9M — and agg=rows beating agg=pack, both on the standard scene only.
This battery measures the candidate knob matrix on ALL THREE bench scenes
(the north star says "sustain >= 5M", which clutter-heavy streets must
meet too), plus the publish-slab production cost at the winning config.

Prints one JSON line per measurement; exits nonzero on a degraded link.

Usage: python scripts/tpu_experiments_r4.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuous_clustering_tpu.tools import bench_setup  # noqa: E402

bench_setup.enable_compile_cache()
from continuous_clustering_tpu.utils.platform import ensure_backend  # noqa: E402

ensure_backend()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

SCENES = {  # (num_boxes, spread, min_radius) — must match bench.py SCENES
    "standard": (24, 35.0, 5.0),
    "near_field": (24, 12.0, 3.0),
    "clutter": (96, 30.0, 4.0),
}

KNOBS = {  # label -> env (all explicit: the shipped defaults changed to s1j2)
    "s3a2": {"CCT_SWEEPS": "3", "CCT_CC_JUMP": "2", "CCT_CC_JUMP_AFTER": "2"},
    "s1j2": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "2", "CCT_CC_JUMP_AFTER": "0"},
    "s2j0": {"CCT_SWEEPS": "2", "CCT_CC_JUMP": "0"},
    "s2j1": {"CCT_SWEEPS": "2", "CCT_CC_JUMP": "1", "CCT_CC_JUMP_AFTER": "0"},
    # alternating dc direction per round (zero per-round cost; targets the
    # near-field/clutter round spikes seen in the cc_rounds meta lane)
    "s1j2alt": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "2",
                "CCT_CC_JUMP_AFTER": "0", "CCT_CC_ALT": "1"},
    "s1j0alt": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "0", "CCT_CC_ALT": "1"},
    # stronger per-round chain compression: the cc_rounds meta lane shows
    # 8-12-round spikes on near_field/clutter steps at j=2; an extra jump
    # costs ~0.18 ms/round but can cut rounds superlinearly
    "s1j3": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "3", "CCT_CC_JUMP_AFTER": "0"},
    # segmented row min-scan after each sweep (association._hscan_min): on
    # CPU probes it cuts near_field spikes 12->4 (mean 4.7->3.0) and
    # clutter 8->6 (4.7->3.5); measure the TPU cost of the two
    # associative scans per round before defaulting
    "s1j2hs": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "2",
               "CCT_CC_JUMP_AFTER": "0", "CCT_CC_HSCAN": "0"},
    "s1j1hs": {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "1",
               "CCT_CC_JUMP_AFTER": "0", "CCT_CC_HSCAN": "0"},
}


def link_ms():
    trivial = jax.jit(lambda x: x + 1)
    int(np.asarray(trivial(jnp.int32(0))))
    t0 = time.perf_counter()
    for k in range(5):
        int(np.asarray(trivial(jnp.int32(k))))
    return (time.perf_counter() - t0) * 1000 / 5


def make_scene_firings(name, num_rows=64, num_cols=2200):
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )

    boxes, spread, min_r = SCENES[name]
    scene = make_scene(num_boxes=boxes, seed=0, spread=spread, min_radius=min_r)
    xyz, _ = raycast_frame(scene, num_rows=num_rows, num_columns=num_cols, seed=0)
    n_points = int(np.sum(~np.isnan(xyz[..., 0])))
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10**8)
    return firings, n_points


def main():
    quick = "--quick" in sys.argv
    rt = link_ms()
    print(json.dumps({"probe": "link_rt_ms", "value": round(rt, 1)}), flush=True)
    if rt > 80:
        print(json.dumps({"error": "tunnel degraded", "rt_ms": round(rt, 1)}),
              flush=True)
        return 3

    # Measurement method (round-4 correction): the original battery replayed
    # already-consumed revolutions (revs[k % len] past one pass), whose steps
    # DEGENERATE — frontier stuck, zero clusters — so 3 of its 8 measured
    # revolutions under-worked and every banked rate was optimistic.  Now
    # every measurement advances one coherent stream via the periodic runner
    # (ONE dispatch per call), the per-call fixed cost is calibrated once by
    # the 2N-vs-N differencing and subtracted (knob-independent), and each
    # knob costs one compile.
    scenes = {}
    cfg = None
    for name in (["standard"] if quick else SCENES):
        # fresh pipe per scene: the host-insertion engine's global-column
        # counter must start at 0 for each scene's block stream
        cfg, pipe = bench_setup.make_bench_pipe(
            num_rows=64, num_cols=2200, batch=384, nth=1, ring_revs=10
        )
        firings, n_points = make_scene_firings(name)
        scene = bench_setup.capture_revolution(pipe, firings, 2200)
        scenes[name] = (pipe, scene, n_points)

    # session fixed-cost calibration on the standard scene, default knobs
    pipe0, scene0, n0 = scenes["standard"]
    cal = bench_setup.measure_periodic_rate(
        cfg, pipe0, scene0, 2200, n0, N=3 if quick else 6, pairs=2
    )
    fixed_s = cal["fixed_call_s"]
    print(json.dumps({
        "probe": "fixed_call_ms", "value": round(fixed_s * 1000, 1),
        "diff_ok": cal["diff_ok"],
        "calibration_pts_per_s": cal["pts_per_s"],
    }), flush=True)

    def measure(tag, scene_name, env=None, slab_cols=0, slab_head=0):
        pipe, scene, n_points = scenes[scene_name]
        env = env or {}
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            jax.clear_caches()
            res = bench_setup.measure_single_rate(
                cfg, pipe, scene, 2200, n_points,
                N=4 if quick else 10, calls=2, fixed_s=fixed_s,
                slab_cols=slab_cols, slab_head=slab_head,
            )
            res["tag"] = tag
            res["scene"] = scene_name
            print(json.dumps(res), flush=True)
            return res
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tag": tag, "scene": scene_name,
                              "error": str(e)[:160]}), flush=True)
            return None
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for scene in scenes:
        for klabel, kenv in (list(KNOBS.items())[:2] if quick else KNOBS.items()):
            for agg in ("pack", "rows"):
                env = dict(kenv)
                env["CCT_AGG"] = agg
                measure(f"{klabel}/{agg}", scene, env)

    # publish-slab production cost (the streaming path pays this every step;
    # the pure-compute knob matrix doesn't): winner knobs, standard scene
    if not quick:
        for sc, sh, tag in ((0, 0, "slab=off"), (1024, 512, "slab=on")):
            measure(
                f"{tag} s1j2/rows", "standard",
                {"CCT_SWEEPS": "1", "CCT_CC_JUMP": "2",
                 "CCT_CC_JUMP_AFTER": "0", "CCT_AGG": "rows"},
                slab_cols=sc, slab_head=sh,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
