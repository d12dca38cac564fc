"""CPU probe: CC fixpoint rounds per step vs the post-sweep scan knobs.

CC round counts are data-dependent but platform-independent, so the CPU
answers "does this knob cut rounds?" before spending a TPU session on
"does it pay for its per-round cost?".  This is the probe that motivated
CCT_CC_HSCAN in round 4 (near_field spikes 12->4; docs/ROUND4_NOTES.md);
this round it evaluates the vertical counterpart CCT_CC_VSCAN
(association._vscan_min) on the same three bench scenes.

Usage: python scripts/cc_rounds_probe.py [--scenes standard,clutter]
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("CCT_NATIVE_REQUIRED", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

from continuous_clustering_tpu.tools import bench_setup  # noqa: E402

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from tpu_experiments_r4 import SCENES, make_scene_firings  # noqa: E402

# Schedules: the shipped default (hscan from round 0, one deferred jump)
# against the column scan added / substituted.
KNOBS = {
    "default(hs)": {"CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "-1"},
    "hs+vs": {"CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "0"},
    # staggered: the column scan only from round N on — if the spike steps
    # are the only ones needing it, this keeps their round cut while easy
    # steps (which converge before round N) never pay the scan
    "hs+vs@1": {"CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "1"},
    "hs+vs@2": {"CCT_CC_HSCAN": "0", "CCT_CC_VSCAN": "2"},
    "vs_only": {"CCT_CC_HSCAN": "-1", "CCT_CC_VSCAN": "0"},
    "none": {"CCT_CC_HSCAN": "-1", "CCT_CC_VSCAN": "-1"},
}


def probe(scene_name, env):
    saved = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        jax.clear_caches()
        cfg, pipe = bench_setup.make_bench_pipe(
            num_rows=64, num_cols=2200, batch=384, nth=1, ring_revs=10
        )
        firings, _ = make_scene_firings(scene_name)
        pipe._publish_trace = []
        for f in firings:
            pipe.add_firing(f, np.eye(4))
        pipe.flush()
        rounds = [t["cc_rounds"] for t in pipe._publish_trace if t["n_cols"] > 0]
        return rounds
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def main():
    arg = [a for a in sys.argv[1:] if a.startswith("--scenes")]
    names = list(SCENES)
    if arg:
        names = arg[0].split("=", 1)[1].split(",")
    for scene in names:
        for tag, env in KNOBS.items():
            rounds = probe(scene, env)
            print(
                json.dumps(
                    {
                        "scene": scene,
                        "tag": tag,
                        "steps": len(rounds),
                        "mean": round(float(np.mean(rounds)), 2),
                        "max": int(np.max(rounds)),
                        "total": int(np.sum(rounds)),
                    }
                ),
                flush=True,
            )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
