"""Bisect which pipeline stage faults the TPU runtime at KITTI scale.

Each tier runs in a child process (a runtime fault kills the child, not the
bisect).  Usage: python scripts/tpu_bisect.py [--rows 64] [--cols 2200]
"""

import os
import subprocess
import sys

TIERS = [
    ("alloc", "init_state only"),
    ("insert128", "insert 128 firings"),
    ("insert550", "insert 550 firings"),
    ("segment", "insert + ground segmentation"),
    ("assoc", "insert + segment + associate/complete"),
    ("full", "fused pipeline_step"),
]

CHILD = r"""
import os, sys
import numpy as np
import jax, jax.numpy as jnp

tier = os.environ["TIER"]
rows = int(os.environ.get("ROWS", "64"))
cols = int(os.environ.get("COLS", "2200"))

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))) if "__file__" in dir() else ".")
import continuous_clustering_tpu as cct
from continuous_clustering_tpu.evaluation.synthetic import make_scene, raycast_frame, frame_to_firings
from continuous_clustering_tpu.ops.state import init_state
from continuous_clustering_tpu.ops.insertion import insert_firings
from continuous_clustering_tpu.ops.ground_segmentation import SegmentInputs, ground_segment_columns
from continuous_clustering_tpu.ops.association import AssocInputs, associate_and_complete
from continuous_clustering_tpu.models.step import EgoCalibration, pipeline_step
from tests.test_insertion import make_batch

cfg = cct.kitti_config()
cfg = cfg.replace(range_image=cfg.range_image.__class__(num_columns=cols))
state = init_state(cfg, rows)
jax.block_until_ready(state.distance)
print("alloc ok", flush=True)
if tier == "alloc":
    sys.exit(0)

n_firings = 128 if tier == "insert128" else 550 if tier == "insert550" else 256
scene = make_scene(num_boxes=16, seed=0, spread=30.0)
xyz, _ = raycast_frame(scene, num_rows=rows, num_columns=cols, seed=0)
firings = frame_to_firings(xyz)[:n_firings]
poses = [np.eye(4) for _ in firings]
batch = make_batch(firings, poses)

if tier == "full":
    calib = EgoCalibration(
        ego_from_sensor=jnp.asarray(np.eye(4)[:3], jnp.float32),
        height_sensor_to_ground=jnp.asarray(-1.7, jnp.float32))
    fn = jax.jit(lambda s, b, c: pipeline_step(cfg, s, b, c, batch_cols=n_firings + 32))
    state, info = fn(state, batch, calib)
    jax.block_until_ready(state.distance)
    print("full ok n_cols=", int(info.n_cols), flush=True)
    sys.exit(0)

res = jax.jit(lambda s, b: insert_firings(cfg, s, b))(state, batch)
state = res.state
jax.block_until_ready(state.distance)
print("insert ok", flush=True)
if tier.startswith("insert"):
    sys.exit(0)

B = n_firings
n = int(state.first_unfinished)
inputs = SegmentInputs(
    gcol0=jnp.asarray(0, jnp.int32), n_cols=jnp.asarray(min(n, B), jnp.int32),
    sensor_pos=jnp.zeros((B, 3), jnp.float32),
    ego_rot=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)),
    ego_trans=jnp.zeros((B, 3), jnp.float32),
    height_sensor_to_ground=jnp.asarray(-1.7, jnp.float32))
state = jax.jit(lambda s, i: ground_segment_columns(cfg, s, i, B))(state, inputs)
jax.block_until_ready(state.distance)
print("segment ok", flush=True)
if tier == "segment":
    sys.exit(0)

cres = jax.jit(lambda s, i: associate_and_complete(cfg, s, i, B))(
    state, AssocInputs(gcol0=jnp.asarray(0, jnp.int32), n_cols=jnp.asarray(min(n, B), jnp.int32)))
jax.block_until_ready(cres.state.distance)
print("assoc ok fu=", int(cres.fu_new), flush=True)
"""


def main():
    here = os.path.dirname(os.path.abspath(__file__))
    repo = os.path.dirname(here)
    for tier, desc in TIERS:
        env = dict(os.environ)
        env["TIER"] = tier
        for a in sys.argv[1:]:
            if a.startswith("--rows"):
                env["ROWS"] = a.split("=")[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
            if a.startswith("--cols"):
                env["COLS"] = a.split("=")[1] if "=" in a else sys.argv[sys.argv.index(a) + 1]
        r = subprocess.run(
            [sys.executable, "-c", CHILD],
            env=env,
            cwd=repo,
            capture_output=True,
            text=True,
            timeout=900,
        )
        status = "OK" if r.returncode == 0 else f"FAIL rc={r.returncode}"
        print(f"[{tier:10s}] {desc:40s} {status}")
        if r.returncode != 0:
            print("--- stderr tail ---")
            print("\n".join(r.stderr.strip().splitlines()[-6:]))
            break


if __name__ == "__main__":
    main()
