"""Multi-sensor streaming demo (reference demo_touareg.launch analog).

Runs N independent sensor streams — the reference's three-node deployment
(roof VLS-128 + two tilted OS-32, launch/demo_touareg.launch:20-31) — either
as host-parallel pipelines or through the sharded multi-sensor device step
(dp-over-sensors mesh).

Usage:
    python -m continuous_clustering_tpu.tools.multi_sensor_demo \
        [--sensors 3] [--rows 32] [--columns 440] [--revolutions 2] [--sharded]
"""

from __future__ import annotations

import json
import math
import sys
import time

import numpy as np

from ..config import Config
from ..evaluation.synthetic import make_scene, raycast_frame, frame_to_firings
from ..models.continuous_clustering import ContinuousClustering
from ..utils.cli import CommandLineParser


def tilted_pose(roll_deg: float) -> np.ndarray:
    """Sensor mounted with a roll tilt (the touareg OS-32s are tilted)."""
    r = math.radians(roll_deg)
    m = np.eye(4)
    m[:3, :3] = np.array(
        [[1, 0, 0], [0, math.cos(r), -math.sin(r)], [0, math.sin(r), math.cos(r)]]
    )
    return m


def main(argv=None):
    from ..utils.platform import ensure_backend

    ensure_backend()
    p = CommandLineParser(argv if argv is not None else sys.argv[1:])
    n_sensors = int(p.get_value_for_argument("--sensors", "3"))
    rows = int(p.get_value_for_argument("--rows", "32"))
    cols = int(p.get_value_for_argument("--columns", "440"))
    revolutions = int(p.get_value_for_argument("--revolutions", "2"))
    sharded = p.argument_exists("--sharded")

    base = Config()
    cfg = base.replace(
        range_image=base.range_image.__class__(num_columns=cols, ring_buffer_revolutions=4)
    )

    scenes = [make_scene(num_boxes=6 + i, seed=i, spread=22.0) for i in range(n_sensors)]
    frames = [
        raycast_frame(s, num_rows=rows, num_columns=cols, seed=i)[0]
        for i, s in enumerate(scenes)
    ]
    tilts = [tilted_pose(0.0 if i == 0 else (20.0 if i % 2 else -20.0)) for i in range(n_sensors)]

    if sharded:
        _run_sharded(cfg, rows, cols, revolutions, frames)
        return

    pipes = []
    counts = [0] * n_sensors
    for i in range(n_sensors):
        pipe = ContinuousClustering(cfg, firing_batch_size=110)
        pipe.reset(rows)
        pipe.set_transform_robot_frame_from_sensor_frame(tilts[i])
        pipe.set_finished_cluster_callback(
            lambda pts, stamp, i=i: counts.__setitem__(i, counts[i] + 1)
        )
        pipes.append(pipe)

    total_points = 0
    t0 = time.perf_counter()
    for rev in range(revolutions):
        for i, pipe in enumerate(pipes):
            for firing in frame_to_firings(
                frames[i], start_stamp=rev * 10**8, end_stamp=(rev + 1) * 10**8,
                frame_index=rev,
            ):
                pipe.add_firing(firing, np.eye(4))
                total_points += int(np.sum(~np.isnan(firing["xyz"][:, 0])))
    for pipe in pipes:
        pipe.flush()
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sensors": n_sensors,
                "clusters_per_sensor": counts,
                "points_per_second": round(total_points / dt, 1),
                "mode": "host-parallel",
            }
        )
    )


def _run_sharded(cfg, rows, cols, revolutions, frames):
    import jax
    import jax.numpy as jnp

    from ..parallel.mesh import make_mesh
    from ..parallel.multi_sensor import make_sharded_step, stacked_init
    from ..models.step import EgoCalibration
    from ..ops.insertion import FiringBatch

    S = len(frames)
    mesh = make_mesh(dp=min(S, max(1, len(jax.devices()))))
    state = stacked_init(cfg, rows, S)
    run = make_sharded_step(cfg, mesh, batch_cols=142)

    def batch_for(frame, rev, lo, hi):
        firings = frame_to_firings(frame, frame_index=rev)[lo:hi]
        F = 110
        xyz = np.full((F, rows, 3), np.nan, np.float32)
        for k, f in enumerate(firings):
            xyz[k] = f["xyz"]
        z = np.zeros((F, rows), np.uint32)
        return FiringBatch(
            xyz=jnp.asarray(xyz),
            pose=jnp.asarray(np.stack([np.eye(4)[:3]] * F), jnp.float32),
            stamp_lo=jnp.asarray(z), stamp_hi=jnp.asarray(z),
            uidx_lo=jnp.asarray(z), uidx_hi=jnp.asarray(z),
            intensity=jnp.asarray(z, jnp.int32),
            firing_index=jnp.arange(F, dtype=jnp.int32) + lo,
            valid=jnp.asarray(np.arange(F) < len(firings)),
        )

    calib = EgoCalibration(
        ego_from_sensor=jnp.asarray(np.eye(4)[:3], jnp.float32),
        height_sensor_to_ground=jnp.asarray(-1.7, jnp.float32),
    )
    scalib = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (S,) + x.shape).copy(), calib
    )

    t0 = time.perf_counter()
    n_chunks = (cols + 109) // 110
    clusters = 0
    for rev in range(revolutions):
        for c in range(n_chunks):
            batches = [
                batch_for(frames[i], rev, c * 110, (c + 1) * 110) for i in range(S)
            ]
            sbatch = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *batches)
            state, info = run(state, sbatch, scalib)
            clusters += int(jnp.sum(info.num_new_clusters))
    jax.block_until_ready(state.distance)
    dt = time.perf_counter() - t0
    print(
        json.dumps(
            {
                "sensors": S,
                "mesh": dict(mesh.shape),
                "total_new_clusters": clusters,
                "wall_s": round(dt, 2),
                "mode": "sharded",
            }
        )
    )


if __name__ == "__main__":
    main()
