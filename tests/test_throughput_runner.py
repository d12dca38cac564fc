"""Scanned multi-batch runner matches per-batch stepping."""

import numpy as np
import jax
import jax.numpy as jnp

from continuous_clustering_tpu.models.continuous_clustering import ContinuousClustering
from continuous_clustering_tpu.models.throughput import make_scan_runner, stack_batches
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)

from .test_pipeline import small_config

NUM_ROWS, NUM_COLS = 16, 110


def test_scan_runner_matches_streaming():
    cfg = small_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(num_columns=NUM_COLS, ring_buffer_revolutions=4)
    )
    scene = make_scene(num_boxes=4, seed=1, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=1)

    # streaming path
    pipe = ContinuousClustering(cfg, firing_batch_size=55)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    for rev in range(2):
        for f in frame_to_firings(xyz, frame_index=rev):
            pipe.add_firing(f, np.eye(4))
    # no flush: compare the state after exactly the same number of steps

    # scanned path on a fresh pipeline
    p2 = ContinuousClustering(cfg, firing_batch_size=55)
    p2.reset(NUM_ROWS)
    p2.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    firings = frame_to_firings(xyz)
    per_step = []
    for start in range(0, NUM_COLS, 55):
        chunk = firings[start : start + 55]
        per_step.append(p2._make_batch(chunk, [np.eye(4)] * len(chunk)))
    stacked = stack_batches(per_step)
    runner = make_scan_runner(cfg, p2._batch_B)
    state = p2.state
    for _ in range(2):
        state, infos = runner(state, stacked, p2._make_calib())
    jax.block_until_ready(state.distance)

    assert not bool(state.overflow)
    assert int(state.first_unpublished) == pipe._h_first_unpublished
    assert int(state.cluster_counter) == pipe._h_cluster_counter

    def cell_ids(s):
        slots = np.asarray(s.slot)
        res = np.asarray(s.slot_parent)[np.maximum(slots, 0)]
        return np.where(slots >= 0, np.asarray(s.slot_cid)[res], 0)

    np.testing.assert_array_equal(cell_ids(state), cell_ids(pipe.state))
