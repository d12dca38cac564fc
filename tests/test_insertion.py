"""JAX insertion op vs the sequential oracle's insertion stage."""

import numpy as np
import pytest

import jax.numpy as jnp

from continuous_clustering_tpu.config import kitti_config
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)
from continuous_clustering_tpu.ops.insertion import FiringBatch, insert_firings
from continuous_clustering_tpu.ops.oracle import OracleContinuousClustering
from continuous_clustering_tpu.ops.state import init_state

NUM_ROWS = 32
NUM_COLS = 220


def small_config():
    cfg = kitti_config()
    return cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )


def make_batch(firings, poses):
    F = len(firings)
    R = firings[0]["xyz"].shape[0]
    xyz = np.stack([f["xyz"] for f in firings])
    stamp = np.stack([f["stamp"] for f in firings])
    uidx = np.stack([f["uidx"] for f in firings])
    return FiringBatch(
        xyz=jnp.asarray(xyz, jnp.float32),
        pose=jnp.asarray(np.stack(poses)[:, :3, :], jnp.float32),
        stamp_lo=jnp.asarray(stamp & 0xFFFFFFFF, jnp.uint32),
        stamp_hi=jnp.asarray(stamp >> 32, jnp.uint32),
        uidx_lo=jnp.asarray(uidx & np.uint64(0xFFFFFFFF), jnp.uint32),
        uidx_hi=jnp.asarray(uidx >> np.uint64(32), jnp.uint32),
        intensity=jnp.asarray(np.stack([f["intensity"] for f in firings]), jnp.int32),
        firing_index=jnp.asarray([f["firing_index"] for f in firings], jnp.int32),
        valid=jnp.ones(F, dtype=bool),
    )


@pytest.mark.parametrize("jitter", [0.0, 0.3])
def test_insertion_matches_oracle(jitter):
    cfg = small_config()
    scene = make_scene(num_boxes=6, seed=1, spread=20.0)
    xyz, _ = raycast_frame(
        scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, azimuth_jitter=jitter, seed=7
    )
    firings = frame_to_firings(xyz)
    poses = [np.eye(4) for _ in firings]

    # oracle with segmentation disabled (pure insertion state)
    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))
    oracle._segment_column = lambda gcol, pose: None
    for f, p in zip(firings, poses):
        oracle.add_firing(f, p)

    # device op
    state = init_state(cfg, NUM_ROWS)
    result = insert_firings(cfg, state, make_batch(firings, poses))
    s = result.state

    assert int(s.prev_rearmost) == oracle.prev_rearmost
    assert int(s.prev_foremost) == oracle.prev_foremost
    assert int(s.first_unfinished) == oracle.first_unfinished
    assert int(s.first_unpublished) == oracle.first_unpublished
    assert not bool(s.reset_required)

    rc = cfg.ring_buffer_max_columns
    o_dist = np.full((NUM_ROWS, rc), np.nan, np.float32)
    o_gcol = np.full((NUM_ROWS, rc), -1, np.int64)
    o_x = np.full((NUM_ROWS, rc), np.nan, np.float32)
    for lc in range(rc):
        for r in range(NUM_ROWS):
            c = oracle.cells[lc][r]
            o_dist[r, lc] = c.distance
            o_gcol[r, lc] = c.global_column_index
            o_x[r, lc] = c.x

    j_dist = np.asarray(s.distance)
    j_gcol = np.asarray(s.gcol)
    j_x = np.asarray(s.x)

    np.testing.assert_array_equal(np.isnan(j_dist), np.isnan(o_dist))
    np.testing.assert_array_equal(j_gcol, o_gcol)
    filled = ~np.isnan(o_dist)
    np.testing.assert_allclose(j_dist[filled], o_dist[filled], rtol=1e-6)
    np.testing.assert_allclose(j_x[filled], o_x[filled], rtol=1e-5, atol=1e-5)


def test_insertion_with_moving_sensor():
    """Ego translation between firings exercises the odom transform path."""
    cfg = small_config()
    scene = make_scene(num_boxes=4, seed=2, spread=20.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)
    firings = frame_to_firings(xyz)
    poses = []
    for i in range(len(firings)):
        p = np.eye(4)
        p[0, 3] = i * 0.005  # ~1.1 m per rotation
        poses.append(p)

    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))
    oracle._segment_column = lambda gcol, pose: None
    for f, p in zip(firings, poses):
        oracle.add_firing(f, p)

    state = init_state(cfg, NUM_ROWS)
    result = insert_firings(cfg, state, make_batch(firings, poses))
    s = result.state

    rc = cfg.ring_buffer_max_columns
    o_gcol = np.full((NUM_ROWS, rc), -1, np.int64)
    for lc in range(rc):
        for r in range(NUM_ROWS):
            o_gcol[r, lc] = oracle.cells[lc][r].global_column_index
    # poses shift points slightly; allow tiny fraction of cells to differ
    mismatch = (np.asarray(s.gcol) != o_gcol).mean()
    assert mismatch < 0.001, f"gcol mismatch fraction {mismatch}"


def test_reset_required_flag():
    cfg = small_config()
    xyz = np.full((1, 2, 3), np.nan, np.float32)
    xyz[0, 0] = [-10, 0.01, -1.7]
    xyz[0, 1] = [10, -1.0, -1.7]
    firings = [
        {
            "xyz": xyz[0],
            "stamp": np.zeros(2, np.uint64),
            "intensity": np.zeros(2, np.uint8),
            "firing_index": 0,
            "uidx": np.zeros(2, np.uint64),
        }
    ]
    state = init_state(cfg, 2)
    result = insert_firings(cfg, state, make_batch(firings, [np.eye(4)]))
    assert bool(result.state.reset_required)
