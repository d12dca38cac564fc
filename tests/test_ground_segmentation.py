"""Ground segmentation op vs the sequential oracle."""

import numpy as np
import pytest

import jax.numpy as jnp

from continuous_clustering_tpu.config import kitti_config
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)
from continuous_clustering_tpu.ops.ground_segmentation import (
    SegmentInputs,
    ground_segment_columns,
)
from continuous_clustering_tpu.ops.insertion import insert_firings
from continuous_clustering_tpu.ops.oracle import OracleContinuousClustering
from continuous_clustering_tpu.ops.state import init_state

from .test_insertion import make_batch, small_config

NUM_ROWS = 32
NUM_COLS = 220


def run_pair(num_frames=1, seed=1, jitter=0.0, dropout=0.0, fog=False, batch_split=None):
    cfg = small_config()
    if fog:
        gs = cfg.ground_segmentation.__class__(
            **{
                **{
                    f.name: getattr(cfg.ground_segmentation, f.name)
                    for f in cfg.ground_segmentation.__dataclass_fields__.values()
                },
                "fog_filtering_enabled": True,
            }
        )
        cfg = cfg.replace(ground_segmentation=gs)
    scene = make_scene(num_boxes=8, seed=seed, spread=22.0)
    firings = []
    for f in range(num_frames):
        xyz, _ = raycast_frame(
            scene,
            num_rows=NUM_ROWS,
            num_columns=NUM_COLS,
            azimuth_jitter=jitter,
            dropout=dropout,
            seed=seed + f,
        )
        firings += frame_to_firings(xyz, frame_index=f)
    poses = [np.eye(4) for _ in firings]
    if fog:
        # low-intensity returns so the fog filter actually fires
        rng_f = np.random.default_rng(seed)
        for f in firings:
            low = rng_f.random(NUM_ROWS) < 0.3
            f["intensity"] = np.where(low, 0, f["intensity"]).astype(np.uint8)

    # oracle: full pipeline (association etc. don't touch ground labels)
    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))
    for f, p in zip(firings, poses):
        oracle.add_firing(f, p)

    # device: insert then segment the finished range
    state = init_state(cfg, NUM_ROWS)
    res = insert_firings(cfg, state, make_batch(firings, poses))
    state = res.state
    first = 0
    last = int(state.first_unfinished)  # exclusive
    n = last - first
    splits = batch_split or [n]
    hsg = np.float32(-0.0 + cfg.ground_segmentation.height_ref_to_ground)
    start = first
    for chunk in splits:
        chunk = min(chunk, last - start)
        if chunk <= 0:
            break
        B = chunk
        inputs = SegmentInputs(
            gcol0=jnp.asarray(start, jnp.int32),
            n_cols=jnp.asarray(chunk, jnp.int32),
            sensor_pos=jnp.zeros((B, 3), jnp.float32),
            ego_rot=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)),
            ego_trans=jnp.zeros((B, 3), jnp.float32),
            height_sensor_to_ground=jnp.asarray(hsg, jnp.float32),
        )
        state = ground_segment_columns(cfg, state, inputs, B)
        start += chunk
    return cfg, oracle, state, (first, last)


def compare(cfg, oracle, state, rng, min_match=1.0):
    first, last = rng
    # the oracle's publishing stage clears columns one rotation behind the
    # frontier (…cpp:1079,1091); only compare live columns
    first = max(first, oracle.ring_start)
    rc = cfg.ring_buffer_max_columns
    n = last - first
    o_label = np.zeros((NUM_ROWS, n), np.int32)
    o_debug = np.zeros((NUM_ROWS, n), np.int32)
    o_ign = np.zeros((NUM_ROWS, n), bool)
    o_inc = np.zeros((NUM_ROWS, n), np.float32)
    o_caz = np.zeros((NUM_ROWS, n), np.float64)
    for i, g in enumerate(range(first, last)):
        lc = g % rc
        for r in range(NUM_ROWS):
            c = oracle.cells[lc][r]
            o_label[r, i] = c.ground_point_label
            o_debug[r, i] = c.debug_label
            o_ign[r, i] = c.is_ignored
            o_inc[r, i] = c.inclination_angle
            o_caz[r, i] = c.continuous_azimuth_angle

    lcols = (np.arange(first, last)) % rc
    j_label = np.asarray(state.ground_label)[:, lcols]
    j_debug = np.asarray(state.debug_label)[:, lcols]
    j_ign = np.asarray(state.is_ignored)[:, lcols]
    j_inc = np.asarray(state.inclination)[:, lcols]
    j_caz = np.asarray(state.cont_az)[:, lcols]

    label_match = (j_label == o_label).mean()
    debug_match = (j_debug == o_debug).mean()
    ign_match = (j_ign == o_ign).mean()
    assert label_match >= min_match, f"ground label match {label_match}"
    assert debug_match >= min_match, f"debug label match {debug_match}"
    assert ign_match >= min_match, f"is_ignored match {ign_match}"
    # supplemented inclinations agree (nan pattern + values)
    np.testing.assert_array_equal(np.isnan(j_inc), np.isnan(o_inc))
    ok = ~np.isnan(o_inc)
    np.testing.assert_allclose(j_inc[ok], o_inc[ok], atol=1e-5)
    # continuous azimuth (f32 relative) close to oracle's f64
    np.testing.assert_allclose(j_caz, o_caz, atol=1e-4)


def test_ground_seg_matches_oracle_clean():
    cfg, oracle, state, rng = run_pair()
    assert not bool(state.overflow)
    compare(cfg, oracle, state, rng)


def test_ground_seg_matches_oracle_noisy():
    cfg, oracle, state, rng = run_pair(seed=5, jitter=0.3, dropout=0.05)
    compare(cfg, oracle, state, rng)


def test_ground_seg_matches_oracle_batched():
    """Splitting into column batches must not change results (carry flows)."""
    cfg, oracle, state, rng = run_pair(seed=2, batch_split=[50, 64, 64, 64])
    compare(cfg, oracle, state, rng)


def test_ground_seg_matches_oracle_fog():
    cfg, oracle, state, rng = run_pair(seed=3, fog=True)
    compare(cfg, oracle, state, rng)


def test_ground_seg_two_frames():
    cfg, oracle, state, rng = run_pair(num_frames=2, seed=4)
    compare(cfg, oracle, state, rng)
