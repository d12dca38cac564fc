"""Scanned multi-batch runner matches per-batch stepping."""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from continuous_clustering_tpu.models.continuous_clustering import ContinuousClustering
from continuous_clustering_tpu.models.host_insertion import HostInsertion
from continuous_clustering_tpu.models.throughput import (
    make_block_scan_runner,
    make_periodic_block_scan_runner,
    make_scan_runner,
    stack_batches,
)
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


def _capture_rev(cfg, pipe, ins, firings, poses):
    blocks, segp = [], []
    first, end, reset = ins.add_firings(firings, poses)
    while first < end:
        blk, trig = ins.fetch_block(first, end, pipe._batch_B, 0, reset)
        blocks.append(blk)
        segp.append(pipe._seg_poses(trig))
        first += int(blk.n_cols)
    ins.clear_before(end - NUM_COLS)
    return blocks, segp


def test_periodic_runner_matches_real_stream_semantics():
    """The bench's periodic block replay (one revolution + exact offsets,
    models/throughput.py make_periodic_block_scan_runner) is a valid stream
    with the production scene's steady-state work profile: the frontier
    advances one revolution per revolution, CC converges, and per-revolution
    cluster production equals the really re-inserted stream's (bit-level
    block equality is impossible — the host engine's f32 azimuth
    accumulation jitters column boundaries by +-1 between revolutions)."""
    cfg = small_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )
    scene = make_scene(num_boxes=4, seed=1, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=1)
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10**8)
    poses = [np.eye(4)] * len(firings)
    hsg = jnp.asarray(np.float32(-1.5))
    N_REV = 6

    def fresh():
        p = ContinuousClustering(cfg, firing_batch_size=55)
        p.reset(NUM_ROWS)
        p.set_transform_robot_frame_from_sensor_frame(np.eye(4))
        return p

    # ---- periodic replay of revolution 0 ----
    pipe = fresh()
    ins = HostInsertion(cfg, NUM_ROWS)
    blocks, segp = _capture_rev(cfg, pipe, ins, firings, poses)
    per_rev = len(blocks)
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    blocks0, segp0 = stack(blocks), stack(segp)
    runner = make_periodic_block_scan_runner(
        cfg, pipe._batch_B, NUM_COLS, per_rev, reduce_infos=False
    )
    state = pipe.state
    new_per_rev = []
    for rev in range(N_REV):
        state, infos = runner(
            state, blocks0, segp0, hsg, jnp.int32(rev * per_rev)
        )
        new_per_rev.append(int(np.sum(np.asarray(infos.num_new_clusters))))
    assert not bool(state.overflow)
    assert not bool(state.cc_failed)
    # frontier: one revolution per revolution, minus the completion lag
    fu = int(state.first_unpublished)
    assert (N_REV - 2) * NUM_COLS < fu <= N_REV * NUM_COLS
    # steady state: identical scene content -> identical cluster production
    assert new_per_rev[3] == new_per_rev[4] == new_per_rev[5]
    assert new_per_rev[4] > 0

    # ---- really re-inserted stream (the production path) ----
    p2 = fresh()
    ins2 = HostInsertion(cfg, NUM_ROWS)
    real_runner = make_block_scan_runner(cfg, p2._batch_B)
    state2 = p2.state
    real_per_rev = []
    for rev in range(N_REV):
        blocks, segp = _capture_rev(cfg, p2, ins2, firings, poses)
        while len(blocks) < per_rev:  # fixed leading dim: pad no-op blocks
            blocks.append(blocks[-1]._replace(n_cols=jnp.zeros((), jnp.int32)))
            segp.append(segp[-1])
        state2, infos = real_runner(state2, stack(blocks), stack(segp), hsg)
        real_per_rev.append(int(np.sum(np.asarray(infos.num_new_clusters))))
    assert not bool(state2.overflow)
    assert real_per_rev[4] == new_per_rev[4]
    assert abs(int(state2.first_unpublished) - fu) <= 2


def _periodic_soak(cfg, n_rev, rebase_every, chunk_revs=50):
    """Run the periodic runner n_rev revolutions in chunk_revs-sized calls
    (one coherent stream via k0); returns (state, per-rev new clusters)."""
    scene = make_scene(num_boxes=4, seed=1, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=1)
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10**8)
    poses = [np.eye(4)] * len(firings)
    hsg = jnp.asarray(np.float32(-1.5))
    pipe = ContinuousClustering(cfg, firing_batch_size=55)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    ins = HostInsertion(cfg, NUM_ROWS)
    blocks, segp = _capture_rev(cfg, pipe, ins, firings, poses)
    per_rev = len(blocks)
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    blocks0, segp0 = stack(blocks), stack(segp)
    runner = make_periodic_block_scan_runner(
        cfg, pipe._batch_B, NUM_COLS, chunk_revs * per_rev,
        reduce_infos=False, rebase_every=rebase_every,
    )
    state = pipe.state
    new_per_rev = []
    for c in range(n_rev // chunk_revs):
        state, infos = runner(
            state, blocks0, segp0, hsg, jnp.int32(c * chunk_revs * per_rev)
        )
        nn = np.asarray(infos.num_new_clusters).reshape(chunk_revs, per_rev)
        new_per_rev += list(nn.sum(axis=1))
    return state, new_per_rev


def test_periodic_runner_rebase_matches_unrebased():
    """Inside the unrebased method's ~300-revolution f32 validity window,
    the in-scan azimuth rebase (rebase_every) must not change the stream:
    identical per-revolution cluster production, frontier, counters and
    final cell partition at 100 revolutions with a rebase every 16."""
    cfg = small_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )
    s_base, nn_base = _periodic_soak(cfg, 100, rebase_every=0)
    s_reb, nn_reb = _periodic_soak(cfg, 100, rebase_every=16)
    assert not bool(s_reb.overflow) and not bool(s_reb.cc_failed)
    assert nn_base == nn_reb
    assert int(s_base.first_unpublished) == int(s_reb.first_unpublished)
    assert int(s_base.cluster_counter) == int(s_reb.cluster_counter)
    # the rebase really ran, and kept stored azimuths bounded
    assert int(s_reb.origin_rot) >= 80
    caz = np.asarray(s_reb.cont_az)
    assert np.nanmax(np.abs(caz[np.asarray(s_reb.gcol) >= 0])) < (16 + 8) * 7.0

    def cell_ids(s):
        slots = np.asarray(s.slot)
        res = np.asarray(s.slot_parent)[np.maximum(slots, 0)]
        return np.where(slots >= 0, np.asarray(s.slot_cid)[res], 0)

    np.testing.assert_array_equal(cell_ids(s_base), cell_ids(s_reb))


@pytest.mark.slow
def test_periodic_runner_1000_rev_soak():
    """VERDICT r4 item 10: a 1000-revolution soak (3x past the unrebased
    f32 validity bound) stays healthy with the in-scan rebase: frontier
    tracks the stream, steady cluster production does not drift, and the
    stored azimuths stay inside the rebase window."""
    cfg = small_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )
    state, nn = _periodic_soak(cfg, 1000, rebase_every=16, chunk_revs=250)
    assert not bool(state.overflow) and not bool(state.cc_failed)
    fu = int(state.first_unpublished)
    assert (1000 - 2) * NUM_COLS < fu <= 1000 * NUM_COLS
    # steady state: identical scene content -> identical production, with
    # no azimuth-precision drift between rev 10 and rev 999
    assert nn[10] == nn[500] == nn[999]
    assert nn[500] > 0
    assert int(state.origin_rot) >= 960
    caz = np.asarray(state.cont_az)
    assert np.nanmax(np.abs(caz[np.asarray(state.gcol) >= 0])) < (16 + 8) * 7.0
