"""End-to-end pipeline (model facade) vs the sequential oracle."""

import os
import dataclasses

import numpy as np
import pytest

from continuous_clustering_tpu.config import kitti_config
from continuous_clustering_tpu.evaluation.partition import partition_agreement
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)
from continuous_clustering_tpu.io.point_cloud import ProcessingStage
from continuous_clustering_tpu.models.continuous_clustering import ContinuousClustering
from continuous_clustering_tpu.ops.oracle import OracleContinuousClustering

NUM_ROWS = 32
NUM_COLS = 220


def small_config(stop_after_association=False):
    cfg = kitti_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )
    cfg = cfg.replace(
        clustering=dataclasses.replace(
            cfg.clustering, stop_after_association_enabled=stop_after_association
        )
    )
    return cfg


def collect_oracle(cfg, all_firings, poses):
    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))
    labels = {}
    ground = {}

    def on_col(a, b, ground_only):
        if ground_only:
            return
        for g in range(a, b + 1):
            lc = g % cfg.ring_buffer_max_columns
            for r in range(NUM_ROWS):
                c = oracle.cells[lc][r]
                if c.globally_unique_point_index != -1:
                    labels[c.globally_unique_point_index] = c.id
                    ground[c.globally_unique_point_index] = c.ground_point_label

    oracle.finished_column_callback = on_col
    for f, p in zip(all_firings, poses):
        oracle.add_firing(f, p)
    return labels, ground


def collect_pipeline(cfg, all_firings, poses, batch=64):
    pipe = ContinuousClustering(cfg, firing_batch_size=batch)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    labels = {}
    ground = {}
    clusters = []

    def on_col(a, b, ground_only):
        if ground_only:
            return
        cloud = pipe.get_columns(a, b)
        valid = cloud["globally_unique_point_index"] != np.iinfo(np.uint64).max
        for u, i, gl in zip(
            cloud["globally_unique_point_index"][valid],
            cloud["id"][valid],
            cloud["ground_point_label"][valid],
        ):
            labels[int(u)] = int(i)
            ground[int(u)] = int(gl)

    pipe.set_finished_column_callback(on_col)
    pipe.set_finished_cluster_callback(lambda pts, stamp: clusters.append((pts, stamp)))
    for f, p in zip(all_firings, poses):
        pipe.add_firing(f, p)
    pipe.flush()
    return labels, ground, clusters


def make_stream(num_frames=2, seed=1, num_boxes=8):
    scene = make_scene(num_boxes=num_boxes, seed=seed, spread=20.0)
    firings = []
    for f in range(num_frames):
        xyz, _ = raycast_frame(
            scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=seed + f
        )
        firings += frame_to_firings(xyz, frame_index=f)
    poses = [np.eye(4) for _ in firings]
    return firings, poses


def test_pipeline_matches_oracle_partition():
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream()
    o_labels, o_ground = collect_oracle(cfg, firings, poses)
    p_labels, p_ground, clusters = collect_pipeline(cfg, firings, poses)

    assert len(p_labels) > 1000
    common = set(o_labels) & set(p_labels)
    assert len(common) > 0.9 * len(o_labels)

    # ground labels agree exactly on common points
    g_match = np.mean([o_ground[k] == p_ground[k] for k in common])
    assert g_match == 1.0, f"ground label agreement {g_match}"

    agreement = partition_agreement(o_labels, p_labels)
    assert agreement >= 0.995, f"partition agreement {agreement}"

    # published clusters have > 20 points and consistent ids
    assert clusters
    for pts, stamp in clusters:
        assert len(pts) > 20
        assert np.all(pts["id"] == pts["id"][0])
        assert stamp > 0


@pytest.mark.parametrize("seed,num_boxes", [(11, 3), (23, 14), (37, 8)])
def test_pipeline_matches_oracle_fuzz(seed, num_boxes):
    """Multi-seed fuzz: randomized scenes (sparse / cluttered / mixed)
    through the SAME jitted program vs the sequential oracle.  Guards the
    batching/seam logic against scene-shape edge cases the fixed-seed
    tests happen to miss (jit reuse keeps the sweep cheap)."""
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(seed=seed, num_boxes=num_boxes)
    o_labels, o_ground = collect_oracle(cfg, firings, poses)
    p_labels, p_ground, _ = collect_pipeline(cfg, firings, poses)

    common = set(o_labels) & set(p_labels)
    assert len(common) > 0.9 * len(o_labels)
    g_match = np.mean([o_ground[k] == p_ground[k] for k in common])
    assert g_match == 1.0, f"seed {seed}: ground label agreement {g_match}"
    agreement = partition_agreement(o_labels, p_labels)
    assert agreement >= 0.995, f"seed {seed}: partition agreement {agreement}"


CONFIG_FUZZ = {
    # tight clustering radius + short wedges (small H: exercises the halo
    # slicing at a width none of the fixed tests use)
    "tight": dict(
        clustering=dict(max_distance=0.3, max_steps_in_row=8,
                        max_steps_in_column=5),
    ),
    # stop heuristic with a non-default min_steps, plus chessboard skip ON
    # (kitti_config defaults it off, so this is the oracle-agreement
    # coverage for the chessboard path in the vectorized pipeline)
    "stop2": dict(
        clustering=dict(stop_after_association_enabled=True,
                        stop_after_association_min_steps=2,
                        ignore_points_in_chessboard_pattern=True),
    ),
    # ground-segmentation rule thresholds off their defaults (reference
    # dynamic_reconfigure surface, cfg/ContinuousClustering.cfg)
    "ground": dict(
        ground_segmentation=dict(
            max_slope=0.35,
            last_ground_point_slope_higher_than=-0.3,
            last_ground_point_distance_smaller_than=9.0,
            ground_because_close_to_last_certain_ground_max_z_diff=0.2,
            obstacle_because_next_certain_obstacle_max_dist_diff=0.6,
        ),
    ),
    # odd completion cadence + last-point cluster stamps
    "nth7": dict(
        clustering=dict(cluster_point_trees_every_nth_column=7,
                        use_last_point_for_cluster_stamp=True),
    ),
    # inclination-diff ignore off (default-on rule disabled)
    "noincl": dict(
        clustering=dict(ignore_points_with_too_big_inclination_angle_diff=False),
    ),
}


# the stop heuristic prunes edges against the per-column publish frontier,
# which our batch-granularity pipeline evaluates at batch starts (PARITY.md
# "Known intentional differences") — same slack as
# test_pipeline_with_stop_heuristic below
CONFIG_FUZZ_MIN_AGREEMENT = {"stop2": 0.98}


@pytest.mark.parametrize("name", sorted(CONFIG_FUZZ))
def test_pipeline_matches_oracle_config_fuzz(name):
    """Config-space fuzz: the scene fuzz above varies geometry at the
    default config; this varies the 23-parameter config surface (wedge
    widths, stop heuristic, ground rules, completion cadence) on one scene
    and requires the same oracle agreement.  Guards parameters the fixed
    goldens never move."""
    cfg = small_config(stop_after_association=False)
    groups = CONFIG_FUZZ[name]
    for group, fields in groups.items():
        cfg = cfg.replace(
            **{group: dataclasses.replace(getattr(cfg, group), **fields)}
        )
    firings, poses = make_stream(seed=19, num_boxes=10)
    o_labels, o_ground = collect_oracle(cfg, firings, poses)
    p_labels, p_ground, _ = collect_pipeline(cfg, firings, poses)

    common = set(o_labels) & set(p_labels)
    assert len(common) > 0.9 * len(o_labels)
    g_match = np.mean([o_ground[k] == p_ground[k] for k in common])
    assert g_match == 1.0, f"{name}: ground label agreement {g_match}"
    agreement = partition_agreement(o_labels, p_labels)
    floor = CONFIG_FUZZ_MIN_AGREEMENT.get(name, 0.995)
    assert agreement >= floor, f"{name}: partition agreement {agreement}"


def test_pipeline_with_stop_heuristic():
    """Reference's stop_after_association prunes edges; agreement stays high."""
    cfg = small_config(stop_after_association=True)
    firings, poses = make_stream(seed=3)
    o_labels, _ = collect_oracle(cfg, firings, poses)
    p_labels, _, _ = collect_pipeline(cfg, firings, poses)
    agreement = partition_agreement(o_labels, p_labels)
    assert agreement >= 0.98, f"partition agreement {agreement}"


def test_pipeline_async_mode_matches_sync():
    """is_single_threaded=False defers scalar readbacks by one batch
    (double buffering); results must be identical to sync mode."""
    import dataclasses as dc

    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=2, seed=7)
    sync_labels, sync_ground, sync_clusters = collect_pipeline(cfg, firings, poses)

    acfg = cfg.replace(general=dc.replace(cfg.general, is_single_threaded=False))
    async_labels, async_ground, async_clusters = collect_pipeline(acfg, firings, poses)

    assert sync_labels.keys() == async_labels.keys()
    agreement = partition_agreement(sync_labels, async_labels)
    assert agreement == 1.0, f"async vs sync agreement {agreement}"
    assert sync_ground == async_ground
    # same published clusters (sizes), no duplicates
    ssizes = sorted(len(c[0]) for c in sync_clusters)
    asizes = sorted(len(c[0]) for c in async_clusters)
    assert ssizes == asizes


def test_pipeline_batch_size_invariance():
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=5)
    l1, _, _ = collect_pipeline(cfg, firings, poses, batch=32)
    l2, _, _ = collect_pipeline(cfg, firings, poses, batch=110)
    common = set(l1) & set(l2)
    agreement = partition_agreement(l1, l2)
    assert agreement >= 0.995, f"batch-size agreement {agreement}"


def test_visited_neighbor_counts_match_oracle():
    """number_of_visited_neighbors (reference ...cpp:725) reconstructed by
    the vectorized wedge walk must equal the oracle's per-cell walk counter.

    Exactness caveat: the reference clips the wedge at its *per-column*
    publish frontier (...cpp:762,782); our batch-granularity pipeline clips
    at the batch-start frontier, which lags within a batch.  Both counters
    faithfully report what their own association tested; they are equal
    whenever the wedge does not touch the frontier, which the test selects
    for (and asserts the clipped remainder is a small minority)."""
    import dataclasses
    import math

    from continuous_clustering_tpu.ops.oracle import OracleContinuousClustering

    scene = make_scene(num_boxes=6, seed=5, spread=18.0)
    firings = []
    for f in range(2):
        xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=5 + f)
        firings += frame_to_firings(xyz, frame_index=f)
    poses = [np.eye(4) for _ in firings]

    cfg = small_config(stop_after_association=False)
    cfg = cfg.replace(
        clustering=dataclasses.replace(cfg.clustering, record_neighbor_stats=True)
    )

    class TracingOracle(OracleContinuousClustering):
        """Records the publish frontier at each column's association."""

        fu_at_assoc = {}

        def _associate_column(self, gcol):
            self.fu_at_assoc[gcol] = self.first_unpublished
            return super()._associate_column(gcol)

    oracle = TracingOracle(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))
    ref = {}
    unclipped = {}
    az_width = 2.0 * math.pi / NUM_COLS
    H = cfg.clustering.max_steps_in_row

    def on_col(a, b, ground_only):
        if ground_only:
            return
        for g in range(a, b + 1):
            lc = g % cfg.ring_buffer_max_columns
            for r in range(NUM_ROWS):
                c = oracle.cells[lc][r]
                if c.globally_unique_point_index != -1 and not c.is_ignored:
                    k = c.globally_unique_point_index
                    ref[k] = c.number_of_visited_neighbors
                    mad = math.asin(
                        cfg.clustering.max_distance / float(c.distance)
                    )
                    wp = min(math.ceil(mad / az_width), H)
                    # the oracle's frontier is >= the pipeline's batch-start
                    # frontier; if even the oracle's wedge is clear of it,
                    # neither side clipped... except the pipeline's frontier
                    # can only be lower, which also does not clip
                    unclipped[k] = (
                        c.global_column_index - wp
                        >= oracle.fu_at_assoc.get(c.global_column_index, 0)
                    )

    oracle.finished_column_callback = on_col
    for f, p in zip(firings, poses):
        oracle.add_firing(f, p)

    pipe = ContinuousClustering(cfg, firing_batch_size=64)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    ours = {}

    def on_col_p(a, b, ground_only):
        if ground_only:
            return
        cloud = pipe.get_columns(a, b, ProcessingStage.CONTINUOUS_CLUSTERING)
        for p_ in cloud:
            if p_["globally_unique_point_index"] != np.uint64(2**64 - 1) and not p_[
                "ignore_for_clustering"
            ]:
                ours[int(p_["globally_unique_point_index"])] = int(
                    p_["number_of_visited_neighbors"]
                )

    pipe.set_finished_column_callback(on_col_p)
    for f, p in zip(firings, poses):
        pipe.add_firing(f, p)
    pipe.flush()

    common = set(ref) & set(ours)
    assert len(common) > 1000
    exact = [k for k in common if unclipped[k]]
    assert len(exact) > 0.7 * len(common), "frontier-clipped points dominate"
    mismatch = [k for k in exact if ref[k] != ours[k]]
    assert not mismatch, (
        f"{len(mismatch)}/{len(exact)} visited-count mismatches; "
        f"first: key={mismatch[0]} oracle={ref[mismatch[0]]} ours={ours[mismatch[0]]}"
    )
    # clipped points may only OVER-count (our frontier lags the oracle's)
    assert all(ours[k] >= ref[k] for k in common)
    assert any(ours[k] > 0 for k in common)


def test_flush_releases_held_finished_clusters():
    """Finished clusters hold the publish frontier for one completion round
    (reference one-round delay, ...cpp:943-959); at stream end the flush
    kicks must release every such hold: afterwards no finished component may
    still gate the frontier, and every publishable cluster must have been
    emitted exactly once."""
    cfg = small_config(stop_after_association=False)
    # stop mid-revolution so the last batch's finished clusters are held
    firings, poses = make_stream(num_frames=2, seed=9)
    cut = len(firings) - NUM_COLS // 3
    firings, poses = firings[:cut], poses[:cut]

    pipe = ContinuousClustering(cfg, firing_batch_size=64)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    emitted = []
    pipe.set_finished_cluster_callback(
        lambda pts, stamp: emitted.append(int(pts["id"][0]))
    )
    for f, p in zip(firings, poses):
        pipe.add_firing(f, p)
    pipe.flush()

    s = pipe.state
    live = np.asarray(s.slot_live)
    valid = np.asarray(s.slot_valid)
    finished = np.asarray(s.slot_finished)
    gmin = np.asarray(s.slot_gmin)
    fu = int(np.asarray(s.first_unpublished))
    held = live & valid & finished
    # the frontier must have advanced past every finished component unless a
    # genuinely unfinished earlier component blocks it: a finished slot with
    # gmin >= fu and nothing unfinished before it is an unreleased hold
    unfin_min = gmin[live & valid & ~finished].min() if np.any(
        live & valid & ~finished
    ) else np.iinfo(np.int32).max
    blocked = held & (gmin >= fu) & (gmin < unfin_min)
    assert not np.any(blocked), (
        f"finished clusters still hold the frontier after flush: "
        f"gmins {gmin[blocked].tolist()}, fu={fu}, unfin_min={unfin_min}"
    )
    # every published id emitted exactly once
    assert len(emitted) == len(set(emitted))
    cid = np.asarray(s.slot_cid)
    counts = np.asarray(s.slot_count)
    # ids are assigned at >5 members (…cpp:936); the publish callback gate
    # is >20 (…cpp:1023) — every still-visible id above the publish gate
    # must have been emitted
    must_emit = sorted(cid[(cid > 0) & live & (counts > 20)])
    counter = int(np.asarray(s.cluster_counter))
    assert all(0 < i < counter for i in emitted)
    assert set(must_emit) <= set(emitted), (
        f"unemitted publishable ids: {sorted(set(must_emit) - set(emitted))}"
    )
    assert len(emitted) > 0


def test_component_table_overflow_raises():
    """Exhausting the component-slot table (max_active_components) must
    surface as the overflow RuntimeError, like a too-small ring buffer —
    never silent corruption."""
    cfg = small_config(stop_after_association=False)
    cfg = cfg.replace(
        clustering=dataclasses.replace(cfg.clustering, max_active_components=4)
    )
    firings, poses = make_stream(num_frames=1, seed=1)
    pipe = ContinuousClustering(cfg, firing_batch_size=64)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    with pytest.raises(RuntimeError, match="overflow"):
        for f, p in zip(firings, poses):
            pipe.add_firing(f, p)
        pipe.flush()


def test_publish_slab_zero_dispatch_emission():
    """The publish readout rides the fused step's outputs: in steady-state
    streaming, every finished-column / finished-cluster callback must be
    served from the step's publish slab — ZERO extra device dispatches
    (VERDICT round 2: emission must cost at most one transfer, and the
    dispatch count must be asserted, not modeled).  Outputs must be
    identical with the slab disabled (CCT_SLAB_W=-1 forces the on-demand
    fetch path)."""
    firings, poses = make_stream(num_frames=2, seed=3)
    cfg = small_config(stop_after_association=False)

    labels_on, ground_on, clusters_on = collect_pipeline(cfg, firings, poses)
    old = os.environ.get("CCT_SLAB_W")
    os.environ["CCT_SLAB_W"] = "-1"
    try:
        labels_off, ground_off, clusters_off = collect_pipeline(cfg, firings, poses)
    finally:
        if old is None:
            del os.environ["CCT_SLAB_W"]
        else:
            os.environ["CCT_SLAB_W"] = old
    assert labels_on == labels_off
    assert ground_on == ground_off
    assert len(clusters_on) == len(clusters_off) > 0
    for (a, sa), (b, sb) in zip(clusters_on, clusters_off):
        assert sa == sb
        for f in a.dtype.names:
            if a[f].dtype.kind == "f":
                assert np.array_equal(a[f], b[f], equal_nan=True), f
            else:
                assert np.array_equal(a[f], b[f]), f

    # dispatch-count guarantee: full streaming run with all callbacks
    # reading their column ranges never needs an on-demand fetch
    pipe = ContinuousClustering(cfg, firing_batch_size=64)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    n_cb = [0]

    def on_col(a, b, ground_only):
        pipe.get_columns(a, b)
        n_cb[0] += 1

    pipe.set_finished_column_callback(on_col)
    pipe.set_finished_cluster_callback(lambda pts, stamp: None)
    for f, p in zip(firings, poses):
        pipe.add_firing(f, p)
    assert n_cb[0] > 0
    assert pipe.n_fetch_dispatches == 0, (
        f"emission needed {pipe.n_fetch_dispatches} on-demand fetch "
        f"dispatches; the publish slab must cover steady-state emission"
    )


def test_cc_nonconvergence_raises_distinct_error():
    """CC non-convergence must NOT masquerade as a ring overflow: the
    remediation differs (iteration/jump knobs vs stream rate)."""
    import dataclasses as dc

    import jax.numpy as jnp
    import pytest

    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    pipe = ContinuousClustering(small_config(), firing_batch_size=16)
    pipe.reset(4)
    from continuous_clustering_tpu.models.step import StepInfo, pack_meta

    def make_info(overflow, cc_failed):
        z = jnp.zeros((0,), jnp.int32)
        return StepInfo(
            meta=pack_meta(
                0, 1, 0, 1, 0, 1, False, overflow, cc_failed
            ),
            slab=z, slab_ext=z,
        )

    with pytest.raises(RuntimeError, match="did not converge"):
        pipe._consume_info(make_info(overflow=False, cc_failed=True))
    with pytest.raises(RuntimeError, match="overflow"):
        pipe._consume_info(make_info(overflow=True, cc_failed=False))


def test_adaptive_slab_head_grows_and_stays_exact(monkeypatch):
    """The adaptive slab head (VERDICT r4 missing #3): when the streamed
    publish-window widths miss a deliberately-undersized head, the pipeline
    grows the head at runtime (one re-jit) and emission output stays
    identical to a run with the head pre-sized to the slab width."""
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=5)
    stream = [(f, p) for f, p in zip(firings, poses)] * 20  # ~90+ windows

    def run(env):
        for k, v in env.items():
            monkeypatch.setenv(k, v)
        pipe = ContinuousClustering(cfg, firing_batch_size=48)
        pipe.reset(NUM_ROWS)
        pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
        labels = {}
        def on_col(a, b, ground_only):
            if ground_only:
                return
            cloud = pipe.get_columns(a, b)
            valid = cloud["globally_unique_point_index"] != np.iinfo(np.uint64).max
            for u, i in zip(cloud["globally_unique_point_index"][valid],
                            cloud["id"][valid]):
                labels[int(u)] = int(i)
        pipe.set_finished_column_callback(on_col)
        for f, p in stream:
            pipe.add_firing(dict(f), p)
        pipe.flush()
        return pipe, labels

    # undersized head (W=64, auto head 32 < typical window width) + adapt on
    p_ad, l_ad = run({"CCT_SLAB_W": "64", "CCT_SLAB_ADAPT": "1"})
    # same slab, head pre-sized to the full slab, no adaptation
    p_ref, l_ref = run({"CCT_SLAB_W": "64", "CCT_SLAB_W1": "64",
                        "CCT_SLAB_ADAPT": "0"})
    assert p_ad._slab_W1 > 32, "adaptation never grew the undersized head"
    assert l_ad == l_ref and len(l_ref) > 500
