"""Packed-aggregate path: the 4-in-1 scatter-max + merged slot-resolve
gather (ops/association.py, CCT_AGG_PACK=1, the default) must match the
plain per-quantity scatters exactly — they carry the reference's tree
aggregates (continuous_clustering.cpp:669-671,818,912-936)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from continuous_clustering_tpu.ops.association import _f32_from_key, _f32_sort_key


def test_f32_sort_key_monotone_bijection():
    vals = np.array(
        [-np.inf, -3e38, -1000.5, -2.0, -1.0, -1e-38, -0.0, 0.0, 1e-38,
         1.0, 2.0, 1000.5, 3e38, np.inf], np.float32
    )
    keys = np.asarray(_f32_sort_key(jnp.asarray(vals)))
    # strictly increasing except the -0.0/0.0 tie
    diff = np.diff(keys.astype(np.int64))
    assert np.all(diff >= 0)
    assert np.sum(diff == 0) == 1  # only the +/-0 pair
    back = np.asarray(_f32_from_key(jnp.asarray(keys)))
    np.testing.assert_array_equal(back[vals != 0], vals[vals != 0])
    assert back[6] == 0.0 and back[7] == 0.0


def test_f32_sort_key_max_equals_float_max():
    rng = np.random.default_rng(3)
    x = (rng.standard_normal(4096) * np.exp(rng.uniform(-30, 30, 4096))).astype(
        np.float32
    )
    grp = rng.integers(0, 64, 4096)
    for g in range(64):
        sel = x[grp == g]
        if not len(sel):
            continue
        kmax = np.asarray(
            _f32_from_key(jnp.max(_f32_sort_key(jnp.asarray(sel))))
        )
        assert kmax == sel.max()


@pytest.mark.parametrize("seed", [0, 1])
def test_packed_matches_plain_pipeline(seed, monkeypatch):
    """Whole-pipeline equality CCT_AGG_PACK=0 vs 1 on a synthetic scene
    (cluster ids, ground labels, frontier — everything observable)."""
    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    num_rows, num_cols = 32, 220
    scene = make_scene(num_boxes=12, seed=seed, spread=24.0, min_radius=4.0)
    xyz, _ = raycast_frame(scene, num_rows=num_rows, num_columns=num_cols, seed=seed)
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10 ** 8)

    def run(pack: str):
        if pack in ("0", "1"):
            monkeypatch.setenv("CCT_AGG_PACK", pack)
            monkeypatch.delenv("CCT_AGG", raising=False)
        else:
            monkeypatch.setenv("CCT_AGG", pack)
        jax.clear_caches()
        cfg = cct.kitti_config()
        cfg = cfg.replace(
            range_image=cfg.range_image.__class__(
                num_columns=num_cols, ring_buffer_revolutions=4
            )
        )
        pipe = ContinuousClustering(cfg, firing_batch_size=32)
        pipe.reset(num_rows)
        pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
        clusters = []
        pipe.set_finished_cluster_callback(
            lambda pts, stamp: clusters.append((len(pts), int(stamp)))
        )
        for rev in range(2):
            for f in firings:
                pipe.add_firing(dict(f), np.eye(4))
        pipe.flush()
        return clusters, pipe.first_unpublished_global_column_index

    c0, fu0 = run("0")
    c1, fu1 = run("1")
    cr, fur = run("rows")
    cs, fus = run("sort")
    cc, fuc = run("sortc")
    assert fu0 == fu1 == fur == fus == fuc
    assert c0 == c1 == cr == cs == cc
    assert len(c0) > 0


@pytest.mark.parametrize("agg", ["pack", "plain"])
def test_cm_labels_match_rm_pipeline(agg, monkeypatch):
    """Whole-pipeline equivalence of the column-major window-id convention
    (CCT_LABEL=cm, the default — new-slot gmin derived from the
    representative, no per-cell gmin scatter) vs the original row-major
    ids.  Cluster id NUMBERING may differ (slot allocation order is rank-
    dependent), so the comparison is order-insensitive: the multiset of
    (size, stamp) clusters and the publish frontier."""
    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    num_rows, num_cols = 32, 220
    scene = make_scene(num_boxes=12, seed=2, spread=24.0, min_radius=4.0)
    xyz, _ = raycast_frame(scene, num_rows=num_rows, num_columns=num_cols, seed=2)
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10 ** 8)

    def run(label_mode: str):
        monkeypatch.setenv("CCT_LABEL", label_mode)
        monkeypatch.setenv("CCT_AGG", agg)
        jax.clear_caches()
        cfg = cct.kitti_config()
        cfg = cfg.replace(
            range_image=cfg.range_image.__class__(
                num_columns=num_cols, ring_buffer_revolutions=4
            )
        )
        pipe = ContinuousClustering(cfg, firing_batch_size=32)
        pipe.reset(num_rows)
        pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
        clusters = []
        pipe.set_finished_cluster_callback(
            lambda pts, stamp: clusters.append((len(pts), int(stamp)))
        )
        for rev in range(3):
            for f in firings:
                pipe.add_firing(dict(f), np.eye(4))
        pipe.flush()
        return clusters, pipe.first_unpublished_global_column_index

    c_cm, fu_cm = run("cm")
    c_rm, fu_rm = run("rm")
    assert fu_cm == fu_rm
    assert sorted(c_cm) == sorted(c_rm)
    assert len(c_cm) > 0


@pytest.mark.parametrize("agg", ["sort", "sortc"])
def test_sort_agg_matches_pack_when_lanes_exceed_table(agg, monkeypatch):
    """With a small component table (K=256) the concat width 3*R*B far
    exceeds NSEG*K, so sortc's compaction slice genuinely truncates (the
    other tests run with lanes < NSEG*K where the static slice is a no-op).
    Equality vs the packed path must still hold."""
    import dataclasses as dc

    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    num_rows, num_cols = 32, 220
    scene = make_scene(num_boxes=10, seed=5, spread=22.0, min_radius=4.0)
    xyz, _ = raycast_frame(scene, num_rows=num_rows, num_columns=num_cols, seed=5)
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10 ** 8)

    def run(mode: str):
        monkeypatch.setenv("CCT_AGG", mode)
        jax.clear_caches()
        cfg = cct.kitti_config()
        cfg = cfg.replace(
            range_image=cfg.range_image.__class__(
                num_columns=num_cols, ring_buffer_revolutions=4
            )
        )
        cfg = cfg.replace(
            clustering=dc.replace(cfg.clustering, max_active_components=256)
        )
        pipe = ContinuousClustering(cfg, firing_batch_size=64)
        pipe.reset(num_rows)
        pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
        clusters = []
        pipe.set_finished_cluster_callback(
            lambda pts, stamp: clusters.append((len(pts), int(stamp)))
        )
        for rev in range(2):
            for f in firings:
                pipe.add_firing(dict(f), np.eye(4))
        pipe.flush()
        return clusters, pipe.first_unpublished_global_column_index

    # lanes = 3 * R * batch_cols = 3*32*96 = 9216 > NSEG*K = 768
    cp, fup = run("pack")
    cs, fus = run(agg)
    assert fup == fus
    assert cp == cs
    assert len(cp) > 0
