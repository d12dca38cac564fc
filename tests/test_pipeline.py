"""End-to-end pipeline (model facade) vs the sequential oracle."""

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
