"""Smoke/behaviour tests for the sequential oracle pipeline."""

import numpy as np
import pytest

from continuous_clustering_tpu.config import Config, kitti_config
from continuous_clustering_tpu.constants import GP_GROUND, GP_OBSTACLE
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    hdl64_inclinations,
    make_scene,
    raycast_frame,
)
from continuous_clustering_tpu.ops.oracle import OracleContinuousClustering

NUM_ROWS = 32
NUM_COLS = 220


def small_config() -> Config:
    cfg = kitti_config()
    return cfg.replace(
        range_image=cfg.range_image.__class__(num_columns=NUM_COLS, ring_buffer_revolutions=4)
    )


def run_oracle(num_frames=2, num_boxes=6, seed=0):
    cfg = small_config()
    scene = make_scene(num_boxes=num_boxes, seed=seed, spread=20.0)
    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))

    clusters = []
    finalized = []
    oracle.finished_cluster_callback = lambda pts, stamp: clusters.append((pts, stamp))
    oracle.finished_column_callback = (
        lambda a, b, ground_only: None if ground_only else finalized.append((a, b))
    )

    pose = np.eye(4)
    for f in range(num_frames):
        xyz, labels = raycast_frame(
            scene,
            num_rows=NUM_ROWS,
            num_columns=NUM_COLS,
            inclinations=hdl64_inclinations(NUM_ROWS),
            seed=seed + f,
        )
        for firing in frame_to_firings(
            xyz, start_stamp=f * 10**8, end_stamp=(f + 1) * 10**8, frame_index=f
        ):
            oracle.add_firing(firing, pose)
    return oracle, clusters, finalized, scene


def test_oracle_runs_and_finds_clusters():
    oracle, clusters, finalized, scene = run_oracle()
    assert not oracle.reset_required
    # some clusters were published (boxes in the scene)
    assert len(clusters) >= 3
    # each published cluster has > 20 points (reference gate …cpp:1023)
    for pts, stamp in clusters:
        assert len(pts) > 20
        assert stamp > 0
    # publish frontier advanced through most of the stream
    assert oracle.first_unpublished > NUM_COLS
    # finalized ranges are contiguous & ordered
    prev_end = None
    for a, b in finalized:
        if prev_end is not None:
            assert a == prev_end + 1
        prev_end = b


def test_oracle_ground_segmentation_labels():
    oracle, clusters, finalized, scene = run_oracle(num_frames=1)
    # check a mid-stream column: ground plane points at low rows should be
    # labeled ground, box hits obstacle
    n_ground = 0
    n_obstacle = 0
    for g in range(NUM_COLS // 4, NUM_COLS // 2):
        labels = oracle.column_field(g, "ground_point_label")
        n_ground += sum(1 for l in labels if l == GP_GROUND)
        n_obstacle += sum(1 for l in labels if l == GP_OBSTACLE)
    assert n_ground > 0
    # ground should dominate in a plane-heavy scene
    assert n_ground > n_obstacle


def test_oracle_cluster_purity():
    """Each published cluster should correspond to a single synthetic box."""
    cfg = small_config()
    scene = make_scene(num_boxes=8, seed=3, spread=18.0)
    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))

    xyz, labels = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)
    # map uidx -> gt instance label
    uidx_to_gt = {}
    for c in range(NUM_COLS):
        for r in range(NUM_ROWS):
            uidx_to_gt[c * NUM_ROWS + r] = labels[c, r]

    published = []
    oracle.finished_cluster_callback = lambda pts, stamp: published.append(list(pts))
    pose = np.eye(4)
    for f in range(2):  # two identical frames so first-frame clusters finish
        for firing in frame_to_firings(xyz, frame_index=f):
            oracle.add_firing(firing, pose)

    assert published
    impure = 0
    for pts in published:
        gts = {uidx_to_gt[p.globally_unique_point_index & 0xFFFFFFFF] for p in pts}
        gts.discard(-1)  # ground points misclassified into cluster
        if len(gts) > 1:
            impure += 1
    # boxes are well separated; clusters should be pure
    assert impure <= len(published) // 10
