"""Checkpoint/resume: a restored pipeline continues bit-identically."""

import numpy as np

from continuous_clustering_tpu.evaluation.partition import partition_agreement
from continuous_clustering_tpu.models.checkpoint import load_state, save_state
from continuous_clustering_tpu.models.continuous_clustering import ContinuousClustering

from .test_pipeline import make_stream, small_config


def run(pipe, firings, poses, labels):
    def on_col(a, b, ground_only):
        if ground_only:
            return
        cloud = pipe.get_columns(a, b)
        valid = cloud["globally_unique_point_index"] != np.iinfo(np.uint64).max
        for u, i in zip(
            cloud["globally_unique_point_index"][valid], cloud["id"][valid]
        ):
            labels[int(u)] = int(i)

    pipe.set_finished_column_callback(on_col)
    for f, p in zip(firings, poses):
        pipe.add_firing(f, p)


def test_checkpoint_resume(tmp_path):
    cfg = small_config()
    firings, poses = make_stream(num_frames=2, seed=9)
    half = len(firings) // 2

    # uninterrupted run
    ref_labels = {}
    pipe = ContinuousClustering(cfg, firing_batch_size=55)
    pipe.reset(32)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    run(pipe, firings, poses, ref_labels)
    pipe.flush()

    # run half, checkpoint, restore into a fresh pipeline, run the rest
    labels = {}
    p1 = ContinuousClustering(cfg, firing_batch_size=55)
    p1.reset(32)
    p1.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    run(p1, firings[:half], poses[:half], labels)
    ckpt = tmp_path / "state.npz"
    save_state(p1, ckpt)

    p2 = ContinuousClustering(cfg, firing_batch_size=55)
    p2.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    load_state(p2, ckpt)
    run(p2, firings[half:], poses[half:], labels)
    p2.flush()

    common = set(ref_labels) & set(labels)
    assert len(common) > 0.9 * len(ref_labels)
    agreement = partition_agreement(ref_labels, labels)
    assert agreement >= 0.99, f"resume agreement {agreement}"
