"""Azimuth origin rebasing over long streams.

The f32 relative-azimuth scheme requires periodic rebases; results must be
identical whether or not a rebase happens mid-stream.
"""

import numpy as np

from continuous_clustering_tpu.evaluation.partition import partition_agreement
from continuous_clustering_tpu.models.continuous_clustering import ContinuousClustering
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)

from .test_pipeline import small_config

NUM_ROWS = 16
NUM_COLS = 110


def run(rebase_after, revolutions=6):
    cfg = small_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )
    pipe = ContinuousClustering(
        cfg, firing_batch_size=55, rebase_after_rotations=rebase_after
    )
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    labels = {}

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
    scene = make_scene(num_boxes=5, seed=4, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=4)
    uidx_base = 0
    for rev in range(revolutions):
        firings = frame_to_firings(xyz, frame_index=rev)
        for f in firings:
            f["uidx"] = f["uidx"] + np.uint64(uidx_base)
        uidx_base += NUM_COLS * NUM_ROWS * 2  # keep uidx unique across revs
        for f in firings:
            pipe.add_firing(f, np.eye(4))
    pipe.flush()
    return labels, pipe


def test_rebase_is_transparent():
    labels_no, pipe_no = run(rebase_after=10_000)
    labels_rb, pipe_rb = run(rebase_after=2)
    assert pipe_rb._h_origin_rot >= 2, "rebase never triggered"
    assert pipe_no._h_origin_rot == 0
    assert labels_no.keys() == labels_rb.keys()
    agreement = partition_agreement(labels_no, labels_rb)
    assert agreement == 1.0, f"rebase changed results: {agreement}"
    # absolute continuous azimuths keep growing across the rebased origin
    cloud = pipe_rb.get_columns(
        pipe_rb.first_unpublished_global_column_index - 5,
        pipe_rb.first_unpublished_global_column_index - 1,
    )
    az = cloud["continuous_azimuth_angle"]
    expected = (
        (pipe_rb.first_unpublished_global_column_index - 3)
        / NUM_COLS
        * 2
        * np.pi
    )
    assert abs(np.nanmedian(az) - expected) < 0.5
