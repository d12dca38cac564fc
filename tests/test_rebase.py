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


def _run_checking_slab_reads(single_threaded: bool):
    """Regression: a publish slab cached (or in flight) BEFORE a rebase must
    not be served with the NEW azimuth origin afterwards — that inflated
    published continuous azimuths by 2*pi*delta."""
    import dataclasses as dc

    cfg = small_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        ),
        general=dc.replace(cfg.general, is_single_threaded=single_threaded),
    )
    pipe = ContinuousClustering(cfg, firing_batch_size=55, rebase_after_rotations=2)
    pipe.reset(NUM_ROWS)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    scene = make_scene(num_boxes=5, seed=4, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, seed=4)
    col_w = 2 * np.pi / NUM_COLS
    rebases_seen = 0
    uidx_base = 0
    for rev in range(8):
        firings = frame_to_firings(xyz, frame_index=rev)
        for f in firings:
            f["uidx"] = f["uidx"] + np.uint64(uidx_base)
        uidx_base += NUM_COLS * NUM_ROWS * 2
        prev_origin = pipe._h_origin_rot
        for f in firings:
            pipe.add_firing(f, np.eye(4))
            if pipe._h_origin_rot != prev_origin:
                rebases_seen += 1
                prev_origin = pipe._h_origin_rot
                # read the freshest published columns RIGHT after the rebase:
                # with the stale-slab bug these carry azimuths 2*pi*delta too big
                fu = pipe.first_unpublished_global_column_index
                if fu >= 5:
                    cloud = pipe.get_columns(fu - 5, fu - 1)
                    az = cloud["continuous_azimuth_angle"]
                    if np.any(np.isfinite(az)):
                        med = float(np.nanmedian(az))
                        expected = (fu - 3) * col_w
                        assert abs(med - expected) < 1.0, (
                            f"stale publish slab after rebase: med az {med} "
                            f"!= expected {expected}"
                        )
    pipe.flush()
    assert rebases_seen >= 1, "rebase never triggered"


def test_slab_invalidated_on_rebase_sync():
    _run_checking_slab_reads(single_threaded=True)


def test_slab_invalidated_on_rebase_async():
    _run_checking_slab_reads(single_threaded=False)
