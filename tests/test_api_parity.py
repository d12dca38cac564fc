"""Public API parity details: config semantics, stage field subsets."""

import dataclasses

import numpy as np
import pytest

from continuous_clustering_tpu.config import Config, kitti_config
from continuous_clustering_tpu.io.point_cloud import (
    POINT_DTYPE,
    ProcessingStage,
    stage_dtype,
)
from continuous_clustering_tpu.models.continuous_clustering import ContinuousClustering

from .test_pipeline import small_config


def test_stage_field_subsets():
    """8/15/19/26 fields per stage (reference ros_utils.cpp:114-122)."""
    assert len(stage_dtype(ProcessingStage.RAW_POINT).names) == 8
    assert len(stage_dtype(ProcessingStage.RANGE_IMAGE_GENERATION).names) == 15
    assert len(stage_dtype(ProcessingStage.GROUND_POINT_SEGMENTATION).names) == 19
    assert len(stage_dtype(ProcessingStage.CONTINUOUS_CLUSTERING).names) == 26
    assert POINT_DTYPE.names[:3] == ("x", "y", "z")


def test_config_reset_required_rules():
    """Hard-reset rules (reference setConfiguration, …cpp:66-81)."""
    a = Config()
    assert not a.reset_required_vs(a)
    b = a.replace(range_image=a.range_image.__class__(num_columns=999))
    assert a.reset_required_vs(b)
    c = a.replace(general=dataclasses.replace(a.general, is_single_threaded=True))
    assert a.reset_required_vs(c)
    d = a.replace(
        clustering=dataclasses.replace(a.clustering, max_distance=0.3)
    )
    assert not a.reset_required_vs(d)  # live-tunable without reset


def test_set_configuration_flags_reset():
    cfg = small_config()
    pipe = ContinuousClustering(cfg, firing_batch_size=32)
    pipe.reset(16)
    assert not pipe.reset_required()
    pipe.set_configuration(
        cfg.replace(range_image=cfg.range_image.__class__(num_columns=220 * 2))
    )
    assert pipe.reset_required()


def test_get_columns_stage_subset():
    cfg = small_config()
    pipe = ContinuousClustering(cfg, firing_batch_size=32)
    pipe.reset(16)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )

    xyz, _ = raycast_frame(make_scene(num_boxes=2, seed=0), num_rows=16, num_columns=220)
    for f in frame_to_firings(xyz):
        pipe.add_firing(f, np.eye(4))
    pipe.flush()
    cloud = pipe.get_columns(10, 20, ProcessingStage.GROUND_POINT_SEGMENTATION)
    assert len(cloud.dtype.names) == 19
    assert "ground_point_label" in cloud.dtype.names
    assert "id" not in cloud.dtype.names
    full = pipe.get_columns(10, 20)
    assert "id" in full.dtype.names
    # column-major layout like the reference message (16 rows x 11 cols)
    assert len(full) == 16 * 11
