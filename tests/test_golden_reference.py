"""Compare the TPU pipeline against the COMPILED C++ reference core.

The reference clustering core is compiled unmodified from /root/reference
(with a minimal Eigen shim) and driven on the same synthetic firing stream
as our pipeline; cluster partitions and ground labels must agree.
"""

import shutil
from pathlib import Path

import numpy as np
import pytest

from continuous_clustering_tpu.config import kitti_config
from continuous_clustering_tpu.constants import (
    GP_EGO_VEHICLE,
    GP_FOG,
    GP_GROUND,
    GP_OBSTACLE,
)
from continuous_clustering_tpu.evaluation.partition import partition_agreement
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)

from .golden import runner
from .test_pipeline import collect_oracle, collect_pipeline, small_config

NUM_ROWS = 32
NUM_COLS = 220

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not Path("/root/reference").exists(),
    reason="reference source or compiler unavailable",
)


@pytest.fixture(scope="module")
def harness(tmp_path_factory):
    return runner.build_harness(tmp_path_factory.mktemp("golden"))


def make_stream(num_frames=2, seed=1, num_boxes=8, jitter=0.0):
    scene = make_scene(num_boxes=num_boxes, seed=seed, spread=20.0)
    firings = []
    for f in range(num_frames):
        xyz, _ = raycast_frame(
            scene,
            num_rows=NUM_ROWS,
            num_columns=NUM_COLS,
            seed=seed + f,
            azimuth_jitter=jitter,
        )
        firings += frame_to_firings(xyz, frame_index=f)
    poses = [np.eye(4) for _ in firings]
    return firings, poses


@pytest.mark.parametrize("stop_assoc", [False, True])
def test_pipeline_matches_compiled_reference(harness, tmp_path, stop_assoc):
    firings, poses = make_stream(seed=2)
    stream = tmp_path / f"stream_{stop_assoc}.bin"
    runner.write_stream(
        stream, firings, poses, NUM_COLS,
        max_distance=0.5, stop_after_association=stop_assoc, chessboard=False,
    )
    ref_labels, ref_ground = runner.run_golden(
        harness, stream, tmp_path / f"out_{stop_assoc}.bin"
    )
    assert len(ref_labels) > 1000

    cfg = small_config(stop_after_association=stop_assoc)
    our_labels, our_ground, _ = collect_pipeline(cfg, firings, poses)

    common = set(ref_labels) & set(our_labels)
    assert len(common) > 0.95 * len(ref_labels)

    g_match = np.mean([ref_ground[k] == our_ground[k] for k in common])
    assert g_match >= 1.0, f"ground label agreement vs compiled reference: {g_match}"

    agreement = partition_agreement(ref_labels, our_labels)
    assert agreement >= 1.0, f"cluster partition agreement vs compiled reference: {agreement}"


def test_pipeline_matches_reference_chessboard(harness, tmp_path):
    """Chessboard subsampling on (the streaming default) changes the active
    point set; the partitions must still agree."""
    import dataclasses

    firings, poses = make_stream(seed=6, jitter=0.2)
    stream = tmp_path / "stream_cb.bin"
    runner.write_stream(
        stream, firings, poses, NUM_COLS,
        max_distance=0.5, stop_after_association=True, chessboard=True,
    )
    ref_labels, ref_ground = runner.run_golden(harness, stream, tmp_path / "out_cb.bin")

    cfg = small_config(stop_after_association=True)
    cfg = cfg.replace(
        clustering=dataclasses.replace(
            cfg.clustering, ignore_points_in_chessboard_pattern=True
        )
    )
    our_labels, our_ground, _ = collect_pipeline(cfg, firings, poses)
    common = set(ref_labels) & set(our_labels)
    g_match = np.mean([ref_ground[k] == our_ground[k] for k in common])
    assert g_match >= 1.0, f"chessboard ground agreement {g_match}"
    agreement = partition_agreement(ref_labels, our_labels)
    assert agreement >= 1.0, f"chessboard agreement {agreement}"


def test_pipeline_matches_reference_moving_sensor(harness, tmp_path):
    """Translating sensor: odom transforms + frontier unwrap under motion."""
    scene = make_scene(num_boxes=8, seed=8, spread=20.0)
    firings, poses = [], []
    for f in range(2):
        xyz, _ = raycast_frame(
            scene,
            num_rows=NUM_ROWS,
            num_columns=NUM_COLS,
            sensor_origin=(2.0 * f, 0.0, 0.0),
            seed=8 + f,
        )
        # points are emitted in sensor frame by subtracting the origin
        xyz = xyz - np.array([2.0 * f, 0.0, 0.0], np.float32)
        firings += frame_to_firings(xyz, frame_index=f)
        for c in range(NUM_COLS):
            p = np.eye(4)
            p[0, 3] = 2.0 * f + 2.0 * c / NUM_COLS
            poses.append(p)
    stream = tmp_path / "stream_mv.bin"
    runner.write_stream(
        stream, firings, poses, NUM_COLS,
        max_distance=0.5, stop_after_association=True, chessboard=False,
    )
    ref_labels, ref_ground = runner.run_golden(harness, stream, tmp_path / "out_mv.bin")
    assert len(ref_labels) > 1000

    cfg = small_config(stop_after_association=True)
    our_labels, our_ground, _ = collect_pipeline(cfg, firings, poses)
    common = set(ref_labels) & set(our_labels)
    g_match = np.mean([ref_ground[k] == our_ground[k] for k in common])
    assert g_match >= 1.0, f"moving-sensor ground agreement {g_match}"
    agreement = partition_agreement(ref_labels, our_labels)
    assert agreement >= 1.0, f"moving-sensor partition agreement {agreement}"


@pytest.mark.parametrize("nth,ring_revs,num_frames", [(300, 5, 6), (1024, 12, 13)])
def test_pipeline_matches_reference_nth_gated(harness, tmp_path, nth, ring_revs, num_frames):
    """cluster_point_trees_every_nth_column > 1 (the bench configuration,
    reference …cpp:841): completion is gated to batches containing an nth
    multiple, exercising the gated completion and ring clears.  The stream
    spans multiple revolutions and crosses our ring seam (ring = ring_revs *
    220 columns < stream length).  Note the publish frontier lags up to
    ~num_cols + 2*nth columns at this cadence (one-round hold + detection
    delay), so the ring must cover that lag or the pipeline raises the
    reference's overflow error — ring_revs is sized accordingly."""
    import dataclasses

    firings, poses = make_stream(seed=11, num_frames=num_frames)
    assert len(firings) > ring_revs * NUM_COLS  # crosses the ring seam
    stream = tmp_path / f"stream_nth{nth}.bin"
    runner.write_stream(
        stream, firings, poses, NUM_COLS,
        max_distance=0.5, stop_after_association=False, chessboard=False,
        nth=nth,
    )
    ref_labels, ref_ground = runner.run_golden(
        harness, stream, tmp_path / f"out_nth{nth}.bin"
    )
    assert len(ref_labels) > 1000

    cfg = small_config(stop_after_association=False)
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=ring_revs
        ),
        clustering=dataclasses.replace(
            cfg.clustering, cluster_point_trees_every_nth_column=nth
        ),
    )
    our_labels, our_ground, _ = collect_pipeline(cfg, firings, poses)

    common = set(ref_labels) & set(our_labels)
    assert len(common) > 0.9 * len(ref_labels)
    g_match = np.mean([ref_ground[k] == our_ground[k] for k in common])
    assert g_match >= 1.0, f"nth={nth} ground agreement {g_match}"
    agreement = partition_agreement(ref_labels, our_labels)
    assert agreement >= 1.0, f"nth={nth} partition agreement {agreement}"


def test_nth_window_validation():
    """A ring too small for the nth-extended live window must be rejected
    (silent aliasing would corrupt state)."""
    import dataclasses

    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    cfg = small_config()
    cfg = cfg.replace(
        clustering=dataclasses.replace(
            cfg.clustering, cluster_point_trees_every_nth_column=1024
        )
    )
    pipe = ContinuousClustering(cfg, firing_batch_size=64)
    with pytest.raises(ValueError, match="ring buffer too small"):
        pipe.reset(NUM_ROWS)


def test_python_oracle_matches_compiled_reference(harness, tmp_path):
    """The Python oracle itself must track the real C++ core."""
    firings, poses = make_stream(seed=4, num_frames=1)
    stream = tmp_path / "stream_o.bin"
    runner.write_stream(
        stream, firings, poses, NUM_COLS,
        max_distance=0.5, stop_after_association=True, chessboard=False,
    )
    ref_labels, ref_ground = runner.run_golden(harness, stream, tmp_path / "out_o.bin")

    cfg = small_config(stop_after_association=True)
    o_labels, o_ground = collect_oracle(cfg, firings, poses)
    common = set(ref_labels) & set(o_labels)
    assert len(common) > 1000
    g_match = np.mean([ref_ground[k] == o_ground[k] for k in common])
    assert g_match >= 1.0, f"oracle ground agreement: {g_match}"
    agreement = partition_agreement(ref_labels, o_labels)
    assert agreement >= 1.0, f"oracle partition agreement: {agreement}"


@pytest.mark.slow
def test_pipeline_matches_reference_kitti_scale_fog(harness, tmp_path):
    """Reference-shape golden: 64x2200, three revolutions crossing our ring
    seam, translating sensor, fog filtering enabled (reference fog rules,
    ground_segmentation fog_filtering_*).  The smaller goldens above run at
    32x220; this one pins parity at the reference's own scale."""
    import dataclasses

    R, C = 64, 2200
    scene = make_scene(num_boxes=24, seed=21, spread=35.0)
    firings, poses = [], []
    for f in range(3):
        xyz, _ = raycast_frame(
            scene, num_rows=R, num_columns=C,
            sensor_origin=(1.5 * f, 0.0, 0.0), seed=21 + f,
        )
        xyz = xyz - np.array([1.5 * f, 0.0, 0.0], np.float32)
        frame = frame_to_firings(xyz, frame_index=f)
        for fi in frame:
            fi["intensity"][:8] = 0  # induce fog candidates on the top rows
        firings += frame
        for c in range(C):
            p = np.eye(4)
            p[0, 3] = 1.5 * f + 1.5 * c / C
            poses.append(p)

    stream = tmp_path / "stream_big.bin"
    runner.write_stream(
        stream, firings, poses, C,
        max_distance=0.5, stop_after_association=False, chessboard=False,
        fog=True,
    )
    ref_labels, ref_ground = runner.run_golden(
        harness, stream, tmp_path / "out_big.bin"
    )
    assert len(ref_labels) > 100_000

    cfg = kitti_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=C, ring_buffer_revolutions=2
        ),
        ground_segmentation=dataclasses.replace(
            cfg.ground_segmentation, fog_filtering_enabled=True
        ),
        clustering=dataclasses.replace(
            cfg.clustering, stop_after_association_enabled=False
        ),
    )
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    pipe = ContinuousClustering(cfg, firing_batch_size=256)
    pipe.reset(R)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    labels, ground = {}, {}

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
    for f, p in zip(firings, poses):
        pipe.add_firing(f, p)
    pipe.flush()

    common = set(ref_labels) & set(labels)
    assert len(common) > 0.9 * len(ref_labels)
    g_match = np.mean([ref_ground[k] == ground[k] for k in common])
    assert g_match >= 1.0, f"kitti-scale ground agreement {g_match}"
    # fog must actually have triggered, with the reference's enum value
    n_fog_ref = sum(1 for k in common if ref_ground[k] == GP_FOG)
    n_fog_ours = sum(1 for k in common if ground[k] == GP_FOG)
    assert n_fog_ref > 100 and n_fog_ours > 100
    agreement = partition_agreement(ref_labels, labels)
    assert agreement >= 1.0, f"kitti-scale partition agreement {agreement}"
