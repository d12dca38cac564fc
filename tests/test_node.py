"""ClusteringNode wiring: sensor -> tf sync -> pipeline -> publishers."""

import numpy as np
import pytest

from continuous_clustering_tpu.config import Config, kitti_config
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)
from continuous_clustering_tpu.io.node import ClusteringNode
from continuous_clustering_tpu.io.transform_synchronizer import TransformSynchronizer

NUM_ROWS = 16
NUM_COLS = 110


def make_node(wait_for_tf=True):
    cfg = Config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(num_columns=NUM_COLS, ring_buffer_revolutions=4)
    )
    return ClusteringNode(
        cfg,
        sensor_manufacturer="generic_points",
        wait_for_tf=wait_for_tf,
        firing_batch_size=32,
    )


def test_node_end_to_end():
    node = make_node()
    ground_cols, inst_cols, clusters = [], [], []
    node.publish_ground_columns = lambda cloud: ground_cols.append(len(cloud))
    node.publish_instance_columns = lambda cloud: inst_cols.append(len(cloud))
    node.publish_cluster = lambda pts, stamp: clusters.append(len(pts))

    scene = make_scene(num_boxes=4, seed=0, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)

    t0 = 1_000_000_000
    for rev in range(2):
        for c in range(NUM_COLS):
            stamp = t0 + (rev * NUM_COLS + c) * 400_000
            node.on_transform(stamp + 1, np.eye(4))
            node.on_points(xyz[c], stamp)
    node.flush()

    assert ground_cols and inst_cols
    assert clusters, "no clusters published through the node"
    assert all(n > 20 for n in clusters)


def test_node_time_jump_resets():
    node = make_node(wait_for_tf=False)
    scene = make_scene(num_boxes=2, seed=1, spread=10.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)

    t0 = 1_000_000_000
    node.on_transform(t0, np.eye(4))
    for c in range(20):
        node.on_points(xyz[c], t0 + c * 400_000)
    frontier_before = node.clustering._h_first_unfinished
    # jump > 0.1 s triggers a full reset (reference …node.cpp:110-131)
    node.on_transform(t0 + 10**10, np.eye(4))
    node.on_points(xyz[0], t0 + 10**10)
    assert node.clustering._h_first_unfinished == -1  # fresh pipeline


def test_transform_synchronizer_buffers():
    sync = TransformSynchronizer(wait_for_tf=True)
    out = []
    sync.set_callback(lambda msg, pose: out.append((msg, pose[0, 3])))
    sync.add_message(100, "a")
    assert out == []  # no tf yet
    p = np.eye(4)
    p[0, 3] = 7.0
    sync.add_transform(50, np.eye(4))
    assert out == []  # tf older than message
    sync.add_transform(150, p)
    assert len(out) == 1 and out[0][0] == "a"
    # interpolated between 50 and 150 at stamp 100 -> x = 3.5
    assert abs(out[0][1] - 3.5) < 1e-9


def test_stats_recording():
    node = make_node()
    node.publish_instance_columns = lambda cloud: None
    scene = make_scene(num_boxes=2, seed=2, spread=12.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)
    t0 = 1_000_000_000
    for c in range(NUM_COLS):
        node.on_transform(t0 + c * 400_000 + 1, np.eye(4))
        node.on_points(xyz[c], t0 + c * 400_000)
    node.flush()
    s = node.clustering.stats.summary()
    assert "device_step" in s and s["device_step"]["count"] >= 1
    w = node.clustering.workload.summary()
    assert "fifo" in w


def test_launch_tree_presets():
    """The launch-file cascade analog (launch.py) composes runnable nodes
    with the reference launch values (launch/demo_touareg.launch:20-31,
    vehicle_touareg.launch:4-10, sensor_os32_*.launch fog preset)."""
    from continuous_clustering_tpu import launch

    descs = launch.demo_touareg()
    assert [d.name for d in descs] == ["vls128_roof", "os32_left", "os32_right"]
    vls = descs[0]
    assert vls.config.range_image.num_columns == 1700
    assert vls.config.ground_segmentation.height_ref_to_ground == -0.64
    os32 = descs[1]
    assert os32.config.range_image.num_columns == 1024
    assert os32.config.ground_segmentation.fog_filtering_enabled
    assert os32.config.ground_segmentation.fog_filtering_distance_below == 5.0
    # per-sensor wiring
    assert os32.raw_data_topic == "/bus/os32_left/lidar_packets"

    node = launch.make_node(descs[1])
    assert node.sensor_input.pixels_per_column == 32
    assert node.config.range_image.num_columns == 1024

    kitti = launch.demo_kitti_folder()
    assert kitti.config.clustering.max_distance == 0.5
    assert kitti.config.ground_segmentation.height_ref_to_ground == -1.7
    n2 = launch.make_node(kitti)
    assert n2.clustering is not None


def test_node_raw_packets_to_clusters_with_decode_offload():
    """Full ingress integration: raw Velodyne UDP packets -> decode-thread
    offload -> firing assembly -> tf sync -> pipeline -> published columns
    and clusters (reference chain ros_sensor_input.hpp -> addFiring).

    The synthetic stream encodes one VLP-16 revolution with a box-shaped
    range bump so at least one >20-point obstacle cluster must publish."""
    import math
    import struct

    from continuous_clustering_tpu import native

    if not native.available():
        pytest.skip("native library unavailable")

    def packet(az0_deg, dists):
        # 12 blocks x 2 firings of 16 lasers; per-block azimuth step 0.4 deg
        out = b""
        for b in range(12):
            az = (az0_deg + 0.4 * b) % 360.0
            block = struct.pack("<HH", 0xEEFF, int(az * 100))
            for ch in range(32):
                d = dists[ch % 16]
                block += struct.pack("<HB", int(d / 0.002), 90)
            out += block
        return out + b"\x00" * 6

    cfg = kitti_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS, ring_buffer_revolutions=4
        )
    )
    node = ClusteringNode(
        config=cfg,
        sensor_manufacturer="velodyne",
        sensor_kwargs={"num_lasers": 16, "decode_threads": 1},
        ego_robot_frame_from_sensor_frame=np.eye(4),
        firing_batch_size=64,
    )
    cols, clusters = [], []
    node.publish_instance_columns = lambda cloud: cols.append(len(cloud))
    node.publish_cluster = lambda pts, stamp: clusters.append(len(pts))

    flat = [25.0] * 16          # distant background
    bump = [6.0] * 16           # a near object across all rows
    t0 = 2_000_000_000
    n_packets = 80              # 12 blocks x 2 firings x 0.2deg -> ~2 revs
    for p in range(n_packets):
        az0 = (p * 4.8) % 360.0
        in_bump = 40.0 <= az0 <= 80.0
        node.on_transform(t0 + p * 1_000_000 + 1, np.eye(4))
        node.on_raw_data(
            packet(az0, bump if in_bump else flat), t0 + p * 1_000_000
        )
    node.flush()

    assert cols, "no instance columns published from raw packets"
    assert clusters, "no clusters published from raw packets"
    assert any(n > 20 for n in clusters)
    assert node.sensor_input.pending_packets() == 0


def test_publish_utils_messages():
    """tf/clock/ego-bbox constructors mirror the reference formulas
    (src/ros/ros_utils.cpp:404-457)."""
    from continuous_clustering_tpu.config import GroundSegmentationConfig
    from continuous_clustering_tpu.io.publish_utils import (
        make_clock_message,
        make_ego_bounding_box_marker,
        make_tf_message,
        rotation_matrix_to_quaternion,
    )

    # quaternion: 90 deg about z
    T = np.eye(4)
    c, s = np.cos(np.pi / 2), np.sin(np.pi / 2)
    T[:3, :3] = [[c, -s, 0], [s, c, 0], [0, 0, 1]]
    T[:3, 3] = [1.0, 2.0, 3.0]
    tf = make_tf_message(T, 5_000_000_123)
    assert tf["frame_id"] == "odom" and tf["child_frame_id"] == "velo_link"
    np.testing.assert_allclose(tf["translation"], [1, 2, 3])
    np.testing.assert_allclose(
        tf["rotation_xyzw"], [0, 0, np.sin(np.pi / 4), np.cos(np.pi / 4)],
        atol=1e-12,
    )
    # quaternion round-trips through every Shepperd branch
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.normal(size=3)
        a /= np.linalg.norm(a)
        ang = rng.uniform(0, 2 * np.pi)
        K = np.array([[0, -a[2], a[1]], [a[2], 0, -a[0]], [-a[1], a[0], 0]])
        R = np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)
        x, y, z, w = rotation_matrix_to_quaternion(R)
        R2 = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ])
        np.testing.assert_allclose(R2, R, atol=1e-9)

    assert make_clock_message(7) == {"type": "clock", "stamp_ns": 7}

    gs = GroundSegmentationConfig(
        height_ref_to_maximum=0.5, height_ref_to_ground=-1.7,
        length_ref_to_front_end=3.0, length_ref_to_rear_end=-2.0,
        width_ref_to_left_mirror=1.1, width_ref_to_right_mirror=-1.0,
    )
    m = make_ego_bounding_box_marker(42, gs)
    assert m["scale"] == (5.0, 2.1, 2.2)
    # center = near_edge + extent/2 (ros_utils.cpp:446-449)
    np.testing.assert_allclose(m["position"], (-2.0 + 2.5, -1.0 + 1.05, -1.7 + 1.1))
    assert m["frame_locked"] and m["marker_type"] == "cube"
    assert m["color_rgba"] == (1.0, 1.0, 1.0, 0.4)


def test_node_emits_clock_tf_and_ego_bbox():
    """The node surfaces clock+tf per firing and the ego bbox at reset
    (reference kitti_demo.cpp:76-80; consumed by RosBridge / rosbag replay)."""
    node = make_node()
    clocks, tfs, bboxes = [], [], []
    node.publish_clock = clocks.append
    node.publish_tf = tfs.append
    node.publish_ego_bbox = bboxes.append

    scene = make_scene(num_boxes=2, seed=1, spread=12.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)
    T = np.eye(4)
    T[:3, 3] = [0.5, 0.0, 0.1]
    t0 = 1_000_000_000
    n_firings = 40
    for c in range(n_firings):
        stamp = t0 + c * 400_000
        node.on_transform(stamp + 1, T)
        node.on_points(xyz[c % NUM_COLS], stamp)
    node.flush()

    assert len(bboxes) == 1  # once per reset
    assert bboxes[0]["type"] == "marker" and bboxes[0]["ns"] == "ego_robot"
    assert len(clocks) == n_firings and len(tfs) == n_firings
    # stamps rise monotonically with the stream (a downstream consumer can
    # drive simulated time from this)
    cs = [m["stamp_ns"] for m in clocks]
    assert cs == sorted(cs) and cs[0] >= t0
    np.testing.assert_allclose(tfs[0]["translation"], [0.5, 0.0, 0.1])
    np.testing.assert_allclose(tfs[0]["rotation_xyzw"], [0, 0, 0, 1])


def test_node_transforms_before_firings_survive_startup_reset():
    """Regression: with an async decode thread the first firing can arrive
    AFTER every transform was buffered.  The startup reset (rows discovery,
    …node.cpp:87-102) must not wipe the pose history — the reference's tf
    buffer is ROS-global and survives resets — or every queued firing waits
    forever and nothing is ever published."""
    node = make_node()
    clusters = []
    node.publish_cluster = lambda pts, stamp: clusters.append(len(pts))

    scene = make_scene(num_boxes=4, seed=0, spread=15.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS)

    t0 = 1_000_000_000
    stamps = [t0 + i * 400_000 for i in range(2 * NUM_COLS)]
    # all transforms first (what drain-time firing bursts look like) ...
    for s in stamps:
        node.on_transform(s + 1, np.eye(4))
    # ... then all firings
    for i, s in enumerate(stamps):
        node.on_points(xyz[i % NUM_COLS], s)
    node.flush()

    assert clusters, "startup reset stranded the queued firings"
    assert all(n > 20 for n in clusters)


def test_time_jump_reset_clears_stale_poses():
    """A genuine time jump discards the old time base (poses included)."""
    sync = TransformSynchronizer(wait_for_tf=True)
    got = []
    sync.set_callback(lambda msg, pose: got.append((msg, pose)))
    sync.add_transform(10**9, np.eye(4))
    sync.reset(clear_poses=True)
    sync.add_message(10**9, "stale-release")
    assert not got  # old pose gone; message must wait for a fresh transform
    sync.add_transform(2 * 10**9, np.eye(4))
    assert [m for m, _ in got] == ["stale-release"]
