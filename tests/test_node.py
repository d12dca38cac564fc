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
