"""ROS1 bag reader + replay: round-trip against a spec-conformant writer.

The writer below emits rosbag format 2.0 exactly as the public spec
describes (magic, length-prefixed records, connection/message records
inside optionally-bz2 chunks); the reader under test must recover the
stream, and the replay tool must drive packets through the real node.
"""

import bz2
import struct

import numpy as np
import pytest

from continuous_clustering_tpu.io import rosbag

from .test_native import _vlp16_packet


def _header(fields):
    out = b""
    for name, value in fields:
        f = name + b"=" + value
        out += struct.pack("<I", len(f)) + f
    return out


def _record(fields, data):
    h = _header(fields)
    return struct.pack("<I", len(h)) + h + struct.pack("<I", len(data)) + data


def _conn_record(cid, topic, datatype):
    conn_header = _header(
        [(b"type", datatype.encode()), (b"md5sum", b"x" * 32),
         (b"message_definition", b"")]
    )
    return _record(
        [(b"op", bytes([rosbag.OP_CONNECTION])),
         (b"conn", struct.pack("<I", cid)),
         (b"topic", topic.encode())],
        conn_header,
    )


def _msg_record(cid, stamp_ns, payload):
    return _record(
        [(b"op", bytes([rosbag.OP_MSG])),
         (b"conn", struct.pack("<I", cid)),
         (b"time", struct.pack("<II", stamp_ns // 10**9, stamp_ns % 10**9))],
        payload,
    )


def _serialize_velodyne_scan(stamp_ns, packets):
    out = struct.pack("<I", 0)  # header.seq
    out += struct.pack("<II", stamp_ns // 10**9, stamp_ns % 10**9)
    frame = b"velodyne"
    out += struct.pack("<I", len(frame)) + frame
    out += struct.pack("<I", len(packets))
    for pstamp, data in packets:
        assert len(data) == 1206
        out += struct.pack("<II", pstamp // 10**9, pstamp % 10**9) + data
    return out


def write_bag(path, messages, compression="none"):
    """messages: list of (topic, datatype, stamp_ns, payload)."""
    topics = {}
    inner = b""
    for topic, datatype, stamp, payload in messages:
        if topic not in topics:
            cid = len(topics)
            topics[topic] = cid
            inner += _conn_record(cid, topic, datatype)
        inner += _msg_record(topics[topic], stamp, payload)
    if compression == "bz2":
        chunk_data = bz2.compress(inner)
    else:
        chunk_data = inner
    chunk = _record(
        [(b"op", bytes([rosbag.OP_CHUNK])),
         (b"compression", compression.encode()),
         (b"size", struct.pack("<I", len(inner)))],
        chunk_data,
    )
    bag_header = _record(
        [(b"op", bytes([rosbag.OP_BAG_HEADER])),
         (b"index_pos", struct.pack("<Q", 0)),
         (b"conn_count", struct.pack("<I", len(topics))),
         (b"chunk_count", struct.pack("<I", 1))],
        b"\x20" * 4096,  # the spec pads the bag header record
    )
    path.write_bytes(rosbag.MAGIC + bag_header + chunk)


@pytest.mark.parametrize("compression", ["none", "bz2"])
def test_bag_roundtrip(tmp_path, compression):
    pkt = _vlp16_packet(10.0)
    scan = _serialize_velodyne_scan(5_000_000_000, [(5_000_000_000, pkt)])
    msgs = [
        ("/bus/vls128_roof/eth_scan/bus_to_host",
         "velodyne_msgs/VelodyneScan", 5_000_000_000, scan),
        ("/other", "std_msgs/String", 6_000_000_000, b"\x03\x00\x00\x00abc"),
    ]
    bag = tmp_path / f"t_{compression}.bag"
    write_bag(bag, msgs, compression=compression)

    got = list(rosbag.read_messages(bag))
    assert [(t, d, s) for t, d, s, _ in got] == [
        (m[0], m[1], m[2]) for m in msgs
    ]
    stamp, packets = rosbag.decode_velodyne_scan(got[0][3])
    assert stamp == 5_000_000_000
    assert len(packets) == 1 and packets[0][1] == pkt


def test_bag_replay_drives_the_node(tmp_path):
    """End-to-end: a bag of VLP-16 scans -> rosbag_replay -> clusters."""
    from continuous_clustering_tpu.tools.rosbag_replay import replay

    msgs = []
    t0 = 9_000_000_000
    n_packets = 80
    flat = [25.0] * 16
    bump = [6.0] * 16
    for p in range(n_packets):
        az0 = (p * 4.8) % 360.0
        dists = bump if 40.0 <= az0 <= 80.0 else flat
        # one packet per scan message; azimuth advances 0.4deg per block
        pkt = _vlp16_multiblock(az0, dists)
        stamp = t0 + p * 1_000_000
        msgs.append(
            ("/velodyne_packets", "velodyne_msgs/VelodyneScan", stamp,
             _serialize_velodyne_scan(stamp, [(stamp, pkt)]))
        )
    bag = tmp_path / "drive.bag"
    write_bag(bag, msgs, compression="bz2")

    stats = replay(
        bag, sensor="velodyne",
        sensor_kwargs={"num_lasers": 16, "decode_threads": 1},
        num_columns=110,
    )
    assert stats["packets"] == n_packets
    assert stats["clusters"] >= 1
    assert stats["cluster_points"] > 20


def _vlp16_multiblock(az0_deg, dists):
    out = b""
    for b in range(12):
        az = (az0_deg + 0.4 * b) % 360.0
        block = struct.pack("<HH", 0xEEFF, int(az * 100))
        for ch in range(32):
            block += struct.pack("<HB", int(dists[ch % 16] / 0.002), 90)
        out += block
    return out + b"\x00" * 6


def test_write_messages_roundtrip(tmp_path):
    """Product-side writer (io.rosbag.write_messages) round-trips through
    the reader, preserving connection headers verbatim."""
    from continuous_clustering_tpu.io.rosbag import (
        read_messages_raw,
        write_messages,
    )

    msgs = [
        ("/a", "pkg/TypeA", 1_500_000_000, b"payload-a0"),
        ("/b", "pkg/TypeB", 1_600_000_000, b"payload-b0"),
        ("/a", "pkg/TypeA", 1_700_000_000, b"payload-a1"),
    ]
    bag = tmp_path / "w.bag"
    write_messages(bag, msgs)
    got = list(read_messages_raw(bag))
    assert [(t, s, d) for t, _, s, d in got] == [
        (t, s, d) for t, _, s, d in [(m[0], None, m[2], m[3]) for m in msgs]
    ]
    # raw headers re-write losslessly (read -> write -> read)
    bag2 = tmp_path / "w2.bag"
    write_messages(bag2, got, compression="bz2")
    assert list(read_messages_raw(bag2)) == got


def test_filter_bag_minimal(tmp_path):
    """make_minimal_rosbag analog: whitelisted topics survive with stamps
    and payloads intact; everything else is dropped."""
    from continuous_clustering_tpu.io.rosbag import filter_bag, read_messages

    src = tmp_path / "full.bag"
    msgs = [
        ("/lidar/raw_data", "velodyne_msgs/VelodyneScan", 10 ** 9, b"p0"),
        ("/camera/image", "sensor_msgs/Image", 10 ** 9 + 1, b"JPG" * 100),
        ("/tf", "tf2_msgs/TFMessage", 10 ** 9 + 2, b"tfmsg"),
        ("/lidar/raw_data", "velodyne_msgs/VelodyneScan", 10 ** 9 + 3, b"p1"),
    ]
    write_bag(src, msgs)
    dst = tmp_path / "min.bag"
    counts = filter_bag(src, dst, ["/lidar/raw_data", "/tf"])
    assert counts == {"/lidar/raw_data": 2, "/tf": 1}
    got = list(read_messages(dst))
    assert [(t, d) for t, _, _, d in got] == [
        ("/lidar/raw_data", b"p0"), ("/tf", b"tfmsg"), ("/lidar/raw_data", b"p1")
    ]
    assert got[0][1] == "velodyne_msgs/VelodyneScan"  # datatype preserved


def test_make_minimal_rosbag_cli(tmp_path):
    from continuous_clustering_tpu.tools.make_minimal_rosbag import main

    src = tmp_path / "full.bag"
    write_bag(src, [("/keep", "t/K", 5, b"x"), ("/drop", "t/D", 6, b"y")])
    dst = tmp_path / "min.bag"
    rc = main([str(src), str(dst), "--topics", "/keep"])
    assert rc == 0 and dst.exists()


def test_bag_header_record_matches_ros_comm_padding(tmp_path):
    """ros_comm pads the bag-header record's HEADER + DATA (excluding both
    4-byte length prefixes) to FILE_HEADER_LENGTH = 4096 (a 4104-byte
    record), so `rosbag reindex` can rewrite index_pos/conn_count in place
    without clobbering the following chunk record."""
    import struct

    from continuous_clustering_tpu.io.rosbag import MAGIC, write_messages

    path = tmp_path / "hdr.bag"
    write_messages(path, [("/t", b"topic=/t\n", 1, b"x")])
    raw = path.read_bytes()
    off = len(MAGIC)
    (hlen,) = struct.unpack_from("<I", raw, off)
    (dlen,) = struct.unpack_from("<I", raw, off + 4 + hlen)
    assert hlen + dlen == 4096
    # the next record (the chunk) must start exactly after the 4104-byte
    # header record and still parse
    from continuous_clustering_tpu.io.rosbag import read_messages

    msgs = list(read_messages(path))
    assert len(msgs) == 1 and msgs[0][3] == b"x"
