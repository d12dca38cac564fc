"""Native C++ components vs oracle / NumPy fallbacks."""

import ctypes
import math
import struct

import numpy as np
import pytest

from continuous_clustering_tpu import native
from continuous_clustering_tpu.evaluation import kitti_loader as kl
from continuous_clustering_tpu.evaluation.synthetic import (
    frame_to_firings,
    make_scene,
    raycast_frame,
)
from continuous_clustering_tpu.ops.oracle import OracleContinuousClustering

from .test_oracle import small_config

NUM_ROWS = 32
NUM_COLS = 220

pytestmark = pytest.mark.skipif(not native.available(), reason="native lib not built")


def test_native_insertion_matches_oracle():
    lib = native.load()
    cfg = small_config()
    scene = make_scene(num_boxes=6, seed=1, spread=20.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS, azimuth_jitter=0.3, seed=7)
    firings = frame_to_firings(xyz)
    poses = [np.eye(4) for _ in firings]

    oracle = OracleContinuousClustering(cfg, NUM_ROWS)
    oracle.set_transform_robot_from_sensor(np.eye(4))
    oracle._segment_column = lambda gcol, pose: None
    for f, p in zip(firings, poses):
        oracle.add_firing(f, p)

    h = lib.cct_insertion_create(NUM_ROWS, NUM_COLS, 4, 1)
    F = len(firings)
    xyzb = np.ascontiguousarray(np.stack([f["xyz"] for f in firings]), np.float32)
    poseb = np.ascontiguousarray(np.stack([p[:3, :] for p in poses]), np.float64)
    stampb = np.ascontiguousarray(np.stack([f["stamp"] for f in firings]), np.uint64)
    uidxb = np.ascontiguousarray(np.stack([f["uidx"] for f in firings]), np.uint64)
    intb = np.ascontiguousarray(np.stack([f["intensity"] for f in firings]), np.uint8)
    first = ctypes.c_int64()
    reset = ctypes.c_int32()
    end = lib.cct_insertion_add_firings(
        h, F,
        xyzb.ctypes.data_as(ctypes.c_void_p),
        poseb.ctypes.data_as(ctypes.c_void_p),
        stampb.ctypes.data_as(ctypes.c_void_p),
        uidxb.ctypes.data_as(ctypes.c_void_p),
        intb.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(first), ctypes.byref(reset),
    )
    assert reset.value == 0
    assert end == oracle.first_unfinished
    assert first.value == 0

    n = end - first.value
    bufs = {
        name: np.empty((n, NUM_ROWS), dt)
        for name, dt in [
            ("x", np.float32), ("y", np.float32), ("z", np.float32),
            ("dist", np.float32), ("az", np.float32), ("inc", np.float32),
        ]
    }
    caz = np.empty((n, NUM_ROWS), np.float64)
    stamp = np.empty((n, NUM_ROWS), np.uint64)
    uidx = np.empty((n, NUM_ROWS), np.uint64)
    inten = np.empty((n, NUM_ROWS), np.uint8)
    pose_idx = np.empty(n, np.int32)
    lib.cct_insertion_fetch_columns(
        h, first.value, end,
        *[bufs[k].ctypes.data_as(ctypes.c_void_p) for k in ("x", "y", "z", "dist", "az", "inc")],
        caz.ctypes.data_as(ctypes.c_void_p),
        stamp.ctypes.data_as(ctypes.c_void_p),
        uidx.ctypes.data_as(ctypes.c_void_p),
        inten.ctypes.data_as(ctypes.c_void_p),
        pose_idx.ctypes.data_as(ctypes.c_void_p),
    )
    lib.cct_insertion_destroy(h)

    rc = cfg.ring_buffer_max_columns
    for i, g in enumerate(range(first.value, end)):
        lc = g % rc
        for r in range(NUM_ROWS):
            c = oracle.cells[lc][r]
            o_dist = c.distance if c.global_column_index == g else np.nan
            if np.isnan(o_dist):
                assert np.isnan(bufs["dist"][i, r]), (i, r)
            else:
                np.testing.assert_allclose(bufs["dist"][i, r], o_dist, rtol=1e-6)
                # native uses atan2f like the C++ reference; the oracle goes
                # through double atan2 — ulp-level differences are expected
                np.testing.assert_allclose(caz[i, r], c.continuous_azimuth_angle, atol=1e-5)
                assert uidx[i, r] == c.globally_unique_point_index


def test_native_range_image_matches_numpy():
    lib = native.load()
    rng = np.random.default_rng(0)
    n = 5000
    pts = np.zeros(n, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"), ("i", "f4")])
    ang = rng.uniform(-math.pi, math.pi, n)
    r = rng.uniform(2, 50, n)
    pts["x"] = r * np.cos(ang)
    pts["y"] = r * np.sin(ang)
    laser = rng.integers(0, 32, n).astype(np.int32)

    ref = kl.generate_range_image(pts, laser, width=220, num_lasers=32, use_native=False)

    xyz4 = np.ascontiguousarray(
        np.stack([pts["x"], pts["y"], pts["z"], pts["i"]], axis=1), np.float32
    )
    out = np.full(32 * 220, -1, np.int64)
    lib.cct_generate_range_image(
        n, xyz4.ctypes.data_as(ctypes.c_void_p),
        laser.ctypes.data_as(ctypes.c_void_p), 220, 32, 1,
        out.ctypes.data_as(ctypes.c_void_p),
    )
    np.testing.assert_array_equal(out, ref)


def _vlp16_packet(azimuth_deg, dist_m=10.0, intensity=77):
    """Build a minimal synthetic VLP-16 packet: 12 blocks, same azimuth."""
    blocks = b""
    for b in range(12):
        block = struct.pack("<HH", 0xEEFF, int(azimuth_deg * 100))
        for ch in range(32):
            ticks = int(dist_m / 0.002)
            block += struct.pack("<HB", ticks, intensity)
        blocks += block
    return blocks + b"\x00" * 6  # 1206 bytes


@pytest.mark.parametrize("use_native", [True, False])
def test_velodyne_decode(use_native):
    from continuous_clustering_tpu.sensors.velodyne import VelodyneInput

    dec = VelodyneInput(num_lasers=16, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_vlp16_packet(45.0), stamp_ns=1_000_000)
    # 12 blocks x 2 firings per block = 24 firings
    assert len(firings) == 24
    f = firings[0]
    assert f["xyz"].shape == (16, 3)
    d = np.linalg.norm(f["xyz"], axis=1)
    np.testing.assert_allclose(d, 10.0, rtol=1e-5)
    assert np.all(f["intensity"] == 77)
    # rows ordered top (largest vertical angle) to bottom
    assert f["xyz"][0, 2] > f["xyz"][-1, 2]


def _ouster_packet(info, ranges_m, encoder0=0):
    R = info["data_format"]["pixels_per_column"]
    cols = info["data_format"]["columns_per_packet"]
    cpf = info["data_format"]["columns_per_frame"]
    out = b""
    for c in range(cols):
        hdr = struct.pack("<QHHI", 12345, c, 0, encoder0 + c * 90112 // cpf)
        body = b""
        for px in range(R):
            rng_mm = int(ranges_m * 1000)
            body += struct.pack("<IHHHH", rng_mm, 0, 500, 0, 0)
        out += hdr + body + struct.pack("<I", 0xFFFFFFFF)
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_ouster_decode(use_native):
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    dec = OusterInput(info, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_ouster_packet(info, 15.0), host_stamp_ns=42)
    assert len(firings) == info["data_format"]["columns_per_packet"]
    f = firings[0]
    assert f["xyz"].shape == (32, 3)
    d = np.linalg.norm(f["xyz"], axis=1)
    np.testing.assert_allclose(d, 15.0, rtol=0.01)
    assert np.all(f["intensity"] == int(500 * 255 / 1000))


def _vls128_packet(azimuth_deg, dist_m=20.0):
    """Four bank flags covering lasers 0-127 at one azimuth."""
    flags = [0xEEFF, 0xDDFF, 0xCCFF, 0xBBFF]
    blocks = b""
    for b in range(12):
        flag = flags[b % 4]
        block = struct.pack("<HH", flag, int(azimuth_deg * 100))
        for ch in range(32):
            block += struct.pack("<HB", int(dist_m / 0.004), 50)
        blocks += block
    return blocks + b"\x00" * 6


@pytest.mark.parametrize("use_native", [True, False])
def test_vls128_all_banks_decoded(use_native):
    from continuous_clustering_tpu.sensors.velodyne import VelodyneInput

    dec = VelodyneInput(num_lasers=128, distance_resolution=0.004, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_vls128_packet(90.0), stamp_ns=0)
    # 12 blocks / 4 banks-per-firing = 3 complete firings
    assert len(firings) == 3
    f = firings[0]
    assert f["xyz"].shape == (128, 3)
    filled = ~np.isnan(f["xyz"][:, 0])
    assert filled.all(), f"only {filled.sum()}/128 rows decoded"
    d = np.linalg.norm(f["xyz"], axis=1)
    np.testing.assert_allclose(d, 20.0, rtol=1e-4)


def test_velodyne_native_matches_python():
    from continuous_clustering_tpu.sensors.velodyne import VelodyneInput

    pkts = [_vlp16_packet(a, dist_m=5 + a / 50) for a in np.linspace(0, 359, 20)]
    results = {}
    for mode in (True, False):
        dec = VelodyneInput(num_lasers=16, use_native=mode)
        out = []
        dec.add_on_new_firing_callback(lambda f: out.append(f))
        for i, p in enumerate(pkts):
            dec.on_packet(p, stamp_ns=i * 10**6)
        results[mode] = out
    assert len(results[True]) == len(results[False])
    for a, b in zip(results[True], results[False]):
        # cosf/sinf vs double trig: f32-level agreement
        np.testing.assert_allclose(a["xyz"], b["xyz"], rtol=1e-5, atol=1e-5, equal_nan=True)
        np.testing.assert_array_equal(a["intensity"], b["intensity"])


def test_velodyne_decode_offload_matches_inline():
    """The decode-thread offload (native/src/decode_offload.cpp, reference
    ros_sensor_input.hpp:19-60) must emit exactly the inline path's firings,
    in order, after drain()."""
    from continuous_clustering_tpu.sensors.velodyne import VelodyneInput

    pkts = [_vlp16_packet(a, dist_m=5 + a / 50) for a in np.linspace(0, 359, 40)]
    results = {}
    for threads in (0, 1):
        dec = VelodyneInput(num_lasers=16, decode_threads=threads)
        if threads and dec._offload is None:
            pytest.skip("native library unavailable")
        out = []
        dec.add_on_new_firing_callback(lambda f: out.append(f))
        for i, p in enumerate(pkts):
            dec.on_packet(p, stamp_ns=i * 10**6)
        dec.drain()
        assert dec.pending_packets() == 0
        results[threads] = out
    assert len(results[1]) == len(results[0]) == 40 * 24
    for a, b in zip(results[0], results[1]):
        np.testing.assert_array_equal(a["xyz"], b["xyz"], err_msg="offload xyz")
        np.testing.assert_array_equal(a["stamp"], b["stamp"])
        np.testing.assert_array_equal(a["intensity"], b["intensity"])
        assert a["firing_index"] == b["firing_index"]


def test_ouster_decode_offload_matches_inline():
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    pkts = [_ouster_packet(info, 5.0 + k) for k in range(16)]
    results = {}
    for threads in (0, 1):
        dec = OusterInput(info, decode_threads=threads)
        if threads and dec._offload is None:
            pytest.skip("native library unavailable")
        out = []
        dec.add_on_new_firing_callback(lambda f: out.append(f))
        for i, p in enumerate(pkts):
            dec.on_packet(p, host_stamp_ns=i * 10**6)
        dec.drain()
        results[threads] = out
    assert len(results[1]) == len(results[0]) > 0
    for a, b in zip(results[0], results[1]):
        np.testing.assert_array_equal(a["xyz"], b["xyz"])
        np.testing.assert_array_equal(a["stamp"], b["stamp"])


def _ouster_rng19_packet(info, ranges_m, m_id=0):
    """Synthetic RNG19_RFL8_SIG16_NIR16 single-return packet: 32-byte packet
    header, per column a 12-byte header (ts u64, m_id u16, status u16 bit0)
    and 12-byte pixels (range u32 19-bit, rfl u8, signal u16 @6, nir u16)."""
    R = info["data_format"]["pixels_per_column"]
    cols = info["data_format"]["columns_per_packet"]
    ranges_m = np.broadcast_to(np.asarray(ranges_m, np.float64), (R,))
    out = b"\x00" * 32
    for c in range(cols):
        out += struct.pack("<QHH", 1000 + c, (m_id + c) % info["data_format"]["columns_per_frame"], 1)
        for r in range(R):
            rng = int(round(ranges_m[r] * 1000.0)) & 0x0007FFFF
            out += struct.pack("<IBBHHH", rng, 200, 0, 700, 55, 0)
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_ouster_rng19_decode(use_native):
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = copy.deepcopy(
        json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    )
    info["data_format"]["udp_profile_lidar"] = "RNG19_RFL8_SIG16_NIR16"
    dec = OusterInput(info, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_ouster_rng19_packet(info, 15.0), host_stamp_ns=42)
    assert len(firings) == info["data_format"]["columns_per_packet"]
    f = firings[0]
    d = np.linalg.norm(f["xyz"], axis=1)
    # |p| ~ range (beam-origin offset shifts it slightly)
    assert np.all(np.abs(d - 15.0) < 0.1)
    assert np.all(f["intensity"] == int(min(700, 1000) * 255 / 1000))


def test_ouster_rng19_matches_legacy_geometry():
    """The same scene encoded in both profiles must decode identically:
    LEGACY encoder ticks are an exact multiple of the RNG19 measurement id
    when ticks-per-column divides evenly."""
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info_l = json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    info_r = copy.deepcopy(info_l)
    info_r["data_format"]["udp_profile_lidar"] = "RNG19_RFL8_SIG16_NIR16"
    cols_per_frame = info_l["data_format"]["columns_per_frame"]
    assert 90112 % cols_per_frame == 0
    ticks_per_col = 90112 // cols_per_frame

    m_id = 37
    out = {}
    for key, info, pkt in (
        ("legacy", info_l, _ouster_packet(info_l, 12.5, encoder0=m_id * ticks_per_col)),
        ("rng19", info_r, _ouster_rng19_packet(info_r, 12.5, m_id=m_id)),
    ):
        dec = OusterInput(info)
        got = []
        dec.add_on_new_firing_callback(lambda f: got.append(f))
        dec.on_packet(pkt, host_stamp_ns=7)
        out[key] = got
    assert len(out["legacy"]) == len(out["rng19"]) > 0
    for a, b in zip(out["legacy"], out["rng19"]):
        np.testing.assert_allclose(a["xyz"], b["xyz"], rtol=2e-5, atol=2e-4)


def _ouster_rng15_packet(info, ranges_m, refl=180, m_id=0):
    """Synthetic RNG15_RFL8_NIR8 low-data-rate packet: 4-byte pixels —
    range u16 (15 bits, 8 mm granularity), calibrated reflectivity u8,
    near_ir u8.  No SIGNAL field exists in this profile."""
    R = info["data_format"]["pixels_per_column"]
    cols = info["data_format"]["columns_per_packet"]
    ranges_m = np.broadcast_to(np.asarray(ranges_m, np.float64), (R,))
    out = b"\x00" * 32
    for c in range(cols):
        out += struct.pack(
            "<QHH", 1000 + c, (m_id + c) % info["data_format"]["columns_per_frame"], 1
        )
        for r in range(R):
            rng = int(round(ranges_m[r] * 1000.0 / 8.0)) & 0x7FFF
            out += struct.pack("<HBB", rng, refl, 33)
    return out


def _ouster_dual_packet(info, ranges_m=(10.0, 14.0), signals=(500, 900), m_id=0):
    """Synthetic RNG19_RFL8_SIG16_NIR16_DUAL packet: 16-byte pixels —
    range u32 per return at offsets 0/4 (19 bits, reflectivity packed in
    bits 24-31), signal u16 per return at offsets 8/10, near_ir u16 @12."""
    R = info["data_format"]["pixels_per_column"]
    cols = info["data_format"]["columns_per_packet"]
    out = b"\x00" * 32
    for c in range(cols):
        out += struct.pack(
            "<QHH", 1000 + c, (m_id + c) % info["data_format"]["columns_per_frame"], 1
        )
        for r in range(R):
            w0 = (int(ranges_m[0] * 1000) & 0x0007FFFF) | (200 << 24)
            w1 = (int(ranges_m[1] * 1000) & 0x0007FFFF) | (90 << 24)
            out += struct.pack("<IIHHHH", w0, w1, signals[0], signals[1], 55, 0)
    return out


@pytest.mark.parametrize("use_native", [True, False])
def test_ouster_rng15_decode(use_native):
    """Low-data-rate profile: 8 mm range granularity, intensity is the
    calibrated reflectivity byte verbatim (no 0-1000 signal scaling)."""
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = copy.deepcopy(
        json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    )
    info["data_format"]["udp_profile_lidar"] = "RNG15_RFL8_NIR8"
    dec = OusterInput(info, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_ouster_rng15_packet(info, 12.0, refl=180), host_stamp_ns=42)
    assert len(firings) == info["data_format"]["columns_per_packet"]
    f = firings[0]
    d = np.linalg.norm(f["xyz"], axis=1)
    assert np.all(np.abs(d - 12.0) < 0.1)
    assert np.all(f["intensity"] == 180)


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("return_index", [0, 1])
def test_ouster_dual_return_decode(use_native, return_index):
    """Dual-return profile: return_index selects which return's
    RANGE/SIGNAL pair is emitted (reference publishes the first,
    ouster_input.hpp:134-138; the second is exposed for completeness)."""
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = copy.deepcopy(
        json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    )
    info["data_format"]["udp_profile_lidar"] = "RNG19_RFL8_SIG16_NIR16_DUAL"
    dec = OusterInput(info, use_native=use_native, return_index=return_index)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    pkt = _ouster_dual_packet(info, ranges_m=(10.0, 14.0), signals=(500, 900))
    dec.on_packet(pkt, host_stamp_ns=42)
    assert len(firings) == info["data_format"]["columns_per_packet"]
    f = firings[0]
    d = np.linalg.norm(f["xyz"], axis=1)
    want_r = (10.0, 14.0)[return_index]
    want_i = int((500, 900)[return_index] * 255 / 1000)
    assert np.all(np.abs(d - want_r) < 0.1)
    assert np.all(f["intensity"] == want_i)


def test_ouster_dual_return_index_validation():
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = copy.deepcopy(
        json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    )
    with pytest.raises(ValueError, match="DUAL"):
        OusterInput(info, return_index=1)
    info["data_format"]["udp_profile_lidar"] = "NOT_A_PROFILE"
    with pytest.raises(ValueError, match="udp_profile_lidar"):
        OusterInput(info)


def _ouster_fusa_packet(info, ranges_m=(10.0, 14.0), refls=(210, 80), m_id=0):
    """Synthetic FUSA_RNG15_RFL8_NIR8_DUAL packet: 8-byte pixels — per
    return r in {0,1} range u16 @4r (15 bits, 8 mm granularity) and
    calibrated reflectivity u8 @(2+4r); near_ir u8 @3 (byte 7 reserved)."""
    R = info["data_format"]["pixels_per_column"]
    cols = info["data_format"]["columns_per_packet"]
    out = b"\x00" * 32
    for c in range(cols):
        out += struct.pack(
            "<QHH", 1000 + c, (m_id + c) % info["data_format"]["columns_per_frame"], 1
        )
        for r in range(R):
            r0 = int(round(ranges_m[0] * 1000.0 / 8.0)) & 0x7FFF
            r1 = int(round(ranges_m[1] * 1000.0 / 8.0)) & 0x7FFF
            out += struct.pack("<HBBHBB", r0, refls[0], 33, r1, refls[1], 0)
    return out


@pytest.mark.parametrize("use_native", [True, False])
@pytest.mark.parametrize("return_index", [0, 1])
def test_ouster_fusa_dual_decode(use_native, return_index):
    """FUSA dual profile: 8 mm range granularity per return; intensity is
    the selected return's calibrated reflectivity byte (no SIGNAL field,
    so no 0-1000 scaling).  Both returns and both decoders agree with the
    hand-computed geometry."""
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = copy.deepcopy(
        json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    )
    info["data_format"]["udp_profile_lidar"] = "FUSA_RNG15_RFL8_NIR8_DUAL"
    dec = OusterInput(info, use_native=use_native, return_index=return_index)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    pkt = _ouster_fusa_packet(info, ranges_m=(10.0, 14.0), refls=(210, 80))
    dec.on_packet(pkt, host_stamp_ns=42)
    assert len(firings) == info["data_format"]["columns_per_packet"]
    f = firings[0]
    d = np.linalg.norm(f["xyz"], axis=1)
    # ranges quantize to 8 mm; 10.0 and 14.0 m are exact multiples
    want_r = (10.0, 14.0)[return_index]
    assert np.all(np.abs(d - want_r) < 0.05)
    assert np.all(f["intensity"] == (210, 80)[return_index])
    # hand-computed XYZ of pixel 0 in column 0 (m_id=0 => theta_enc=2*pi)
    alt = np.deg2rad(info["beam_altitude_angles"][0])
    azo = np.deg2rad(info["beam_azimuth_angles"][0])
    n = info["lidar_origin_to_beam_origin_mm"] * 1e-3
    theta_enc = 2.0 * np.pi
    theta = theta_enc + azo
    rc = want_r - n
    want_xyz = np.array(
        [
            rc * np.cos(theta) * np.cos(alt) + n * np.cos(theta_enc),
            rc * np.sin(theta) * np.cos(alt) + n * np.sin(theta_enc),
            rc * np.sin(alt),
        ],
        np.float32,
    )
    np.testing.assert_allclose(f["xyz"][0], want_xyz, atol=2e-2)


def test_ouster_fusa_native_matches_python():
    import copy
    import json

    from continuous_clustering_tpu.sensors.ouster import OusterInput

    info = copy.deepcopy(
        json.load(open("/root/reference/calibrations/touareg_os32_left.json"))
    )
    info["data_format"]["udp_profile_lidar"] = "FUSA_RNG15_RFL8_NIR8_DUAL"
    pkt = _ouster_fusa_packet(info, ranges_m=(7.5, 21.0), refls=(17, 255), m_id=3)
    for ri in (0, 1):
        outs = []
        for use_native in (True, False):
            dec = OusterInput(info, use_native=use_native, return_index=ri)
            firings = []
            dec.add_on_new_firing_callback(lambda f: firings.append(f))
            dec.on_packet(pkt, host_stamp_ns=7)
            outs.append(firings)
        assert len(outs[0]) == len(outs[1]) > 0
        for fn, fp in zip(outs[0], outs[1]):
            np.testing.assert_allclose(fn["xyz"], fp["xyz"], atol=1e-5)
            np.testing.assert_array_equal(fn["intensity"], fp["intensity"])


# ---------------------------------------------------------------- velodyne
# decode-fidelity goldens: expected values hand-computed from the public
# velodyne_pointcloud math (the parser the reference delegates to,
# /root/reference/include/continuous_clustering/ros/velodyne_input.hpp:15-97)

def _vlp16_packet_blocks(block_specs, return_mode=0x37):
    """12 blocks from (azimuth_ticks, {channel: (dist_ticks, intensity)})."""
    blocks = b""
    for az_ticks, chans in block_specs:
        block = struct.pack("<HH", 0xEEFF, az_ticks)
        for ch in range(32):
            d, i = chans.get(ch, (0, 0))
            block += struct.pack("<HB", d, i)
        blocks += block
    return blocks + struct.pack("<IBB", 0, return_mode, 0x22)  # 1206 bytes


def _expected_xyz_vlp16(laser, az_ticks_f, dist_m, vert_deg):
    va = math.radians(vert_deg)
    az = (az_ticks_f % 36000.0) * 0.01 * math.pi / 180.0
    cv = math.cos(va)
    return np.array(
        [dist_m * cv * math.cos(az), -dist_m * cv * math.sin(az),
         dist_m * math.sin(va)], np.float32,
    )


@pytest.mark.parametrize("use_native", [True, False])
def test_vlp16_azimuth_interpolation(use_native):
    """Channel azimuths are interpolated across the block from the
    inter-block gap (velodyne_pointcloud unpack_vlp16 timing model)."""
    from continuous_clustering_tpu.sensors.velodyne import (
        VLP16_VERT_ANGLES,
        VelodyneInput,
    )

    # block azimuths advance 40 ticks (0.4 deg) per block
    az0, daz = 9000, 40
    dist_ticks = int(12.0 / 0.002)
    specs = []
    for b in range(12):
        # every channel of both firings carries a return
        chans = {ch: (dist_ticks, 10) for ch in range(32)}
        specs.append((az0 + b * daz, chans))
    dec = VelodyneInput(num_lasers=16, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_vlp16_packet_blocks(specs), stamp_ns=0)
    assert len(firings) == 24

    dsr_t, fir_t, blk_t = 2.304, 55.296, 110.592
    rings = np.argsort(np.argsort(VLP16_VERT_ANGLES))
    for b in (0, 5):
        for firing in (0, 1):
            f = firings[b * 2 + firing]
            for dsr in (0, 7, 15):
                row = 16 - int(rings[dsr]) - 1
                az_f = az0 + b * daz + daz * (
                    dsr * dsr_t + firing * fir_t) / blk_t
                exp = _expected_xyz_vlp16(
                    dsr, az_f, 12.0, VLP16_VERT_ANGLES[dsr])
                np.testing.assert_allclose(
                    f["xyz"][row], exp, rtol=2e-5, atol=2e-5,
                    err_msg=f"b={b} firing={firing} dsr={dsr}",
                )
    # the interpolated azimuth must differ measurably from the block
    # azimuth for late channels (the round-2 decoder used az0 for all)
    f = firings[1]  # block 0, firing 1
    row = 16 - int(rings[15]) - 1
    uninterp = _expected_xyz_vlp16(15, az0, 12.0, VLP16_VERT_ANGLES[15])
    assert np.abs(f["xyz"][row] - uninterp).max() > 1e-3


@pytest.mark.parametrize("use_native", [True, False])
def test_vlp16_dual_return(use_native):
    """Factory byte 0x39: block pairs carry last+strongest of the SAME
    firing; the pair assembles into one firing, strongest winning."""
    from continuous_clustering_tpu.sensors.velodyne import (
        VLP16_VERT_ANGLES,
        VelodyneInput,
    )

    last_t, strong_t = int(8.0 / 0.002), int(6.0 / 0.002)
    specs = []
    for pair in range(6):
        az = 18000 + pair * 40
        # even block: last return; odd block: strongest return.
        # laser 3: both valid -> strongest (6 m) wins
        # laser 5: strongest missing -> last (8 m) kept
        last_ch = {3: (last_t, 1), 5: (last_t, 2),
                   16 + 3: (last_t, 1), 16 + 5: (last_t, 2)}
        strong_ch = {3: (strong_t, 9), 16 + 3: (strong_t, 9)}
        specs.append((az, last_ch))
        specs.append((az, strong_ch))
    dec = VelodyneInput(num_lasers=16, use_native=use_native)
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    dec.on_packet(_vlp16_packet_blocks(specs, return_mode=0x39), stamp_ns=0)
    # 6 pairs x 2 firings each (NOT 24: pairs collapse)
    assert len(firings) == 12
    rings = np.argsort(np.argsort(VLP16_VERT_ANGLES))
    row3, row5 = 16 - int(rings[3]) - 1, 16 - int(rings[5]) - 1
    for f in firings:
        d3 = np.linalg.norm(f["xyz"][row3])
        d5 = np.linalg.norm(f["xyz"][row5])
        np.testing.assert_allclose(d3, 6.0, rtol=1e-4)  # strongest won
        np.testing.assert_allclose(d5, 8.0, rtol=1e-4)  # last kept
        assert f["intensity"][row3] == 9
        other = [r for r in range(16) if r not in (row3, row5)]
        assert np.isnan(f["xyz"][other, 0]).all()


@pytest.mark.parametrize("use_native", [True, False])
def test_velodyne_two_point_calibration(use_native):
    """dist/two-point/offset corrections follow the velodyne_pointcloud
    unpack math (hand-computed expected coordinates)."""
    from continuous_clustering_tpu.sensors.velodyne import VelodyneInput

    R = 32
    vert_deg = np.linspace(10, -30, R)
    dc = np.full(R, 0.12, np.float32)      # 12 cm base correction
    dcx = np.full(R, 0.20, np.float32)
    dcy = np.full(R, 0.05, np.float32)
    vo = np.full(R, 0.10, np.float32)      # 10 cm vertical offset
    ho = np.full(R, 0.026, np.float32)     # 2.6 cm horizontal offset
    rot_deg = np.full(R, 1.5, np.float32)  # rot_correction
    two_pt = np.ones(R, np.uint8)
    dec = VelodyneInput(
        num_lasers=R, vert_angles_deg=vert_deg,
        azimuth_offsets_deg=rot_deg, use_native=use_native,
        dist_corrections_m=dc, dist_corrections_x_m=dcx,
        dist_corrections_y_m=dcy, vert_offsets_m=vo, horiz_offsets_m=ho,
        two_pt=two_pt,
    )
    firings = []
    dec.add_on_new_firing_callback(lambda f: firings.append(f))
    az_deg, dist_m = 73.0, 17.0
    blocks = b""
    for b in range(12):
        block = struct.pack("<HH", 0xEEFF, int(az_deg * 100))
        for ch in range(32):
            block += struct.pack("<HB", int(dist_m / 0.002), 40)
        blocks += block
    dec.on_packet(blocks + b"\x00" * 6, stamp_ns=0)
    assert len(firings) == 12

    # independent recomputation of the velodyne_pointcloud formula
    rings = np.argsort(np.argsort(vert_deg))
    for laser in (0, 13, 31):
        va = math.radians(float(vert_deg[laser]))
        cv, sv = math.cos(va), math.sin(va)
        az = math.radians(az_deg) - math.radians(1.5)
        ca, sa = math.cos(az), math.sin(az)
        d = dist_m + 0.12
        xy = d * cv - 0.10 * sv
        xx = abs(xy * sa - 0.026 * ca)
        yy = abs(xy * ca + 0.026 * sa)
        cx = (0.12 - 0.20) * (xx - 2.40) / (25.04 - 2.40) + 0.20 - 0.12
        cy = (0.12 - 0.05) * (yy - 1.93) / (25.04 - 1.93) + 0.05 - 0.12
        xv = ((d + cx) * cv - 0.10 * sv) * sa - 0.026 * ca
        yv = ((d + cy) * cv - 0.10 * sv) * ca + 0.026 * sa
        zv = (d + cy) * sv + 0.10 * cv
        exp = np.array([yv, -xv, zv], np.float32)
        row = R - int(rings[laser]) - 1
        np.testing.assert_allclose(
            firings[0]["xyz"][row], exp, rtol=1e-4, atol=1e-4,
            err_msg=f"laser={laser}",
        )


def test_velodyne_native_matches_python_interpolated():
    """Native/python parity on packets with advancing azimuths, dual-return
    mode and full correction terms active."""
    from continuous_clustering_tpu.sensors.velodyne import VelodyneInput

    rng = np.random.default_rng(7)
    pkts = []
    for p in range(8):
        specs = []
        dual = p % 2 == 1
        for b in range(12):
            az = (p * 600 + (b // (2 if dual else 1)) * 40) % 36000
            chans = {
                int(ch): (int(rng.integers(0, 3000)), int(rng.integers(0, 255)))
                for ch in rng.integers(0, 32, 20)
            }
            specs.append((az, chans))
        pkts.append(_vlp16_packet_blocks(specs, 0x39 if dual else 0x37))
    kw = dict(
        num_lasers=16,
        dist_corrections_m=np.full(16, 0.03, np.float32),
        vert_offsets_m=np.full(16, 0.05, np.float32),
        horiz_offsets_m=np.full(16, -0.02, np.float32),
        two_pt=np.ones(16, np.uint8),
        dist_corrections_x_m=np.full(16, 0.06, np.float32),
        dist_corrections_y_m=np.full(16, 0.01, np.float32),
    )
    results = {}
    for mode in (True, False):
        dec = VelodyneInput(use_native=mode, **kw)
        out = []
        dec.add_on_new_firing_callback(lambda f: out.append(f))
        for i, p in enumerate(pkts):
            dec.on_packet(p, stamp_ns=i * 10**6)
        results[mode] = out
    assert len(results[True]) == len(results[False]) > 0
    for a, b in zip(results[True], results[False]):
        np.testing.assert_allclose(
            a["xyz"], b["xyz"], rtol=1e-5, atol=1e-5, equal_nan=True
        )
        np.testing.assert_array_equal(a["intensity"], b["intensity"])
        np.testing.assert_array_equal(a["stamp"], b["stamp"])


# ---------------------------------------------------------------------------
# Native publish-path readout (native/src/readout.cpp): record assembly and
# cluster grouping must match the NumPy get_columns/_emit_clusters paths
# exactly (reference: columnToPointCloud / clusterToPointCloud,
# src/ros/ros_utils.cpp:34-107).
# ---------------------------------------------------------------------------


def _streamed_pipe_outputs(cfg, firings, num_rows, use_native):
    from continuous_clustering_tpu.io import native_readout
    from continuous_clustering_tpu.io.point_cloud import ProcessingStage
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    native_readout._AVAILABLE = use_native
    try:
        pipe = ContinuousClustering(cfg, firing_batch_size=64)
        pipe.reset(num_rows)
        pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
        clusters = []
        pipe.set_finished_cluster_callback(
            lambda pts, stamp: clusters.append((pts.copy(), stamp))
        )
        for _ in range(2):
            for f in firings:
                pipe.add_firing(dict(f), np.eye(4))
        pipe.flush()
        fu = pipe.first_unpublished_global_column_index
        cols = pipe.get_columns(
            max(0, fu - 128), fu - 1, ProcessingStage.CONTINUOUS_CLUSTERING
        )
    finally:
        native_readout._AVAILABLE = None
    return clusters, cols


def test_native_readout_matches_numpy():
    from continuous_clustering_tpu.io import native_readout

    assert native_readout.available(), "layout drift broke the native readout"
    import continuous_clustering_tpu as cct

    cfg = cct.kitti_config()
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=NUM_COLS * 2, ring_buffer_revolutions=4
        )
    )
    scene = make_scene(num_boxes=8, seed=3, spread=25.0, min_radius=4.0)
    xyz, _ = raycast_frame(scene, num_rows=NUM_ROWS, num_columns=NUM_COLS * 2, seed=1)
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10**8)

    cn, coln = _streamed_pipe_outputs(cfg, firings, NUM_ROWS, True)
    cp, colp = _streamed_pipe_outputs(cfg, firings, NUM_ROWS, False)

    assert len(cn) == len(cp) > 0
    for (gn, sn), (gp, sp) in zip(cn, cp):
        assert sn == sp
        assert len(gn) == len(gp)
        for f in gn.dtype.names:
            a, b = gn[f], gp[f]
            if a.dtype.kind == "f":
                np.testing.assert_array_equal(a, b, err_msg=f)
            else:
                assert np.array_equal(a, b), f
    assert coln.dtype == colp.dtype
    for f in coln.dtype.names:
        a, b = coln[f], colp[f]
        if a.dtype.kind == "f":
            np.testing.assert_array_equal(a, b, err_msg=f)
        else:
            assert np.array_equal(a, b), f
