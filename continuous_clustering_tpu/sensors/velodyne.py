"""Velodyne packet input: native C++ decoder with a NumPy fallback.

Decodes raw 1206-byte Velodyne data packets into firings (reference
VelodyneInput, ros/velodyne_input.hpp; wire format per the public Velodyne
manuals).  Calibration = per-laser vertical angles (+ optional azimuth
offsets and ring mapping), e.g. from a velodyne_pointcloud-style YAML.
"""

from __future__ import annotations

import ctypes
import math
import numpy as np

from .. import native
from .sensor_input import SensorInput

# Built-in VLP-16 vertical angles (degrees), laser-id order
VLP16_VERT_ANGLES = [
    -15, 1, -13, 3, -11, 5, -9, 7, -7, 9, -5, 11, -3, 13, -1, 15,
]


class VelodyneInput(SensorInput):
    def __init__(
        self,
        num_lasers: int = 16,
        vert_angles_deg=None,
        azimuth_offsets_deg=None,
        rings=None,
        distance_resolution: float = 0.002,
        firing_cycle_ns: float = 55296.0,
        use_native: bool = True,
        decode_threads: int = 0,
    ):
        super().__init__(num_lasers)
        if vert_angles_deg is None:
            if num_lasers == 16:
                vert_angles_deg = VLP16_VERT_ANGLES
            else:
                vert_angles_deg = np.linspace(15, -25, num_lasers)
        self.vert = np.deg2rad(np.asarray(vert_angles_deg, np.float32))
        self.az_off = (
            np.deg2rad(np.asarray(azimuth_offsets_deg, np.float32))
            if azimuth_offsets_deg is not None
            else np.zeros(num_lasers, np.float32)
        )
        if rings is None:
            # ring = rank of vertical angle (bottom = 0)
            rings = np.argsort(np.argsort(self.vert)).astype(np.int32)
        self.rings = np.asarray(rings, np.int32)
        self.distance_resolution = distance_resolution
        self.firing_cycle_ns = firing_cycle_ns

        self._native = None
        self._offload = None
        lib = native.load() if use_native else None
        if lib is not None:
            self._lib = lib
            self._native = lib.cct_velodyne_create(
                num_lasers,
                ctypes.c_float(distance_resolution),
                self.vert.ctypes.data_as(ctypes.c_void_p),
                self.az_off.ctypes.data_as(ctypes.c_void_p),
                self.rings.ctypes.data_as(ctypes.c_void_p),
                ctypes.c_double(firing_cycle_ns),
            )
            if decode_threads > 0:
                # decode-thread offload (reference ros_sensor_input.hpp:19-60):
                # on_packet only enqueues; a native worker decodes packet n
                # while the caller dispatches the firings of packet n-1
                self._offload = lib.cct_offload_create(self._native, 0, 1)
        # fallback assembly state
        self._slot_xyz = np.full((num_lasers, 3), np.nan, np.float32)
        self._slot_int = np.zeros(num_lasers, np.uint8)
        self._slot_stamp = np.zeros(num_lasers, np.uint64)
        self._slot_filled = np.zeros(num_lasers, bool)

    def __del__(self):
        if getattr(self, "_offload", None):
            self._lib.cct_offload_destroy(self._offload)
            self._offload = None
        if getattr(self, "_native", None):
            self._lib.cct_velodyne_destroy(self._native)
            self._native = None

    # ------------------------------------------------------------- decode
    def on_packet(self, packet: bytes, stamp_ns: int) -> None:
        if self._offload:
            buf = (ctypes.c_char * len(packet)).from_buffer_copy(packet)
            self._lib.cct_offload_enqueue(
                self._offload, buf, len(packet), ctypes.c_uint64(stamp_ns)
            )
            self._poll_native()
        elif self._native:
            buf = (ctypes.c_char * len(packet)).from_buffer_copy(packet)
            self._lib.cct_velodyne_decode(
                self._native, buf, len(packet), ctypes.c_uint64(stamp_ns)
            )
            self._poll_native()
        else:
            self._decode_python(packet, stamp_ns)

    def pending_packets(self) -> int:
        """Packets enqueued to the decode thread but not yet decoded
        (queue-depth metric, reference workload sampling)."""
        if self._offload:
            return int(self._lib.cct_offload_pending(self._offload))
        return 0

    def drain(self) -> None:
        """Block until the decode thread has consumed every enqueued packet,
        then emit the resulting firings (deterministic flush)."""
        if self._offload:
            self._lib.cct_offload_drain(self._offload)
            self._poll_native()

    def _poll_native(self):
        R = self.num_lasers
        max_f = 64
        while True:
            # fresh buffers every round: _emit hands out views into them
            xyz = np.empty((max_f, R, 3), np.float32)
            inten = np.empty((max_f, R), np.uint8)
            stamps = np.empty((max_f, R), np.uint64)
            if self._offload:
                n = self._lib.cct_offload_poll(
                    self._offload,
                    max_f,
                    xyz.ctypes.data_as(ctypes.c_void_p),
                    inten.ctypes.data_as(ctypes.c_void_p),
                    stamps.ctypes.data_as(ctypes.c_void_p),
                )
            else:
                n = self._lib.cct_velodyne_poll(
                    self._native,
                    max_f,
                    xyz.ctypes.data_as(ctypes.c_void_p),
                    inten.ctypes.data_as(ctypes.c_void_p),
                    stamps.ctypes.data_as(ctypes.c_void_p),
                )
            for i in range(n):
                self._emit(xyz[i], stamps[i], inten[i])
            if n < max_f:
                break

    # -------------------------------------------------- pure NumPy fallback
    def _decode_python(self, packet: bytes, stamp_ns: int) -> None:
        if len(packet) < 1200:
            return
        data = np.frombuffer(packet, dtype=np.uint8)[:1200].reshape(12, 100)
        R = self.num_lasers
        blocks_per_firing = max(1, (R + 31) // 32)
        # bank flags: 0xEEFF lasers 0-31, 0xDDFF 32-63, 0xCCFF 64-95,
        # 0xBBFF 96-127 (VLS-128)
        bank_of = {0xEEFF: 0, 0xDDFF: 32, 0xCCFF: 64, 0xBBFF: 96}
        for b in range(12):
            block = data[b]
            flag = int(block[0]) | (int(block[1]) << 8)
            if flag not in bank_of:
                continue
            azimuth = (int(block[2]) | (int(block[3]) << 8)) * 0.01 * math.pi / 180.0
            payload = block[4:100].reshape(32, 3)
            ticks = payload[:, 0].astype(np.uint16) | (
                payload[:, 1].astype(np.uint16) << np.uint16(8)
            )
            inten = payload[:, 2]
            bank = bank_of[flag] if R > 32 else 0
            for ch in range(32):
                if R == 16:
                    # two consecutive 16-laser firings per block
                    if ch == 16 and self._slot_filled.any():
                        self._emit_fallback()
                    laser = ch % 16
                else:
                    laser = bank + ch
                    if laser >= R:
                        break
                self._add_point(
                    laser, azimuth, float(ticks[ch]) * self.distance_resolution,
                    int(inten[ch]),
                    stamp_ns + int((b * 32 + ch) * self.firing_cycle_ns / 32),
                )
            if (b + 1) % blocks_per_firing == 0 and self._slot_filled.any():
                self._emit_fallback()

    def _add_point(self, laser, azimuth, dist, inten, stamp):
        ring = int(self.rings[laser])
        row = self.num_lasers - ring - 1  # velodyne_input.hpp:62
        if self._slot_filled[row]:
            return
        self._slot_filled[row] = True
        self._slot_stamp[row] = stamp
        if dist <= 0:
            return  # distance 0 => NaN (velodyne_input.hpp:56)
        va = float(self.vert[laser])
        # rot_correction is subtracted (velodyne_pointcloud convention)
        az = azimuth - float(self.az_off[laser])
        cv = math.cos(va)
        self._slot_xyz[row] = (
            dist * cv * math.cos(az),
            -dist * cv * math.sin(az),
            dist * math.sin(va),
        )
        self._slot_int[row] = inten

    def _emit_fallback(self):
        self._emit(self._slot_xyz.copy(), self._slot_stamp.copy(), self._slot_int.copy())
        self._slot_xyz[:] = np.nan
        self._slot_int[:] = 0
        self._slot_stamp[:] = 0
        self._slot_filled[:] = False
