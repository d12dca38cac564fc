"""Host-side insertion fast path (native C++ engine + device ingest).

Stage A is pointer-chasing, latency-sensitive host work (the reference runs
it on a dedicated thread, src/clustering/continuous_clustering.cpp:49-63);
the native engine (native/src/insertion.cpp, oracle-exact) builds the
continuous range image on the host and hands the device dense finished
column blocks — removing the sequential insertion scan from the device
program entirely.
"""

from __future__ import annotations

import ctypes
import math
from typing import Dict, List, Tuple

import jax.numpy as jnp
import numpy as np

from .. import native
from ..config import Config
from ..ops.ingest import ColumnBlock

TWO_PI = 2.0 * math.pi
# np.float32 NaN bit pattern (padding for the in-place packed fetch)
_NAN_BITS = np.float32(np.nan).view(np.int32)


class HostInsertion:
    """ctypes wrapper owning a native insertion engine."""

    def __init__(self, config: Config, num_rows: int):
        self.lib = native.load()
        if self.lib is None:
            raise RuntimeError("native library not built")
        self.config = config
        self.R = num_rows
        self.handle = self.lib.cct_insertion_create(
            num_rows,
            config.range_image.num_columns,
            config.range_image.ring_buffer_revolutions,
            1 if config.range_image.sensor_is_clockwise else 0,
        )
        self.prev_rearmost = 0
        self.prev_foremost = -1
        self.fu_init = -1

    def __del__(self):
        if getattr(self, "handle", None):
            self.lib.cct_insertion_destroy(self.handle)
            self.handle = None

    def reset(self) -> None:
        self.lib.cct_insertion_reset(self.handle)
        self.prev_rearmost = 0
        self.prev_foremost = -1
        self.fu_init = -1

    def add_firings(
        self, firings: List[Dict[str, np.ndarray]], poses: List[np.ndarray]
    ) -> Tuple[int, int, bool]:
        """Returns (first_finished, end_finished, reset_required)."""
        F, R = len(firings), self.R
        xyz = np.full((F, R, 3), np.nan, np.float32)
        stamps = np.zeros((F, R), np.uint64)
        uidx = np.full((F, R), np.iinfo(np.uint64).max, np.uint64)
        inten = np.zeros((F, R), np.uint8)
        pose_arr = np.zeros((F, 3, 4), np.float64)
        for i, (f, p) in enumerate(zip(firings, poses)):
            xyz[i] = f["xyz"]
            if "stamp" in f:
                stamps[i] = f["stamp"]
            if "uidx" in f:
                uidx[i] = f["uidx"]
            if "intensity" in f:
                inten[i] = f["intensity"]
            pose_arr[i] = p[:3, :]
        self._poses = pose_arr
        first = ctypes.c_int64()
        reset = ctypes.c_int32()
        end = self.lib.cct_insertion_add_firings(
            self.handle, F,
            np.ascontiguousarray(xyz).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(pose_arr).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(stamps).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(uidx).ctypes.data_as(ctypes.c_void_p),
            np.ascontiguousarray(inten).ctypes.data_as(ctypes.c_void_p),
            ctypes.byref(first), ctypes.byref(reset),
        )
        return int(first.value), int(end), bool(reset.value)

    def _fetch_columns_np(self, first: int, n: int, B: int, origin_rot: int):
        """Raw host-side column fetch into numpy buffers (no device work)."""
        R = self.R
        bufs = {k: np.full((B, R), np.nan, np.float32)
                for k in ("x", "y", "z", "dist", "az", "inc")}
        caz = np.full((B, R), np.nan, np.float64)
        stamp = np.zeros((B, R), np.uint64)
        uidxv = np.full((B, R), np.iinfo(np.uint64).max, np.uint64)
        inten = np.zeros((B, R), np.uint8)
        pose_idx = np.zeros(B, np.int32)
        if n > 0:
            self.lib.cct_insertion_fetch_columns(
                self.handle, first, first + n,
                *[bufs[k].ctypes.data_as(ctypes.c_void_p)
                  for k in ("x", "y", "z", "dist", "az", "inc")],
                caz.ctypes.data_as(ctypes.c_void_p),
                stamp.ctypes.data_as(ctypes.c_void_p),
                uidxv.ctypes.data_as(ctypes.c_void_p),
                inten.ctypes.data_as(ctypes.c_void_p),
                pose_idx.ctypes.data_as(ctypes.c_void_p),
            )
        bufs["caz_rel"] = (caz - TWO_PI * origin_rot).astype(np.float32)
        return bufs, stamp, uidxv, inten, pose_idx

    def fetch_block_packed(
        self, first: int, end: int, B: int, origin_rot: int, reset: bool,
        out: np.ndarray = None,
    ) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Fetch columns [first, min(end, first+B)) as packed staging buffers
        (fields (N_BLOCK_FIELDS, B, R) i32, scalars (N_BLOCK_SCALARS,) i32)
        plus the per-column trigger pose array (n, 3, 4).

        The packed form stages to device in TWO transfers total; the jitted
        step rebuilds the ColumnBlock via ``ops.ingest.unpack_block`` (which
        transposes the whole stack once on device — the planes are (B, R),
        the native engine's natural write order, so no host transposes
        remain; the previous (R, B) contract cost ~4 ms/revolution of
        single-core numpy transposes).  ``out`` optionally supplies the
        fields buffer (>= N_BLOCK_FIELDS leading planes of an (_, B, R)
        i32 array) so callers building the fully merged single-transfer
        buffer avoid a copy."""
        from ..ops.ingest import N_BLOCK_FIELDS, N_BLOCK_SCALARS

        R = self.R
        n = min(end - first, B) if end > first else 0
        if out is not None:
            fields = out[:N_BLOCK_FIELDS]
            assert fields.shape == (N_BLOCK_FIELDS, B, R)
            assert fields.dtype == np.int32
        else:
            fields = np.empty((N_BLOCK_FIELDS, B, R), np.int32)
        # the native fetch writes the six f32 fields IN PLACE into planes
        # 0..5 (f32 stores into i32 plane memory: identical bytes); the
        # remaining planes are transpose-free SIMD copies.  (A full scalar
        # C++ pack of all 13 planes measured 2.4x SLOWER than this hybrid
        # on a 1-core box — 13 interleaved scalar store streams lose to
        # numpy's vectorized plane copies; docs/ROUND4_NOTES.md.)
        caz = np.full((B, R), np.nan, np.float64)
        stamp = np.zeros((B, R), np.uint64)
        uidxv = np.full((B, R), np.iinfo(np.uint64).max, np.uint64)
        inten = np.zeros((B, R), np.uint8)
        pose_idx = np.zeros(B, np.int32)
        if n > 0:
            self.lib.cct_insertion_fetch_columns(
                self.handle, first, first + n,
                *[fields[k].ctypes.data_as(ctypes.c_void_p) for k in range(6)],
                caz.ctypes.data_as(ctypes.c_void_p),
                stamp.ctypes.data_as(ctypes.c_void_p),
                uidxv.ctypes.data_as(ctypes.c_void_p),
                inten.ctypes.data_as(ctypes.c_void_p),
                pose_idx.ctypes.data_as(ctypes.c_void_p),
            )
        fields[0:6, n:] = _NAN_BITS
        fields[6] = (caz - TWO_PI * origin_rot).astype(np.float32).view(np.int32)
        fields[7] = (stamp & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        fields[8] = (stamp >> np.uint64(32)).astype(np.uint32).view(np.int32)
        fields[9] = (uidxv & np.uint64(0xFFFFFFFF)).astype(np.uint32).view(np.int32)
        fields[10] = (uidxv >> np.uint64(32)).astype(np.uint32).view(np.int32)
        fields[11] = inten
        fields[12] = np.maximum(pose_idx, 0)[:, None]
        scalars = np.zeros(N_BLOCK_SCALARS, np.int32)
        scalars[0] = first
        scalars[1] = n
        scalars[2] = max(end, 0)
        scalars[3] = max(end, self.prev_foremost)
        scalars[4] = first + n
        scalars[5] = self.fu_init if self.fu_init >= 0 else first
        scalars[6] = int(reset)
        poses = self._poses[np.clip(pose_idx[:n], 0, len(self._poses) - 1)]
        if self.fu_init < 0 and n > 0:
            self.fu_init = first
        return fields, scalars, poses

    def fetch_block(
        self, first: int, end: int, B: int, origin_rot: int, reset: bool
    ) -> Tuple[ColumnBlock, np.ndarray]:
        """Fetch columns [first, min(end, first+B)) as a padded ColumnBlock
        of device arrays plus the trigger pose array (n, 3, 4).

        Compatibility path (one transfer per field); the hot streaming loop
        uses ``fetch_block_packed`` + in-jit unpack instead."""
        R = self.R
        n = min(end - first, B) if end > first else 0
        bufs, stamp, uidxv, inten, pose_idx = self._fetch_columns_np(
            first, n, B, origin_rot
        )

        def t(a, dt=jnp.float32):
            return jnp.asarray(a.T, dt)  # (R, B)

        block = ColumnBlock(
            gcol0=jnp.asarray(first, jnp.int32),
            n_cols=jnp.asarray(n, jnp.int32),
            x=t(bufs["x"]), y=t(bufs["y"]), z=t(bufs["z"]),
            distance=t(bufs["dist"]), azimuth=t(bufs["az"]),
            inclination=t(bufs["inc"]), cont_az=t(bufs["caz_rel"]),
            stamp_lo=jnp.asarray((stamp & np.uint64(0xFFFFFFFF)).T, jnp.uint32),
            stamp_hi=jnp.asarray((stamp >> np.uint64(32)).T, jnp.uint32),
            uidx_lo=jnp.asarray((uidxv & np.uint64(0xFFFFFFFF)).T, jnp.uint32),
            uidx_hi=jnp.asarray((uidxv >> np.uint64(32)).T, jnp.uint32),
            intensity=jnp.asarray(inten.T, jnp.int32),
            firing_index=jnp.asarray(np.maximum(pose_idx, 0)[None, :].repeat(R, 0), jnp.int32),
            prev_rearmost=jnp.asarray(max(end - 1 + 1, 0), jnp.int32),
            prev_foremost=jnp.asarray(max(end, self.prev_foremost), jnp.int32),
            first_unfinished=jnp.asarray(first + n, jnp.int32),
            first_unpublished_init=jnp.asarray(
                self.fu_init if self.fu_init >= 0 else first, jnp.int32
            ),
            reset_required=jnp.asarray(reset),
        )
        poses = self._poses[np.clip(pose_idx[:n], 0, len(self._poses) - 1)]
        if self.fu_init < 0 and n > 0:
            self.fu_init = first
        return block, poses

    def clear_before(self, keep_from: int) -> None:
        if keep_from > 0:
            self.lib.cct_insertion_clear_before(self.handle, keep_from)
