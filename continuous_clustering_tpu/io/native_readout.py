"""Native publish-path assembly: packed slab -> structured cloud in C++.

The reference fills its published PointCloud2 record-by-record in C++
(src/ros/ros_utils.cpp:34-107).  The NumPy equivalent (26 per-field strided
stores, then structured-array filter + argsort + split for clusters) costs
~45 ms per 512-column window and caps streaming throughput below the device
rate; ``native/src/readout.cpp`` does both jobs in one pass.  Falls back to
the NumPy path when the native library is absent (callers check
``available()``).
"""

from __future__ import annotations

import ctypes
from typing import List, Optional, Tuple

import numpy as np

from .. import native
from ..ops.readout import FETCH_ORDER, N_SLAB_ROWS
from .point_cloud import POINT_DTYPE

# slab row order compiled into readout.cpp (enum SlabRow); guards drift
_EXPECTED_ORDER = (
    "x", "y", "z", "distance", "azimuth", "inclination", "cont_az",
    "finish_az", "stamp_lo", "stamp_hi", "uidx_lo", "uidx_hi", "gcol",
    "firing_index", "intensity", "ground_label", "debug_label", "nbr_stats",
    "slot", "is_ignored",
)

_AVAILABLE: Optional[bool] = None


def available() -> bool:
    global _AVAILABLE
    if _AVAILABLE is None:
        lib = native.load()
        _AVAILABLE = (
            lib is not None
            and FETCH_ORDER == _EXPECTED_ORDER
            and N_SLAB_ROWS == len(_EXPECTED_ORDER) + 2
            and int(lib.cct_readout_record_size()) == POINT_DTYPE.itemsize
        )
    return _AVAILABLE


def _prep(slab: np.ndarray) -> np.ndarray:
    assert slab.dtype == np.int32 and slab.ndim == 3
    assert slab.shape[0] == N_SLAB_ROWS
    return np.ascontiguousarray(slab)


def assemble_cloud(
    slab: np.ndarray, off: int, n: int, from_gcol: int, rc: int,
    origin_az: float,
) -> np.ndarray:
    """All cells of slab columns [off, off+n) as a CONTINUOUS_CLUSTERING
    stage cloud, flattened column-major (get_columns contract)."""
    slab = _prep(slab)
    _, R, W = slab.shape
    out = np.empty(R * n, dtype=POINT_DTYPE)
    native.load().cct_assemble_cloud(
        slab.ctypes.data_as(ctypes.c_void_p), N_SLAB_ROWS, R, W, off, n,
        from_gcol, rc, float(origin_az), out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def emit_clusters(
    slab: np.ndarray, off: int, n: int, from_gcol: int, rc: int,
    origin_az: float, counter_old: int, counter_new: int,
    use_last_stamp: bool,
) -> List[Tuple[np.ndarray, int]]:
    """New finished clusters in [counter_old, counter_new) with >20 points:
    list of (record view, stamp ns), id-ascending (_emit_clusters contract).
    """
    slab = _prep(slab)
    _, R, W = slab.shape
    max_groups = R * n // 21 + 2
    records = np.empty(R * n, dtype=POINT_DTYPE)
    group_off = np.empty(max_groups, dtype=np.int64)
    group_stamp = np.empty(max_groups, dtype=np.uint64)
    n_groups = native.load().cct_emit_clusters(
        slab.ctypes.data_as(ctypes.c_void_p), N_SLAB_ROWS, R, W, off, n,
        from_gcol, rc, float(origin_az), counter_old, counter_new,
        1 if use_last_stamp else 0,
        records.ctypes.data_as(ctypes.c_void_p),
        group_off.ctypes.data_as(ctypes.c_void_p),
        group_stamp.ctypes.data_as(ctypes.c_void_p),
    )
    return [
        (records[group_off[g] : group_off[g + 1]], int(group_stamp[g]))
        for g in range(n_groups)
    ]
