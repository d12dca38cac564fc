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
from ..ops.readout import FETCH_ORDER, N_SLAB_ROWS, N_SLAB_ROWS_NBR
from .point_cloud import POINT_DTYPE

# slab row order compiled into readout.cpp (enum SlabRow, v3 layout);
# guards drift — pk8 byte-packs intensity/ground/debug/ignored, gcol is
# derived host-side, the component-slot join happens in C++ via the (2, K)
# join tables, the nbr_stats row is optional and trails
_EXPECTED_ORDER = (
    "x", "y", "z", "distance", "azimuth", "inclination", "cont_az",
    "finish_az", "stamp_lo", "stamp_hi", "uidx_lo", "uidx_hi", "pk8",
    "firing_index", "slot",
)

_AVAILABLE: Optional[bool] = None


def available() -> bool:
    global _AVAILABLE
    if _AVAILABLE is None:
        lib = native.load()
        _AVAILABLE = (
            lib is not None
            and hasattr(lib, "cct_readout_layout_version")
            and int(lib.cct_readout_layout_version()) == 3
            and FETCH_ORDER == _EXPECTED_ORDER
            and N_SLAB_ROWS == len(_EXPECTED_ORDER)
            and int(lib.cct_readout_record_size()) == POINT_DTYPE.itemsize
        )
    return _AVAILABLE


def _prep(slab: np.ndarray) -> np.ndarray:
    assert slab.dtype == np.int32 and slab.ndim == 3
    assert slab.shape[0] in (N_SLAB_ROWS, N_SLAB_ROWS_NBR)
    return np.ascontiguousarray(slab)


def _prep_tabs(tabs: np.ndarray) -> np.ndarray:
    tabs = np.ascontiguousarray(tabs, dtype=np.int32)
    assert tabs.ndim == 2 and tabs.shape[0] == 2
    return tabs


def assemble_cloud(
    slab: np.ndarray, tabs: np.ndarray, off: int, n: int, from_gcol: int,
    rc: int, origin_az: float,
) -> np.ndarray:
    """All cells of slab columns [off, off+n) as a CONTINUOUS_CLUSTERING
    stage cloud, flattened column-major (get_columns contract).  ``tabs`` is
    the (2, K) component-slot join table (ops/readout.py join_tables)."""
    slab = _prep(slab)
    tabs = _prep_tabs(tabs)
    n_rows, R, W = slab.shape
    out = np.empty(R * n, dtype=POINT_DTYPE)
    native.load().cct_assemble_cloud(
        slab.ctypes.data_as(ctypes.c_void_p), n_rows, R, W,
        tabs.ctypes.data_as(ctypes.c_void_p), tabs.shape[1], off, n,
        from_gcol, rc, float(origin_az), out.ctypes.data_as(ctypes.c_void_p),
    )
    return out


def emit_clusters(
    slab: np.ndarray, tabs: np.ndarray, off: int, n: int, from_gcol: int,
    rc: int, origin_az: float, counter_old: int, counter_new: int,
    use_last_stamp: bool,
) -> Tuple[List[Tuple[np.ndarray, int]], Optional[np.ndarray]]:
    """New finished clusters in [counter_old, counter_new) with >20 points:
    (list of (record view, stamp ns) id-ascending — the _emit_clusters
    contract — , full-window cloud or None).  The second element is the
    whole window assembled as a get_columns-shaped cloud when the selection
    was dense enough that the C++ built it anyway (callers cache it)."""
    slab = _prep(slab)
    tabs = _prep_tabs(tabs)
    n_rows, R, W = slab.shape
    max_groups = R * n // 21 + 2
    records = np.empty(R * n, dtype=POINT_DTYPE)
    full = np.empty(R * n, dtype=POINT_DTYPE)
    group_off = np.empty(max_groups, dtype=np.int64)
    group_stamp = np.empty(max_groups, dtype=np.uint64)
    was_dense = ctypes.c_int32(0)
    n_groups = native.load().cct_emit_clusters(
        slab.ctypes.data_as(ctypes.c_void_p), n_rows, R, W,
        tabs.ctypes.data_as(ctypes.c_void_p), tabs.shape[1], off, n,
        from_gcol, rc, float(origin_az), counter_old, counter_new,
        1 if use_last_stamp else 0,
        records.ctypes.data_as(ctypes.c_void_p),
        group_off.ctypes.data_as(ctypes.c_void_p),
        group_stamp.ctypes.data_as(ctypes.c_void_p),
        full.ctypes.data_as(ctypes.c_void_p),
        ctypes.byref(was_dense),
    )
    groups = [
        (records[group_off[g] : group_off[g + 1]], int(group_stamp[g]))
        for g in range(n_groups)
    ]
    return groups, (full if was_dense.value else None)
