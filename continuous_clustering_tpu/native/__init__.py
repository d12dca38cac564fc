"""ctypes bindings for the native host components.

Build with:  cmake -S continuous_clustering_tpu/native -B build && make -C build
(or ``python -m continuous_clustering_tpu.native.build``).  All consumers
fall back to pure-Python implementations when the library is absent.
"""

from __future__ import annotations

import ctypes
from pathlib import Path
from typing import Optional

_LIB: Optional[ctypes.CDLL] = None


def load() -> Optional[ctypes.CDLL]:
    global _LIB
    if _LIB is not None:
        return _LIB
    # a failed probe is NOT cached: the lib is generated on demand (a fresh
    # container starts without it; bench.py / the measurement session build
    # it mid-process and re-call load()).  Consumers that got None fall back
    # to pure Python and never re-enter this path per-call.
    here = Path(__file__).parent
    for cand in (here / "lib" / "libcct_native.so", here / "libcct_native.so"):
        if cand.exists():
            lib = ctypes.CDLL(str(cand))
            _declare(lib)
            _LIB = lib
            break
    return _LIB


def available() -> bool:
    return load() is not None


def _declare(lib: ctypes.CDLL) -> None:
    c = ctypes
    lib.cct_insertion_create.restype = c.c_void_p
    lib.cct_insertion_create.argtypes = [c.c_int, c.c_int, c.c_int, c.c_int]
    lib.cct_insertion_destroy.argtypes = [c.c_void_p]
    lib.cct_insertion_add_firings.restype = c.c_int64
    lib.cct_insertion_add_firings.argtypes = [
        c.c_void_p, c.c_int, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p, c.POINTER(c.c_int64), c.POINTER(c.c_int32),
    ]
    lib.cct_insertion_fetch_columns.argtypes = [c.c_void_p, c.c_int64, c.c_int64] + [c.c_void_p] * 11
    lib.cct_insertion_clear_before.argtypes = [c.c_void_p, c.c_int64]
    lib.cct_insertion_reset.argtypes = [c.c_void_p]

    lib.cct_generate_range_image.argtypes = [
        c.c_int64, c.c_void_p, c.c_void_p, c.c_int, c.c_int, c.c_int, c.c_void_p
    ]
    lib.cct_recover_laser_indices.restype = c.c_int32
    lib.cct_recover_laser_indices.argtypes = [c.c_int64, c.c_void_p, c.c_int, c.c_void_p]

    lib.cct_velodyne_create.restype = c.c_void_p
    lib.cct_velodyne_create.argtypes = [
        c.c_int, c.c_float, c.c_void_p, c.c_void_p, c.c_void_p, c.c_double
    ]
    lib.cct_velodyne_set_corrections.argtypes = [
        c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.c_void_p,
    ]
    lib.cct_velodyne_destroy.argtypes = [c.c_void_p]
    lib.cct_velodyne_decode.argtypes = [c.c_void_p, c.c_void_p, c.c_int64, c.c_uint64]
    lib.cct_velodyne_poll.restype = c.c_int
    lib.cct_velodyne_poll.argtypes = [c.c_void_p, c.c_int, c.c_void_p, c.c_void_p, c.c_void_p]

    lib.cct_ouster_create.restype = c.c_void_p
    lib.cct_ouster_create.argtypes = [
        c.c_int, c.c_int, c.c_int, c.c_int, c.c_int, c.c_double,
        c.c_void_p, c.c_void_p,
    ]
    lib.cct_ouster_destroy.argtypes = [c.c_void_p]
    lib.cct_ouster_decode.argtypes = [c.c_void_p, c.c_void_p, c.c_int64, c.c_uint64]
    lib.cct_ouster_poll.restype = c.c_int
    lib.cct_ouster_poll.argtypes = [c.c_void_p, c.c_int, c.c_void_p, c.c_void_p, c.c_void_p]

    lib.cct_offload_create.restype = c.c_void_p
    lib.cct_offload_create.argtypes = [c.c_void_p, c.c_int, c.c_int]
    lib.cct_offload_destroy.argtypes = [c.c_void_p]
    lib.cct_offload_enqueue.argtypes = [c.c_void_p, c.c_void_p, c.c_int64, c.c_uint64]
    lib.cct_offload_pending.restype = c.c_int64
    lib.cct_offload_pending.argtypes = [c.c_void_p]
    lib.cct_offload_drain.argtypes = [c.c_void_p]
    lib.cct_offload_poll.restype = c.c_int
    lib.cct_offload_poll.argtypes = [c.c_void_p, c.c_int, c.c_void_p, c.c_void_p, c.c_void_p]

    lib.cct_readout_record_size.restype = c.c_int64
    lib.cct_readout_record_size.argtypes = []
    if hasattr(lib, "cct_readout_layout_version"):
        lib.cct_readout_layout_version.restype = c.c_int64
        lib.cct_readout_layout_version.argtypes = []
    lib.cct_assemble_cloud.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_int64, c.c_void_p, c.c_int64,
        c.c_int64, c.c_int64, c.c_int64, c.c_int64, c.c_double, c.c_void_p,
    ]
    lib.cct_emit_clusters.restype = c.c_int64
    lib.cct_emit_clusters.argtypes = [
        c.c_void_p, c.c_int64, c.c_int64, c.c_int64, c.c_void_p, c.c_int64,
        c.c_int64, c.c_int64, c.c_int64, c.c_int64, c.c_double, c.c_int64,
        c.c_int64, c.c_int, c.c_void_p, c.c_void_p, c.c_void_p, c.c_void_p,
        c.POINTER(c.c_int32),
    ]
