"""Shared setup for throughput benchmarking / profiling.

Builds the exact configuration the headline bench uses (KITTI-shaped
64x2200 stream, host insertion, device-resident block scan) so bench.py
and scripts/profile_stages.py measure the same program.
"""

from __future__ import annotations

import dataclasses
import os

import numpy as np


def host_cpu_fingerprint() -> str:
    """Short hash of the host CPU's feature set.

    XLA:CPU AOT cache entries embed the COMPILE machine's features; loading
    them on a host with a different feature set can SIGILL/abort (observed:
    this container migrates across heterogeneous hosts, and stale
    /tmp/cct_xla_cache entries aborted mid-test with 'Fatal Python error:
    Aborted' in jax Array._value).  Keying the cache directory by the CPU
    fingerprint makes foreign entries unreachable."""
    import hashlib

    try:
        flags = ""
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    flags = " ".join(sorted(line.split(":", 1)[1].split()))
                    break
        return hashlib.sha1(flags.encode()).hexdigest()[:10]
    except Exception:  # pragma: no cover
        return "unknown"


def compile_cache_dir() -> str:
    cache = os.environ.get("CCT_COMPILE_CACHE")
    if cache:
        return cache
    return f"/tmp/cct_xla_cache_{host_cpu_fingerprint()}"


def enable_compile_cache() -> None:
    """Persistent XLA compile cache: avoids fresh big compiles, which have
    historically wedged the TPU tunnel (docs/ROUND1_NOTES.md).  The cache
    directory is per-host-CPU (see host_cpu_fingerprint)."""
    import jax

    cache = compile_cache_dir()
    try:
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception:
        pass


def make_bench_pipe(num_rows=64, num_cols=2200, ring_revs=10, batch=256, nth=1024):
    """Pipeline configured like the headline bench. Returns (cfg, pipe)."""
    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    cfg = cct.kitti_config(single_threaded=False)
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=num_cols, ring_buffer_revolutions=ring_revs
        ),
        clustering=dataclasses.replace(
            cfg.clustering, cluster_point_trees_every_nth_column=nth
        ),
    )
    pipe = ContinuousClustering(cfg, firing_batch_size=batch)
    pipe.reset(num_rows)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    return cfg, pipe


def make_bench_scene(num_rows=64, num_cols=2200):
    """Synthetic KITTI-shaped revolution. Returns (firings, n_valid_points)."""
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )

    scene = make_scene(num_boxes=24, seed=0, spread=35.0)
    xyz, _ = raycast_frame(scene, num_rows=num_rows, num_columns=num_cols, seed=0)
    n_points = int(np.sum(~np.isnan(xyz[..., 0])))
    firings = frame_to_firings(xyz, start_stamp=0, end_stamp=10**8)
    return firings, n_points


def prepare_rev_blocks(pipe, firings, n_rev, num_cols):
    """Host-insert ``n_rev + 1`` revolutions and stack the resulting dense
    column blocks per revolution. Requires the host-insertion fast path.

    Returns (revs, hsg) where revs[k] = (stacked_blocks, stacked_seg_poses).
    """
    import jax
    import jax.numpy as jnp

    assert pipe._host_ins is not None, "host insertion unavailable"
    hsg = jnp.asarray(np.float32(-1.7))
    blocks, seg_poses = [], []
    for _ in range(n_rev + 1):
        first, end, reset = pipe._host_ins.add_firings(
            firings, [np.eye(4)] * len(firings)
        )
        while first < end:
            blk, trig = pipe._host_ins.fetch_block(
                first, end, pipe._batch_B, 0, reset
            )
            blocks.append(blk)
            seg_poses.append(pipe._seg_poses(trig))
            first += int(blk.n_cols)
        pipe._host_ins.clear_before(end - num_cols)
    per_rev = len(blocks) // (n_rev + 1)
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    revs = [
        (
            stack(blocks[k * per_rev : (k + 1) * per_rev]),
            stack(seg_poses[k * per_rev : (k + 1) * per_rev]),
        )
        for k in range(n_rev + 1)
    ]
    return revs, hsg
