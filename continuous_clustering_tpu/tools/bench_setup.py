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


def capture_revolution(pipe, firings, num_cols):
    """ONE revolution of host-inserted blocks, stacked and device-resident:
    the periodic block scan runner (models/throughput.py
    make_periodic_block_scan_runner) replays it with exact per-revolution
    offsets.  Returns (blocks0, seg_poses0, per_rev, hsg)."""
    import jax
    import jax.numpy as jnp

    assert pipe._host_ins is not None, "host insertion unavailable"
    blocks, seg_poses = [], []
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
    if not blocks:
        raise RuntimeError("no complete columns produced by host insertion")
    stack = lambda xs: jax.tree_util.tree_map(lambda *a: jnp.stack(a), *xs)
    hsg = jnp.asarray(np.float32(-1.7))
    return stack(blocks), stack(seg_poses), len(blocks), hsg


def measure_periodic_rate(cfg, pipe, scene, num_cols, n_points, N=8,
                          pairs=3, slab_cols=0, slab_head=0,
                          state=None, k0=0):
    """Steady-state device rate via the one-dispatch periodic runner and
    the 2N-vs-N scan-length DIFFERENCE, which cancels the per-call fixed
    cost (dispatch serialization + final scalar fetch — link round trips
    on a remote tunnel) exactly.  This replaced per-revolution dispatch
    loops that (a) tracked tunnel health more than the device and (b) in
    some scripts replayed already-consumed revolutions, whose steps
    degenerate (frontier stuck, zero clusters) and understate the work —
    the periodic runner always advances one coherent stream.

    ``scene`` is capture_revolution's (blocks0, seg_poses0, per_rev, hsg).
    Starts from a fresh device copy of ``pipe.state`` unless (state, k0)
    continue a previous call's stream.  Returns a result dict including
    the advanced ``state``/``k0``."""
    import time

    import jax
    import jax.numpy as jnp

    from continuous_clustering_tpu.models.throughput import (
        make_periodic_block_scan_runner,
    )

    blocks0, segp0, per_rev, hsg = scene
    if state is None:
        state = jax.tree_util.tree_map(
            jnp.asarray, jax.tree_util.tree_map(np.asarray, pipe.state)
        )
    mk = lambda n: make_periodic_block_scan_runner(
        cfg, pipe._batch_B, num_cols, n * per_rev,
        slab_cols=slab_cols, slab_head=slab_head,
    )
    r1, r2 = mk(N), mk(2 * N)

    def call(r, n_steps):
        nonlocal state, k0
        t0 = time.perf_counter()
        state, _ = r(state, blocks0, segp0, hsg, jnp.int32(k0))
        int(np.asarray(state.first_unpublished))
        dt = time.perf_counter() - t0
        k0 += n_steps
        return dt

    call(r1, N * per_rev)  # compile + allocation warm (both programs)
    call(r2, 2 * N * per_rev)
    t1s, t2s = [], []
    for _ in range(pairs):
        t1s.append(call(r1, N * per_rev))
        t2s.append(call(r2, 2 * N * per_rev))
    diff = sum(t2s) - sum(t1s)
    raw = pairs * 2 * N * n_points / sum(t2s)
    diff_ok = 0.25 * sum(t2s) < diff < 0.75 * sum(t2s)
    rate = (pairs * N * n_points / diff) if diff_ok else raw
    # per-call fixed cost (dispatch + fetch): E[T_N] = F + N*t_rev
    fixed_s = max(0.0, (2 * sum(t1s) - sum(t2s)) / pairs)
    return {
        "pts_per_s": round(rate),
        "raw_2n_pts_per_s": round(raw),
        "diff_ok": diff_ok,
        "fixed_call_s": fixed_s,
        "ms_per_rev": round(n_points / rate * 1000.0, 2),
        "t1s_ms": [round(t * 1000, 1) for t in t1s],
        "t2s_ms": [round(t * 1000, 1) for t in t2s],
        "overflow": bool(np.asarray(state.overflow)),
        "cc_failed": bool(np.asarray(state.cc_failed)),
        "runner_n": r1,
        "n_steps_n": N * per_rev,
        "per_rev": per_rev,
        "state": state,
        "k0": k0,
    }


def measure_single_rate(cfg, pipe, scene, num_cols, n_points, N=12, calls=2,
                        fixed_s=0.0, slab_cols=0, slab_head=0):
    """Battery variant of measure_periodic_rate: ONE program (one compile)
    per measurement — an N-revolution periodic scan timed over ``calls``
    calls — with a session-level per-call fixed cost ``fixed_s`` (measure
    it once per session with measure_periodic_rate's differencing; it is
    knob-independent: dispatch serialization + the final scalar fetch)
    subtracted.  Meant for knob ORDERING sweeps where compiling two scan
    lengths per knob would dominate the session; bank headline numbers
    with measure_periodic_rate."""
    import time

    import jax
    import jax.numpy as jnp

    from continuous_clustering_tpu.models.throughput import (
        make_periodic_block_scan_runner,
    )

    blocks0, segp0, per_rev, hsg = scene
    state = jax.tree_util.tree_map(
        jnp.asarray, jax.tree_util.tree_map(np.asarray, pipe.state)
    )
    r = make_periodic_block_scan_runner(
        cfg, pipe._batch_B, num_cols, N * per_rev,
        slab_cols=slab_cols, slab_head=slab_head,
    )
    k0 = 0
    ts = []
    for i in range(calls + 1):
        t0 = time.perf_counter()
        state, _ = r(state, blocks0, segp0, hsg, jnp.int32(k0))
        int(np.asarray(state.first_unpublished))
        if i > 0:  # call 0 is the compile/alloc warmup
            ts.append(time.perf_counter() - t0)
        k0 += N * per_rev
    tot = sum(ts)
    raw = calls * N * n_points / tot
    f = max(0.0, min(fixed_s, 0.4 * min(ts)))  # clip runaway calibrations
    rate = calls * N * n_points / (tot - calls * f)
    return {
        "pts_per_s": round(rate),
        "raw_pts_per_s": round(raw),
        "fixed_sub_ms": round(f * 1000, 1),
        "ms_per_rev": round(n_points / rate * 1000.0, 2),
        "t_ms": [round(t * 1000, 1) for t in ts],
        "overflow": bool(np.asarray(state.overflow)),
        "cc_failed": bool(np.asarray(state.cc_failed)),
    }


def prepare_rev_blocks(pipe, firings, n_rev, num_cols):
    """Host-insert ``n_rev + 1`` revolutions and stack the resulting dense
    column blocks per revolution. Requires the host-insertion fast path.

    Returns (revs, hsg) where revs[k] = (stacked_blocks, stacked_seg_poses).

    NOTE (round 4): replaying these stacks cyclically (``revs[k % len]``)
    is INVALID past one pass — a revolution whose columns the frontier
    already passed degenerates to a near-no-op step (frontier stuck, zero
    clusters; verified in tests/test_throughput_runner.py's probe and on
    CPU).  Keep the measured count within ``n_rev`` distinct revolutions,
    or use capture_revolution + measure_periodic_rate instead."""
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
