"""Resolve the irregular-op context penalty (docs/ROUND3_NOTES.md).

Round-3 finding: window->K scatters/gathers cost ~6-8 ns per SOURCE LANE
inside the compiled step, but the same ops in a lax.scan microbench ran
~30x faster (0.2 ns/lane).  Two competing explanations:

  (H1) VMEM residency: ring-scale ops around the scatter evict the K
       tables, so each element pays an HBM access in context.
  (H2) Hoisting artifact: the old microbench used scan-INVARIANT indices
       (scripts/microbench_ops.py builds `perm` once outside the scan), so
       XLA could hoist scatter preprocessing out of the loop; 6.5 ns/lane
       is simply the true serial per-element scatter cost.

This script separates them on-chip:

  const_idx          — indices invariant across scan iterations (old setup)
  varying_idx        — indices derived from the carry each iteration
                       (nothing hoistable).  If this matches the in-context
                       6.5 ns/lane, H2 wins and source-lane reduction is
                       the only real lever.
  varying_sorted     — varying but sorted indices, indices_are_sorted=True
  varying_unique     — varying, unique+sorted flags (iota + bounded jitter)
  ring_context       — const_idx scatter with ring-scale DUS traffic in the
                       same scan body (H1 probe: residency loss without
                       index variation)
  gather_* variants  — same grid for jnp.take

Usage: python scripts/microbench_scatter_context.py [--iters 50]
Writes one JSON line per case; per-lane ns = ms * 1e6 / n_src.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuous_clustering_tpu.tools import bench_setup  # noqa: E402
from continuous_clustering_tpu.utils.platform import ensure_backend  # noqa: E402

bench_setup.enable_compile_cache()
ensure_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

K = 8192          # component-slot table size (state.slot_*)
NSRC = 24576      # R*B at the bench config (64 x 384)
R, RC = 64, 22000  # ring shape at ring_revs=10


def timed(name, body, carry, iters, n_src):
    run = jax.jit(
        lambda c: jax.lax.scan(lambda c, _: (body(c), 0.0), c, None,
                               length=iters)
    )
    c, _ = run(carry)  # compile + warmup
    leaf = jax.tree_util.tree_leaves(c)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    t0 = time.perf_counter()
    c, _ = run(carry)
    leaf = jax.tree_util.tree_leaves(c)[0]
    float(np.asarray(leaf.reshape(-1)[0]))
    t1 = time.perf_counter()
    ms = (t1 - t0) * 1000 / iters
    print(json.dumps({"case": name, "ms": round(ms, 4),
                      "ns_per_lane": round(ms * 1e6 / n_src, 3)}), flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    it = args.iters
    key = jax.random.PRNGKey(0)

    idx0 = jax.random.randint(key, (NSRC,), 0, K, dtype=jnp.int32)
    val0 = jnp.arange(NSRC, dtype=jnp.int32)
    tbl0 = jnp.zeros((K,), jnp.int32)

    # --- scatter-max: constant (hoistable) vs varying indices -------------
    def const_idx(c):
        tbl, v = c
        t = tbl.at[idx0].max(v, mode="drop")
        return t, v + 1

    timed("scatter_const_idx", const_idx, (tbl0, val0), it, NSRC)

    def varying_idx(c):
        tbl, idx = c
        t = tbl.at[idx].max(val0, mode="drop")
        idx = (idx * 1103515245 + 12345) % K  # new indices every iteration
        return t, idx

    timed("scatter_varying_idx", varying_idx, (tbl0, idx0), it, NSRC)

    # varying + sorted: per-iteration sort would dominate, so build sorted
    # indices arithmetically (iota-based ramp with a varying offset)
    ramp = (jnp.arange(NSRC, dtype=jnp.int32) * K) // NSRC  # sorted, dups

    def varying_sorted(c):
        tbl, off = c
        idx = jnp.minimum(ramp + (off % 4), K - 1)  # still sorted
        t = tbl.at[idx].max(val0, mode="drop", indices_are_sorted=True)
        return t, off + 1

    timed("scatter_varying_sorted", varying_sorted,
          (tbl0, jnp.int32(0)), it, NSRC)

    uramp = jnp.arange(K, dtype=jnp.int32)  # K-source unique+sorted

    def varying_unique(c):
        tbl, off = c
        v = val0[:K] + off
        t = tbl.at[uramp].max(v, mode="drop", indices_are_sorted=True,
                              unique_indices=True)
        return t, off + 1

    timed("scatter_varying_unique_K", varying_unique,
          (tbl0, jnp.int32(0)), it, K)

    # --- H1 probe: constant indices + ring-scale traffic in the body ------
    ring0 = jnp.zeros((R, RC), jnp.float32)
    win = jnp.ones((R, 384), jnp.float32)

    def ring_context(c):
        tbl, v, ring = c
        # ring-scale DUS traffic around the scatter (evicts VMEM)
        ring = jax.lax.dynamic_update_slice(
            ring, win + ring[0, 0], (0, 5000))
        ring = jax.lax.dynamic_update_slice(
            ring, win * 0.5 + ring[0, 1], (0, 9000))
        t = tbl.at[idx0].max(v, mode="drop")
        return t, v + 1, ring

    timed("scatter_const_idx_ring_context", ring_context,
          (tbl0, val0, ring0), it, NSRC)

    def ring_context_varying(c):
        tbl, idx, ring = c
        ring = jax.lax.dynamic_update_slice(
            ring, win + ring[0, 0], (0, 5000))
        ring = jax.lax.dynamic_update_slice(
            ring, win * 0.5 + ring[0, 1], (0, 9000))
        t = tbl.at[idx].max(val0, mode="drop")
        idx = (idx * 1103515245 + 12345) % K
        return t, idx, ring

    timed("scatter_varying_idx_ring_context", ring_context_varying,
          (tbl0, idx0, ring0), it, NSRC)

    # --- gathers: constant vs varying ---------------------------------------
    big = jnp.arange(R * 436, dtype=jnp.int32)  # window-sized source table
    gidx0 = jax.random.randint(key, (NSRC,), 0, R * 436, dtype=jnp.int32)

    def g_const(c):
        v, s = c
        return jnp.take(big, gidx0) + s, s + 1

    timed("gather_const_idx", g_const,
          (jnp.zeros((NSRC,), jnp.int32), jnp.int32(0)), it, NSRC)

    def g_varying(c):
        v, idx = c
        out = jnp.take(big, idx)
        return out, (idx * 1103515245 + 12345) % (R * 436)

    timed("gather_varying_idx", g_varying,
          (jnp.zeros((NSRC,), jnp.int32), gidx0), it, NSRC)

    # --- packed-scatter cost model: 4x24.5k vs compact-then-scatter -------
    # current: one scatter with 4*NSRC source lanes
    i_cat0 = jnp.concatenate([idx0, idx0 + K, idx0 + 2 * K, idx0 + 3 * K])
    v_cat0 = jnp.concatenate([val0] * 4)
    t4 = jnp.zeros((4 * K,), jnp.int32)

    def packed4(c):
        tbl, idx = c
        i_cat = jnp.concatenate([idx, idx + K, idx + 2 * K, idx + 3 * K])
        t = tbl.at[i_cat].max(v_cat0, mode="drop")
        return t, (idx * 1103515245 + 12345) % K

    timed("scatter_packed4_varying", packed4, (t4, idx0), it, 4 * NSRC)

    # --- sort-based aggregation candidates ---------------------------------
    # If sorted/unique scatters vectorize (see varying_sorted/unique above),
    # the aggregate scatters could run as: co-sort (idx, payloads) once,
    # then scatter with indices_are_sorted=True.  These probes price the
    # pieces: the sort itself, sort+sorted-scatter, and sort+segmented-scan
    # +unique-set (deduplicated targets; flags off because OOB fillers break
    # sortedness, so the win there would come from set-lowering alone).

    def sort_only(c):
        acc, idx = c
        sk, sv = jax.lax.sort((idx, val0), num_keys=1)
        return acc + sk[0] + sv[-1], (idx * 1103515245 + 12345) % K

    timed("sort_cost_1key_1payload", sort_only,
          (jnp.int32(0), idx0), it, NSRC)

    def sort_only4(c):
        acc, idx = c
        sk, a, b, d = jax.lax.sort((idx, val0, val0 + 1, val0 + 2),
                                   num_keys=1)
        return acc + sk[0] + a[-1] + b[0] + d[-1], \
            (idx * 1103515245 + 12345) % K

    timed("sort_cost_1key_3payload", sort_only4,
          (jnp.int32(0), idx0), it, NSRC)

    def sort_then_sorted_scatter(c):
        tbl, idx = c
        sk, sv = jax.lax.sort((idx, val0), num_keys=1)
        t = tbl.at[sk].max(sv, mode="drop", indices_are_sorted=True)
        return t, (idx * 1103515245 + 12345) % K

    timed("sort_then_sorted_scatter", sort_then_sorted_scatter,
          (tbl0, idx0), it, NSRC)

    def sort_seg_unique_set(c):
        tbl, idx = c
        sk, sv = jax.lax.sort((idx, val0), num_keys=1)
        # segmented running max over contiguous equal-key runs
        def comb(a, b):
            ka, ma = a
            kb, mb = b
            same = (ka == kb).astype(jnp.int32)
            return kb, jnp.maximum(mb, same * ma + (same - 1) * 2147483647)
        _, m = jax.lax.associative_scan(comb, (sk, sv))
        last = jnp.concatenate([sk[1:] != sk[:-1], jnp.ones((1,), bool)])
        t = tbl.at[jnp.where(last, sk, K)].set(m, mode="drop")
        return t, (idx * 1103515245 + 12345) % K

    timed("sort_seg_unique_set", sort_seg_unique_set,
          (tbl0, idx0), it, NSRC)

    def scatter_set_varying(c):
        tbl, idx = c
        t = tbl.at[idx].set(val0, mode="drop")
        return t, (idx * 1103515245 + 12345) % K

    timed("scatter_set_varying", scatter_set_varying, (tbl0, idx0), it, NSRC)

    # candidate: compact active lanes once (scatter NSRC->cap) then packed
    # scatter from 4*cap lanes (cap = NSRC/2)
    cap = NSRC // 2
    act = jax.random.bernoulli(key, 0.4, (NSRC,))

    def compact4(c):
        tbl, idx = c
        rank = jnp.cumsum(act.astype(jnp.int32)) - 1
        tgt = jnp.where(act, rank, cap)
        cidx = jnp.zeros((cap,), jnp.int32).at[tgt].max(idx, mode="drop")
        cval = jnp.zeros((cap,), jnp.int32).at[tgt].max(val0, mode="drop")
        i_cat = jnp.concatenate(
            [cidx, cidx + K, cidx + 2 * K, cidx + 3 * K])
        v_cat = jnp.concatenate([cval] * 4)
        t = tbl.at[i_cat].max(v_cat, mode="drop")
        return t, (idx * 1103515245 + 12345) % K

    timed("scatter_compact_then_packed4", compact4, (t4, idx0), it,
          2 * NSRC + 4 * cap)


if __name__ == "__main__":
    main()
