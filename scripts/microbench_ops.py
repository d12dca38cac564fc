"""Microbenchmarks for the irregular ops that dominate the streaming step.

Times each candidate op inside a lax.scan (the deployment shape: many steps
per dispatch, carried state) with a scalar fetch to force execution.  Used
to pick formulations for completion / ingest / writeback; results land in
docs/ROUND2_NOTES.md.

Usage: python scripts/microbench_ops.py [--iters 50]
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

R = 64
RC = 22000       # ring columns at ring_revs=10
WIN = 3519       # live window columns at nth=1024
NW = R * WIN     # 225k window cells
NB = R * 256     # 16k batch cells


def timed(name, fn, carry, iters):
    run = jax.jit(lambda c: jax.lax.scan(lambda c, _: (fn(c), 0.0), c,
                                         None, length=iters))
    c, _ = run(carry)  # compile+warmup
    first = c[0] if isinstance(c, tuple) else c
    float(np.asarray(first.reshape(-1)[0]))
    t0 = time.perf_counter()
    c, _ = run(carry)
    first = c[0] if isinstance(c, tuple) else c
    float(np.asarray(first.reshape(-1)[0]))
    t1 = time.perf_counter()
    print(json.dumps({"op": name, "ms": round((t1 - t0) * 1000 / iters, 4)}),
          flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=50)
    args = ap.parse_args()
    it = args.iters
    key = jax.random.PRNGKey(0)

    # --- window-scale irregular ops (completion building blocks) ---
    perm = jax.random.randint(key, (NW,), 0, NW, dtype=jnp.int32)
    vals = jnp.arange(NW, dtype=jnp.int32)
    fvals = vals.astype(jnp.float32)

    timed("take_225k(p,p)", lambda p: jnp.take(p, p) ^ 1, perm, it)
    timed("scatter_min_225k_into_225k",
          lambda v: jnp.full((NW,), 2**30, jnp.int32).at[perm].min(v) + v,
          vals, it)
    timed("scatter_add_225k_into_225k",
          lambda v: jnp.zeros((NW,), jnp.int32).at[perm].add(v) + v, vals, it)
    bidx = jax.random.randint(key, (NB,), 0, NW, dtype=jnp.int32)
    bval = jnp.arange(NB, dtype=jnp.int32)
    timed("scatter_min_16k_into_225k",
          lambda v: v.at[bidx].min(bval), vals, it)
    timed("take_16k_from_225k",
          lambda v: v.at[bidx].min(jnp.take(v, bidx) ^ 1), vals, it)
    timed("sort_16k", lambda v: jnp.sort(v) ^ 1,
          jax.random.randint(key, (NB,), 0, NW, jnp.int32), it)
    timed("sort_2k", lambda v: jnp.sort(v) ^ 1,
          jax.random.randint(key, (2048,), 0, NW, jnp.int32), it)
    timed("cumsum_1d_225k", lambda v: jnp.cumsum(v) ^ 1, vals, it)
    timed("elementwise_225k_x6",
          lambda v: ((v * 3 + 1) // 7) % 11 + (v ^ 5), vals, it)
    # 2D segment-style reduce over the window as elementwise + row reduce
    timed("reduce_min_2d_64x3519",
          lambda v: v.at[:WIN].min(jnp.min(v.reshape(R, WIN), axis=0)), vals, it)
    timed("noop_scalar", lambda v: v + 1,
          jnp.zeros((8,), jnp.float32), it)

    # --- ring write path (ingest building block) ---
    ring = jnp.zeros((R, RC), jnp.float32)
    win = jnp.ones((R, 256), jnp.float32)

    def dus(r):
        r = jax.lax.dynamic_update_slice(r, win + r[0, 0], (0, 5000))
        return r

    timed("dus_64x256_into_64x22000", dus, ring, it)

    def dus14(r):
        for k in range(14):
            r = jax.lax.dynamic_update_slice(r, win + r[0, k], (0, 5000))
        return r
    timed("dus_64x256_into_64x22000_x14", dus14, ring, it)

    ring4 = jnp.zeros((R, 8800), jnp.float32)

    def dus14_small(r):
        for k in range(14):
            r = jax.lax.dynamic_update_slice(r, win + r[0, k], (0, 5000))
        return r
    timed("dus_64x256_into_64x8800_x14", dus14_small, ring4, it)

    # window read+write (the writeback path): DUS of a 64xWIN slab
    slab = jnp.ones((R, WIN), jnp.float32)

    def dus_slab(r):
        r = jax.lax.dynamic_update_slice(r, slab + r[0, 0], (0, 1000))
        return r
    timed("dus_64x3519_into_64x22000", dus_slab, ring, it)

    def ds_slab(r):
        s = jax.lax.dynamic_slice(r, (0, 1000), (R, WIN))
        return jax.lax.dynamic_update_slice(r, s * 1.0001, (0, 1000))
    timed("dyn_slice+dus_64x3519", ds_slab, ring, it)


if __name__ == "__main__":
    main()
