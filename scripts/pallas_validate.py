"""Validate + time the compiled Pallas kernels against the XLA paths on TPU.

Runs the full block-scan pipeline twice (CCT_PALLAS=0 / 1) on the bench
scene and requires exactly equal frontiers, cluster counts, per-cell
cluster ids and ground labels.  Prints per-step times for both.

Usage: python scripts/pallas_validate.py [--batch 384] [--nth 1]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from continuous_clustering_tpu.tools import bench_setup

bench_setup.enable_compile_cache()
from continuous_clustering_tpu.utils.platform import ensure_backend  # noqa: E402

ensure_backend()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from continuous_clustering_tpu.models.throughput import (  # noqa: E402
    make_block_scan_runner,
)


def run(pallas, batch, nth):
    os.environ["CCT_PALLAS"] = "1" if pallas else "0"
    cfg, pipe = bench_setup.make_bench_pipe(
        num_rows=64, num_cols=2200, batch=batch, nth=nth, ring_revs=4
    )
    firings, _ = bench_setup.make_bench_scene(64, 2200)
    revs, hsg = bench_setup.prepare_rev_blocks(pipe, firings, 2, 2200)
    spr = int(revs[0][0].gcol0.shape[0])
    runner = make_block_scan_runner(cfg, pipe._batch_B)
    state = jax.tree_util.tree_map(
        jnp.asarray, jax.tree_util.tree_map(np.asarray, pipe.state)
    )
    state, _ = runner(state, revs[0][0], revs[0][1], hsg)
    int(np.asarray(state.first_unpublished))
    t0 = time.perf_counter()
    for k in (1, 2):
        state, _ = runner(state, revs[k][0], revs[k][1], hsg)
    fu = int(np.asarray(state.first_unpublished))
    cc = int(np.asarray(state.cluster_counter))
    t1 = time.perf_counter()
    slots = np.asarray(state.slot)
    sp = np.asarray(state.slot_parent)
    cid = np.asarray(state.slot_cid)
    ids = np.where(slots >= 0, cid[sp[np.maximum(slots, 0)]], 0)
    gl = np.asarray(state.ground_label)
    print(
        ("pallas" if pallas else "xla"),
        "ms/step", round((t1 - t0) * 1000 / (2 * spr), 3),
        "fu", fu, "clusters", cc, flush=True,
    )
    return ids, gl, fu, cc


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--nth", type=int, default=1)
    args = ap.parse_args()
    ids0, gl0, fu0, cc0 = run(False, args.batch, args.nth)
    ids1, gl1, fu1, cc1 = run(True, args.batch, args.nth)
    ok = (
        fu0 == fu1 and cc0 == cc1
        and bool((ids0 == ids1).all()) and bool((gl0 == gl1).all())
    )
    print("match:", ok)
    if not ok:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
