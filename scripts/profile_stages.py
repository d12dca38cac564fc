"""Per-stage device-time profile of the bench step (cumulative-cut method).

Runs the bench-configured block-scan program truncated at successive stage
boundaries (ingest -> seg -> bits -> cc -> union -> completion -> full);
the time delta between consecutive cuts is that stage's cost.  Everything
runs in ONE child process (results are printed as they land so a TPU
runtime fault loses at most one variant).

Usage: python scripts/profile_stages.py [--revs 2] [--batch 256] [--nth 1024]
"""

import json
import os
import subprocess
import sys
import time

CUTS = ["ingest", "seg", "bits", "cc", "union", "completion", ""]

CHILD = r"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.environ["CCT_REPO"])
from continuous_clustering_tpu.utils.platform import ensure_backend
from continuous_clustering_tpu.tools import bench_setup

bench_setup.enable_compile_cache()
ensure_backend()

from continuous_clustering_tpu.models.throughput import make_block_scan_runner

num_rows, num_cols = 64, 2200
batch = int(os.environ.get("CCT_PROF_BATCH", "256"))
nth = int(os.environ.get("CCT_PROF_NTH", "1024"))
n_rev = int(os.environ.get("CCT_PROF_REVS", "2"))
ring = int(os.environ.get("CCT_PROF_RING", "10"))
cuts = json.loads(os.environ["CCT_PROF_CUTS"])

cfg, pipe = bench_setup.make_bench_pipe(
    num_rows=num_rows, num_cols=num_cols, batch=batch, nth=nth,
    ring_revs=ring)
firings, n_points = bench_setup.make_bench_scene(num_rows, num_cols)
revs, hsg = bench_setup.prepare_rev_blocks(pipe, firings, n_rev, num_cols)
steps_per_rev = revs[0][0].gcol0.shape[0]
print(json.dumps({"event": "setup", "steps_per_rev": int(steps_per_rev),
                  "points_per_rev": n_points}), flush=True)

import jax
import jax.numpy as jnp
# pristine host copy: the runner donates its state argument
init = jax.tree_util.tree_map(np.asarray, pipe.state)

prev_ms = 0.0
for cut in cuts:
    runner = make_block_scan_runner(cfg, pipe._batch_B, profile_cut=cut)
    state = jax.tree_util.tree_map(jnp.asarray, init)
    state, _ = runner(state, revs[0][0], revs[0][1], hsg)  # warmup/compile
    int(np.asarray(state.first_unpublished))
    t0 = time.perf_counter()
    for k in range(1, n_rev + 1):
        state, infos = runner(state, revs[k][0], revs[k][1], hsg)
    int(np.asarray(state.first_unpublished))
    int(np.asarray(state.cluster_counter))
    t1 = time.perf_counter()
    ms_per_step = (t1 - t0) * 1000.0 / (n_rev * steps_per_rev)
    print(json.dumps({
        "cut": cut or "full",
        "ms_per_step": round(ms_per_step, 3),
        "delta_ms": round(ms_per_step - prev_ms, 3),
        "pts_per_s": round(n_rev * n_points / (t1 - t0), 1),
    }), flush=True)
    prev_ms = ms_per_step
"""


def main():
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env["CCT_REPO"] = repo
    env["CCT_PROF_CUTS"] = json.dumps(CUTS)
    args = sys.argv[1:]
    for i, a in enumerate(args):
        if a == "--revs":
            env["CCT_PROF_REVS"] = args[i + 1]
        if a == "--batch":
            env["CCT_PROF_BATCH"] = args[i + 1]
        if a == "--nth":
            env["CCT_PROF_NTH"] = args[i + 1]
        if a == "--ring":
            env["CCT_PROF_RING"] = args[i + 1]
    t0 = time.time()
    p = subprocess.Popen(
        [sys.executable, "-c", CHILD], env=env, cwd=repo,
        stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True,
    )
    try:
        out, err = p.communicate(timeout=int(os.environ.get("CCT_PROF_TIMEOUT", "1800")))
    except subprocess.TimeoutExpired:
        p.kill()
        out, err = p.communicate()
        print("TIMEOUT", file=sys.stderr)
    print(out)
    if p.returncode != 0:
        print(f"child rc={p.returncode}\n{err[-2000:]}", file=sys.stderr)
    print(f"wall: {time.time() - t0:.1f}s", file=sys.stderr)


if __name__ == "__main__":
    main()
