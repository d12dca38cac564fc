"""Round-3 TPU experiment battery: run when the tunnel is healthy.

Measures, in ONE process (sequentially, no concurrency):
  1. link health (round-trip floor)
  2. baseline full-program rate (x3 trials)
  3. CC knob matrix (CCT_SWEEPS x CCT_CC_JUMP)
  4. aggregate-scatter mode (CCT_AGG: pack / rows / plain / sort / sortc)
  5. subclear / subcomp substitution probes

Prints one JSON line per measurement; exits nonzero if the link is
degraded (>80 ms/RT) so callers can retry later.

Usage: python scripts/tpu_experiments_r3.py [--quick]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from continuous_clustering_tpu.tools import bench_setup  # noqa: E402

bench_setup.enable_compile_cache()
from continuous_clustering_tpu.utils.platform import ensure_backend  # noqa: E402

ensure_backend()
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from continuous_clustering_tpu.models import throughput as thr  # noqa: E402


def link_ms():
    trivial = jax.jit(lambda x: x + 1)
    int(np.asarray(trivial(jnp.int32(0))))
    t0 = time.perf_counter()
    for k in range(5):
        int(np.asarray(trivial(jnp.int32(k))))
    return (time.perf_counter() - t0) * 1000 / 5


def main():
    quick = "--quick" in sys.argv
    rt = link_ms()
    print(json.dumps({"probe": "link_rt_ms", "value": round(rt, 1)}), flush=True)
    if rt > 80:
        print(json.dumps({"error": "tunnel degraded", "rt_ms": round(rt, 1)}),
              flush=True)
        return 3

    cfg, pipe = bench_setup.make_bench_pipe(
        num_rows=64, num_cols=2200, batch=384, nth=1, ring_revs=10
    )
    firings, n_points = bench_setup.make_bench_scene(64, 2200)
    revs, hsg = bench_setup.prepare_rev_blocks(pipe, firings, 5, 2200)
    init = jax.tree_util.tree_map(np.asarray, pipe.state)

    def measure(tag, env=None, cut="", n_meas=4):
        env = env or {}
        saved = {}
        for k, v in env.items():
            saved[k] = os.environ.get(k)
            os.environ[k] = v
        try:
            jax.clear_caches()
            runner = thr.make_block_scan_runner(cfg, pipe._batch_B, profile_cut=cut)
            state = jax.tree_util.tree_map(jnp.asarray, init)
            state, _ = runner(state, revs[0][0], revs[0][1], hsg)
            int(np.asarray(state.first_unpublished))
            t0 = time.perf_counter()
            for k in range(1, n_meas + 1):
                state, _ = runner(
                    state, revs[k % len(revs)][0], revs[k % len(revs)][1], hsg
                )
            fu = int(np.asarray(state.first_unpublished))
            dt = (time.perf_counter() - t0) / n_meas
            print(json.dumps({
                "tag": tag, "ms_per_rev": round(dt * 1000, 2),
                "pts_per_s": round(n_points / dt), "fu": fu,
                "overflow": bool(np.asarray(state.overflow)),
                "cc_failed": bool(np.asarray(state.cc_failed)),
            }), flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"tag": tag, "error": str(e)[:160]}), flush=True)
            return None
        finally:
            for k, v in saved.items():
                if v is None:
                    os.environ.pop(k, None)
                else:
                    os.environ[k] = v

    for t in range(1 if quick else 3):
        measure(f"baseline[{t}]")

    for sweeps, njump in ([(2, 1)] if quick else
                          [(1, 2), (1, 1), (2, 1), (2, 0), (3, 0)]):
        measure(f"cc s={sweeps} j={njump}",
                {"CCT_SWEEPS": str(sweeps), "CCT_CC_JUMP": str(njump)})

    # deferred-jump region (round-3 defaults are s=3 after=2 j=2); the
    # sweeps>3 half was never measured — more sweeps per launch cut the
    # change-detect reduces between launches at the cost of VMEM time
    if not quick:
        for sweeps, after in [(3, 2), (4, 2), (5, 2), (6, 3), (4, 99)]:
            measure(
                f"cc s={sweeps} after={after}",
                {"CCT_SWEEPS": str(sweeps), "CCT_CC_JUMP": "2",
                 "CCT_CC_JUMP_AFTER": str(after)},
            )

    for mode in (["rows"] if quick else ["pack", "rows", "plain", "sort", "sortc"]):
        measure(f"agg={mode}", {"CCT_AGG": mode})

    if not quick:
        for cut in ("subclear", "subcomp", "subagg+subgather+subrep"):
            measure(f"cut={cut}", cut=cut)
        # VMEM-pressure hypothesis: the Pallas kernels' scoped-VMEM
        # reservations (~16 MB limit) may evict the slot tables and make
        # the irregular linkage ops HBM-latency-bound.  If the linkage
        # block (full - sub) gets cheaper with the kernels OFF, the fix is
        # shrinking kernel scratch, not the linkage itself.
        measure("pallas=off", {"CCT_PALLAS": "0"})
        measure("pallas=off sublinkage", {"CCT_PALLAS": "0"},
                cut="subagg+subgather+subrep")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
