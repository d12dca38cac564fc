"""Isolate the cost of ingest_columns (and its pieces) inside a scan.

The cumulative-cut profile says ingest-minus-null is ~2.5 ms/step, but the
constituent DUS writes measure ~0.03 ms.  This drives ingest_columns alone
on a bench-shaped state to find the real cost.
"""

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

from continuous_clustering_tpu.ops.ingest import ColumnBlock, ingest_columns  # noqa: E402

ITERS = int(os.environ.get("CCT_ITERS", "100"))


def timed(name, scan_fn, carry):
    run = jax.jit(scan_fn)
    c = run(carry)
    float(np.asarray(c[0].reshape(-1)[0] if isinstance(c, tuple) else c.x[0, 0]))
    t0 = time.perf_counter()
    c = run(carry)
    float(np.asarray(c[0].reshape(-1)[0] if isinstance(c, tuple) else c.x[0, 0]))
    t1 = time.perf_counter()
    print(json.dumps({"op": name, "ms": round((t1 - t0) * 1000 / ITERS, 4)}),
          flush=True)


def main():
    cfg, pipe = bench_setup.make_bench_pipe()
    state = pipe.state
    R, B = 64, 256
    rng = np.random.default_rng(0)
    f = lambda: jnp.asarray(rng.random((R, B), np.float32))
    blk = ColumnBlock(
        gcol0=jnp.asarray(5000, jnp.int32),
        n_cols=jnp.asarray(B, jnp.int32),
        x=f(), y=f(), z=f(), distance=f(), azimuth=f(), inclination=f(),
        cont_az=f(),
        stamp_lo=jnp.zeros((R, B), jnp.uint32),
        stamp_hi=jnp.zeros((R, B), jnp.uint32),
        uidx_lo=jnp.zeros((R, B), jnp.uint32),
        uidx_hi=jnp.zeros((R, B), jnp.uint32),
        intensity=jnp.zeros((R, B), jnp.int32),
        firing_index=jnp.zeros((R, B), jnp.int32),
        prev_rearmost=jnp.asarray(5255, jnp.int32),
        prev_foremost=jnp.asarray(5260, jnp.int32),
        first_unfinished=jnp.asarray(5256, jnp.int32),
        first_unpublished_init=jnp.asarray(-1, jnp.int32),
        reset_required=jnp.asarray(False),
    )

    def scan_ingest(s):
        def body(s, _):
            s = ingest_columns(cfg, s, blk, B)
            return s, 0.0
        s, _ = jax.lax.scan(body, s, None, length=ITERS)
        return s

    timed("ingest_columns", scan_ingest, state)

    # variant: block as scan input (stacked), like the real runner
    stacked = jax.tree_util.tree_map(
        lambda x: jnp.broadcast_to(x, (ITERS,) + jnp.shape(x)).copy(), blk
    )

    def scan_ingest_xs(s):
        def body(s, b):
            s = ingest_columns(cfg, s, b, B)
            return s, 0.0
        s, _ = jax.lax.scan(body, s, stacked)
        return s

    timed("ingest_columns_stacked_xs", scan_ingest_xs, state)

    # variant: raw DUS writes only (no ring_read modify, no wmask)
    import dataclasses

    def scan_raw(s):
        def body(s, _):
            lc0 = blk.gcol0 % s.ring_cols
            upd = {}
            for name in ("x", "y", "z", "distance", "azimuth", "inclination",
                         "cont_az", "stamp_lo", "stamp_hi", "uidx_lo",
                         "uidx_hi", "intensity", "firing_index"):
                arr = getattr(s, name)
                vals = getattr(blk, name).astype(arr.dtype)
                upd[name] = jax.lax.dynamic_update_slice(arr, vals, (0, lc0))
            return dataclasses.replace(s, **upd), 0.0
        s, _ = jax.lax.scan(body, s, None, length=ITERS)
        return s

    timed("raw_dus_13_fields", scan_raw, state)


if __name__ == "__main__":
    main()
