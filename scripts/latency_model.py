"""p50/p95 cluster-publish latency: measured step times + decomposed model.

The north star is <10 ms p50 cluster-publish latency (BASELINE.json); the
reference's headline is ~5 ms (/root/reference/README.md:11).  Publish
latency for a cluster = time from its *finishing column* arriving at the
sensor to the cluster callback firing:

  batching delay   — the finish condition is evaluated against the newest
                     column of a batch, so a cluster finishing at column c
                     waits for the rest of c's batch: (B-1 - c%B) * tau
                     (tau = column period; uniform c -> mean (B-1)/2 * tau)
  device step      — the fused step for that batch (measured here on the
                     real chip, scan-resident, nth=1 latency configuration,
                     INCLUDING the publish-slab readout the streaming step
                     pays)
  host emit        — the publish readout RIDES THE STEP OUTPUTS
                     (StepInfo.slab): emission is ONE device->host transfer
                     of an already-computed array plus host-side grouping —
                     zero extra dispatches (asserted by
                     tests/test_pipeline.py::test_publish_slab_zero_dispatch_emission).
                     Round 4: the slab is dtype-packed (16 rows, was 22) and
                     SPLIT into a narrow head + tail; the typical window
                     fits the head, so the p50 transfer pays only the head's
                     bytes.  The head hit rate is measured from a real
                     streamed trace, not assumed.

Additionally a LOADED soak streams full revolutions through the real
add_firing path as fast as the link sustains (the most queue-stressed
state reachable here — wall-clock pacing at the VLS-128 rate exceeds what
a remote tunnel can carry; a local-attach deployment has no such limit)
and samples per-window publish wall times.

This is a *decomposed* measurement: per-batch standalone dispatch through
the current TPU tunnel hits a ~1.7 s dispatch anomaly
(docs/ROUND1_NOTES.md) that a PCIe-attached host does not have, so the
streaming loop itself cannot be timed end-to-end here.  Each component is
measured for real; the composition is arithmetic.  Writes LATENCY_r4.json.

Usage: python scripts/latency_model.py [--batch 64] [--rows 64] [--cols 2200]
       [--smoke]   (tiny shapes on CPU, no JSON file — CI exercise only)
"""

import argparse
import json
import os
import subprocess
import sys

CHILD = r"""
import json, os, sys, time
import numpy as np

sys.path.insert(0, os.environ["CCT_REPO"])
from continuous_clustering_tpu.tools import bench_setup
from continuous_clustering_tpu.utils.platform import ensure_backend

smoke = os.environ.get("CCT_LAT_SMOKE") == "1"
if smoke:
    import jax
    jax.config.update("jax_platforms", "cpu")
else:
    bench_setup.enable_compile_cache()
    ensure_backend()

import jax
import jax.numpy as jnp
from continuous_clustering_tpu.models.throughput import make_block_scan_runner

num_rows = int(os.environ["CCT_LAT_ROWS"])
num_cols = int(os.environ["CCT_LAT_COLS"])
batch = int(os.environ["CCT_LAT_BATCH"])

# latency configuration: nth=1 (completion every batch; cheap since the
# component table made completion K-sized), small batch
cfg, pipe = bench_setup.make_bench_pipe(
    num_rows=num_rows, num_cols=num_cols, batch=batch, nth=1, ring_revs=4)
firings, n_points = bench_setup.make_bench_scene(num_rows, num_cols)
revs, hsg = bench_setup.prepare_rev_blocks(pipe, firings, 2, num_cols)
steps_per_rev = int(revs[0][0].gcol0.shape[0])
W, W1 = pipe._slab_W, pipe._slab_W1

# device step INCLUDING the per-step publish-slab readout (what streaming
# pays; round-3 measured the step with the slab off)
runner = make_block_scan_runner(cfg, pipe._batch_B, slab_cols=W, slab_head=W1)
state = jax.tree_util.tree_map(jnp.asarray,
                               jax.tree_util.tree_map(np.asarray, pipe.state))
state, _ = runner(state, revs[0][0], revs[0][1], hsg)
int(np.asarray(state.first_unpublished))
t0 = time.perf_counter()
for k in (1, 2):
    state, infos = runner(state, revs[k][0], revs[k][1], hsg)
int(np.asarray(state.first_unpublished))
t1 = time.perf_counter()
step_ms = (t1 - t0) * 1000.0 / (2 * steps_per_rev)

# host emit cost via the publish slab (the streaming path): ONE transfer of
# the step-output slab HEAD + host-side unpack/group/split + callback.  The
# slab is ALREADY a step output in the streaming path (StepInfo.slab), so
# the timed region must contain NO dispatch: produce fresh device buffers
# outside the clock, then time exactly what _consume_info pays — one
# device->host transfer (np.asarray on first touch) + host grouping.
pipe._state = state
emit = []
def cb(cloud, stamp):
    emit.append(len(cloud))
pipe.set_finished_cluster_callback(cb)
fu = int(np.asarray(state.first_unpublished))
from continuous_clustering_tpu.ops.readout import packed_readout
with_nbr = bool(cfg.clustering.record_neighbor_stats)
slab_fn = jax.jit(lambda s, lc0: packed_readout(s, lc0, W1, with_nbr))
lo = max(0, fu - min(batch, W1))
slab_dev = slab_fn(state, jnp.asarray(lo % state.x.shape[1], jnp.int32))
np.asarray(slab_dev)  # warm the transfer path / compile
# the (2, K) component-slot join tables ride the meta transfer in the
# streaming path; they are tiny (64 KB) and materialized outside the clock
# here, with the meta-vector transfer cost measured separately below
parent = np.asarray(state.slot_parent)
tabs = np.stack([
    np.asarray(state.slot_cid)[parent],
    np.asarray(state.slot_rep)[parent],
]).astype(np.int32)
N = 20
# fresh device buffers, allocated OUTSIDE the timed region (the streaming
# path gets them for free as step outputs; re-using one would let the
# runtime cache the transfer).  The meta vector (scalars + join tables)
# is ALSO a per-step transfer in the streaming path — fresh same-sized
# buffers price it inside the clock.
slabs = [slab_fn(state, jnp.asarray(lo % state.x.shape[1], jnp.int32))
         for _ in range(N)]
meta_len = 10 + 2 * int(cfg.clustering.max_active_components)
metas = [jax.device_put(jnp.zeros((meta_len,), jnp.int32)) for _ in range(N)]
jax.block_until_ready(slabs)
jax.block_until_ready(metas)
tail0 = slabs[0][:, :, :0]
transfer_s = 0.0
t0 = time.perf_counter()
for slab_dev, meta_dev in zip(slabs, metas):
    ttr = time.perf_counter()
    np.asarray(meta_dev)                   # the meta transfer
    pipe._slab = (lo, lo + W1, slab_dev, tail0, tabs)
    pipe._slab_np = np.asarray(slab_dev)   # the slab-head transfer
    transfer_s += time.perf_counter() - ttr
    pipe._cloud_cache = None
    pipe._emit_clusters(lo, fu, 0, 10**9)
t1 = time.perf_counter()
emit_ms = (t1 - t0) * 1000.0 / N
transfer_ms = transfer_s * 1000.0 / N
group_ms = emit_ms - transfer_ms
n_dispatch = pipe.n_fetch_dispatches  # must stay 0: slab covers the range
slab_bytes = int(np.asarray(slabs[0]).nbytes) + meta_len * 4  # head + meta

# device-link round-trip floor: a trivial dispatch + scalar fetch.  The
# slab emit path costs exactly ONE transfer; on a remote tunnel the link
# floor dominates it, on a PCIe-attached host it is ~0.1 ms.
trivial = jax.jit(lambda x: x + 1)
_ = int(np.asarray(trivial(jnp.int32(0))))
t0 = time.perf_counter()
for k in range(10):
    _ = int(np.asarray(trivial(jnp.int32(k))))
t1 = time.perf_counter()
link_ms = (t1 - t0) * 1000.0 / 10

# link bulk rate at the slab's exact byte size: transferring a raw device
# buffer of the same shape shows whether the emit transfer runs at link
# speed-of-light (i.e. the framework adds nothing on top of the link)
raw = [jax.device_put(jnp.zeros_like(slabs[0])) for _ in range(5)]
jax.block_until_ready(raw)
t0 = time.perf_counter()
for r in raw:
    np.asarray(r)
t1 = time.perf_counter()
link_bulk_ms = (t1 - t0) * 1000.0 / len(raw)

# LOADED soak through the real add_firing path: streams full revolutions as
# fast as the link sustains (max queue pressure reachable here) and samples
# per-consumed-window publish wall times (emit + column callbacks included)
# plus the publish-window widths (slab-head hit rate).
from continuous_clustering_tpu.models.continuous_clustering import (
    ContinuousClustering,
)
pipe2 = ContinuousClustering(cfg, firing_batch_size=batch)
pipe2.reset(num_rows)
pipe2.set_transform_robot_frame_from_sensor_frame(np.eye(4))
pipe2.set_finished_cluster_callback(lambda pts, stamp: None)
pipe2.set_finished_column_callback(lambda a, b, g: None)
widths = []
consume_ms = []
transfer_win_ms = []
pipe2._transfer_s = 0.0          # per-window link-transfer decomposition
win_w = []
orig = pipe2._consume_info
def timed_consume(info):
    t0 = time.perf_counter()
    tr0 = pipe2._transfer_s
    n0 = len(trace)
    r = orig(info)
    consume_ms.append((time.perf_counter() - t0) * 1000.0)
    transfer_win_ms.append((pipe2._transfer_s - tr0) * 1000.0)
    if len(trace) > n0 and trace[-1]["fu_old"] >= 0:
        t = trace[-1]
        win_w.append(max(t["gcol0"] + t["n_cols"], t["fu_new"]) - t["fu_old"])
    else:
        win_w.append(-1)
    return r
pipe2._consume_info = timed_consume
pipe2._publish_trace = trace = []
# enough revolutions that the head can adapt (first check at 32 windows)
# AND a steady-state tail remains: windows/rev = cols/batch, so large
# batches need more revolutions (B=128 saw only 53 windows in 3 revs and
# the head never grew — LATENCY_r5 head_hit 0.5)
n_soak = 1 if smoke else max(3, -(-160 * batch // num_cols))
for _ in range(n_soak):
    for f in firings:
        pipe2.add_firing(dict(f), np.eye(4))
pipe2.flush()
widths = [max(t["gcol0"] + t["n_cols"], t["fu_new"]) - t["fu_old"]
          for t in trace if t["fu_old"] >= 0]
# the head adapts during the soak (CCT_SLAB_ADAPT): steady-state hit rate
# is evaluated against the FINAL head width over the soak's second half
W1_final = pipe2._slab_W1
tail_widths = widths[len(widths) // 2:]
head_hits = sum(1 for w in tail_widths if w <= W1_final)
n_widths = max(1, len(tail_widths))
soak = sorted(consume_ms)
# loaded local-attach projection: measured per-window wall time minus the
# measured link transfer, plus the same bytes priced at PCIe gen3 x16
n_slab_rows = 16 if cfg.clustering.record_neighbor_stats else 15
head_bytes_final = n_slab_rows * num_rows * W1_final * 4
tail_bytes = n_slab_rows * num_rows * max(0, W - W1_final) * 4
meta_bytes = (10 + 2 * cfg.clustering.max_active_components) * 4
local_ms = []
for cm, tm, wd in zip(consume_ms, transfer_win_ms, win_w):
    b = meta_bytes + (head_bytes_final if 0 <= wd <= W1_final
                      else head_bytes_final + tail_bytes)
    local_ms.append(cm - tm + max(0.05, b / 8e9 * 1000.0))
local_sorted = sorted(local_ms)
# steady-state percentiles over the soak's SECOND HALF of windows (same
# convention as head_hit): the full-soak tail percentiles include the
# adaptive-head re-jit and first-window warmup, which a long-running
# deployment pays once — report both, clearly labeled
local_steady = sorted(local_ms[len(local_ms) // 2:])
def pct(xs, p):
    return round(xs[min(len(xs) - 1, int(p * len(xs)))], 3) if xs else None

print(json.dumps({
    "step_ms": round(step_ms, 3),
    "emit_ms": round(emit_ms, 3),
    "emit_transfer_ms": round(transfer_ms, 3),
    "emit_group_ms": round(group_ms, 3),
    "slab_bytes": slab_bytes,
    "slab_w": W, "slab_head_w": W1,
    "slab_head_w_final": W1_final,
    "head_hit_rate": round(head_hits / n_widths, 3),
    "window_width_p50": pct(sorted(widths), 0.5),
    "window_width_p95": pct(sorted(widths), 0.95),
    "link_bulk_same_size_ms": round(link_bulk_ms, 3),
    "emit_extra_dispatches": n_dispatch,
    "link_roundtrip_ms": round(link_ms, 3),
    "steps_per_rev": steps_per_rev,
    "clusters_emitted_per_probe": len(emit) // max(N, 1),
    "loaded_consume_ms_p50": pct(soak, 0.5),
    "loaded_consume_ms_p95": pct(soak, 0.95),
    "loaded_consume_ms_p99": pct(soak, 0.99),
    "loaded_transfer_ms_p50": pct(sorted(transfer_win_ms), 0.5),
    "loaded_transfer_ms_p95": pct(sorted(transfer_win_ms), 0.95),
    "loaded_local_attach_ms_p50": pct(local_sorted, 0.5),
    "loaded_local_attach_ms_p95": pct(local_sorted, 0.95),
    "loaded_local_attach_ms_p99": pct(local_sorted, 0.99),
    "loaded_local_attach_steady_ms_p50": pct(local_steady, 0.5),
    "loaded_local_attach_steady_ms_p95": pct(local_steady, 0.95),
    "loaded_local_attach_steady_ms_p99": pct(local_steady, 0.99),
    "loaded_windows": len(soak),
}), flush=True)
"""


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=2200)
    ap.add_argument("--rev-hz", type=float, default=10.0,
                    help="sensor revolutions per second (KITTI HDL-64E: 10)")
    ap.add_argument("--smoke", action="store_true",
                    help="tiny-shape CPU exercise (CI); prints but writes no file")
    ap.add_argument("--out", default="LATENCY_r4.json")
    args = ap.parse_args()
    if args.smoke:
        args.rows, args.cols, args.batch = 16, 128, 32

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ)
    env.update(
        CCT_REPO=repo,
        CCT_LAT_ROWS=str(args.rows),
        CCT_LAT_COLS=str(args.cols),
        CCT_LAT_BATCH=str(args.batch),
        CCT_LAT_SMOKE="1" if args.smoke else "0",
    )
    p = subprocess.run(
        [sys.executable, "-c", CHILD], env=env, cwd=repo,
        capture_output=True, text=True, timeout=1500,
    )
    line = [l for l in p.stdout.splitlines() if l.startswith("{")]
    if not line:
        print(p.stderr[-2000:], file=sys.stderr)
        raise SystemExit("latency child failed")
    meas = json.loads(line[-1])
    if meas.get("emit_extra_dispatches", 0) != 0:
        raise SystemExit(
            "emit path took extra dispatches: %s" % meas["emit_extra_dispatches"]
        )

    tau_ms = 1000.0 / (args.rev_hz * args.cols)   # column period
    B = args.batch
    batching_p50 = (B - 1) / 2.0 * tau_ms
    batching_p95 = 0.95 * (B - 1) * tau_ms
    p50 = batching_p50 + meas["step_ms"] + meas["emit_ms"]
    p95 = batching_p95 + meas["step_ms"] + meas["emit_ms"]
    # the slab emit path is exactly ONE device->host transfer (measured
    # split into transfer + host grouping).  Modeled local attach keeps the
    # measured grouping and replaces the tunnel transfer with the same
    # bytes over PCIe gen3 x16 (~8 GB/s, conservative)
    link = meas.get("link_roundtrip_ms", 0.0)
    group = meas.get("emit_group_ms", meas["emit_ms"])
    slab_bytes = meas.get("slab_bytes", 0)
    pcie_transfer = max(0.05, slab_bytes / 8e9 * 1000.0)
    emit_local = group + pcie_transfer
    p50_local = batching_p50 + meas["step_ms"] + emit_local
    # LOADED local-attach latency (VERDICT r4 missing #3): per-window soak
    # wall time with the measured link transfer replaced by the same bytes
    # at PCIe — measured grouping + callback cost UNDER LOAD, composed with
    # the batching delay and the device step.  Queueing beyond one step is
    # bounded at local attach: the sustained pipeline rate exceeds the
    # sensor rate (BENCH vs 2.2M), so the double buffer never backs up.
    loaded_local_p50 = loaded_local_p95 = None
    if meas.get("loaded_local_attach_ms_p50") is not None:
        loaded_local_p50 = round(
            batching_p50 + meas["step_ms"] + meas["loaded_local_attach_ms_p50"], 3
        )
        loaded_local_p95 = round(
            batching_p95 + meas["step_ms"] + meas["loaded_local_attach_ms_p95"], 3
        )
    # steady-state composition over the soak's second half (post adaptive-
    # head growth / warmup — the one-time costs a long-running deployment
    # amortizes); the full-soak numbers above include them
    loaded_steady_p50 = loaded_steady_p95 = None
    if meas.get("loaded_local_attach_steady_ms_p50") is not None:
        loaded_steady_p50 = round(
            batching_p50 + meas["step_ms"]
            + meas["loaded_local_attach_steady_ms_p50"], 3
        )
        loaded_steady_p95 = round(
            batching_p95 + meas["step_ms"]
            + meas["loaded_local_attach_steady_ms_p95"], 3
        )

    out = {
        "metric": "p50_cluster_publish_latency_ms",
        "value": round(p50, 3),
        "p95_ms": round(p95, 3),
        "p50_modeled_local_attach_ms": round(p50_local, 3),
        "target_ms": 10.0,
        "reference_headline_ms": 5.0,
        "config": {
            "rows": args.rows, "cols": args.cols, "batch": B,
            "nth": 1, "rev_hz": args.rev_hz,
        },
        "components_ms": {
            "batching_p50": round(batching_p50, 3),
            "device_step_measured": meas["step_ms"],
            "host_emit_measured": meas["emit_ms"],
            "emit_transfer_measured": meas.get("emit_transfer_ms"),
            "emit_group_measured": round(group, 3),
            "slab_bytes": slab_bytes,
            "slab_w": meas.get("slab_w"),
            "slab_head_w": meas.get("slab_head_w"),
            "head_hit_rate": meas.get("head_hit_rate"),
            "window_width_p50": meas.get("window_width_p50"),
            "window_width_p95": meas.get("window_width_p95"),
            "link_bulk_same_size_measured": meas.get("link_bulk_same_size_ms"),
            "emit_extra_dispatches": meas.get("emit_extra_dispatches", 0),
            "link_roundtrip_measured": link,
            "host_emit_modeled_local_attach": round(emit_local, 3),
        },
        "loaded_soak": {
            "consume_ms_p50": meas.get("loaded_consume_ms_p50"),
            "consume_ms_p95": meas.get("loaded_consume_ms_p95"),
            "consume_ms_p99": meas.get("loaded_consume_ms_p99"),
            "transfer_ms_p50": meas.get("loaded_transfer_ms_p50"),
            "transfer_ms_p95": meas.get("loaded_transfer_ms_p95"),
            "local_attach_consume_ms_p50": meas.get("loaded_local_attach_ms_p50"),
            "local_attach_consume_ms_p95": meas.get("loaded_local_attach_ms_p95"),
            "local_attach_consume_ms_p99": meas.get("loaded_local_attach_ms_p99"),
            "p50_modeled_local_attach_loaded_ms": loaded_local_p50,
            "p95_modeled_local_attach_loaded_ms": loaded_local_p95,
            "p50_modeled_local_attach_loaded_steady_ms": loaded_steady_p50,
            "p95_modeled_local_attach_loaded_steady_ms": loaded_steady_p95,
            "local_attach_consume_steady_ms_p95":
                meas.get("loaded_local_attach_steady_ms_p95"),
            "slab_head_w_final": meas.get("slab_head_w_final"),
            "head_hit_rate_steady": meas.get("head_hit_rate"),
            "windows": meas.get("loaded_windows"),
            "note": (
                "per-consumed-window publish wall time (meta fetch + slab "
                "transfer + grouping + callbacks) sampled while streaming "
                "full revolutions through the real add_firing path as fast "
                "as the link sustains — max queue pressure reachable "
                "through a remote tunnel; a local-attach deployment paces "
                "at the sensor rate with strictly lower queueing"
            ),
        },
        "method": (
            "decomposed: batching delay analytic; device step measured "
            "scan-resident on the real chip at the latency config (B={}, "
            "nth=1) INCLUDING the publish-slab readout; host emit measured "
            "via the publish slab riding the step outputs — the timed "
            "region contains NO dispatch, exactly one device->host transfer "
            "of an existing step output (the dtype-packed slab HEAD; the "
            "measured head_hit_rate says how often the real publish window "
            "fits it) plus host grouping (zero extra dispatches, asserted "
            "here and in test_publish_slab_zero_dispatch_emission). "
            "link_bulk_same_size_measured is a raw same-byte-count device "
            "buffer fetch: emit_transfer ~= it means the readback runs at "
            "link speed and the framework adds nothing. Composition is "
            "additive because the three phases are strictly sequential per "
            "batch in single-threaded mode. 'value' is as-measured through "
            "this remote TPU tunnel (floor and bulk rate reported); "
            "p50_modeled_local_attach_ms keeps the measured grouping and "
            "prices the same transfer bytes at PCIe gen3 x16 "
            "(8 GB/s).".format(B)
        ),
    }
    if args.smoke:
        print(json.dumps(out))
        return
    path = os.path.join(repo, args.out)
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
