"""HBM-bandwidth roofline for the device step (VERDICT r4 weak #5).

"Is it actually fast, or just faster than the reference?"  This script
answers with XLA's own cost model: compile the fused step at bench shapes
(with the publish-slab readout, as the bench measures it), read
``compiled.cost_analysis()`` bytes-accessed, difference the profile cuts
for per-stage attribution, and state the roofline:

    bound_pts_per_s = HBM_bandwidth / bytes_per_point

compared against the banked measured rate.  Two caveats, stated in the
output: XLA counts a while loop's body ONCE (the CC fixpoint runs ~3
rounds/step on bench scenes — the cc term is scaled by --cc-rounds), and
bytes-accessed is the cost model's estimate, not a hardware counter (the
xplane trace table is the per-op ground truth when a chip is up).

Usage: python scripts/roofline.py [--rows 64] [--cols 2200] [--batch 384]
           [--rate PTS_PER_S] [--cc-rounds 3.4] [--json OUT]
Works chipless: compiles for whatever backend initializes (TPU preferred,
CPU fallback — byte counts are platform-close since the program is
dominated by explicit array traffic).
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# TPU v5e (the bench chip): 819 GB/s HBM, 197 bf16 TFLOP/s (public spec)
HBM_GBPS = 819.0

CUTS = ["null", "ingest", "seg", "bits", "cc", "union", "completion", ""]
CUT_LABEL = {
    "null": "scan overhead", "ingest": "stage A ingest",
    "seg": "stage B ground seg", "bits": "stage C edge bits",
    "cc": "stage C cc fixpoint", "union": "stage D slot union",
    "completion": "stage D completion", "": "stage E clear+slab+meta",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=2200)
    ap.add_argument("--batch", type=int, default=384)
    ap.add_argument("--rate", type=float, default=0.0,
                    help="measured pts/s to compare (default: BENCH_r04 value)")
    ap.add_argument("--cc-rounds", type=float, default=3.4,
                    help="mean CC fixpoint rounds/step (cc_rounds meta lane; "
                         "bench scenes measure ~3.0-4.7)")
    ap.add_argument("--fill", type=float, default=0.83,
                    help="occupied-cell fraction of the bench scenes "
                         "(points per step = fill * R * B)")
    ap.add_argument("--json", default="")
    ap.add_argument("--platform", default="cpu",
                    help="compiler to cost with (cpu default: the byte "
                         "counts are dominated by explicit array traffic "
                         "and platform-close; tpu uses the chipless AOT "
                         "helper, which can 500 on large programs)")
    args = ap.parse_args()

    import jax

    if args.platform == "cpu":
        jax.config.update("jax_platforms", "cpu")
        platform = "cpu"
    else:
        from continuous_clustering_tpu.utils.platform import ensure_backend

        ensure_backend()
        platform = jax.devices()[0].platform

    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )
    from continuous_clustering_tpu.models.step import pipeline_step_block

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from shard_hlo_inventory import _zero_block_and_poses

    cfg = cct.kitti_config(single_threaded=True)
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=args.cols, ring_buffer_revolutions=4
        )
    )
    pipe = ContinuousClustering(cfg, firing_batch_size=args.batch)
    pipe.reset(args.rows)
    import numpy as np

    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    B = pipe._batch_B
    blk, segp = _zero_block_and_poses(args.rows, B)
    import jax.numpy as jnp

    hsg = jnp.float32(-1.5)
    state = pipe.state

    def cost_at(cut):
        fn = jax.jit(
            lambda s, b, sp: pipeline_step_block(
                cfg, s, b, sp, hsg, B, profile_cut=cut,
                slab_cols=pipe._slab_W, slab_head=pipe._slab_W1,
            )
        )
        c = fn.lower(state, blk, segp).compile().cost_analysis()
        if isinstance(c, (list, tuple)):
            c = c[0]
        return float(c.get("bytes accessed", 0.0)), float(c.get("flops", 0.0))

    rows = []
    prev_bytes = prev_flops = 0.0
    for cut in CUTS:
        by, fl = cost_at(cut)
        rows.append({
            "cut": cut or "full", "label": CUT_LABEL[cut],
            "bytes_total": by, "flops_total": fl,
            "bytes_marginal": by - prev_bytes,
            "flops_marginal": fl - prev_flops,
        })
        prev_bytes, prev_flops = by, fl

    pts_per_step = args.fill * args.rows * B
    full_bytes = rows[-1]["bytes_total"]
    # the CC while body is counted once by the cost model; scale its
    # marginal bytes by the measured mean rounds
    cc_extra = 0.0
    for r in rows:
        if r["cut"] == "cc":
            cc_extra = max(0.0, (args.cc_rounds - 1.0)) * r["bytes_marginal"]
    adj_bytes = full_bytes + cc_extra

    # ---- analytic post-fusion bytes model (the primary number) --------
    # cost_analysis counts every producer/consumer pair UNFUSED (the
    # vectorized edge-bits intermediates alone are GBs that XLA:TPU never
    # materializes), so it is only an upper envelope.  The explicit model
    # below counts the arrays that MUST move through HBM: ring-window
    # read-modify-writes, the edge bitmask, the CC label plane per round,
    # the publish slab, and the clear chunk.  Constants are shapes, 4 B
    # each, x2 for read-modify-write where applicable.
    R = args.rows
    H = cfg.clustering.max_steps_in_row
    WCOL = H + B
    w_cells = R * B
    analytic = {
        "ingest (14 fields RMW)": 14 * w_cells * 4 * 2,
        "ground seg (read 7 + write 4)": 11 * w_cells * 4,
        "edge bits (mask write+read + window reads)":
            (H + 1) * 2 * w_cells * 4 * 2 + 8 * R * WCOL * 4,
        f"cc fixpoint ({args.cc_rounds} rounds x (bits read + labels RMW))":
            args.cc_rounds * ((H + 1) * 2 * w_cells * 4 + R * WCOL * 4 * 2),
        "slot scatters/tables (K + window)":
            6 * 8192 * 4 * 2 + 4 * w_cells * 4,
        "publish slab (15 rows write + 18 source planes)":
            15 * R * pipe._slab_W * 4 + 18 * R * pipe._slab_W * 4,
        "clear chunk (20 fields RMW)": 20 * w_cells * 4 * 2,
    }
    analytic_total = sum(analytic.values())
    bpp_analytic = analytic_total / pts_per_step
    bound = HBM_GBPS * 1e9 / bpp_analytic
    bpp = adj_bytes / pts_per_step
    measured = args.rate
    if not measured:
        try:
            with open(os.path.join(os.path.dirname(os.path.dirname(
                    os.path.abspath(__file__))), "BENCH_r04.json")) as f:
                measured = json.load(f)["parsed"]["value"]
        except Exception:
            measured = 0.0

    # latency model: the measured anchor is ~6-8 ns per irregular-gather
    # SOURCE LANE inside the compiled step (docs/ROUND3_NOTES.md) — count
    # the dominant irregular source lanes per step
    irregular_lanes = (
        2 * w_cells            # label->slot + slot join gathers (window)
        + args.cc_rounds * 2 * w_cells  # jump gathers inside the fixpoint
        + 6 * 8192             # K-table scatters/gathers
    )
    irregular_ms = irregular_lanes * 7e-9 * 1000.0
    step_ms_at_measured = (
        pts_per_step / measured * 1000.0 if measured else None
    )

    out = {
        "metric": "device_step_hbm_roofline",
        "platform_compiled_for": platform,
        "shape": {"rows": args.rows, "cols": args.cols, "batch": B,
                  "slab_w": pipe._slab_W, "slab_head": pipe._slab_W1},
        "points_per_step": round(pts_per_step),
        "hbm_gbps": HBM_GBPS,
        "analytic_bytes_per_step": analytic_total,
        "analytic_bytes_breakdown": {k: round(v) for k, v in analytic.items()},
        "analytic_bytes_per_point": round(bpp_analytic, 1),
        "roofline_bound_pts_per_s": round(bound),
        "measured_pts_per_s": measured,
        "achieved_fraction_of_roofline": (
            round(measured / bound, 4) if measured else None
        ),
        "latency_model": {
            "irregular_source_lanes_per_step": round(irregular_lanes),
            "irregular_cost_ms_at_7ns_per_lane": round(irregular_ms, 3),
            "step_ms_implied_by_measured_rate": (
                round(step_ms_at_measured, 3) if step_ms_at_measured else None
            ),
            "note": (
                "the step is NOT bandwidth-bound: the analytic HBM bytes "
                "support ~100x the measured rate.  The binding constraints "
                "are irregular-op per-lane latency (~6-8 ns/source lane, "
                "measured in-step, docs/ROUND3_NOTES.md) and the serial "
                "round structure of the CC fixpoint + scan — which is why "
                "the effective optimizations were round-count cuts "
                "(hscan/vscan), op merging, and source shrinking, not "
                "fusion"
            ),
        },
        "cost_model_envelope": {
            "bytes_per_step_unfused": round(full_bytes),
            "bytes_per_step_cc_adjusted": round(adj_bytes),
            "bytes_per_point_unfused": round(bpp, 1),
            "cc_rounds_assumed": args.cc_rounds,
            "stages": [
                {k: (round(v) if isinstance(v, float) else v)
                 for k, v in r.items()} for r in rows
            ],
            "note": (
                "XLA cost_analysis counts producer/consumer traffic "
                "UNFUSED (the vectorized edge-bits intermediates alone are "
                "GBs that XLA:TPU never materializes) — an upper envelope "
                "only; the analytic model above is the roofline basis"
            ),
        },
    }
    print(json.dumps(out, indent=1))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
