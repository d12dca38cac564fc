"""Inventory the collectives GSPMD inserts for the dp x sp sharded step.

VERDICT r2 #5: the sp (ring-column) sharding was correctness-proven but
cost-blind — nobody had looked at what the partitioner actually does with
``ring_read``'s dynamic slices over an sp-sharded axis.  This script
compiles ``parallel.multi_sensor.make_sharded_step`` on a virtual CPU mesh
at a realistic shape and counts the collective ops in the optimized HLO,
per category, plus their operand bytes.

Usage:  python scripts/shard_hlo_inventory.py [--rows 64] [--cols 2200]
            [--batch 256] [--dp 2] [--sp 4]
Writes a summary table to stdout (paste into ARCHITECTURE.md).
"""

import argparse
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

COLLECTIVES = (
    "all-gather", "all-reduce", "collective-permute", "reduce-scatter",
    "all-to-all", "collective-broadcast",
)


def count_collectives(hlo: str):
    counts = {}
    bytes_per = {}
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo.splitlines():
        s = line.strip()
        for c in COLLECTIVES:
            if re.search(rf"= \S+ {c}\(", s) or re.search(rf"{c}(-start)?\(", s):
                if f"{c}-done" in s:
                    continue
                counts[c] = counts.get(c, 0) + 1
                sm = shape_re.search(s.split("=")[1] if "=" in s else s)
                if sm and sm.group(2):
                    n = 1
                    for d in sm.group(2).split(","):
                        n *= int(d)
                    dt = sm.group(1)
                    width = 4 if dt in ("f32", "s32", "u32") else (
                        1 if dt in ("pred", "s8", "u8") else 8)
                    bytes_per[c] = bytes_per.get(c, 0) + n * width
                break
    return counts, bytes_per


def _zero_block_and_poses(R, B):
    import jax.numpy as jnp

    from continuous_clustering_tpu.models.step import SegPoses
    from continuous_clustering_tpu.ops.ingest import ColumnBlock

    z = lambda *shape: jnp.zeros(shape, jnp.float32)
    zi = lambda *shape: jnp.zeros(shape, jnp.int32)
    zu = lambda *shape: jnp.zeros(shape, jnp.uint32)
    blk = ColumnBlock(
        gcol0=jnp.int32(0), n_cols=jnp.int32(0),
        x=z(R, B), y=z(R, B), z=z(R, B), distance=z(R, B),
        azimuth=z(R, B), inclination=z(R, B), cont_az=z(R, B),
        stamp_lo=zu(R, B), stamp_hi=zu(R, B),
        uidx_lo=zu(R, B), uidx_hi=zu(R, B),
        intensity=zi(R, B), firing_index=zi(R, B),
        prev_rearmost=jnp.int32(-1), prev_foremost=jnp.int32(-1),
        first_unfinished=jnp.int32(-1), first_unpublished_init=jnp.int32(-1),
        reset_required=jnp.asarray(False),
    )
    segp = SegPoses(
        sensor_pos=z(B, 3),
        ego_rot=jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32), (B, 3, 3)),
        ego_trans=z(B, 3),
    )
    return blk, segp


def halo_hlo(cfg, rows, batch, sp):
    """Compile the shard_map halo step on a (1, sp) mesh; return HLO."""
    from jax.sharding import Mesh

    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )
    from continuous_clustering_tpu.parallel import halo

    pipe = ContinuousClustering(cfg, firing_batch_size=batch)
    pipe.reset(rows)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    devs = np.array(jax.devices()[:sp]).reshape(1, sp)
    mesh = Mesh(devs, axis_names=("dp", "sp"))
    import jax.numpy as jnp

    from jax.sharding import NamedSharding

    B = pipe._batch_B
    blk, segp = _zero_block_and_poses(rows, B)
    hsg = jnp.float32(-1.5)
    state = halo.place_state(mesh, pipe.state)
    from functools import partial

    body = partial(halo.halo_step_local, cfg, batch_cols=B, nsp=sp)
    sm = halo.compat_shard_map(
        body, mesh,
        in_specs=(
            halo._state_specs(state, False),
            halo._repl_specs(blk, False),
            halo._repl_specs(segp, False),
            halo._repl_specs(hsg, False),
        ),
        out_specs=(
            halo._state_specs(state, False),
            halo._repl_specs_info(False),
        ),
    )
    jit_step = jax.jit(sm, donate_argnums=(0,))
    return jit_step.lower(state, blk, segp, hsg).compile().as_text()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=2200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--sp", type=int, default=4)
    ap.add_argument("--path", choices=["gspmd", "halo", "both"],
                    default="both")
    ap.add_argument("--json", default="",
                    help="also write the counts to this JSON file")
    args = ap.parse_args()

    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )
    from continuous_clustering_tpu.parallel.mesh import make_mesh
    from continuous_clustering_tpu.parallel.multi_sensor import (
        make_sharded_step,
        stacked_init,
    )

    cfg = cct.kitti_config(single_threaded=True)
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(
            num_columns=args.cols, ring_buffer_revolutions=4
        )
    )
    mesh = make_mesh(dp=args.dp)
    S = args.dp
    state = stacked_init(cfg, args.rows, S)

    pipe = ContinuousClustering(cfg, firing_batch_size=args.batch)
    pipe.reset(args.rows)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))
    batch = pipe._empty_batch()
    calib = pipe._make_calib()
    sbatch = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (S,) + np.shape(x)).copy(), batch
    )
    scalib = jax.tree_util.tree_map(
        lambda x: np.broadcast_to(np.asarray(x), (S,) + np.shape(x)).copy(), calib
    )

    from continuous_clustering_tpu.models.step import pipeline_step
    from functools import partial
    from jax.sharding import NamedSharding, PartitionSpec as P
    from continuous_clustering_tpu.parallel.mesh import state_sharding

    vstep = jax.vmap(partial(pipeline_step, cfg, batch_cols=args.batch))
    ss = state_sharding(mesh, stacked=True)

    def bshard(leaf):
        return NamedSharding(mesh, P("dp", *([None] * (np.ndim(leaf) - 1))))

    results = {}

    if args.path in ("gspmd", "both"):
        jit_step = jax.jit(
            vstep,
            in_shardings=(
                jax.tree_util.tree_map(ss, state),
                jax.tree_util.tree_map(bshard, sbatch),
                jax.tree_util.tree_map(bshard, scalib),
            ),
            out_shardings=(jax.tree_util.tree_map(ss, state), None),
        )
        hlo = jit_step.lower(state, sbatch, scalib).compile().as_text()
        results["gspmd"] = (count_collectives(hlo), hlo.count(" while("),
                            len(hlo.splitlines()))

    if args.path in ("halo", "both"):
        hlo = halo_hlo(cfg, args.rows, args.batch, args.sp)
        results["halo"] = (count_collectives(hlo), hlo.count(" while("),
                           len(hlo.splitlines()))

    summary = {"rows": args.rows, "cols": args.cols, "batch": args.batch,
               "dp": args.dp, "sp": args.sp, "paths": {}}
    for path, ((counts, bytes_per), n_while, n_lines) in results.items():
        print(f"# {path} sharded-step HLO inventory (rows={args.rows} "
              f"cols={args.cols} B={args.batch} mesh dp={args.dp} x "
              f"sp={args.sp})")
        total = 0
        prow = {}
        for c in COLLECTIVES:
            if c in counts:
                mb = bytes_per.get(c, 0) / 1e6
                print(f"  {c:22s} x{counts[c]:<4d} ~{mb:.2f} MB operand bytes")
                total += counts[c]
                prow[c] = {"count": counts[c], "mb": round(mb, 3)}
        if total == 0:
            print("  NO collectives in the optimized HLO — the partition is "
                  "communication-free at steady state")
        print(f"  while loops: {n_while}; HLO lines: {n_lines}")
        summary["paths"][path] = {
            "collectives": prow, "total_collectives": total,
            "while_loops": n_while, "hlo_lines": n_lines,
        }
    if args.json:
        import json

        with open(args.json, "w") as f:
            json.dump(summary, f, indent=1)
        print(f"wrote {args.json}")


if __name__ == "__main__":
    main()
