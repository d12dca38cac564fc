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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=64)
    ap.add_argument("--cols", type=int, default=2200)
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--dp", type=int, default=2)
    ap.add_argument("--sp", type=int, default=4)
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

    jit_step = jax.jit(
        vstep,
        in_shardings=(
            jax.tree_util.tree_map(ss, state),
            jax.tree_util.tree_map(bshard, sbatch),
            jax.tree_util.tree_map(bshard, scalib),
        ),
        out_shardings=(jax.tree_util.tree_map(ss, state), None),
    )
    compiled = jit_step.lower(state, sbatch, scalib).compile()
    hlo = compiled.as_text()

    counts = {}
    bytes_per = {}
    shape_re = re.compile(r"(\w+)\[([\d,]*)\]")
    for line in hlo.splitlines():
        s = line.strip()
        m = re.match(r"%?\S+ = (\S+) (all-gather|all-reduce|collective-permute|"
                     r"reduce-scatter|all-to-all|collective-broadcast)", s)
        if not m:
            # ops appear as: %name = type[shape] op-name(...)
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
            continue

    n_while = hlo.count(" while(")
    print(f"# sharded-step HLO inventory (rows={args.rows} cols={args.cols} "
          f"B={args.batch} mesh dp={args.dp} x sp={args.sp})")
    total = 0
    for c in COLLECTIVES:
        if c in counts:
            mb = bytes_per.get(c, 0) / 1e6
            print(f"  {c:22s} x{counts[c]:<4d} ~{mb:.2f} MB operand bytes")
            total += counts[c]
    if total == 0:
        print("  NO collectives in the optimized HLO — the partition is "
              "communication-free at steady state")
    print(f"  while loops: {n_while}; HLO lines: {len(hlo.splitlines())}")


if __name__ == "__main__":
    main()
