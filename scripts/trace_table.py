"""Capture one traced revolution of the bench program and print a per-op
device-time table (the reliable profiling method; see docs/ROUND2_NOTES.md).

Usage: PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python python scripts/trace_table.py
"""

import glob
import os
import shutil
import sys

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


def main():
    batch = int(os.environ.get("CCT_TRACE_BATCH", "384"))
    cfg, pipe = bench_setup.make_bench_pipe(
        num_rows=64, num_cols=2200, batch=batch, nth=1, ring_revs=10
    )
    firings, _ = bench_setup.make_bench_scene(64, 2200)
    revs, hsg = bench_setup.prepare_rev_blocks(pipe, firings, 2, 2200)
    runner = make_block_scan_runner(cfg, pipe._batch_B)
    state = jax.tree_util.tree_map(
        jnp.asarray, jax.tree_util.tree_map(np.asarray, pipe.state)
    )
    state, _ = runner(state, revs[0][0], revs[0][1], hsg)
    int(np.asarray(state.first_unpublished))
    logdir = "/tmp/cct_trace_table"
    shutil.rmtree(logdir, ignore_errors=True)
    jax.profiler.start_trace(logdir)
    state, _ = runner(state, revs[1][0], revs[1][1], hsg)
    int(np.asarray(state.first_unpublished))
    jax.profiler.stop_trace()

    from collections import defaultdict

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    path = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)[0]
    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(path, "rb").read())
    p = [pl for pl in xs.planes if pl.name == "/device:TPU:0"][0]
    line = max(p.lines, key=lambda l: len(l.events))
    agg = defaultdict(int)
    meta_full = {}
    for ev in line.events:
        name = p.event_metadata[ev.metadata_id].name
        key = name.split(" = ")[0]
        agg[key] += ev.duration_ps
        meta_full.setdefault(key, name)
    # annotate op names from the compiled HLO: root instruction + metadata
    # (fusion.NNN / while.NNN names alone are unreadable)
    import re

    notes = {}
    try:
        from collections import Counter

        lowered = runner.lower(state, revs[1][0], revs[1][1], hsg)  # type: ignore[attr-defined]
        hlo = lowered.compile().as_text()
        # per-computation source histogram (to attribute while/cond ops,
        # whose own HLO line carries no useful metadata, by their BODY)
        comp_srcs: dict = {}
        cur = None
        for ln in hlo.splitlines():
            if ln.rstrip().endswith("{") and ("(" in ln and "->" in ln):
                cm = re.match(r"\s*%?([\w.-]+)\s*\(", ln)
                cur = cm.group(1) if cm else None
                continue
            if ln.startswith("}"):
                cur = None
                continue
            if cur:
                fm = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', ln)
                if fm:
                    comp_srcs.setdefault(cur, Counter())[
                        f"{os.path.basename(fm.group(1))}:{fm.group(2)}"
                    ] += 1
        for ln in hlo.splitlines():
            # type may be a tuple "(s32[], f32[64]{0})" (spaces inside)
            dm = re.search(r"(%[\w.-]+)\s*=\s*(?:\([^)]*\)|\S+)\s+(\w+)\(", ln)
            if not dm:
                continue
            key = dm.group(1).lstrip("%")
            if dm.group(2) == "while":
                bm = re.search(r"body=%?([\w.-]+)", ln)
                if bm and bm.group(1) in comp_srcs:
                    top = comp_srcs[bm.group(1)].most_common(3)
                    notes.setdefault(
                        key,
                        "while[INCLUSIVE] body~ "
                        + " ".join(f"{s}x{c}" for s, c in top),
                    )
                continue
            if dm.group(2) == "conditional":
                bs = re.findall(r"branch_computations=\{([^}]*)\}|"
                                r"(?:true|false)_computation=%?([\w.-]+)", ln)
                branches = []
                for a, b in bs:
                    branches += [x.strip().lstrip("%") for x in a.split(",") if x] if a else [b]
                tops: Counter = Counter()
                for br in branches:
                    tops.update(comp_srcs.get(br, Counter()))
                if tops:
                    notes.setdefault(
                        key,
                        "cond branches~ "
                        + " ".join(f"{s}x{c}" for s, c in tops.most_common(3)),
                    )
                continue
            if "metadata=" in ln:
                sm = re.search(r'op_name="([^"]*)"', ln)
                fm = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', ln)
                note = sm.group(1)[-70:] if sm else dm.group(2)
                if fm:
                    note += f" @{os.path.basename(fm.group(1))}:{fm.group(2)}"
                notes.setdefault(key, note)
    except Exception as e:  # noqa: BLE001
        print(f"(hlo annotation unavailable: {e})")

    steps = int(revs[0][0].gcol0.shape[0])
    print(f"{steps} steps per revolution; top ops (ms/rev | src):")
    for k, v in sorted(agg.items(), key=lambda kv: -kv[1])[:30]:
        src = ""
        full = meta_full[k]
        m = re.search(r'source_file="([^"]+)".*?source_line=(\d+)', full)
        if m:
            src = f"{os.path.basename(m.group(1))}:{m.group(2)}"
        note = notes.get(k.lstrip("%"), "")
        print(f"  {v/1e9:8.3f}  {k:22s} {src} {note}")

    # stage buckets: classify every op by its source file/op_name so the
    # whole-step budget decomposes at a glance (the per-op table above only
    # covers the top 30; the long tail is where 'everything else' hides)
    def bucket_of(key: str) -> str:
        full = meta_full[key]
        note = notes.get(key.lstrip("%"), "")
        text = full + " " + note
        rules = [
            ("cc_pallas", "cc-kernels"),
            ("custom-call", "cc-kernels"),
            ("ingest.py", "ingest"),
            ("ground_segmentation.py", "seg"),
            ("insertion.py", "insertion"),
            ("readout.py", "slab"),
            ("state.py", "ring-ops"),
            ("while", "loops"),
        ]
        for pat, b in rules:
            if pat in text:
                return b
        if "association.py" in text:
            m2 = re.search(r"association\.py:(\d+)", text)
            ln2 = int(m2.group(1)) if m2 else 0
            if ln2 and ln2 < 660:
                return "assoc-bits/cc"
            return "assoc-linkage"
        return "other"

    buckets = {}
    for k, v in agg.items():
        buckets[bucket_of(k)] = buckets.get(bucket_of(k), 0) + v
    total = sum(agg.values())
    print(f"\nstage buckets (ms/rev, total {total/1e9:.3f}):")
    for b, v in sorted(buckets.items(), key=lambda kv: -kv[1]):
        print(f"  {v/1e9:8.3f}  {100*v/total:5.1f}%  {b}")


if __name__ == "__main__":
    main()
