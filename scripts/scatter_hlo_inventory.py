"""Chipless structural probe for the irregular-op context penalty.

Compiles the scatter/gather variants from microbench_scatter_context.py
FOR TPU without touching the chip (jit().lower().compile() works with the
tunnel down) and inventories the optimized HLO: does the TPU backend keep
`scatter` as one op, expand it to a serial while loop, or rewrite
sorted/unique cases into vectorized dynamic-update-slice / select code?

The timing experiment (microbench_scatter_context.py) measures the cost;
this answers WHAT LOWERING each flag combination gets, which is the
structural half of the H1/H2 question in docs/ROUND3_NOTES.md.

Usage: python scripts/scatter_hlo_inventory.py [--platform tpu|cpu]
"""

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

K = 8192
NSRC = 24576


def inventory(name, fn, *args):
    try:
        hlo = jax.jit(fn).lower(*args).compile().as_text()
    except Exception as e:  # tunnel-down compile service, etc.
        print(f"{name}: COMPILE FAILED: {type(e).__name__}: {e}")
        return
    counts = collections.Counter()
    for op in ("scatter", "while", "dynamic-update-slice", "sort",
               "dynamic-slice", "gather", "select"):
        counts[op] = len(re.findall(rf"= \S+ {op}\(", hlo)) + len(
            re.findall(rf"= \S+ {op}\.", hlo)
        )
    n_fusions = hlo.count(" fusion(")
    print(
        f"{name}: " + " ".join(f"{k}={v}" for k, v in counts.items() if v)
        + f" fusions={n_fusions} hlo_lines={hlo.count(chr(10))}"
    )
    return hlo


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", default=None)
    ap.add_argument("--dump", action="store_true",
                    help="write full HLO texts to /tmp/scatter_hlo_<case>.txt")
    args = ap.parse_args()
    if args.platform:
        jax.config.update("jax_platforms", args.platform)

    idx = jnp.zeros((NSRC,), jnp.int32)
    val = jnp.zeros((NSRC,), jnp.int32)
    tbl = jnp.zeros((K,), jnp.int32)
    uidx = jnp.zeros((K,), jnp.int32)
    uval = jnp.zeros((K,), jnp.int32)

    cases = {
        "scatter_max_plain": (
            lambda t, i, v: t.at[i].max(v, mode="drop"), tbl, idx, val),
        "scatter_max_sorted": (
            lambda t, i, v: t.at[i].max(v, mode="drop",
                                        indices_are_sorted=True),
            tbl, idx, val),
        "scatter_max_sorted_unique_K": (
            lambda t, i, v: t.at[i].max(v, mode="drop",
                                        indices_are_sorted=True,
                                        unique_indices=True),
            tbl, uidx, uval),
        "scatter_add_plain": (
            lambda t, i, v: t.at[i].add(v, mode="drop"), tbl, idx, val),
        "gather_plain": (lambda t, i: jnp.take(t, i), tbl, idx),
        "gather_window": (
            lambda t, i: jnp.take(t, i),
            jnp.zeros((64 * 436,), jnp.int32), idx),
    }
    for name, (fn, *cargs) in cases.items():
        hlo = inventory(name, fn, *cargs)
        if hlo and args.dump:
            with open(f"/tmp/scatter_hlo_{name}.txt", "w") as f:
                f.write(hlo)


if __name__ == "__main__":
    main()
