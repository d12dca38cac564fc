"""Pallas TPU kernel for the connected-components label sweep.

The hot loop of association is the min-label diffusion over the halo+batch
window: ~(H+1)*(2V+1) neighbor offsets, each a masked shifted min.  The XLA
fallback (`association._window_cc`) launches one op per offset per round;
this kernel runs one *entire sweep* (all offsets, Gauss-Seidel in-place on a
padded VMEM scratch) in a single launch, with labels and edge bitmasks
VMEM-resident.  Pointer-jump compression stays outside (a cheap XLA gather)
between sweeps.

VMEM budget: labels (R+2V, WCOL+2H) i32 + bits (H+1, 2, R, B) i32 — fits
comfortably for B <= ~512 (≈6 MB); larger batches fall back to the XLA path.
"""

from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp

from ..config import Config

try:  # pallas is optional at import time (CPU-only environments)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def pallas_enabled(B: int) -> bool:
    if not HAVE_PALLAS:
        return False
    mode = os.environ.get("CCT_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    # auto: only on TPU backends and VMEM-sized batches
    try:
        platform = jax.devices()[0].platform
    except Exception:  # pragma: no cover
        return False
    return platform in ("tpu", "axon") and B <= 512


def _sweep_kernel(H: int, V: int, R: int, B: int, WCOL: int,
                  bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref):
    inf = jnp.int32(R * WCOL)
    n_dr = 2 * V + 1

    # initialize padded scratch: INF border, labels in the center
    lpad_ref[:, :] = jnp.full((R + 2 * V, WCOL + 2 * H), inf, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]

    def body(o, _):
        dc = o // n_dr
        dr_idx = o % n_dr
        word = bits_ref[dc, dr_idx // 32]          # (R, B) dynamic leading index
        m = ((word >> (dr_idx % 32)) & 1) == 1     # (R, B) source mask

        cur = lpad_ref[V : V + R, H : H + WCOL]    # (R, WCOL) current labels

        # pull-left: batch point p at window col H+b pulls neighbor
        # (r + dr, (H + b) - dc); Lpad coords: row dr_idx + r, col 2H + b - dc
        nb = lpad_ref[pl.ds(dr_idx, R), pl.ds(2 * H - dc, B)]
        cur_b = cur[:, H:]
        upd_b = jnp.minimum(cur_b, jnp.where(m, nb, inf))

        # pull-right: target q at any window col wc pulls source p at
        # (r - dr, wc + dc) when p's mask bit is set; build the shifted
        # source values/masks from the padded scratch
        src = lpad_ref[pl.ds(2 * V - dr_idx, R), pl.ds(H + dc, WCOL)]
        # shifted mask: source must be a batch point with the bit set;
        # embed m into a padded zero field once per offset
        mpad = jnp.zeros((R + 2 * V, WCOL + 2 * H), jnp.int32)
        mpad = jax.lax.dynamic_update_slice(
            mpad, m.astype(jnp.int32), (V, 2 * H)
        )
        ms = jax.lax.dynamic_slice(
            mpad, (2 * V - dr_idx, H + dc), (R, WCOL)
        ) == 1
        upd = jnp.minimum(cur, jnp.where(ms, src, inf))
        upd = upd.at[:, H:].min(upd_b)

        lpad_ref[V : V + R, H : H + WCOL] = upd
        return 0

    jax.lax.fori_loop(0, upper_ref[0, 0], body, 0)
    out_ref[:, :] = lpad_ref[V : V + R, H : H + WCOL]


def sweep_pallas(config: Config, bits: jax.Array, L: jax.Array,
                 max_wp: jax.Array) -> jax.Array:
    """One full Gauss-Seidel sweep over all offsets on TPU."""
    cl = config.clustering
    H, V = cl.max_steps_in_row, cl.max_steps_in_column
    R, WCOL = L.shape
    B = WCOL - H
    n_dr = 2 * V + 1
    upper = (jnp.minimum(max_wp, H) + 1) * n_dr

    kernel = functools.partial(_sweep_kernel, H, V, R, B, WCOL)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((R, WCOL), jnp.int32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),            # bits
            pl.BlockSpec((1, 1), memory_space=pltpu.SMEM),    # upper
            pl.BlockSpec(memory_space=pltpu.VMEM),            # labels in
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((R + 2 * V, WCOL + 2 * H), jnp.int32)],
        interpret=os.environ.get("CCT_PALLAS_INTERPRET", "0") == "1",
    )(bits, jnp.asarray(upper, jnp.int32).reshape(1, 1), L)


def window_cc_pallas(config: Config, bits: jax.Array, active_w: jax.Array,
                     B: int, max_wp: jax.Array) -> jax.Array:
    """Drop-in replacement for association._window_cc using the Pallas sweep."""
    from .association import cc_converge

    R, WCOL = active_w.shape
    return cc_converge(
        lambda L: sweep_pallas(config, bits, L, max_wp), R, WCOL
    )
