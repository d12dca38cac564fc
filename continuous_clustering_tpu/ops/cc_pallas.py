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

import jax
import jax.numpy as jnp

from ..config import Config

try:  # pallas is optional at import time (CPU-only environments)
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAVE_PALLAS = True
except Exception:  # pragma: no cover
    HAVE_PALLAS = False


def _padded_width(WCOL: int, H: int) -> int:
    """Lane (last-dim) extent rounded to 128 so dynamic rotates lower."""
    return -(-(WCOL + 2 * H) // 128) * 128


def pallas_enabled(B: int) -> bool:
    if not HAVE_PALLAS:
        return False
    mode = os.environ.get("CCT_PALLAS", "auto")
    if mode == "0":
        return False
    if mode == "1":
        return True
    # auto: currently opt-in only — the sweep kernel does not yet lower
    # through this environment's Mosaic version (dynamic rotate / unaligned
    # slice restrictions); the XLA offset sweep is the default
    return False


def _sweep_kernel(H: int, V: int, R: int, B: int, WCOL: int,
                  bits_ref, upper_ref, l_in_ref, out_ref, lpad_ref, mpad_ref):
    """One Gauss-Seidel sweep.

    Mosaic constraints shape the code: dynamic sublane-offset slices are
    unsupported, so the row offset ``dr`` is a *static* unroll (static
    slices at any offset are fine) while the column offset ``dc`` is
    dynamic via lane-axis rotates (circular wrap only touches the INF/zero
    borders, which is exactly what out-of-window reads should see).
    Crucially, masks stay **i32 end-to-end**: bool vectors (jnp.where with
    a bool mask, bool concatenate) hit Mosaic's "Invalid vector register
    cast" in this environment (scripts/pallas_bisect.py); the arithmetic
    select ``m*x + (1-m)*INF`` lowers fine.
    """
    INF = R * WCOL  # python int (jnp scalars get captured as constants)
    n_dr = 2 * V + 1
    PW = _padded_width(WCOL, H)

    # initialize padded scratches: INF/zero borders, payload in the center
    lpad_ref[:, :] = jnp.full((R + 2 * V, PW), INF, jnp.int32)
    lpad_ref[V : V + R, H : H + WCOL] = l_in_ref[:, :]
    mpad_ref[:, :] = jnp.zeros((R + 2 * V, PW), jnp.int32)

    def body(dc, _):
        w0 = bits_ref[dc, 0]  # (R, B) — dynamic leading index is fine
        w1 = bits_ref[dc, 1]
        for dr_idx in range(n_dr):  # static unroll over row offsets
            word = w0 if dr_idx < 32 else w1
            mi = (word >> (dr_idx % 32)) & 1  # (R, B) i32 in {0, 1}
            mfull = jnp.concatenate(
                [jnp.zeros((R, H), jnp.int32), mi], axis=1
            )  # (R, WCOL) source mask at batch columns
            mpad_ref[V : V + R, 2 * H : 2 * H + B] = mi

            cur = lpad_ref[V : V + R, H : H + WCOL]

            # pull-left: p pulls (r + dr, wc - dc)
            a = lpad_ref[dr_idx : dr_idx + R, :]              # rows r + dr
            nb = pltpu.roll(a, dc, axis=1)[:, H : H + WCOL]   # cols - dc
            upd = jnp.minimum(cur, mfull * nb + (1 - mfull) * INF)

            # pull-right: q pulls source p at (r - dr, wc + dc), gated on
            # p's mask bit (shifted from the mask scratch)
            b = lpad_ref[2 * V - dr_idx : 2 * V - dr_idx + R, :]
            src = pltpu.roll(b, -dc, axis=1)[:, H : H + WCOL]
            mrow = mpad_ref[2 * V - dr_idx : 2 * V - dr_idx + R, :]
            ms = pltpu.roll(mrow, -dc, axis=1)[:, H : H + WCOL]
            upd = jnp.minimum(upd, ms * src + (1 - ms) * INF)

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
    upper = jnp.minimum(max_wp, H) + 1  # fori over dc; dr is unrolled

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
        scratch_shapes=[
            pltpu.VMEM((R + 2 * V, _padded_width(WCOL, H)), jnp.int32),
            pltpu.VMEM((R + 2 * V, _padded_width(WCOL, H)), jnp.int32),
        ],
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
