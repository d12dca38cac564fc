"""Pallas CC sweep vs the XLA fallback.

Runs in the DEFAULT suite (interpret mode, ~45 s): the production TPU path
defaults to these kernels, so `pytest tests/ -q` must lower them.  Set
CCT_TEST_PALLAS=0 to opt out on very slow boxes.
"""

import os

import numpy as np
import pytest

from continuous_clustering_tpu.evaluation.partition import partition_agreement

from .test_pipeline import collect_pipeline, make_stream, small_config

pytestmark = pytest.mark.skipif(
    os.environ.get("CCT_TEST_PALLAS", "1") == "0",
    reason="CCT_TEST_PALLAS=0 opts out of the interpret-mode Pallas comparison",
)


def test_pallas_snake_chain_converges(monkeypatch):
    """Adversarial CC input: one serpentine component whose label chain
    spans whole windows.  With deferred pointer jumps (CCT_CC_JUMP_AFTER)
    this is the worst case — the fixpoint must still converge inside the
    64-round cap (non-convergence is loud: the distinct cc_failed
    RuntimeError) and match the XLA fallback exactly."""
    import numpy as np

    from continuous_clustering_tpu.evaluation.synthetic import frame_to_firings

    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    R, C = 32, 220
    # sensor conventions of the synthetic generator: inclinations +2..-24.8
    # deg, clockwise rotation (azimuth = pi - column*width)
    inc = np.deg2rad(np.linspace(2.0, -24.8, R))
    az = np.pi - np.arange(C) * (2.0 * np.pi / C)
    xyz = np.full((R, C, 3), np.nan, np.float32)
    rr = 6.0
    # triangle wave between rows 2 and 14 (row 15+ at 6 m is close enough
    # to the ground plane that segmentation claims it): |dr/dc| = 1 keeps
    # neighbors in range; the component zigzags across window boundaries
    period = 24
    for c in range(C):
        ph = c % period
        r = 2 + (ph if ph < 12 else period - ph)
        for dr in (0, 1):  # two-cell-thick ribbon (survives the >20 gate)
            row = min(R - 1, r + dr)
            d = np.array([
                np.cos(inc[row]) * np.cos(az[c]),
                np.cos(inc[row]) * np.sin(az[c]),
                np.sin(inc[row]),
            ])
            xyz[row, c] = rr * d
    # TWO revolutions: the serpentine spans the full rotation, so it only
    # finishes via the full-rotation force rule, which needs the next
    # revolution's columns to arrive (the oracle/reference behave the
    # same — a one-rev stream ending on an unfinished full-circle
    # component publishes nothing)
    firings = (frame_to_firings(xyz.transpose(1, 0, 2), frame_index=0)
               + frame_to_firings(xyz.transpose(1, 0, 2), frame_index=1))
    poses = [np.eye(4) for _ in firings]
    cfg = small_config(stop_after_association=False)

    monkeypatch.setenv("CCT_PALLAS", "0")
    l_xla, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_PALLAS", "1")
    l_pl, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert len(l_pl) > 300
    assert partition_agreement(l_xla, l_pl) == 1.0
    # the serpentine is one connected component end-to-end
    ids = set(l_pl.values())
    assert len(ids - {0}) <= 2, f"snake fragmented: {len(ids)} ids"


def test_pallas_sweep_matches_xla(monkeypatch):
    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=5)

    monkeypatch.setenv("CCT_PALLAS", "0")
    l_xla, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_PALLAS", "1")
    l_pl, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert partition_agreement(l_xla, l_pl) == 1.0


def test_pallas_alternating_direction_matches_xla(monkeypatch):
    """CCT_CC_ALT=1 alternates the in-kernel dc iteration direction per
    round (a pure Gauss-Seidel scheduling change: same monotone min-label
    fixpoint).  The serpentine stream is the adversarial case — long
    zigzag chains are exactly what alternation is for."""
    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    monkeypatch.setenv("CCT_CC_ALT", "1")
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=5)

    monkeypatch.setenv("CCT_PALLAS", "0")
    l_xla, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_PALLAS", "1")
    l_pl, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert partition_agreement(l_xla, l_pl) == 1.0
