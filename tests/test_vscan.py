"""Segmented vertical min-scan (association._vscan_min): unit brute-force
equivalence + pipeline agreement with the scan enabled.

The column scan is an optional CC accelerator (CCT_CC_VSCAN): extra exact
min-propagation along real (dr=-1, dc=0) edges, so every labeling it
produces must be identical to the plain fixpoint's.
"""

import numpy as np
import pytest
import jax.numpy as jnp

from continuous_clustering_tpu.evaluation.partition import partition_agreement
from continuous_clustering_tpu.ops.association import _vscan_min

from .test_pipeline import collect_pipeline, make_stream, small_config


def _brute(L, conn):
    """O(n^2) reference: per column, min over the maximal run of consecutive
    rows connected by conn (conn[r, c] links r-1 and r)."""
    R, W = L.shape
    out = L.copy()
    for c in range(W):
        start = 0
        for r in range(R + 1):
            if r == R or (r > 0 and not conn[r, c]):
                if r > start:
                    out[start:r, c] = L[start:r, c].min()
                start = r
    return out


@pytest.mark.slow
def test_vscan_min_matches_bruteforce():
    rng = np.random.default_rng(13)
    for _ in range(20):
        R = int(rng.integers(2, 70))
        W = int(rng.integers(1, 9))
        L = rng.integers(0, 1000, size=(R, W)).astype(np.int32)
        conn = rng.random((R, W)) < rng.uniform(0.2, 0.9)
        conn[0, :] = False  # row 0 never links upward (window boundary)
        got = np.asarray(_vscan_min(jnp.asarray(L), jnp.asarray(conn)))
        np.testing.assert_array_equal(got, _brute(L, conn))


def test_pipeline_agreement_with_vscan(monkeypatch):
    """Full pipeline with the column scan enabled from round 0 must produce
    the identical partition (the scan only accelerates convergence).
    Both legs force the row scan OFF so the delta is vscan alone."""
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=11)

    monkeypatch.setenv("CCT_CC_HSCAN", "-1")
    monkeypatch.setenv("CCT_CC_VSCAN", "-1")
    l_base, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_CC_VSCAN", "0")
    l_vs, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert len(l_base) > 100
    assert partition_agreement(l_base, l_vs) == 1.0


def test_pipeline_agreement_with_both_scans(monkeypatch):
    """Row + column scans composed against a scan-free baseline must leave
    the partition unchanged.  The baseline forces BOTH scans OFF explicitly
    (CCT_CC_HSCAN=0 is the shipped default, so an env-default baseline
    would already include the row scan — ADVICE r4)."""
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=23)

    monkeypatch.setenv("CCT_CC_HSCAN", "-1")
    monkeypatch.setenv("CCT_CC_VSCAN", "-1")
    l_base, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_CC_HSCAN", "0")
    monkeypatch.setenv("CCT_CC_VSCAN", "0")
    l_both, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert len(l_base) > 100
    assert partition_agreement(l_base, l_both) == 1.0


def test_pipeline_agreement_with_staggered_thresholds(monkeypatch):
    """Different per-scan thresholds (hs from round 0, vs from round 2)
    exercise the per-fn lax.cond gating inside the combined post
    (association._hscan_post) — each scan must apply from its OWN round
    and the partition must still be exact."""
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=23)

    monkeypatch.setenv("CCT_CC_HSCAN", "-1")
    monkeypatch.setenv("CCT_CC_VSCAN", "-1")
    l_base, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_CC_HSCAN", "0")
    monkeypatch.setenv("CCT_CC_VSCAN", "2")
    l_st, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert len(l_base) > 100
    assert partition_agreement(l_base, l_st) == 1.0
