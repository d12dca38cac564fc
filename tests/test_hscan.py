"""Segmented horizontal min-scan (association._hscan_min): unit brute-force
equivalence + pipeline agreement with the scan enabled.

The scan is an optional CC accelerator (CCT_CC_HSCAN): extra exact
min-propagation along real (dr=0, dc=1) edges, so every labeling it
produces must be identical to the plain fixpoint's.
"""

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from continuous_clustering_tpu.evaluation.partition import partition_agreement
from continuous_clustering_tpu.ops.association import _hscan_min

from .test_pipeline import collect_pipeline, make_stream, small_config


def _brute(L, conn):
    """O(n^2) reference: per row, min over the maximal run of consecutive
    columns connected by conn (conn[r, c] links c-1 and c)."""
    R, W = L.shape
    out = L.copy()
    for r in range(R):
        start = 0
        for c in range(W + 1):
            if c == W or (c > 0 and not conn[r, c]):
                m = L[r, start:c].min() if c > start else None
                if m is not None:
                    out[r, start:c] = m
                start = c
    return out


@pytest.mark.slow
def test_hscan_min_matches_bruteforce():
    rng = np.random.default_rng(7)
    for _ in range(20):
        R = int(rng.integers(1, 9))
        W = int(rng.integers(2, 70))
        L = rng.integers(0, 1000, size=(R, W)).astype(np.int32)
        conn = rng.random((R, W)) < rng.uniform(0.2, 0.9)
        conn[:, 0] = False  # column 0 never links left (window boundary)
        got = np.asarray(_hscan_min(jnp.asarray(L), jnp.asarray(conn)))
        np.testing.assert_array_equal(got, _brute(L, conn))


def test_pipeline_agreement_with_hscan(monkeypatch):
    """Full pipeline with the row scan enabled from round 0 must produce
    the identical partition (the scan only accelerates convergence).

    The baseline leg forces the scan OFF explicitly: 0 is the shipped
    default, so an env-default baseline would compare the scan against
    itself (ADVICE r4)."""
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=11)

    monkeypatch.setenv("CCT_CC_HSCAN", "-1")
    monkeypatch.setenv("CCT_CC_VSCAN", "-1")
    l_base, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_CC_HSCAN", "0")
    l_hs, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert len(l_base) > 100
    assert partition_agreement(l_base, l_hs) == 1.0
