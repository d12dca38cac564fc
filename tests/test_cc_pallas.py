"""Pallas CC sweep vs the XLA fallback.

Interpret-mode execution is slow, so this test is gated behind
CCT_TEST_PALLAS=1 (it is exercised in CI-style full runs and on TPU).
"""

import os

import numpy as np
import pytest

from continuous_clustering_tpu.evaluation.partition import partition_agreement

from .test_pipeline import collect_pipeline, make_stream, small_config

pytestmark = pytest.mark.skipif(
    os.environ.get("CCT_TEST_PALLAS", "0") != "1",
    reason="set CCT_TEST_PALLAS=1 to run the interpret-mode Pallas comparison",
)


def test_pallas_sweep_matches_xla(monkeypatch):
    monkeypatch.setenv("CCT_PALLAS_INTERPRET", "1")
    cfg = small_config(stop_after_association=False)
    firings, poses = make_stream(num_frames=1, seed=5)

    monkeypatch.setenv("CCT_PALLAS", "0")
    l_xla, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    monkeypatch.setenv("CCT_PALLAS", "1")
    l_pl, _, _ = collect_pipeline(cfg, firings, poses, batch=48)
    assert partition_agreement(l_xla, l_pl) == 1.0
