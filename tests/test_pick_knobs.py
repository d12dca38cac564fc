"""Unit tests for scripts/pick_knobs.py — the battery-winner selector.

The TPU session applies this picker's output to every subsequent
measurement (bench, contract, trace), so a selection bug would silently
misconfigure the whole banked round.  Covers: min-over-scenes argmax,
ineligibility on missing scenes / overflow / cc_failed / error rows,
unknown tags, and the keep-defaults fallback.
"""

import json
import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "scripts"))

from pick_knobs import KNOBS, SCENES, pick  # noqa: E402


def _write(tmp_path, rows, extra_lines=()):
    p = tmp_path / "battery.out"
    with open(p, "w") as f:
        for line in extra_lines:
            f.write(line + "\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")
    return str(p)


def _full_tag(tag, base):
    return [{"tag": tag, "scene": s, "pts_per_s": base + i * 1000}
            for i, s in enumerate(sorted(SCENES))]


def test_picks_max_of_min_over_scenes(tmp_path):
    # hs min = 5.0M, hsvs min = 5.5M -> hsvs wins even though hs has the
    # single best scene row
    rows = _full_tag("hs", 5_000_000) + _full_tag("hsvs", 5_500_000)
    rows[1]["pts_per_s"] = 9_000_000  # hs best-scene outlier must not win
    best, best_min = pick(_write(tmp_path, rows))
    assert best == "hsvs"
    assert best_min == 5_500_000


def test_tag_missing_a_scene_is_ineligible(tmp_path):
    rows = _full_tag("hs", 5_000_000) + _full_tag("hsvs", 9_000_000)[:2]
    best, _ = pick(_write(tmp_path, rows))
    assert best == "hs"


def test_overflow_and_error_rows_excluded(tmp_path):
    rows = _full_tag("hs", 5_000_000)
    bad = _full_tag("hsvs", 9_000_000)
    bad[0]["overflow"] = True  # that scene row is dirty -> hsvs ineligible
    rows += bad
    worse = _full_tag("hsvs1", 9_500_000)
    worse[1]["cc_failed"] = True
    rows += worse
    errd = _full_tag("hsvsj0", 9_900_000)
    errd[2]["error"] = "tunnel died"
    rows += errd
    best, _ = pick(_write(tmp_path, rows))
    assert best == "hs"


def test_unknown_tag_ignored(tmp_path):
    rows = _full_tag("hs", 5_000_000) + _full_tag("not_a_knob", 9_000_000)
    best, _ = pick(_write(tmp_path, rows))
    assert best == "hs"


def test_non_json_and_probe_lines_skipped(tmp_path):
    rows = _full_tag("hs", 5_000_000)
    path = _write(tmp_path, rows, extra_lines=[
        "+ some shell trace", "{not json",
        json.dumps({"probe": "link_rt_ms", "value": 27.0}),
        json.dumps({"resume": [["hs", "standard"]]}),
    ])
    best, best_min = pick(path)
    assert best == "hs" and best_min == 5_000_000


def test_missing_file_keeps_defaults(tmp_path):
    best, best_min = pick(str(tmp_path / "nope.out"))
    assert best is None and best_min is None


def test_empty_file_keeps_defaults(tmp_path):
    best, _ = pick(_write(tmp_path, []))
    assert best is None


def test_r5b_composition_tag_eligible(tmp_path):
    # the picker must see r5b composition tags (KNOBS is the r4c+r5b merge)
    rows = _full_tag("hs", 5_000_000) + _full_tag("hsvsj0_u4", 6_000_000)
    best, best_min = pick(_write(tmp_path, rows))
    assert best == "hsvsj0_u4" and best_min == 6_000_000


@pytest.mark.parametrize("tag", sorted(KNOBS))
def test_every_tag_env_is_exportable(tag):
    # the session evals `export K=V` lines verbatim: values must be plain
    # shell-safe tokens
    for k, v in KNOBS[tag].items():
        assert k.startswith("CCT_"), k
        assert str(v).lstrip("-").isdigit(), (k, v)
