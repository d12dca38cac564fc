"""Interactive HTML viewer: payload integrity of the generated single-file
WebGL viewer (the rviz-plugin analog, tools/html_viewer.py)."""

import base64
import json
import re

import numpy as np

from continuous_clustering_tpu.tools.html_viewer import _PALETTE, ClusterViewer


def _decode(path):
    html = open(path).read()
    m = re.search(r"const DATA = (\{.*?\});\n", html, re.S)
    assert m, "payload not embedded"
    d = json.loads(m.group(1))
    xyz = np.frombuffer(base64.b64decode(d["xyz_b64"]), "<f4").reshape(-1, 3)
    rgb = np.frombuffer(base64.b64decode(d["rgb_b64"]), np.uint8).reshape(-1, 3)
    return html, d, xyz, rgb


def test_viewer_payload_roundtrip(tmp_path):
    v = ClusterViewer()
    rng = np.random.default_rng(0)
    a = rng.standard_normal((30, 3)).astype(np.float32)
    b = rng.standard_normal((50, 3)).astype(np.float32) + 5
    v.add_cluster(a, stamp=123, cluster_id=7)
    v.add_cluster(b, stamp=456, cluster_id=8)
    v.add_ground(rng.standard_normal((40, 3)).astype(np.float32) - 5)
    out = v.write(tmp_path / "v.html")
    html, d, xyz, rgb = _decode(out)
    assert d["n"] == 120 and len(xyz) == 120 and len(rgb) == 120
    assert d["kinds"] == ["cluster", "cluster", "ground"]
    assert d["ids"] == [7, 8, -1]
    assert d["counts"] == [30, 50, 40]
    np.testing.assert_allclose(xyz[:30], a)
    # stable id -> color mapping
    np.testing.assert_array_equal(rgb[0], np.asarray(_PALETTE[7 % len(_PALETTE)]))
    # self-contained: no external resources
    assert "http://" not in html and "https://" not in html
    assert "<script src" not in html


def test_viewer_structured_array_and_nan_filter(tmp_path):
    v = ClusterViewer()
    pts = np.zeros(5, dtype=[("x", "f4"), ("y", "f4"), ("z", "f4"), ("id", "i4")])
    pts["x"] = [1, 2, np.nan, 4, 5]
    pts["id"] = 3
    v.add_cluster(pts, stamp=9)
    out = v.write(tmp_path / "v.html")
    _, d, xyz, _ = _decode(out)
    assert d["n"] == 4  # NaN row dropped
    assert d["ids"] == [3]


def test_viewer_empty(tmp_path):
    out = ClusterViewer().write(tmp_path / "v.html")
    _, d, xyz, rgb = _decode(out)
    assert d["n"] == 0 and len(xyz) == 0
