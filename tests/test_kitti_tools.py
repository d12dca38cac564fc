"""End-to-end kitti_demo / gt_label_generator on a synthetic dataset."""

import os
from pathlib import Path

import numpy as np
import pytest

from continuous_clustering_tpu.evaluation import kitti_loader as kl
from continuous_clustering_tpu.evaluation.euclidean_clustering import (
    generate_euclidean_clustering_labels,
)
from continuous_clustering_tpu.evaluation.kitti_evaluation import (
    FrameResult,
    KittiEvaluation,
    evaluate_clusters,
)
from continuous_clustering_tpu.tools.make_synthetic_dataset import write_sequence


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    root = tmp_path_factory.mktemp("synth_kitti")
    write_sequence(root, "00", num_frames=2, num_boxes=8, num_rows=32, num_columns=220, seed=1)
    return root


def test_loader_roundtrip(dataset):
    points = kl.load_point_cloud(dataset / "00" / "velodyne" / "000000.bin")
    semantic, instance = kl.load_labels(
        dataset / "00" / "labels" / "000000.label", len(points)
    )
    assert len(points) > 2000
    laser = kl.recover_laser_indices(points["x"], points["y"], num_lasers=32)
    # top rows are sky in the synthetic scene and vanish from the recovery
    # (same as sparse rows in real KITTI; the reference only warns)
    assert laser.max() >= 28
    image = kl.generate_range_image(points, laser, width=220, num_lasers=32)
    filled = image >= 0
    # nearly all points land in the image (collisions are rare)
    assert filled.sum() >= 0.9 * len(points)
    # column mapping: all image entries point to real points
    assert image[filled].max() < len(points)


def test_euclidean_gt_labels(dataset):
    points = kl.load_point_cloud(dataset / "00" / "velodyne" / "000000.bin")
    semantic, instance = kl.load_labels(
        dataset / "00" / "labels" / "000000.label", len(points)
    )
    xyz = np.stack([points["x"], points["y"], points["z"]], axis=1)
    labels = generate_euclidean_clustering_labels(xyz, semantic, instance)
    # ground points (semantic 40) must have label 0
    assert np.all(labels[semantic == 40] == 0)
    # box instances are dominated by a single GT cluster (sparse far faces may
    # split off sub-minimum fragments that are correctly dropped to 0)
    for inst in np.unique(instance[instance > 0]):
        sel = (instance == inst) & (semantic == 10)
        if sel.sum() >= 20:
            vals, counts = np.unique(labels[sel], return_counts=True)
            major = vals[np.argmax(counts)]
            assert major != 0, f"instance {inst} entirely unclustered"
            assert counts.max() >= 0.8 * sel.sum(), f"instance {inst}: {vals}, {counts}"
    # two different instances never share a GT label
    nz = labels != 0
    pairs = set(zip(labels[nz].tolist(), instance[nz].tolist()))
    seen = {}
    for lab, inst in pairs:
        assert seen.setdefault(lab, inst) == inst, f"label {lab} spans instances"


def test_gt_label_zip_layout(dataset, tmp_path):
    """--zip archives generated labels under dataset/sequences/<seq>/… —
    the layout of the reference's zip_euclidean_clustering_labels.sh."""
    import zipfile

    from continuous_clustering_tpu.tools.gt_label_generator import main

    out = tmp_path / "labels.zip"
    main([str(dataset), "00", "--zip", str(out)])
    names = zipfile.ZipFile(out).namelist()
    assert names, "empty archive"
    assert all(
        n.startswith("dataset/sequences/00/labels_euclidean_clustering/")
        and n.endswith(".label")
        for n in names
    ), names


def test_ose_use_metrics_basics():
    # perfect clustering: zero entropies
    gt = np.array([1, 1, 1, 2, 2, 0])
    det = np.array([5, 5, 5, 7, 7, 0])
    r = FrameResult()
    evaluate_clusters(gt, det, r)
    assert r.ose == 0.0 and r.use == 0.0

    # split one GT cluster in two -> OSE > 0, USE == 0
    det2 = np.array([5, 5, 6, 7, 7, 0])
    r2 = FrameResult()
    evaluate_clusters(gt, det2, r2)
    assert r2.ose > 0 and r2.use == 0.0

    # merge two GT clusters -> USE > 0, OSE == 0
    det3 = np.array([5, 5, 5, 5, 5, 0])
    r3 = FrameResult()
    evaluate_clusters(gt, det3, r3)
    assert r3.use > 0 and r3.ose == 0.0


def test_kitti_demo_moving_sensor(tmp_path_factory, tmp_path, monkeypatch):
    """Ego motion (5 m/s) exercises undo-ego-motion + pose interpolation."""
    from continuous_clustering_tpu.tools.kitti_demo import main as demo_main

    root = tmp_path_factory.mktemp("synth_move")
    write_sequence(
        root, "00", num_frames=2, num_boxes=6, num_rows=32, num_columns=220,
        seed=2, speed_mps=5.0,
    )
    monkeypatch.chdir(tmp_path)
    demo_main(
        [str(root), "00", "--evaluate-fast", "--rows", "32", "--columns", "220",
         "--firing-batch", "64"]
    )
    out = (tmp_path / "evaluation_results.txt").read_text()
    ours = [l for l in out.splitlines() if "All (**Ours**)" in l][0]
    cells = [c.strip() for c in ours.split("|")[2:8]]
    recall = float(cells[0].split("/")[0])
    use = float(cells[4].split("/")[0])
    assert recall > 95.0
    assert use < 5.0


def test_kitti_demo_end_to_end(dataset, tmp_path, monkeypatch):
    from continuous_clustering_tpu.tools.gt_label_generator import main as gt_main
    from continuous_clustering_tpu.tools.kitti_demo import main as demo_main

    gt_main([str(dataset), "00"])
    assert (dataset / "00" / "labels_euclidean_clustering" / "000000.label").exists()

    monkeypatch.chdir(tmp_path)
    demo_main(
        [
            str(dataset),
            "00",
            "--evaluate-fast",
            "--rows",
            "32",
            "--columns",
            "220",
            "--firing-batch",
            "64",
        ]
    )
    out = (tmp_path / "evaluation_results.txt").read_text()
    assert "All (**Ours**)" in out
    # parse our pooled row: recall/precision should be high on clean synthetic
    ours = [l for l in out.splitlines() if "All (**Ours**)" in l][0]
    cells = [c.strip() for c in ours.split("|")[2:8]]
    recall = float(cells[0].split("/")[0])
    precision = float(cells[1].split("/")[0])
    use = float(cells[4].split("/")[0])
    assert recall > 95.0
    assert precision > 95.0
    assert use < 5.0
