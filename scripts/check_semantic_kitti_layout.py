"""Validate a SemanticKITTI odometry dataset layout.

The reference ships a downloader (scripts/download_semantic_kitti.sh);
this environment has no egress, so instead this tool checks that an
existing dataset folder has the layout kitti_demo expects and reports
what is missing (sequences, velodyne/labels counts, times/calib/poses,
cached euclidean-clustering GT labels).

Usage: python scripts/check_semantic_kitti_layout.py <folder>
"""

import sys
from pathlib import Path


def check(root: Path) -> int:
    if not root.is_dir():
        print(f"not a directory: {root}")
        return 1
    problems = 0
    sequences = sorted(p for p in root.iterdir() if p.is_dir())
    if not sequences:
        print("no sequence directories found")
        return 1
    for seq in sequences:
        bins = sorted((seq / "velodyne").glob("*.bin")) if (seq / "velodyne").is_dir() else []
        labels = sorted((seq / "labels").glob("*.label")) if (seq / "labels").is_dir() else []
        euclid = (
            sorted((seq / "labels_euclidean_clustering").glob("*.label"))
            if (seq / "labels_euclidean_clustering").is_dir()
            else []
        )
        notes = []
        if not bins:
            notes.append("NO velodyne/*.bin")
            problems += 1
        if labels and len(labels) != len(bins):
            notes.append(f"label count mismatch ({len(labels)} vs {len(bins)})")
            problems += 1
        if not labels:
            notes.append("no labels/ (evaluation disabled)")
        if not euclid:
            notes.append("no cached GT labels (run gt_label_generator for fast eval)")
        for f in ("times.txt", "calib.txt", "poses.txt"):
            if not (seq / f).exists():
                notes.append(f"missing {f}")
                problems += 1
        status = "; ".join(notes) if notes else "ok"
        print(f"{seq.name}: {len(bins)} frames | {status}")
    return 1 if problems else 0


if __name__ == "__main__":
    if len(sys.argv) != 2:
        print(__doc__)
        sys.exit(2)
    sys.exit(check(Path(sys.argv[1])))
