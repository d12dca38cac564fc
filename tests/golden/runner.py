"""Build + run the compiled reference core as a golden oracle."""

from __future__ import annotations

import shutil
import struct
import subprocess
from pathlib import Path
from typing import Dict, List, Optional, Tuple

import numpy as np

GOLDEN_DIR = Path(__file__).parent
REFERENCE = Path("/root/reference")


def build_harness(out_dir: Path) -> Optional[Path]:
    """Compile the reference clustering core + harness; None if impossible."""
    if shutil.which("g++") is None or not REFERENCE.exists():
        return None
    binary = out_dir / "golden_harness"
    if binary.exists():
        return binary
    cmd = [
        "g++", "-O2", "-std=c++17", "-include", "functional",
        "-I", str(REFERENCE / "include"),
        "-I", str(GOLDEN_DIR / "eigen_lite"),
        "-o", str(binary),
        str(GOLDEN_DIR / "harness.cpp"),
        str(REFERENCE / "src/clustering/continuous_clustering.cpp"),
        "-lpthread",
    ]
    r = subprocess.run(cmd, capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"golden harness build failed:\n{r.stderr[:2000]}")
    return binary


def write_stream(
    path: Path,
    firings: List[dict],
    poses: List[np.ndarray],
    num_columns: int,
    max_distance: float,
    stop_after_association: bool,
    chessboard: bool,
    ego=(0.5, -1.7, 3.0, -3.0, 1.5, -1.5),
    nth: int = 1,
    fog: bool = False,
) -> None:
    num_rows = firings[0]["xyz"].shape[0]
    with open(path, "wb") as fh:
        fh.write(struct.pack("<iii", num_rows, num_columns, len(firings)))
        fh.write(struct.pack("<f", max_distance))
        fh.write(struct.pack("<ii", int(stop_after_association), int(chessboard)))
        fh.write(struct.pack("<i", int(nth)))
        fh.write(struct.pack("<i", int(fog)))
        fh.write(struct.pack("<6f", *ego))
        for f, pose in zip(firings, poses):
            fh.write(np.asarray(pose, np.float64)[:3, :].tobytes())
            xyz = np.asarray(f["xyz"], np.float32)
            stamps = np.asarray(f.get("stamp", np.zeros(num_rows)), np.uint64)
            uidx = np.asarray(f.get("uidx", np.zeros(num_rows)), np.uint64)
            inten = np.asarray(f.get("intensity", np.zeros(num_rows)), np.uint8)
            for r in range(num_rows):
                fh.write(struct.pack("<3f", *xyz[r]))
                fh.write(struct.pack("<QQB", int(stamps[r]), int(uidx[r]), int(inten[r])))


def run_golden(
    binary: Path, stream: Path, out: Path
) -> Tuple[Dict[int, int], Dict[int, int]]:
    """Run the oracle; returns (uidx -> cluster id, uidx -> ground label)."""
    r = subprocess.run([str(binary), str(stream), str(out)], capture_output=True, text=True)
    if r.returncode != 0:
        raise RuntimeError(f"golden harness failed ({r.returncode}): {r.stderr[:500]}")
    raw = np.fromfile(out, dtype=np.uint8)
    rec = 17  # u64 + u8 + u64
    n = len(raw) // rec
    raw = raw[: n * rec].reshape(n, rec)
    uidx = raw[:, 0:8].copy().view(np.uint64)[:, 0]
    ground = raw[:, 8]
    cid = raw[:, 9:17].copy().view(np.uint64)[:, 0]
    labels = {int(u): int(c) for u, c in zip(uidx, cid)}
    glabels = {int(u): int(g) for u, g in zip(uidx, ground)}
    return labels, glabels
