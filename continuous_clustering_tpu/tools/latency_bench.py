"""Cluster-publish latency benchmark.

Streams a synthetic scene at real sensor pacing and measures the latency of
each published cluster w.r.t. its newest point's wall-clock stamp — the
reference's headline ~5 ms metric (README.md:11; measured with the
use_last_point_for_cluster_stamp flag, cfg/ContinuousClustering.cfg:76-78).

Usage: python -m continuous_clustering_tpu.tools.latency_bench \
    [--rows 64] [--columns 2200] [--revolutions 5] [--batch 128] [--rpm 600]
"""

from __future__ import annotations

import dataclasses
import json
import sys
import time

import numpy as np

from ..config import kitti_config
from ..evaluation.synthetic import make_scene, raycast_frame
from ..models.continuous_clustering import ContinuousClustering
from ..utils.cli import CommandLineParser
from ..utils.stats import LatencyTracker


def main(argv=None):
    from ..utils.platform import ensure_backend

    ensure_backend()
    p = CommandLineParser(argv if argv is not None else sys.argv[1:])
    rows = int(p.get_value_for_argument("--rows", "64"))
    cols = int(p.get_value_for_argument("--columns", "2200"))
    revolutions = int(p.get_value_for_argument("--revolutions", "5"))
    batch = int(p.get_value_for_argument("--batch", "128"))
    rpm = float(p.get_value_for_argument("--rpm", "600"))

    cfg = kitti_config(single_threaded=False)
    cfg = cfg.replace(
        range_image=cfg.range_image.__class__(num_columns=cols),
        clustering=dataclasses.replace(
            cfg.clustering, use_last_point_for_cluster_stamp=True
        ),
    )
    pipe = ContinuousClustering(cfg, firing_batch_size=batch)
    pipe.reset(rows)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))

    tracker = LatencyTracker()
    pipe.set_finished_cluster_callback(
        lambda pts, stamp: tracker.record_cluster(int(stamp))
    )

    scene = make_scene(num_boxes=20, seed=0, spread=30.0)
    xyz, _ = raycast_frame(scene, num_rows=rows, num_columns=cols, seed=0)

    col_period = 60.0 / rpm / cols  # seconds per column
    rng = np.arange(rows, dtype=np.uint64)

    # warmup revolution (compile)
    for c in range(cols):
        firing = {
            "xyz": xyz[c],
            "stamp": np.full(rows, time.time_ns(), np.uint64),
            "intensity": np.full(rows, 100, np.uint8),
            "firing_index": c,
            "uidx": np.uint64(c * rows) + rng,
        }
        pipe.add_firing(firing, np.eye(4))
    pipe.flush()
    tracker.samples.clear()

    deadline_miss = 0
    t_next = time.perf_counter()
    for rev in range(revolutions):
        for c in range(cols):
            t_next += col_period
            now = time.perf_counter()
            if now < t_next:
                time.sleep(t_next - now)
            else:
                deadline_miss += 1
            firing = {
                "xyz": xyz[c],
                "stamp": np.full(rows, time.time_ns(), np.uint64),
                "intensity": np.full(rows, 100, np.uint8),
                "firing_index": rev * cols + c,
                "uidx": np.uint64((rev * cols + c) * rows) + rng,
            }
            pipe.add_firing(firing, np.eye(4))
    pipe.flush()

    out = tracker.percentiles()
    out.update(
        {
            "metric": "cluster_publish_latency",
            "unit": "ms",
            "clusters": len(tracker.samples),
            "deadline_misses": deadline_miss,
            "columns_per_second": cols * rpm / 60.0,
        }
    )
    print(json.dumps(out))


if __name__ == "__main__":
    main()
