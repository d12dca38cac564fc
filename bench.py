"""Throughput benchmark: streaming points/sec/chip through the full pipeline.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: the reference's implicit sustained CPU throughput — VLS-128 @
600 rpm, 1700 columns/rev ≈ 2.2M points/s (BASELINE.md; overflow throw at
src/clustering/continuous_clustering.cpp:337-344 if not sustained).
"""

import json
import sys
import time

import numpy as np

BASELINE_PTS_PER_S = 2.2e6


def main():
    from continuous_clustering_tpu.utils.platform import ensure_backend

    ensure_backend()
    import continuous_clustering_tpu as cct
    from continuous_clustering_tpu.evaluation.synthetic import (
        frame_to_firings,
        make_scene,
        raycast_frame,
    )
    from continuous_clustering_tpu.models.continuous_clustering import (
        ContinuousClustering,
    )

    num_rows, num_cols = 64, 2200  # KITTI-shaped stream
    cfg = cct.kitti_config()
    pipe = ContinuousClustering(cfg, firing_batch_size=550)
    pipe.reset(num_rows)
    pipe.set_transform_robot_frame_from_sensor_frame(np.eye(4))

    scene = make_scene(num_boxes=24, seed=0, spread=35.0)
    xyz, _ = raycast_frame(scene, num_rows=num_rows, num_columns=num_cols, seed=0)
    n_points_per_rev = int(np.sum(~np.isnan(xyz[..., 0])))

    def feed_rev(frame_index):
        for f in frame_to_firings(
            xyz,
            start_stamp=frame_index * 10**8,
            end_stamp=(frame_index + 1) * 10**8,
            frame_index=frame_index % 4096,
        ):
            pipe.add_firing(f, np.eye(4))

    # warmup: compile + settle
    feed_rev(0)
    pipe.flush()

    n_rev = 4
    t0 = time.perf_counter()
    for k in range(1, n_rev + 1):
        feed_rev(k)
    pipe.flush()
    t1 = time.perf_counter()

    pts_per_s = n_rev * n_points_per_rev / (t1 - t0)
    print(
        json.dumps(
            {
                "metric": "streaming_points_per_second_per_chip",
                "value": round(pts_per_s, 1),
                "unit": "points/s",
                "vs_baseline": round(pts_per_s / BASELINE_PTS_PER_S, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
