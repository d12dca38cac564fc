"""continuous_clustering_tpu — TPU-native continuous clustering for rotating LiDAR.

A ground-up JAX/XLA/Pallas re-design of the capabilities of
UniBwTAS/continuous_clustering (IEEE IV 2024, arXiv 2311.13976): low-latency
streaming instance segmentation over a continuously growing range image.

Layering (mirrors the reference's layer map, see SURVEY.md §1):

* ``utils``       — host-side threading / CLI helpers (L0)
* ``ops``         — the TPU compute path: insertion, ground segmentation,
                    association/connected components, completion (L1 kernels)
* ``models``      — ``ContinuousClustering``: the streaming pipeline with the
                    reference-parity public API (L1 facade)
* ``sensors``     — firing assembly + packet decoders (L2)
* ``evaluation``  — SemanticKITTI loader + metrics (L3)
* ``io``          — point-cloud schemas and serialization (L4 glue)
* ``tools``       — CLI entry points: kitti_demo, gt_label_generator (L4)
* ``parallel``    — mesh/sharding utilities for multi-chip execution
"""

from .config import (
    ClusteringConfig,
    Config,
    GeneralConfig,
    GroundSegmentationConfig,
    RangeImageConfig,
    kitti_config,
    ouster_os32_config,
    vls128_roof_config,
)

__version__ = "0.1.0"

__all__ = [
    "Config",
    "GeneralConfig",
    "RangeImageConfig",
    "GroundSegmentationConfig",
    "ClusteringConfig",
    "kitti_config",
    "vls128_roof_config",
    "ouster_os32_config",
]
