from nerface_tpu.data.flame import FlameDataset, load_flame_data, pose_spherical
from nerface_tpu.data.sampler import (
    build_importance_maps,
    sample_ray_indices,
)
from nerface_tpu.data.pipeline import RayFeed

__all__ = [
    "FlameDataset",
    "load_flame_data",
    "pose_spherical",
    "build_importance_maps",
    "sample_ray_indices",
    "RayFeed",
]
