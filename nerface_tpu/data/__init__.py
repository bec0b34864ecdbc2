from nerface_tpu.data.flame import FlameDataset, load_flame_data, pose_spherical
from nerface_tpu.data.sampler import (
    build_importance_maps,
    sample_ray_indices,
)
from nerface_tpu.data.pipeline import RayFeed
from nerface_tpu.data.blender import BlenderDataset, load_blender_data
from nerface_tpu.data.llff import LLFFDataset, load_llff_data

__all__ = [
    "BlenderDataset",
    "load_blender_data",
    "LLFFDataset",
    "load_llff_data",
    "FlameDataset",
    "load_flame_data",
    "pose_spherical",
    "build_importance_maps",
    "sample_ray_indices",
    "RayFeed",
]
