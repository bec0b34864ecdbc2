"""nerface-tpu: a TPU-native JAX/XLA framework with the capabilities of NeRFace.

Reimplements, TPU-first, everything in gafniguy/4D-Facial-Avatars
(`nerface_code/nerf-pytorch`): expression-conditioned dynamic NeRFs with
per-frame learnable latent codes, pose-transformed ray generation,
hierarchical inverse-CDF sampling, and fixed/learned background compositing
— as jit-compiled XLA programs with Pallas kernels on the hot path and
data-parallel ray sharding across a device mesh.

Public surface mirrors the reference (YAML configs, dataset JSON format,
checkpoint semantics) while the internals are idiomatic JAX.
"""

from nerface_tpu.config import CfgNode
from nerface_tpu.ops import (
    cumprod_exclusive,
    get_embedding_function,
    get_ray_bundle,
    img2mse,
    meshgrid_xy,
    mse2psnr,
    ndc_rays,
    positional_encoding,
    sample_pdf,
    volume_render_radiance_field,
)

__version__ = "0.1.0"
