from nerface_tpu.ops.math import (
    cumprod_exclusive,
    img2mse,
    meshgrid_xy,
    mse2psnr,
)
from nerface_tpu.ops.encoding import (
    get_embedding_function,
    positional_encoding,
)
from nerface_tpu.ops.rays import (
    get_ray_bundle,
    get_ray_bundle_axis_angles,
    ndc_rays,
    rodrigues,
)
from nerface_tpu.ops.sampling import (
    merge_sorted_zvals,
    sample_pdf,
    stratified_zvals,
)
from nerface_tpu.ops.compositing import volume_render_radiance_field

__all__ = [
    "cumprod_exclusive",
    "img2mse",
    "meshgrid_xy",
    "mse2psnr",
    "get_embedding_function",
    "positional_encoding",
    "get_ray_bundle",
    "get_ray_bundle_axis_angles",
    "ndc_rays",
    "rodrigues",
    "merge_sorted_zvals",
    "sample_pdf",
    "stratified_zvals",
    "volume_render_radiance_field",
]
