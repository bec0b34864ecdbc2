from nerface_tpu.render.pipeline import (
    RenderSettings,
    render_rays,
    run_one_iter_of_nerf,
)

__all__ = ["RenderSettings", "render_rays", "run_one_iter_of_nerf"]
