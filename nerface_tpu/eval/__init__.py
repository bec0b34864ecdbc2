from nerface_tpu.eval.renderer import render_full_frame
from nerface_tpu.eval.normals import normal_map_from_depth

__all__ = ["render_full_frame", "normal_map_from_depth"]
