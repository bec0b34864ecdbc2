from nerface_tpu.utils.smoothing import gaussian_smooth
from nerface_tpu.utils.tb import ScalarWriter

__all__ = ["gaussian_smooth", "ScalarWriter"]
