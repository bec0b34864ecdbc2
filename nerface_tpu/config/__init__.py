from nerface_tpu.config.cfgnode import CfgNode, load_config
from nerface_tpu.config.flags import FeatureFlags

__all__ = ["CfgNode", "load_config", "FeatureFlags"]
