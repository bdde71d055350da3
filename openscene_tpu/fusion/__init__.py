from .mapper import PointCloudToImageMapper, compute_mapping_jax
from .fuse import MultiViewFuser, save_fused_feature
