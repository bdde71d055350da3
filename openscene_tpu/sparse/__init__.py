from .types import (ConvPlan, DownPlan, LevelGeometry, UNetGeometry,
                    stencil_offsets)
from .geometry import build_unet_geometry, GeometryCaps
from .ops import (sparse_conv, sparse_down_conv, sparse_up_conv,
                  masked_batch_norm, masked_global_avg_pool, relu)
