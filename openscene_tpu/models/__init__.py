from .sparse_unet import ARCHS, apply_unet, init_unet
from .disnet import apply_disnet, init_disnet
