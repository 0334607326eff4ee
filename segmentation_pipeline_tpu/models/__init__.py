from .components import (
    AvgPoolDown,
    Block3d,
    BlurConv3d,
    BlurConvTranspose3d,
    Conv3d,
    Softmax,
    StochasticMatrix,
    TrilinearUp,
    WSConv3d,
)
from .modular_unet import ModularUNet
from .nested_unet import NestedResUNet

__all__ = [k for k in dir() if not k.startswith("_")]
