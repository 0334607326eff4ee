"""ModularUNet — configurable-depth UNet with injectable components.

TPU-native re-design of ref models/modular_unet.py:11-102: encoder of
``depth`` blocks with down/up-sampler classes injected (AvgPool or
BlurConv3d down; trilinear or BlurConvTranspose3d up), skip-concat decoder,
3^3 out conv + softmax.  Down/up samplers are channel-preserving
(filters[i] -> filters[i]) exactly as the reference constructs them
(modular_unet.py:56-81).  torch-style constructor param names in
``*_params`` dicts are accepted for config parity.
"""
from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Union

import jax.numpy as jnp
from flax import linen as nn

from ..utils.misc import is_sequence
from .components import (
    AvgPoolDown,
    Block3d,
    Conv3d,
    Softmax,
    TrilinearUp,
)

_TORCH_PARAM_MAP = {
    "kernel_size": "kernel_size",
    "stride": "stride",
    "padding": "padding",
    "output_padding": "output_padding",
    "bias": "use_bias",
    "weight_standardization": "weight_standardization",
}


def _map_params(cls, params: Optional[Dict], features: Optional[int]) -> Dict:
    """Translate torch-style kwargs to the flax components' field names and
    inject ``features`` where the class takes it."""
    out = {}
    for k, v in (params or {}).items():
        out[_TORCH_PARAM_MAP.get(k, k)] = v
    fields = getattr(cls, "__dataclass_fields__", {})
    out = {k: v for k, v in out.items() if k in fields}
    if features is not None and "features" in fields:
        out["features"] = features
    return out


class ModularUNet(nn.Module):
    in_channels: int
    out_channels: int
    filters: Union[int, Sequence[int]]
    depth: int
    block_class: Any = Block3d
    block_params: Optional[Dict] = None
    upsample_class: Any = TrilinearUp
    upsample_params: Optional[Dict] = None
    downsample_class: Any = AvgPoolDown
    downsample_params: Optional[Dict] = None
    out_conv_class: Any = Conv3d
    out_conv_params: Optional[Dict] = None
    hypothesis_class: Any = Softmax
    hypothesis_params: Optional[Dict] = None
    remat: bool = False
    """Rematerialize blocks under grad (jax.checkpoint): trades recompute for
    activation memory — needed to fit batch-4 96^3 depth-6 training in HBM."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        filters = self.filters
        if isinstance(filters, int):
            filters = [filters] * self.depth
        elif is_sequence(filters) and len(filters) != self.depth:
            raise ValueError(
                f"Sequence of filters {filters} does not match depth {self.depth}")

        block_params = self.block_params or {}

        block_class = (nn.remat(self.block_class, static_argnums=(2,))
                       if self.remat else self.block_class)

        down_blocks = [
            block_class(features=filters[i],
                             **_map_params(self.block_class, block_params, None),
                             name=f"down_block_{i}")
            for i in range(self.depth)
        ]
        downsampling = [
            self.downsample_class(
                **_map_params(self.downsample_class, self.downsample_params, filters[i]),
                name=f"down_{i}")
            for i in range(self.depth - 1)
        ]
        up_blocks = [
            block_class(features=filters[i],
                             **_map_params(self.block_class, block_params, None),
                             name=f"up_block_{i}")
            for i in range(self.depth - 1)
        ]
        upsampling = [
            self.upsample_class(
                **_map_params(self.upsample_class, self.upsample_params, filters[i + 1]),
                name=f"up_{i}")
            for i in range(self.depth - 1)
        ]

        skips = []
        for i in range(self.depth):
            x = down_blocks[i](x, train)
            if i != self.depth - 1:
                skips.append(x)
                x = downsampling[i](x)

        for i in reversed(range(self.depth - 1)):
            x = upsampling[i](x)
            x = up_blocks[i](jnp.concatenate([x, skips[i]], axis=-1), train)

        out_conv_params = self.out_conv_params or {"kernel_size": 3, "padding": 1}
        x = self.out_conv_class(
            features=self.out_channels,
            **{k: v for k, v in _map_params(self.out_conv_class, out_conv_params,
                                            self.out_channels).items()
               if k != "features"},
            name="out_conv")(x)
        hypothesis = self.hypothesis_class(**(self.hypothesis_params or {}))
        return hypothesis(x)
