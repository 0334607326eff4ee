"""NestedResUNet — UNet++-style nested skip grid.

TPU-native re-design of ref models/nested_residual_unet.py:49-105: the same
nested topology (conv0_0..conv0_3, AvgPool down, trilinear-align-corners up,
3^3 out conv + channel softmax) expressed channels-last in flax with convs
routed through ops/convolution.py.  Spatial dims must be divisible by 8
(three pooling levels), as in the reference's 96x88x24 config
(main_config.py:80).
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convolution import (
    avg_pool3d,
    upsample_trilinear2x,
    upsample_trilinear2x_sharded,
)
from .components import Block3d, Conv3d, Softmax


class NestedResUNet(nn.Module):
    input_channels: int
    output_channels: int
    filters: int = 40
    dropout_p: float = 0.0
    hypothesis_class: Any = Softmax
    hypothesis_params: Optional[Dict] = None
    remat: bool = False
    """Rematerialize blocks under grad (jax.checkpoint) to cut activation
    memory at the cost of recompute."""
    spatial_shard_axis: Optional[str] = None
    """Run on volumes whose W axis is sharded over this mesh axis (inside
    shard_map): convs halo-exchange, the upsample is global-index aware, and
    pooling stays local (shard boundaries align with even indices). The
    whole forward then never materializes the full volume on one device —
    see parallel/sharded_model.py."""
    bn_axis_name: Any = None
    """Mesh axis name(s) for cross-shard BatchNorm statistics when training
    inside shard_map (see training/train_step.py make_spatial_train_step)."""
    use_norm: bool = True
    """Disable BatchNorm in every block (numerics experiments: gradient
    accumulation is exactly batch-equivalent only without batch statistics,
    tests/test_parallel.py TestQsmMeshRecipe)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        f = self.filters
        block_cls = (nn.remat(Block3d, static_argnums=(2,))
                     if self.remat else Block3d)
        block = lambda residual, name: block_cls(  # noqa: E731
            features=f, residual=residual, dropout_p=self.dropout_p,
            shard_axis_name=self.spatial_shard_axis,
            bn_axis_name=self.bn_axis_name, use_norm=self.use_norm,
            name=name)
        down = lambda t: avg_pool3d(t, 2, 2)  # noqa: E731
        if self.spatial_shard_axis is not None:
            up = lambda t: upsample_trilinear2x_sharded(  # noqa: E731
                t, self.spatial_shard_axis)
        else:
            up = lambda t: upsample_trilinear2x(t, align_corners=True)  # noqa: E731
        cat = lambda *ts: jnp.concatenate(ts, axis=-1)  # noqa: E731

        x0_0 = block(True, "conv0_0")(x, train)
        x1_0 = block(False, "conv1_0")(down(x0_0), train)
        x0_1 = block(True, "conv0_1")(cat(x0_0, up(x1_0)), train)

        x2_0 = block(False, "conv2_0")(down(x1_0), train)
        x1_1 = block(False, "conv1_1")(cat(x1_0, up(x2_0), down(x0_1)), train)
        x0_2 = block(True, "conv0_2")(cat(x0_1, up(x1_1)), train)

        x3_0 = block(False, "conv3_0")(down(x2_0), train)
        x2_1 = block(False, "conv2_1")(cat(x2_0, up(x3_0), down(x1_1)), train)
        x1_2 = block(False, "conv1_2")(cat(x1_1, up(x2_1), down(x0_2)), train)
        x0_3 = block(True, "conv0_3")(cat(x0_2, up(x1_2)), train)

        x_out = Conv3d(features=self.output_channels, kernel_size=3, padding=1,
                       shard_axis_name=self.spatial_shard_axis,
                       name="out_conv")(x0_3)
        hypothesis = self.hypothesis_class(**(self.hypothesis_params or {}))
        return hypothesis(x_out)
