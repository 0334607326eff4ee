"""Model building blocks (flax, channels-last NDHWC... here (N, W, H, D, C)).

TPU-native re-design of ref models/components.py:17-185 (Block3d, WSConv3d,
BlurConv3d, BlurConvTranspose3d, StochasticMatrix) and the inner Block of
nested_residual_unet.py:7-47.  Semantics match torch: explicit symmetric
padding, BatchNorm momentum 0.1 (flax 0.9), channel-wise Dropout3d,
unbiased-std weight standardization, box-blurred anti-aliasing convs.
Convs route through ops/convolution.py so the Pallas backend can swap in.
"""
from __future__ import annotations

from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops.convolution import avg_pool3d, conv3d, conv_transpose3d, upsample_trilinear2x


def torch_conv_kernel_init(key, shape, dtype=jnp.float32):
    """torch Conv3d default init: U(-1/sqrt(fan_in), 1/sqrt(fan_in)) where
    fan_in = Cin * prod(kernel). shape: (kw, kh, kd, Cin, Cout)."""
    fan_in = shape[3] * shape[0] * shape[1] * shape[2]
    bound = 1.0 / jnp.sqrt(fan_in)
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _triple(v):
    return (v, v, v) if isinstance(v, int) else tuple(v)


class Conv3d(nn.Module):
    """torch-style Conv3d: features, kernel_size, stride, padding, bias.

    With ``shard_axis_name`` set (3^3/s1/p1 convs only), the input's W axis
    is assumed sharded over that mesh axis inside shard_map: a 1-voxel halo
    exchange replaces the W padding, making the sharded conv exactly equal
    to the unsharded one (parallel/halo.py building block).
    """

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    use_bias: bool = True
    shard_axis_name: Optional[str] = None

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init, (*k, cin, self.features))
        if self.shard_axis_name is not None:
            from ..parallel.halo import halo_exchange

            assert k == (3, 3, 3) and _triple(self.stride) == (1, 1, 1) \
                and _triple(self.padding) == (1, 1, 1), \
                "sharded Conv3d supports the 3^3/s1/p1 case"
            x = halo_exchange(x, 1, self.shard_axis_name, axis=1)
            y = conv3d(x, kernel.astype(x.dtype), stride=1, padding=(0, 1, 1))
        else:
            y = conv3d(x, kernel.astype(x.dtype), stride=self.stride,
                       padding=self.padding)
        if self.use_bias:
            fan_in = cin * k[0] * k[1] * k[2]
            bound = 1.0 / jnp.sqrt(fan_in)
            bias = self.param(
                "bias", lambda key, shape: jax.random.uniform(
                    key, shape, jnp.float32, -bound, bound), (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class WSConv3d(nn.Module):
    """Weight-standardized conv (ref components.py:76-88): per-out-channel
    zero-mean/unit-std (unbiased) kernel before the conv."""

    features: int
    kernel_size: Any = 3
    stride: Any = 1
    padding: Any = 0
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init, (*k, cin, self.features))
        # standardize over (spatial, Cin) per output channel — torch dims (1,2,3,4)
        mean = kernel.mean(axis=(0, 1, 2, 3), keepdims=True)
        n = kernel.shape[0] * kernel.shape[1] * kernel.shape[2] * kernel.shape[3]
        var = ((kernel - mean) ** 2).sum(axis=(0, 1, 2, 3), keepdims=True) / max(n - 1, 1)
        kernel = (kernel - mean) / (jnp.sqrt(var) + 1e-5)
        y = conv3d(x, kernel.astype(x.dtype), stride=self.stride, padding=self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


def _blur_weight(kernel: jax.Array, scale: float) -> jax.Array:
    """Depthwise 2x2x2 box-blur of an HWDIO conv kernel with zero padding 1:
    (k,k,k,I,O) -> (k+1,k+1,k+1,I,O), each tap averaging a 2^3 neighborhood
    times ``scale`` (ref components.py:103-119 blurs weights, not activations)."""
    k = kernel.shape[:3]
    padded = jnp.pad(kernel, ((1, 1), (1, 1), (1, 1), (0, 0), (0, 0)))
    out = jnp.zeros((k[0] + 1, k[1] + 1, k[2] + 1, *kernel.shape[3:]), kernel.dtype)
    for dw in range(2):
        for dh in range(2):
            for dd in range(2):
                out = out + padded[dw:dw + k[0] + 1, dh:dh + k[1] + 1, dd:dd + k[2] + 1]
    return out * scale


class BlurConv3d(nn.Module):
    """Anti-aliased strided conv: weights pre-blurred with a 2^3 box kernel
    (ref components.py:91-121). Blur taps are 1/(8*prod(stride)) each."""

    features: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1
    use_bias: bool = True
    weight_standardization: bool = False

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init, (*k, cin, self.features))
        if self.weight_standardization:
            mean = kernel.mean(axis=(0, 1, 2, 3), keepdims=True)
            n = kernel.shape[0] * kernel.shape[1] * kernel.shape[2] * kernel.shape[3]
            var = ((kernel - mean) ** 2).sum(axis=(0, 1, 2, 3), keepdims=True) / max(n - 1, 1)
            kernel = (kernel - mean) / (jnp.sqrt(var) + 1e-5)
        scale = 1.0 / (8.0 * (s[0] * s[1] * s[2]))
        blurred = _blur_weight(kernel, scale).astype(x.dtype)
        y = conv3d(x, blurred, stride=self.stride, padding=self.padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class BlurConvTranspose3d(nn.Module):
    """Anti-aliased transposed conv (ref components.py:124-154). Blur taps are
    prod(stride)/8 each; output = (in-1)*s - 2p + (k+1) + output_padding."""

    features: int
    kernel_size: Any = 3
    stride: Any = 2
    padding: Any = 1
    output_padding: Any = 0
    use_bias: bool = True
    weight_standardization: bool = False

    @nn.compact
    def __call__(self, x):
        k = _triple(self.kernel_size)
        s = _triple(self.stride)
        cin = x.shape[-1]
        kernel = self.param("kernel", torch_conv_kernel_init, (*k, cin, self.features))
        if self.weight_standardization:
            mean = kernel.mean(axis=(0, 1, 2, 3), keepdims=True)
            n = kernel.shape[0] * kernel.shape[1] * kernel.shape[2] * kernel.shape[3]
            var = ((kernel - mean) ** 2).sum(axis=(0, 1, 2, 3), keepdims=True) / max(n - 1, 1)
            kernel = (kernel - mean) / (jnp.sqrt(var) + 1e-5)
        scale = (s[0] * s[1] * s[2]) / 8.0
        blurred = _blur_weight(kernel, scale).astype(x.dtype)
        y = conv_transpose3d(x, blurred, stride=self.stride, padding=self.padding,
                             output_padding=self.output_padding)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class Block3d(nn.Module):
    """n x (conv -> norm -> act), optional residual 3^3 conv, channel dropout
    (ref components.py:17-73 and the NestedResUNet inner Block)."""

    features: int
    num_convs: int = 2
    residual: bool = False
    dropout_p: float = 0.0
    conv_class: Callable = Conv3d
    conv_params: Optional[Dict] = None
    use_norm: bool = True
    activation: Callable = nn.relu
    shard_axis_name: Optional[str] = None
    bn_axis_name: Any = None
    """Mesh axis name(s) BatchNorm batch statistics are pmean'd over when
    training inside shard_map (spatial and/or data axes); cross-shard sync
    makes sharded-training BN stats exactly match the unsharded program."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        conv_params = dict(self.conv_params or
                           {"kernel_size": 3, "padding": 1, "use_bias": False})
        if self.shard_axis_name is not None:
            import dataclasses

            fields = {f.name for f in dataclasses.fields(self.conv_class)} \
                if dataclasses.is_dataclass(self.conv_class) else set()
            if "shard_axis_name" in fields:
                conv_params.setdefault("shard_axis_name", self.shard_axis_name)
            else:
                raise ValueError(
                    f"Spatial sharding requested but conv_class "
                    f"{self.conv_class.__name__} has no shard_axis_name "
                    f"field — its convs would silently compute wrong values "
                    f"at shard boundaries")
        x_in = x
        for i in range(self.num_convs):
            x = self.conv_class(features=self.features, **conv_params)(x)
            if self.use_norm:
                x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                                 epsilon=1e-5, axis_name=self.bn_axis_name,
                                 dtype=x.dtype)(x)
            x = self.activation(x)
        if self.residual:
            x = Conv3d(features=self.features, kernel_size=3, padding=1, use_bias=True,
                       shard_axis_name=self.shard_axis_name,
                       name="res_conv")(x_in) + x
        if self.dropout_p > 0.0:
            # Dropout3d: drop entire channels (broadcast over spatial dims)
            x = nn.Dropout(rate=self.dropout_p, broadcast_dims=(1, 2, 3),
                           deterministic=not train)(x)
        return x


class AvgPoolDown(nn.Module):
    """AvgPool3d(2,2) downsample (ref nested_residual_unet.py:67)."""

    @nn.compact
    def __call__(self, x):
        return avg_pool3d(x, window=2, stride=2)


class TrilinearUp(nn.Module):
    """Trilinear 2x upsample, align_corners=True (ref nested_residual_unet.py:68)."""

    @nn.compact
    def __call__(self, x):
        return upsample_trilinear2x(x, align_corners=True)


class Softmax(nn.Module):
    """Channel softmax hypothesis head (torch nn.Softmax(dim=1) analog for
    channels-last)."""

    @nn.compact
    def __call__(self, x):
        return jax.nn.softmax(x, axis=-1)


class StochasticMatrix(nn.Module):
    """(N, ..., C^2) -> softmax over the first factor of the C x C transition
    matrix, flattened back (ref components.py:157-185; cascade head)."""

    channels: int
    diag_bias: Optional[float] = None

    @nn.compact
    def __call__(self, x):
        C = self.channels
        c2 = x.shape[-1]
        if c2 != C * C:
            raise RuntimeError(
                "Expected final dim of input tensor to be the square of the number "
                "of out channels")
        shape = x.shape
        x = x.reshape(*shape[:-1], C, C)  # (..., C_row, C_col)
        if self.diag_bias is not None:
            x = x + jnp.eye(C, dtype=x.dtype) * self.diag_bias
        x = jax.nn.softmax(x, axis=-2)  # softmax over rows (torch dim=1)
        return x.reshape(*shape[:-1], C * C)
