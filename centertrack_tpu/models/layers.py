"""Shared NN building blocks (NHWC, Flax linen).

BatchNorm follows the reference's torch settings: momentum 0.1 (flax
momentum = 0.9), eps 1e-5 (reference: src/lib/model/networks/dla.py:25).
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

BN_MOMENTUM_FLAX = 0.9  # = 1 - torch 0.1


class ConvBNAct(nn.Module):
    """Conv -> BatchNorm -> optional ReLU."""
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    act: bool = True
    use_bias: bool = False
    groups: int = 1
    dtype: object = None   # compute dtype (None = fp32); params stay fp32

    @nn.compact
    def __call__(self, x, train: bool = False):
        pad = self.dilation * (self.kernel - 1) // 2
        x = nn.Conv(self.features, (self.kernel, self.kernel),
                    strides=(self.stride, self.stride),
                    padding=((pad, pad), (pad, pad)),
                    kernel_dilation=(self.dilation, self.dilation),
                    feature_group_count=self.groups,
                    use_bias=self.use_bias, dtype=self.dtype,
                    name="conv")(x)
        x = nn.BatchNorm(use_running_average=not train,
                         momentum=BN_MOMENTUM_FLAX, epsilon=1e-5,
                         dtype=self.dtype, name="bn")(x)
        if self.act:
            x = nn.relu(x)
        return x


def bilinear_diag_init(channels):
    """Identity bilinear-upsample init for a FULL (kh,kw,in,out)
    transposed-conv kernel: channel c upsamples to channel c, zero
    cross-channel terms. (Cleaner than the reference's fill_up_weights,
    which writes the bilinear stencil into output channel 0 only —
    training erases the difference; conversion overwrites it.)"""
    import jax.numpy as jnp

    def init(rng, shape=None, dtype=jnp.float32):
        if shape is None:
            shape = (4, 4, channels, channels)
        kh, kw, cin, cout = shape
        dw = bilinear_upsample_kernel(kh // 2, cin)  # (kh,kw,1,cin)
        k = np.zeros(shape, np.float32)
        idx = np.arange(min(cin, cout))
        k[:, :, idx, idx] = dw[:, :, 0, idx]
        return jnp.asarray(k, dtype)
    return init


def bilinear_upsample_kernel(f: int, channels: int) -> np.ndarray:
    """Depthwise bilinear kernel of size (2f, 2f, 1, C)
    (reference: fill_up_weights, src/lib/model/networks/dla.py:454-463)."""
    size = 2 * f
    c = (2 * f - 1 - f % 2) / (2.0 * f)
    w = np.zeros((size, size), np.float32)
    fc = math.ceil(size / 2)
    for i in range(size):
        for j in range(size):
            w[i, j] = (1 - abs(i / fc - c)) * (1 - abs(j / fc - c))
    return np.tile(w[:, :, None, None], (1, 1, 1, channels))


class UpBilinear(nn.Module):
    """Trainable depthwise transposed conv, bilinear-initialized —
    the reference's fixed-upsample layer
    (reference: src/lib/model/networks/dla.py:529-532)."""
    channels: int
    factor: int
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        f = self.factor
        k = 2 * f
        kernel = self.param(
            "kernel",
            lambda rng: jnp.asarray(bilinear_upsample_kernel(f, self.channels)))
        # conv_transpose(stride f, pad f//2) == conv over f-dilated input
        # with symmetric padding k - 1 - f//2.
        pad = k - 1 - f // 2
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
        out = jax.lax.conv_general_dilated(
            x, kernel,
            window_strides=(1, 1),
            padding=((pad, pad), (pad, pad)),
            lhs_dilation=(f, f),
            feature_group_count=self.channels,
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return out


class DCNLayer(nn.Module):
    """Modulated deformable conv layer: a plain conv predicts per-tap
    offsets + modulation, then the deformable gather/matmul op runs
    (reference API: DCN(chi, cho, 3, stride=1, padding=1, dilation=1,
    deformable_groups=1) — src/lib/model/networks/dla.py:513).

    Offset/mask conv is zero-initialized so the layer starts as a plain
    3x3 conv with 0.5 modulation, matching upstream DCNv2 init.
    """
    features: int
    kernel: int = 3
    stride: int = 1
    dilation: int = 1
    dtype: object = None
    mode: str = "gather"       # 'gather' (exact) | 'local' (TPU fast path)
    max_offset: int = 2        # offset clamp for 'local'

    @nn.compact
    def __call__(self, x, train: bool = False):
        from centertrack_tpu.ops.dcn import deform_conv2d, \
            deform_conv2d_local
        k2 = self.kernel * self.kernel
        pad = self.dilation * (self.kernel - 1) // 2
        om = nn.Conv(3 * k2, (self.kernel, self.kernel),
                     strides=(self.stride, self.stride),
                     padding=((pad, pad), (pad, pad)),
                     kernel_dilation=(self.dilation, self.dilation),
                     kernel_init=nn.initializers.zeros,
                     bias_init=nn.initializers.zeros,
                     dtype=self.dtype, name="conv_offset_mask")(x)
        offset = om[..., :2 * k2]
        mask = jax.nn.sigmoid(om[..., 2 * k2:])
        cin = x.shape[-1]
        weight = self.param(
            "weight", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, cin, self.features))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        if self.dtype is not None:
            x = x.astype(self.dtype)
            offset = offset.astype(self.dtype)
            mask = mask.astype(self.dtype)
            weight = weight.astype(self.dtype)
            bias = bias.astype(self.dtype)
        if self.mode == "local" and self.kernel == 3 \
                and self.stride == 1 and self.dilation == 1:
            return deform_conv2d_local(x, offset, mask, weight, bias,
                                       max_offset=self.max_offset,
                                       train=train)
        return deform_conv2d(x, offset, mask, weight, bias,
                             stride=self.stride, padding=pad,
                             dilation=self.dilation)
