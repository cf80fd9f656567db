"""PoseResNet (`res_X`) and PoseResDCN (`resdcn_X`), NHWC / Flax.

Re-design of reference src/lib/model/networks/resnet.py (plain deconv
neck) and resdcn.py (DCN + bilinear-up neck). Standard ResNet trunk,
then 3 upsampling stages back to stride 4.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from centertrack_tpu.models.layers import (ConvBNAct, DCNLayer,
                                           bilinear_diag_init)


class ResBasicBlock(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBNAct(self.planes, 3, self.stride, act=True,
                        dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNAct(self.planes, 3, 1, act=False, dtype=self.dtype,
                        name="conv2")(out, train)
        if self.downsample:
            residual = ConvBNAct(self.planes, 1, self.stride, act=False,
                                 dtype=self.dtype, name="downsample")(x, train)
        return nn.relu(out + residual)


class ResBottleneck(nn.Module):
    planes: int
    stride: int = 1
    downsample: bool = False
    expansion: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        residual = x
        out = ConvBNAct(self.planes, 1, 1, act=True, dtype=self.dtype,
                        name="conv1")(x, train)
        out = ConvBNAct(self.planes, 3, self.stride, act=True,
                        dtype=self.dtype, name="conv2")(out, train)
        out = ConvBNAct(self.planes * self.expansion, 1, 1, act=False,
                        dtype=self.dtype, name="conv3")(out, train)
        if self.downsample:
            residual = ConvBNAct(self.planes * self.expansion, 1,
                                 self.stride, act=False, dtype=self.dtype,
                                 name="downsample")(x, train)
        return nn.relu(out + residual)


RESNET_SPEC = {
    18: ("basic", (2, 2, 2, 2)),
    34: ("basic", (3, 4, 6, 3)),
    50: ("bottleneck", (3, 4, 6, 3)),
    101: ("bottleneck", (3, 4, 23, 3)),
    152: ("bottleneck", (3, 8, 36, 3)),
}


class ResNetTrunk(nn.Module):
    """conv1..layer4 of a torchvision-style ResNet
    (reference: resnet.py:113-131)."""
    num_layers: int = 18
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        block_name, layers = RESNET_SPEC[self.num_layers]
        block = ResBasicBlock if block_name == "basic" else ResBottleneck
        expansion = 1 if block_name == "basic" else 4

        x = ConvBNAct(64, 7, 2, act=True, dtype=self.dtype,
                      name="conv1")(x, train)
        # pre-frame stems at stride 2, added to the current stem features
        # (resdcn has no stems upstream; we support them uniformly so every
        #  arch can run the tracking task, mirroring mobilenet.py:120-129).
        if pre_img is not None and self.with_pre_img:
            x = x + ConvBNAct(64, 7, 2, act=True, dtype=self.dtype,
                              name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            x = x + ConvBNAct(64, 7, 2, act=True, dtype=self.dtype,
                              name="pre_hm_layer")(pre_hm, train)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                need_ds = (bi == 0 and
                           (stride != 1 or inplanes != planes * expansion))
                x = block(planes, stride if bi == 0 else 1, need_ds,
                          dtype=self.dtype,
                          name=f"layer{li + 1}_{bi}")(x, train=train)
            inplanes = planes * expansion
        return x


class PoseResNet(nn.Module):
    """ResNet + 3 plain deconv stages (256 ch, 4x4, stride 2)
    (reference: resnet.py:134-211). Output stride 4, 256 channels."""
    num_layers: int = 18
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        x = ResNetTrunk(self.num_layers, self.with_pre_img,
                        self.with_pre_hm, dtype=self.dtype,
                        name="trunk")(
            x, pre_img, pre_hm, train=train)
        for i in range(3):
            # ConvTranspose(k=4, s=2, p=1) == 2x upsample; flax 'SAME'
            # padding reproduces the torch output size (2 * in).
            x = nn.ConvTranspose(256, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 kernel_init=nn.initializers.normal(0.001),
                                 dtype=self.dtype,
                                 name=f"deconv_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"deconv_bn_{i}")(x)
            x = nn.relu(x)
        return [x]


class PoseResDCN(nn.Module):
    """ResNet + DCN-enhanced upsample stages: per stage DCN 3x3 -> BN ->
    ReLU -> bilinear up -> BN -> ReLU (reference: resdcn.py:235-267)."""
    num_layers: int = 18
    deconv_channels: Tuple[int, ...] = (256, 128, 64)
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        x = ResNetTrunk(self.num_layers, self.with_pre_img,
                        self.with_pre_hm, dtype=self.dtype,
                        name="trunk")(
            x, pre_img, pre_hm, train=train)
        for i, planes in enumerate(self.deconv_channels):
            x = DCNLayer(planes, 3, dtype=self.dtype,
                         name=f"dcn_{i}")(x, train=train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"dcn_bn_{i}")(x)
            x = nn.relu(x)
            # full (not depthwise) transposed conv, as in the reference
            # (resdcn.py:248-256) — keeps trained reference checkpoints
            # convertible; initialized as an identity bilinear upsampler
            x = nn.ConvTranspose(planes, (4, 4), strides=(2, 2),
                                 padding="SAME", use_bias=False,
                                 kernel_init=bilinear_diag_init(planes),
                                 dtype=self.dtype,
                                 name=f"up_{i}")(x)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"up_bn_{i}")(x)
            x = nn.relu(x)
        return [x]
