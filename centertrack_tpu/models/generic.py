"""Generic backbone x neck composition + MobileNetV2
(reference: src/lib/model/networks/generic_network.py,
backbones/mobilenet.py, backbones/resnet.py, backbones/dla.py,
necks/dlaup.py, necks/msraup.py).

Selected by arch='generic' with cfg.backbone in {dla34, resnet,
mobilenet} and cfg.neck in {dlaup, msraup}.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax.numpy as jnp

from centertrack_tpu.models.dla import DLA, DLA_CONFIGS, DLAUp, IDAUp
from centertrack_tpu.models.layers import (ConvBNAct, DCNLayer, UpBilinear,
                                           bilinear_diag_init)
from centertrack_tpu.models.resnet import RESNET_SPEC, ResBasicBlock, \
    ResBottleneck


def _make_divisible(v, divisor=8, min_value=None):
    if min_value is None:
        min_value = divisor
    new_v = max(min_value, int(v + divisor / 2) // divisor * divisor)
    if new_v < 0.9 * v:
        new_v += divisor
    return new_v


class InvertedResidual(nn.Module):
    """(reference: backbones/mobilenet.py:52-79)"""
    oup: int
    stride: int
    expand_ratio: int
    dtype: object = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        inp = x.shape[-1]
        hidden = int(round(inp * self.expand_ratio))
        use_res = self.stride == 1 and inp == self.oup
        out = x
        if self.expand_ratio != 1:
            out = ConvBNAct(hidden, 1, 1, act=True, dtype=self.dtype,
                            name="pw")(out, train)
            out = jnp.minimum(out, 6.0)  # ReLU6 upper clamp
        out = ConvBNAct(hidden, 3, self.stride, act=True,
                        groups=hidden, dtype=self.dtype, name="dw")(out, train)
        out = jnp.minimum(out, 6.0)
        out = ConvBNAct(self.oup, 1, 1, act=False, dtype=self.dtype,
                        name="pw_linear")(
            out, train)
        return x + out if use_res else out


MOBILENET_SETTING = [
    # t, c, n, s  (reference: mobilenet.py:103-111)
    (1, 16, 1, 1), (6, 24, 2, 2), (6, 32, 3, 2), (6, 64, 4, 2),
    (6, 96, 3, 1), (6, 160, 3, 2), (6, 320, 1, 1),
]


class MobileNetV2(nn.Module):
    """Pyramid-tapped MobileNetV2 with pre_img/pre_hm stems at stride 2
    (reference: backbones/mobilenet.py:82-195).

    channels = [32, 16, 24, 32, 96, 320] (taps before each stride-2
    block + final)."""
    with_pre_img: bool = False
    with_pre_hm: bool = False
    width_mult: float = 1.0
    dtype: object = None

    @staticmethod
    def out_channels(width_mult: float = 1.0):
        input_channel = _make_divisible(32 * width_mult)
        chans = [input_channel]
        all_channels = [input_channel]
        key = [True]
        for t, c, n, s in MOBILENET_SETTING:
            oc = _make_divisible(c * width_mult)
            for i in range(n):
                key.append(s == 2 and i == 0)
                all_channels.append(oc)
        for i in range(len(key) - 1):
            if key[i + 1]:
                chans.append(all_channels[i])
        chans.append(all_channels[-1])
        return chans

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        input_channel = _make_divisible(32 * self.width_mult)
        h = ConvBNAct(input_channel, 3, 2, act=True, dtype=self.dtype,
                      name="stem")(x, train)
        h = jnp.minimum(h, 6.0)
        if pre_img is not None and self.with_pre_img:
            h = h + ConvBNAct(input_channel, 3, 2, act=False, dtype=self.dtype,
                              name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            h = h + ConvBNAct(input_channel, 3, 2, act=False, dtype=self.dtype,
                              name="pre_hm_layer")(pre_hm, train)
        y = [h]
        idx = 0
        prev = h
        # taps mirror the reference key_block logic: output just BEFORE
        # each stride-2 block, plus the final block output.
        blocks = []
        for t, c, n, s in MOBILENET_SETTING:
            oc = _make_divisible(c * self.width_mult)
            for i in range(n):
                blocks.append((oc, s if i == 0 else 1, t))
        for bi, (oc, stride, t) in enumerate(blocks):
            if stride == 2:
                y.append(prev)
            prev = InvertedResidual(oc, stride, t, dtype=self.dtype,
                                    name=f"block_{bi}")(
                prev, train=train)
        y.append(prev)
        # reference emits 6 maps: stem + 4 pre-stride taps + final; the
        # first two entries (stem, first tap) coincide at stride 2.
        return y[:6] if len(y) >= 6 else y


class ResnetPyramid(nn.Module):
    """6-level resnet pyramid (reference: backbones/resnet.py:103-169).
    channels = [64, 64, 64e, 128e, 256e, 512e]."""
    num_layers: int = 18
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        block_name, layers = RESNET_SPEC[self.num_layers]
        block = ResBasicBlock if block_name == "basic" else ResBottleneck
        expansion = 1 if block_name == "basic" else 4
        h = ConvBNAct(64, 7, 2, act=True, dtype=self.dtype,
                      name="conv1")(x, train)
        if pre_img is not None and self.with_pre_img:
            h = h + ConvBNAct(64, 7, 2, act=True, dtype=self.dtype,
                              name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            h = h + ConvBNAct(64, 7, 2, act=True, dtype=self.dtype,
                              name="pre_hm_layer")(pre_hm, train)
        y = [h]
        h = nn.max_pool(h, (3, 3), strides=(2, 2),
                        padding=((1, 1), (1, 1)))
        y.append(h)
        inplanes = 64
        for li, (planes, blocks) in enumerate(
                zip((64, 128, 256, 512), layers)):
            stride = 1 if li == 0 else 2
            for bi in range(blocks):
                need_ds = (bi == 0 and (
                    stride != 1 or inplanes != planes * expansion))
                h = block(planes, stride if bi == 0 else 1, need_ds,
                          dtype=self.dtype,
                          name=f"layer{li + 1}_{bi}")(h, train=train)
            inplanes = planes * expansion
            y.append(h)
        return y


class DLAPyramid(nn.Module):
    """Plain DLA-34 pyramid backbone for the generic path
    (reference: backbones/dla.py — identical tree to models/dla.DLA)."""
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        levels, channels, block = DLA_CONFIGS[34]
        return DLA(levels, channels, block,
                   with_pre_img=self.with_pre_img,
                   with_pre_hm=self.with_pre_hm, dtype=self.dtype,
                   name="base")(
            x, pre_img, pre_hm, train=train)


class TinyPyramid(nn.Module):
    """Minimal 6-level pyramid (one ConvBNAct per level, strides
    1/2/4/8/16/32). No reference counterpart: this is a smoke/test
    backbone that pairs with the PRODUCTION necks and heads, so
    trainer/engine/sharding tests exercise the real DCN-neck/decode/
    loss graph at a fraction of full-backbone compile cost."""
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    CHANNELS = (8, 8, 16, 16, 32, 32)

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        c = self.CHANNELS
        h = ConvBNAct(c[0], 3, 1, act=True, dtype=self.dtype,
                      name="conv1")(x, train)
        if pre_img is not None and self.with_pre_img:
            h = h + ConvBNAct(c[0], 3, 1, act=True, dtype=self.dtype,
                              name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            h = h + ConvBNAct(c[0], 3, 1, act=True, dtype=self.dtype,
                              name="pre_hm_layer")(pre_hm, train)
        y = [h]
        for i, ch in enumerate(c[1:], 1):
            h = ConvBNAct(ch, 3, 2, act=True, dtype=self.dtype,
                          name=f"level{i}")(h, train)
            y.append(h)
        return y


class DLAUpNeck(nn.Module):
    """Generic DLAUp neck (reference: necks/dlaup.py:169-199)."""
    channels: Tuple[int, ...]  # 6 backbone channels
    dla_node: str = "dcn"
    dtype: object = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        first_level, last_level = 2, 5
        channels = list(self.channels)
        out = DLAUp(first_level, tuple(channels[first_level:]),
                    node=self.dla_node, dtype=self.dtype,
                    name="dla_up")(
            feats[first_level:], train=train)
        y = out[: last_level - first_level]
        y = IDAUp(channels[first_level],
                  tuple(2 ** i for i in range(last_level - first_level)),
                  node=self.dla_node, dtype=self.dtype,
                  base_stride=2 ** first_level,
                  name="ida_up")(y, train=train)
        return [y[-1]]


class MSRAUpNeck(nn.Module):
    """3 x (DCN -> BN -> ReLU -> deconv -> BN -> ReLU)
    (reference: necks/msraup.py:48-135). out_channel 64 or 256. The
    deconv is a FULL transposed conv as in the reference (keeps trained
    reference checkpoints convertible), initialized as an identity
    bilinear upsampler."""
    out_channel: int = 256
    dtype: object = None

    @nn.compact
    def __call__(self, feats, train: bool = False):
        planes_list = ((256, 128, 64) if self.out_channel == 64
                       else (256, 256, 256))
        x = feats[-1]
        for i, planes in enumerate(planes_list):
            x = DCNLayer(planes, 3, dtype=self.dtype,
                         name=f"dcn_{i}")(x, train=train)
            x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, dtype=self.dtype,
                             name=f"dcn_bn_{i}")(x)
            x = nn.relu(x)
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


class GenericNetwork(nn.Module):
    """backbone x neck composition
    (reference: generic_network.py:30-107)."""
    num_layers: int = 0
    backbone: str = "dla34"
    neck: str = "dlaup"
    dla_node: str = "dcn"
    msra_outchannel: int = 256
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        if self.backbone == "dla34":
            bb = DLAPyramid(self.with_pre_img, self.with_pre_hm,
                            dtype=self.dtype, name="backbone")
            channels = list(DLA_CONFIGS[34][1])
        elif self.backbone == "resnet":
            nl = self.num_layers if self.num_layers in RESNET_SPEC else 50
            bb = ResnetPyramid(nl, self.with_pre_img, self.with_pre_hm,
                               dtype=self.dtype, name="backbone")
            e = 1 if RESNET_SPEC[nl][0] == "basic" else 4
            channels = [64, 64, 64 * e, 128 * e, 256 * e, 512 * e]
        elif self.backbone == "mobilenet":
            bb = MobileNetV2(self.with_pre_img, self.with_pre_hm,
                             dtype=self.dtype, name="backbone")
            channels = MobileNetV2.out_channels()
        elif self.backbone == "tiny":
            bb = TinyPyramid(self.with_pre_img, self.with_pre_hm,
                             dtype=self.dtype, name="backbone")
            channels = list(TinyPyramid.CHANNELS)
        else:
            raise ValueError(f"unknown backbone {self.backbone}")
        feats = bb(x, pre_img, pre_hm, train=train)
        if self.neck == "dlaup":
            neck = DLAUpNeck(tuple(channels), self.dla_node,
                             dtype=self.dtype, name="neck")
        elif self.neck == "msraup":
            neck = MSRAUpNeck(self.msra_outchannel, dtype=self.dtype,
                              name="neck")
        else:
            raise ValueError(f"unknown neck {self.neck}")
        return neck(feats, train=train)
