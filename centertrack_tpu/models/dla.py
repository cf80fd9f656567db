"""DLA backbone + DLAUp/IDAUp neck, NHWC / Flax.

Re-design of the reference DLA-34 implementation
(reference: src/lib/model/networks/dla.py). Structure and channel math
match exactly (so a torch->jax weight converter is a pure renaming), but
the code is functional: the backbone returns a 6-level pyramid, the neck
transforms it, no in-place list mutation.

The CenterTrack temporal mechanism — separate 7x7 stems for the previous
frame and the prior-track heatmap whose outputs are ADDED to the current
frame's stem features (reference: dla.py:256-267, 305-311) — lives in
``DLA.__call__``.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple, Type

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.models.layers import ConvBNAct, DCNLayer, UpBilinear


class BasicBlock(nn.Module):
    """(reference: dla.py:38-66)"""
    planes: int
    stride: int = 1
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        out = ConvBNAct(self.planes, 3, self.stride, self.dilation,
                        act=True, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNAct(self.planes, 3, 1, self.dilation,
                        act=False, dtype=self.dtype, name="conv2")(out, train)
        return nn.relu(out + residual)


class Bottleneck(nn.Module):
    """(reference: dla.py:69-107)"""
    planes: int
    stride: int = 1
    dilation: int = 1
    expansion: int = 2
    dtype: object = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.planes // self.expansion
        out = ConvBNAct(bottle, 1, 1, act=True, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNAct(bottle, 3, self.stride, self.dilation, act=True,
                        dtype=self.dtype, name="conv2")(out, train)
        out = ConvBNAct(self.planes, 1, 1, act=False, dtype=self.dtype,
                        name="conv3")(out, train)
        return nn.relu(out + residual)


class BottleneckX(nn.Module):
    """ResNeXt-style grouped bottleneck (reference: dla.py:110-151)"""
    planes: int
    stride: int = 1
    dilation: int = 1
    cardinality: int = 32
    dtype: object = None

    @nn.compact
    def __call__(self, x, residual=None, train: bool = False):
        if residual is None:
            residual = x
        bottle = self.planes * self.cardinality // 32
        out = ConvBNAct(bottle, 1, 1, act=True, dtype=self.dtype, name="conv1")(x, train)
        out = ConvBNAct(bottle, 3, self.stride, self.dilation, act=True,
                        groups=self.cardinality, dtype=self.dtype,
                        name="conv2")(out, train)
        out = ConvBNAct(self.planes, 1, 1, act=False, dtype=self.dtype,
                        name="conv3")(out, train)
        return nn.relu(out + residual)


BLOCKS = {"basic": BasicBlock, "bottleneck": Bottleneck,
          "bottleneckx": BottleneckX}


class Root(nn.Module):
    """Concat children -> 1x1 conv -> BN -> (+child0) -> ReLU
    (reference: dla.py:154-172)"""
    features: int
    residual: bool = False
    dtype: object = None

    @nn.compact
    def __call__(self, children: Sequence[jnp.ndarray], train: bool = False):
        x = jnp.concatenate(children, axis=-1)
        x = ConvBNAct(self.features, 1, 1, act=False, dtype=self.dtype,
                       name="conv")(x, train)
        if self.residual:
            x = x + children[0]
        return nn.relu(x)


class Tree(nn.Module):
    """Recursive deep-aggregation tree (reference: dla.py:175-228)."""
    levels: int
    block: str
    in_channels: int
    out_channels: int
    stride: int = 1
    level_root: bool = False
    root_residual: bool = False
    dilation: int = 1
    dtype: object = None

    @nn.compact
    def __call__(self, x, children=None, train: bool = False):
        children = [] if children is None else list(children)
        block_cls = BLOCKS[self.block]

        bottom = nn.max_pool(
            x, (self.stride, self.stride),
            strides=(self.stride, self.stride)) if self.stride > 1 else x
        if self.in_channels != self.out_channels:
            residual = ConvBNAct(self.out_channels, 1, 1, act=False,
                                 dtype=self.dtype, name="project")(bottom, train)
        else:
            residual = bottom
        if self.level_root:
            children.append(bottom)

        if self.levels == 1:
            x1 = block_cls(self.out_channels, self.stride,
                           self.dilation, dtype=self.dtype, name="tree1")(
                x, residual, train=train)
            x2 = block_cls(self.out_channels, 1, self.dilation,
                           dtype=self.dtype, name="tree2")(x1, train=train)
            out = Root(self.out_channels, self.root_residual, dtype=self.dtype,
                       name="root")(
                [x2, x1] + children, train)
        else:
            x1 = Tree(self.levels - 1, self.block, self.in_channels,
                      self.out_channels, self.stride,
                      root_residual=self.root_residual,
                      dilation=self.dilation, dtype=self.dtype,
                      name="tree1")(x, train=train)
            children.append(x1)
            out = Tree(self.levels - 1, self.block, self.out_channels,
                       self.out_channels, 1,
                       root_residual=self.root_residual,
                       dilation=self.dilation, dtype=self.dtype,
                       name="tree2")(
                x1, children=children, train=train)
        return out


class DLA(nn.Module):
    """The DLA pyramid backbone with pre_img/pre_hm stems
    (reference: dla.py:231-316)."""
    levels: Tuple[int, ...]
    channels: Tuple[int, ...]
    block: str = "basic"
    residual_root: bool = False
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None

    def _conv_level(self, x, features, convs, stride, name, train):
        for i in range(convs):
            x = ConvBNAct(features, 3, stride if i == 0 else 1, act=True,
                          dtype=self.dtype, name=f"{name}_{i}")(x, train)
        return x

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        ch = self.channels
        x = ConvBNAct(ch[0], 7, 1, act=True, dtype=self.dtype,
                      name="base_layer")(x, train)
        if pre_img is not None and self.with_pre_img:
            x = x + ConvBNAct(ch[0], 7, 1, act=True, dtype=self.dtype,
                              name="pre_img_layer")(pre_img, train)
        if pre_hm is not None and self.with_pre_hm:
            x = x + ConvBNAct(ch[0], 7, 1, act=True, dtype=self.dtype,
                              name="pre_hm_layer")(pre_hm, train)
        y = []
        x = self._conv_level(x, ch[0], self.levels[0], 1, "level0", train)
        y.append(x)
        x = self._conv_level(x, ch[1], self.levels[1], 2, "level1", train)
        y.append(x)
        x = Tree(self.levels[2], self.block, ch[1], ch[2], 2,
                 level_root=False, root_residual=self.residual_root,
                 dtype=self.dtype, name="level2")(x, train=train)
        y.append(x)
        x = Tree(self.levels[3], self.block, ch[2], ch[3], 2,
                 level_root=True, root_residual=self.residual_root,
                 dtype=self.dtype, name="level3")(x, train=train)
        y.append(x)
        x = Tree(self.levels[4], self.block, ch[3], ch[4], 2,
                 level_root=True, root_residual=self.residual_root,
                 dtype=self.dtype, name="level4")(x, train=train)
        y.append(x)
        x = Tree(self.levels[5], self.block, ch[4], ch[5], 2,
                 level_root=True, root_residual=self.residual_root,
                 dtype=self.dtype, name="level5")(x, train=train)
        y.append(x)
        return y


DLA_CONFIGS = {
    # name -> (levels, channels, block)
    34: ((1, 1, 1, 2, 2, 1), (16, 32, 64, 128, 256, 512), "basic"),
    60: ((1, 1, 1, 2, 3, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
    102: ((1, 1, 1, 3, 4, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
    169: ((1, 1, 2, 3, 5, 1), (16, 32, 128, 256, 512, 1024), "bottleneck"),
}


class ConvNode(nn.Module):
    """'conv' node: 1x1 conv + BN + ReLU (reference: dla.py:466-475)."""
    features: int
    dtype: object = None
    map_stride: int = 4  # unused; uniform node-class signature

    @nn.compact
    def __call__(self, x, train: bool = False):
        return ConvBNAct(self.features, 1, 1, act=True, dtype=self.dtype,
                         name="conv")(x, train)


class DeformNode(nn.Module):
    """'dcn' node: DCN 3x3 + BN + ReLU (reference: dla.py:506-518).
    mode='local' selects the gather-free clamped-offset op
    (ops/dcn.deform_conv2d_local); mode='mix' picks per module by
    `map_stride`: clamped-local (+/-2 px) on the stride-4/8 maps —
    where the gather is most expensive and trained offsets exceed 2 px
    at <=25% of positions — exact gather on the stride-16/32 levels,
    where trained offsets are largest (p50 up to 2 px, >2 px at up to
    51% of positions) and the gather is cheap. Design data:
    tools/dcn_levelbench.py timings + the trained offset histograms in
    docs/dcn_drift_trained.json; measured 544x960 honest-protocol fps
    dcn 33.6 / dcn_mix 48.2 / dcn_local1 68.2, and the full +/-2 px
    clamp costs only -0.002 MOTA on exact-trained weights (clamping
    stride-16 too — CT_MIX_STRIDE=16 — buys ~1.6 fps for -0.012 MOTA,
    docs/dcn_drift_mix16.json). Override the stride threshold via env
    CT_MIX_STRIDE for experiments."""
    features: int
    dtype: object = None
    mode: str = "gather"
    max_offset: int = 2
    map_stride: int = 4  # absolute feature stride of this node's map

    @nn.compact
    def __call__(self, x, train: bool = False):
        mode = self.mode
        if mode == "mix":
            import os
            thr = int(os.environ.get("CT_MIX_STRIDE", "8"))
            mode = "local" if self.map_stride <= thr else "gather"
        x = DCNLayer(self.features, 3, dtype=self.dtype, mode=mode,
                     max_offset=self.max_offset, name="conv")(
            x, train=train)
        x = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                         epsilon=1e-5, dtype=self.dtype,
                         name="actf_bn")(x)
        return nn.relu(x)


class GlobalConvNode(nn.Module):
    """'gcn' node: large separable kernels (reference: dla.py:478-503)."""
    features: int
    k: int = 7
    dtype: object = None
    map_stride: int = 4  # unused; uniform node-class signature

    @nn.compact
    def __call__(self, x, train: bool = False):
        p = self.k // 2
        gl = nn.Conv(self.features, (self.k, 1), padding=((p, p), (0, 0)),
                     use_bias=False, name="gcl_0")(x)
        gl = nn.Conv(self.features, (1, self.k), padding=((0, 0), (p, p)),
                     use_bias=False, name="gcl_1")(gl)
        gr = nn.Conv(self.features, (1, self.k), padding=((0, 0), (p, p)),
                     use_bias=False, name="gcr_0")(x)
        gr = nn.Conv(self.features, (self.k, 1), padding=((p, p), (0, 0)),
                     use_bias=False, name="gcr_1")(gr)
        out = gl + gr
        out = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                           epsilon=1e-5, dtype=self.dtype,
                           name="act_bn")(out)
        return nn.relu(out)


import functools


def node_types(dla_node: str):
    """(reference: DLA_NODE, dla.py:588-592; 'dcn_local' is this
    repo's gather-free TPU fast path)"""
    local = functools.partial(DeformNode, mode="local")
    local1 = functools.partial(DeformNode, mode="local", max_offset=1)
    mix = functools.partial(DeformNode, mode="mix")
    return {
        "dcn": (DeformNode, DeformNode),
        "dcn_mix": (mix, mix),
        "dcn_local": (local, local),
        "dcn_local1": (local1, local1),
        "gcn": (ConvNode, GlobalConvNode),
        "conv": (ConvNode, ConvNode),
    }[dla_node]


class IDAUp(nn.Module):
    """Iterative deep aggregation over a level slice
    (reference: dla.py:520-545). Functional: consumes a list of maps,
    returns the new list (no mutation)."""
    out_channels: int
    up_factors: Tuple[int, ...]  # per input level, relative to level 0
    node: str = "dcn"
    dtype: object = None
    base_stride: int = 4  # absolute stride of level 0 of the slice

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False):
        proj_cls, node_cls = node_types(self.node)
        layers = list(layers)
        for i in range(1, len(layers)):
            f = int(self.up_factors[i])
            # proj runs at layers[i]'s own resolution (stride
            # base*up_factor); node runs at the slice-base resolution
            x = proj_cls(self.out_channels, dtype=self.dtype,
                         map_stride=self.base_stride * f,
                         name=f"proj_{i}")(
                layers[i], train=train)
            if f > 1:
                x = UpBilinear(self.out_channels, f, dtype=self.dtype,
                               name=f"up_{i}")(x)
            layers[i] = node_cls(self.out_channels, dtype=self.dtype,
                                 map_stride=self.base_stride,
                                 name=f"node_{i}")(
                x + layers[i - 1], train=train)
        return layers


class DLAUp(nn.Module):
    """Pyramid of IDAUp stages (reference: dla.py:549-574)."""
    startp: int
    channels: Tuple[int, ...]  # channels at levels startp..5
    node: str = "dcn"
    dtype: object = None

    @nn.compact
    def __call__(self, layers: Sequence[jnp.ndarray], train: bool = False):
        # `layers` holds levels startp..5 only (reference passes the full
        # 6-level list and indexes from startp; the result is identical).
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array([2 ** i for i in range(len(channels))], dtype=int)
        out = [layers[-1]]
        for i in range(len(channels) - 1):
            j = -i - 2
            ida = IDAUp(channels[j],
                        tuple(int(s) for s in scales[j:] // scales[j]),
                        node=self.node, dtype=self.dtype,
                        base_stride=2 ** (self.startp
                                          + len(channels) + j),
                        name=f"ida_{i}")
            layers[j:] = ida(layers[j:], train=train)
            out.insert(0, layers[-1])
            scales[j + 1:] = scales[j]
        return out


class DLASeg(nn.Module):
    """Full DLA backbone + neck producing one stride-4 feature map
    (reference: dla.py:594-641)."""
    num_layers: int = 34
    dla_node: str = "dcn"
    with_pre_img: bool = False
    with_pre_hm: bool = False
    last_level: int = 5
    down_ratio: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        levels, channels, block = DLA_CONFIGS[self.num_layers]
        first_level = int(np.log2(self.down_ratio))
        base = DLA(levels, channels, block,
                   with_pre_img=self.with_pre_img,
                   with_pre_hm=self.with_pre_hm, dtype=self.dtype,
                   name="base")
        feats = base(x, pre_img, pre_hm, train=train)
        dla_up = DLAUp(first_level, channels[first_level:],
                       node=self.dla_node, dtype=self.dtype,
                       name="dla_up")
        out = dla_up(feats[first_level:], train=train)
        y = out[: self.last_level - first_level]
        ida_up = IDAUp(
            channels[first_level],
            tuple(2 ** i for i in range(self.last_level - first_level)),
            node=self.dla_node, dtype=self.dtype,
            base_stride=2 ** first_level, name="ida_up")
        y = ida_up(y, train=train)
        return [y[-1]]
