"""Legacy CenterNet-era DLA variant (`dlav0_34`)
(reference: src/lib/model/networks/dlav0.py).

Same DLA tree backbone; the up-path is a plain-conv IDAUp (no DCN):
per level 1x1 proj conv + bilinear upsample, pairwise 3x3 node merges,
single stride-4 output map.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from centertrack_tpu.models.dla import DLA, DLA_CONFIGS
from centertrack_tpu.models.layers import ConvBNAct, UpBilinear


class IDAUpV0(nn.Module):
    """(reference: dlav0.py:441-496)"""
    out_dim: int
    up_factors: tuple
    dtype: object = None

    @nn.compact
    def __call__(self, layers, train: bool = False):
        layers = list(layers)
        for i, f in enumerate(self.up_factors):
            x = layers[i]
            if x.shape[-1] != self.out_dim:
                x = ConvBNAct(self.out_dim, 1, 1, act=True, dtype=self.dtype,
                              name=f"proj_{i}")(x, train)
            if f > 1:
                x = UpBilinear(self.out_dim, int(f), dtype=self.dtype,
                               name=f"up_{i}")(x)
            layers[i] = x
        x = layers[0]
        for i in range(1, len(layers)):
            x = ConvBNAct(self.out_dim, 3, 1, act=True, dtype=self.dtype,
                          name=f"node_{i}")(
                jnp.concatenate([x, layers[i]], axis=-1), train)
            layers[i] = x
        return x, layers


class DLAUpV0(nn.Module):
    """(reference: dlav0.py:499-524)"""
    channels: tuple
    dtype: object = None

    @nn.compact
    def __call__(self, layers, train: bool = False):
        layers = list(layers)
        channels = list(self.channels)
        scales = np.array([2 ** i for i in range(len(channels))], int)
        for i in range(len(layers) - 1):
            j = -i - 2
            x, sub = IDAUpV0(
                channels[j],
                tuple(int(s) for s in scales[j:] // scales[j]),
                dtype=self.dtype,
                name=f"ida_{i}")(layers[j:], train=train)
            layers[j:] = sub
            scales[j + 1:] = scales[j]
            channels[j + 1:] = [channels[j]] * len(channels[j + 1:])
        return x


class DLASegV0(nn.Module):
    """(reference: dlav0.py:530-555). Output: stride-4 map with
    channels[first_level] features."""
    num_layers: int = 34
    with_pre_img: bool = False
    with_pre_hm: bool = False
    down_ratio: int = 4
    dtype: object = None

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        levels, channels, block = DLA_CONFIGS[self.num_layers]
        first_level = int(np.log2(self.down_ratio))
        feats = DLA(levels, channels, block,
                    with_pre_img=self.with_pre_img,
                    with_pre_hm=self.with_pre_hm, dtype=self.dtype,
                    name="base")(
            x, pre_img, pre_hm, train=train)
        out = DLAUpV0(tuple(channels[first_level:]), dtype=self.dtype,
                      name="dla_up")(
            feats[first_level:], train=train)
        return [out]
