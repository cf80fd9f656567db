"""Output-head factory (reference: src/lib/model/networks/base_model.py).

Each head is: 3x3 conv(head_conv[0]) -> ReLU -> [1x1 conv -> ReLU]* ->
1x1 out conv. 'hm' heads get their final bias filled with ``prior_bias``
(-4.6) so the initial heatmap sigmoid is ~1e-2
(reference: base_model.py:24-65, opts.py:103).
"""

from __future__ import annotations

from typing import Dict, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp


class Head(nn.Module):
    out_features: int
    convs: Tuple[int, ...]
    head_kernel: int = 3
    prior_bias: float | None = None  # set for 'hm' heads
    dtype: object = None

    @nn.compact
    def __call__(self, x):
        bias_init = (nn.initializers.constant(self.prior_bias)
                     if self.prior_bias is not None
                     else nn.initializers.zeros)
        if len(self.convs) > 0:
            k = self.head_kernel
            x = nn.Conv(self.convs[0], (k, k),
                        padding=((k // 2, k // 2), (k // 2, k // 2)),
                        dtype=self.dtype, name="conv_0")(x)
            x = nn.relu(x)
            for i, c in enumerate(self.convs[1:], start=1):
                x = nn.Conv(c, (1, 1), dtype=self.dtype,
                            name=f"conv_{i}")(x)
                x = nn.relu(x)
            x = nn.Conv(self.out_features, (1, 1), bias_init=bias_init,
                        dtype=self.dtype, name="out")(x)
        else:
            x = nn.Conv(self.out_features, (1, 1), bias_init=bias_init,
                        dtype=self.dtype, name="out")(x)
        return x


class HeadSet(nn.Module):
    """Applies every head to a feature map -> dict of NHWC maps."""
    heads: Tuple[Tuple[str, int], ...]
    head_convs: Tuple[Tuple[str, Tuple[int, ...]], ...]
    head_kernel: int = 3
    prior_bias: float = -4.6
    dtype: object = None

    @nn.compact
    def __call__(self, feat) -> Dict[str, jnp.ndarray]:
        head_convs = dict(self.head_convs)
        out = {}
        for name, classes in self.heads:
            prior = self.prior_bias if "hm" in name else None
            out[name] = Head(classes, tuple(head_convs.get(name, ())),
                             self.head_kernel, prior, dtype=self.dtype,
                             name=name)(feat)
            out[name] = out[name].astype(jnp.float32)
        return out
