"""Reference .pth checkpoint -> centertrack_tpu params converter.

Maps the reference's torch state_dict naming scheme
(reference: src/lib/model/model.py:31-71, networks/dla.py module tree)
onto this repo's flax param/batch_stats trees for the dla_34 arch, so
models trained with the reference can be evaluated here.

Layout conversions:
  * conv weight (O, I, kh, kw)      -> (kh, kw, I, O)
  * depthwise ConvTranspose (C,1,k,k) -> UpBilinear kernel (k,k,1,C)
  * BatchNorm weight/bias/running_* -> bn scale/bias + stats mean/var
  * DCN conv_offset_mask channels: IDENTITY. Upstream DCNv2's
    chunk(3)/cat((o1,o2)) is a layout no-op and its CUDA kernel reads
    offset channel 2t as dy and 2t+1 as dx of tap t (taps row-major),
    i.e. already interleaved per tap, with mask in channels 18..26 —
    exactly the layout ops/dcn.py consumes. Verified numerically in
    tests/test_torch_parity.py against a torch re-implementation of
    the CUDA kernel's indexing.

Usage:
  python -m centertrack_tpu.tools.convert_torch_weights \
      --pth model_best.pth --arch dla_34 --out converted.ckpt \
      [--task tracking --dataset mot]
"""

from __future__ import annotations

import argparse
from typing import Dict, Tuple

import numpy as np


def _conv_w(w):
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _dcn_offset_mask_w(w):
    """Upstream offset/mask channel order already matches ops/dcn.py
    (interleaved (dy,dx) per tap, then 9 mask channels) — only the
    conv-kernel layout transpose applies. See module docstring."""
    return _conv_w(np.asarray(w))


def _dcn_offset_mask_b(b):
    return np.asarray(b)


def _up_w(w):
    # torch ConvTranspose2d depthwise (C, 1, k, k) -> (k, k, 1, C),
    # SPATIALLY FLIPPED: ConvTranspose(x, w, stride s, pad p) ==
    # Conv(dilate_s(x), flip(w), pad k-1-p), and UpBilinear runs the
    # latter (cross-correlation over an lhs-dilated input). The
    # reference's bilinear init is flip-symmetric, so this only shows
    # up on trained (asymmetric) weights.
    w = np.transpose(np.asarray(w), (2, 3, 1, 0))
    return w[::-1, ::-1].copy()


class TreeWriter:
    def __init__(self):
        self.params: Dict = {}
        self.stats: Dict = {}

    def _set(self, root, path, value):
        node = root
        parts = path.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = np.asarray(value)

    def conv(self, prefix, w, b=None):
        self._set(self.params, f"{prefix}/kernel", _conv_w(w))
        if b is not None:
            self._set(self.params, f"{prefix}/bias", np.asarray(b))

    def bn(self, prefix, weight, bias, mean, var):
        self._set(self.params, f"{prefix}/scale", np.asarray(weight))
        self._set(self.params, f"{prefix}/bias", np.asarray(bias))
        self._set(self.stats, f"{prefix}/mean", np.asarray(mean))
        self._set(self.stats, f"{prefix}/var", np.asarray(var))


def convert_dla34(state_dict: Dict[str, np.ndarray]
                  ) -> Tuple[Dict, Dict, list]:
    """Returns (params, batch_stats, unused_keys)."""
    sd = {k[7:] if k.startswith("module.") else k: v
          for k, v in state_dict.items()}
    out = TreeWriter()
    used = set()

    def take(name):
        used.add(name)
        return sd[name]

    def conv_bn(src_conv, src_bn, dst):
        out.conv(f"{dst}/conv", take(f"{src_conv}.weight"))
        out.bn(f"{dst}/bn", take(f"{src_bn}.weight"),
               take(f"{src_bn}.bias"), take(f"{src_bn}.running_mean"),
               take(f"{src_bn}.running_var"))

    def block(src, dst):
        # BasicBlock: conv1/bn1 conv2/bn2
        conv_bn(f"{src}.conv1", f"{src}.bn1", f"{dst}/conv1")
        conv_bn(f"{src}.conv2", f"{src}.bn2", f"{dst}/conv2")

    def tree(src, dst, levels):
        if levels == 1:
            block(f"{src}.tree1", f"{dst}/tree1")
            block(f"{src}.tree2", f"{dst}/tree2")
            conv_bn(f"{src}.root.conv", f"{src}.root.bn",
                    f"{dst}/root/conv")
        else:
            tree(f"{src}.tree1", f"{dst}/tree1", levels - 1)
            tree(f"{src}.tree2", f"{dst}/tree2", levels - 1)
        if f"{src}.project.0.weight" in sd:
            conv_bn(f"{src}.project.0", f"{src}.project.1",
                    f"{dst}/project")

    def dcn_layer(src, dst):
        out._set(out.params, f"{dst}/conv_offset_mask/kernel",
                 _dcn_offset_mask_w(take(f"{src}.conv_offset_mask.weight")))
        out._set(out.params, f"{dst}/conv_offset_mask/bias",
                 _dcn_offset_mask_b(take(f"{src}.conv_offset_mask.bias")))
        out._set(out.params, f"{dst}/weight",
                 _conv_w(take(f"{src}.weight")))
        out._set(out.params, f"{dst}/bias", take(f"{src}.bias"))

    def deform_node(src, dst):
        dcn_layer(f"{src}.conv", f"{dst}/conv")
        out.bn(f"{dst}/actf_bn", take(f"{src}.actf.0.weight"),
               take(f"{src}.actf.0.bias"),
               take(f"{src}.actf.0.running_mean"),
               take(f"{src}.actf.0.running_var"))

    def ida(src, dst, n):
        for i in range(1, n):
            deform_node(f"{src}.proj_{i}", f"{dst}/proj_{i}")
            deform_node(f"{src}.node_{i}", f"{dst}/node_{i}")
            out._set(out.params, f"{dst}/up_{i}/kernel",
                     _up_w(take(f"{src}.up_{i}.weight")))

    # --- base -----------------------------------------------------
    conv_bn("base.base_layer.0", "base.base_layer.1",
            "backbone/base/base_layer")
    for stem in ("pre_img_layer", "pre_hm_layer"):
        if f"base.{stem}.0.weight" in sd:
            conv_bn(f"base.{stem}.0", f"base.{stem}.1",
                    f"backbone/base/{stem}")
    conv_bn("base.level0.0", "base.level0.1", "backbone/base/level0_0")
    conv_bn("base.level1.0", "base.level1.1", "backbone/base/level1_0")
    tree("base.level2", "backbone/base/level2", 1)
    tree("base.level3", "backbone/base/level3", 2)
    tree("base.level4", "backbone/base/level4", 2)
    tree("base.level5", "backbone/base/level5", 1)

    # --- neck -----------------------------------------------------
    ida("dla_up.ida_0", "backbone/dla_up/ida_0", 2)
    ida("dla_up.ida_1", "backbone/dla_up/ida_1", 3)
    ida("dla_up.ida_2", "backbone/dla_up/ida_2", 4)
    ida("ida_up", "backbone/ida_up", 3)

    # --- heads ----------------------------------------------------
    head_names = sorted({k.split(".")[0] for k in sd
                         if "." in k and not k.startswith(
                             ("base", "dla_up", "ida_up"))})
    for head in head_names:
        idx = 0
        ci = 0
        while f"{head}.{idx}.weight" in sd:
            nxt = f"{head}.{idx + 2}.weight"
            dst = (f"heads/{head}/out" if nxt not in sd
                   else f"heads/{head}/conv_{ci}")
            out.conv(dst, take(f"{head}.{idx}.weight"),
                     take(f"{head}.{idx}.bias"))
            idx += 2
            ci += 1

    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--arch", default="dla_34")
    args = p.parse_args()
    import torch
    payload = torch.load(args.pth, map_location="cpu",
                         weights_only=False)
    sd = payload.get("state_dict", payload)
    sd = {k: v.numpy() for k, v in sd.items()}
    assert args.arch == "dla_34", "converter currently supports dla_34"
    params, stats, unused = convert_dla34(sd)
    if unused:
        print(f"WARNING: {len(unused)} unconverted keys, e.g. "
              f"{unused[:5]}")
    from centertrack_tpu.models.model import save_model
    save_model(args.out, payload.get("epoch", 0), params, stats)
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
