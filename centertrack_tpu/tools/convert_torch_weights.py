"""Reference .pth checkpoint -> centertrack_tpu params converter.

Maps the reference's torch state_dict naming scheme
(reference: src/lib/model/model.py:31-71 + the networks/ module trees)
onto this repo's flax param/batch_stats trees, so models trained with
the reference can be evaluated here. Supported archs: dla_34, dlav0,
resdcn_*, res_*, and generic MobileNetV2+DLAUp ("mobilenet"); each is
pinned by an activation-parity test in tests/test_torch_parity.py.

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


def _deconv_w(w):
    """torch ConvTranspose2d FULL weight (in, out, kh, kw) -> flax
    nn.ConvTranspose kernel (kh, kw, in, out). lax.conv_transpose
    applies the kernel unflipped (cross-correlation on the dilated
    input) while torch flips it, so the spatial dims reverse here.
    Pinned numerically by tests/test_torch_parity.py."""
    w = np.transpose(np.asarray(w), (2, 3, 0, 1))
    return w[::-1, ::-1].copy()


def _strip_module(state_dict):
    return {k[7:] if k.startswith("module.") else k: v
            for k, v in state_dict.items()}


def _convert_dla_base(sd, out, used, src_prefix="base",
                      dst_prefix="backbone/base"):
    """DLA tree backbone shared by dla_34 and dlav0 (torch names
    base.base_layer/level0/level1/levelN trees). src_prefix="" handles
    backbone-only checkpoints (upstream ImageNet DLA,
    reference: src/lib/model/networks/dla.py:318-329, whose keys are
    unprefixed base_layer/levelN)."""

    def take(name):
        used.add(name)
        return sd[name]

    def conv_bn(src_conv, src_bn, dst):
        out.conv(f"{dst}/conv", take(f"{src_conv}.weight"))
        out.bn(f"{dst}/bn", take(f"{src_bn}.weight"),
               take(f"{src_bn}.bias"), take(f"{src_bn}.running_mean"),
               take(f"{src_bn}.running_var"))

    def block(src, dst):
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

    b = f"{src_prefix}." if src_prefix else ""
    d = dst_prefix
    conv_bn(f"{b}base_layer.0", f"{b}base_layer.1", f"{d}/base_layer")
    for stem in ("pre_img_layer", "pre_hm_layer"):
        if f"{b}{stem}.0.weight" in sd:
            conv_bn(f"{b}{stem}.0", f"{b}{stem}.1", f"{d}/{stem}")
    conv_bn(f"{b}level0.0", f"{b}level0.1", f"{d}/level0_0")
    conv_bn(f"{b}level1.0", f"{b}level1.1", f"{d}/level1_0")
    tree(f"{b}level2", f"{d}/level2", 1)
    tree(f"{b}level3", f"{d}/level3", 2)
    tree(f"{b}level4", f"{d}/level4", 2)
    tree(f"{b}level5", f"{d}/level5", 1)


def _convert_heads(sd, out, used, skip_prefixes):
    """Torch head Sequentials (conv/relu alternating) -> heads/<name>."""

    def take(name):
        used.add(name)
        return sd[name]

    head_names = sorted({k.split(".")[0] for k in sd
                         if "." in k and not k.startswith(skip_prefixes)})
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


def convert_dla34(state_dict: Dict[str, np.ndarray]
                  ) -> Tuple[Dict, Dict, list]:
    """Returns (params, batch_stats, unused_keys)."""
    sd = _strip_module(state_dict)
    out = TreeWriter()
    used = set()

    def take(name):
        used.add(name)
        return sd[name]

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
    _convert_dla_base(sd, out, used)

    # --- neck -----------------------------------------------------
    ida("dla_up.ida_0", "backbone/dla_up/ida_0", 2)
    ida("dla_up.ida_1", "backbone/dla_up/ida_1", 3)
    ida("dla_up.ida_2", "backbone/dla_up/ida_2", 4)
    ida("ida_up", "backbone/ida_up", 3)

    # --- heads ----------------------------------------------------
    _convert_heads(sd, out, used, ("base", "dla_up", "ida_up"))

    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


def convert_dlav0(state_dict: Dict[str, np.ndarray], num_layers=34
                  ) -> Tuple[Dict, Dict, list]:
    """DLASegv0: DLA tree base + plain-conv IDAUp pyramid
    (reference: src/lib/model/networks/dlav0.py:440-556). proj/node are
    conv+BN Sequentials, up_* are depthwise bilinear ConvTransposes;
    Identity stages (matching channels / factor 1) have no params on
    either side."""
    sd = _strip_module(state_dict)
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

    _convert_dla_base(sd, out, used)
    for i in range(3):  # ida_0..ida_2 over 2/3/4 levels
        src = f"dla_up.ida_{i}"
        dst = f"backbone/dla_up/ida_{i}"
        for j in range(1, i + 2):
            if f"{src}.proj_{j}.0.weight" in sd:
                conv_bn(f"{src}.proj_{j}.0", f"{src}.proj_{j}.1",
                        f"{dst}/proj_{j}")
            if f"{src}.up_{j}.weight" in sd:
                out._set(out.params, f"{dst}/up_{j}/kernel",
                         _up_w(take(f"{src}.up_{j}.weight")))
            conv_bn(f"{src}.node_{j}.0", f"{src}.node_{j}.1",
                    f"{dst}/node_{j}")

    _convert_heads(sd, out, used, ("base", "dla_up"))
    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


def _convert_res_trunk(sd, out, used, num_layers, src_prefix="",
                       dst_prefix="backbone/trunk"):
    """Torch resnet trunk (conv1/bn1/layerL.B.*), shared by res/resdcn
    (reference: resdcn.py:145-196, resnet.py:134-211) and the generic
    resnet backbone (backbones/resnet.py:110-169)."""

    def take(name):
        used.add(name)
        return sd[name]

    def conv_bn(src_conv, src_bn, dst):
        out.conv(f"{dst}/conv", take(f"{src_conv}.weight"))
        out.bn(f"{dst}/bn", take(f"{src_bn}.weight"),
               take(f"{src_bn}.bias"), take(f"{src_bn}.running_mean"),
               take(f"{src_bn}.running_var"))

    blocks_of = {18: (2, 2, 2, 2), 34: (3, 4, 6, 3),
                 50: (3, 4, 6, 3), 101: (3, 4, 23, 3)}[num_layers]
    bottleneck = num_layers >= 50
    p, d = src_prefix, dst_prefix

    conv_bn(f"{p}conv1", f"{p}bn1", f"{d}/conv1")
    for stem in ("pre_img_layer", "pre_hm_layer"):
        if f"{p}{stem}.0.weight" in sd:
            conv_bn(f"{p}{stem}.0", f"{p}{stem}.1", f"{d}/{stem}")
    for li, nb in enumerate(blocks_of):
        for bi in range(nb):
            src = f"{p}layer{li + 1}.{bi}"
            dst = f"{d}/layer{li + 1}_{bi}"
            n_convs = 3 if bottleneck else 2
            for ci in range(1, n_convs + 1):
                conv_bn(f"{src}.conv{ci}", f"{src}.bn{ci}",
                        f"{dst}/conv{ci}")
            if f"{src}.downsample.0.weight" in sd:
                conv_bn(f"{src}.downsample.0", f"{src}.downsample.1",
                        f"{dst}/downsample")


def _convert_mobilenet_trunk(sd, out, used, src_prefix="",
                             dst_prefix="backbone/backbone"):
    """MobileNetV2 inverted-residual trunk (torchvision `features.N`
    names, which the reference's backbone reuses —
    backbones/mobilenet.py:130-176). src_prefix="" handles a raw
    torchvision ImageNet checkpoint (classifier.* left unused)."""

    def take(name):
        used.add(name)
        return sd[name]

    def conv_bn(src_conv, src_bn, dst):
        out.conv(f"{dst}/conv", take(f"{src_conv}.weight"))
        out.bn(f"{dst}/bn", take(f"{src_bn}.weight"),
               take(f"{src_bn}.bias"), take(f"{src_bn}.running_mean"),
               take(f"{src_bn}.running_var"))

    b = f"{src_prefix}." if src_prefix else ""
    d = dst_prefix
    conv_bn(f"{b}features.0.0", f"{b}features.0.1", f"{d}/stem")
    for stem in ("pre_img_layer", "pre_hm_layer"):
        if f"{b}{stem}.0.weight" in sd:
            conv_bn(f"{b}{stem}.0", f"{b}{stem}.1", f"{d}/{stem}")
    fi = 1
    while f"{b}features.{fi}.conv.0.0.weight" in sd:
        src = f"{b}features.{fi}.conv"
        dst = f"{d}/block_{fi - 1}"
        # expand_ratio==1 blocks have no pw stage: [dw, pwlin, bn];
        # others: [pw, dw, pwlin, bn] (mobilenet.py:61-72)
        has_pw = f"{src}.3.weight" in sd
        o = 0
        if has_pw:
            conv_bn(f"{src}.0.0", f"{src}.0.1", f"{dst}/pw")
            o = 1
        conv_bn(f"{src}.{o}.0", f"{src}.{o}.1", f"{dst}/dw")
        conv_bn(f"{src}.{o + 1}", f"{src}.{o + 2}", f"{dst}/pw_linear")
        fi += 1


def convert_backbone(state_dict: Dict[str, np.ndarray], kind: str,
                     num_layers: int = 34, arch: str = "dla_34"
                     ) -> Tuple[Dict, Dict, list]:
    """Backbone-ONLY (ImageNet pretrain) checkpoint -> partial param
    tree for `arch`. This reproduces the reference's pretrain->finetune
    entry points, which download ImageNet trunks at model build time
    (DLA: dla.py:318-329; resnet: resnet.py:145-150 via model_zoo;
    mobilenet: backbones/mobilenet.py:175-176):

      kind "dla":       upstream ImageNet DLA-34 (unprefixed
                        base_layer/levelN keys + an unused fc head)
      kind "res":       torchvision resnet18/34/50/101
      kind "mobilenet": torchvision mobilenet_v2

    The result is saved like a normal checkpoint; `load_model` merges
    it onto a freshly-initialized model, leaving every non-backbone
    leaf (neck, heads, temporal stems) at its fresh init — the same
    partial-load semantics the reference gets from strict=False
    loading. Returns (params, batch_stats, unused_keys)."""
    sd = _strip_module(state_dict)
    out = TreeWriter()
    used = set()
    base_arch = arch.partition("_")[0]
    if kind == "dla":
        dst = ("backbone/backbone/base" if base_arch == "generic"
               else "backbone/base")
        _convert_dla_base(sd, out, used, src_prefix="", dst_prefix=dst)
    elif kind == "res":
        dst = ("backbone/backbone" if base_arch == "generic"
               else "backbone/trunk")
        _convert_res_trunk(sd, out, used, num_layers, src_prefix="",
                           dst_prefix=dst)
    elif kind == "mobilenet":
        _convert_mobilenet_trunk(sd, out, used, src_prefix="",
                                 dst_prefix="backbone/backbone")
    else:
        raise ValueError(f"unknown backbone kind {kind}")
    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


def _convert_res_common(sd, out, used, num_layers):
    """Trunk + heads shared by res/resdcn."""
    _convert_res_trunk(sd, out, used, num_layers)
    _convert_heads(sd, out, used,
                   ("conv1", "bn1", "layer", "deconv_layers",
                    "pre_img_layer", "pre_hm_layer", "base", "fc"))


def convert_resdcn(state_dict: Dict[str, np.ndarray], num_layers=18
                   ) -> Tuple[Dict, Dict, list]:
    """PoseResDCN: trunk + 3x (DCN -> BN -> ReLU -> deconv -> BN ->
    ReLU) stages, deconv_layers indices (0,1,3,4) + 6*i
    (reference: resdcn.py:236-266)."""
    sd = _strip_module(state_dict)
    out = TreeWriter()
    used = set()

    def take(name):
        used.add(name)
        return sd[name]

    _convert_res_common(sd, out, used, num_layers)
    for i in range(3):
        base = f"deconv_layers.{6 * i}"
        out._set(out.params, f"backbone/dcn_{i}/conv_offset_mask/kernel",
                 _dcn_offset_mask_w(take(f"{base}.conv_offset_mask.weight")))
        out._set(out.params, f"backbone/dcn_{i}/conv_offset_mask/bias",
                 _dcn_offset_mask_b(take(f"{base}.conv_offset_mask.bias")))
        out._set(out.params, f"backbone/dcn_{i}/weight",
                 _conv_w(take(f"{base}.weight")))
        out._set(out.params, f"backbone/dcn_{i}/bias",
                 take(f"{base}.bias"))
        bn1 = f"deconv_layers.{6 * i + 1}"
        out.bn(f"backbone/dcn_bn_{i}", take(f"{bn1}.weight"),
               take(f"{bn1}.bias"), take(f"{bn1}.running_mean"),
               take(f"{bn1}.running_var"))
        out._set(out.params, f"backbone/up_{i}/kernel",
                 _deconv_w(take(f"deconv_layers.{6 * i + 3}.weight")))
        bn2 = f"deconv_layers.{6 * i + 4}"
        out.bn(f"backbone/up_bn_{i}", take(f"{bn2}.weight"),
               take(f"{bn2}.bias"), take(f"{bn2}.running_mean"),
               take(f"{bn2}.running_var"))

    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


def convert_res(state_dict: Dict[str, np.ndarray], num_layers=18
                ) -> Tuple[Dict, Dict, list]:
    """PoseResNet: trunk + 3x (deconv -> BN -> ReLU), deconv_layers
    indices (0,1) + 3*i (reference: resnet.py:176-201)."""
    sd = _strip_module(state_dict)
    out = TreeWriter()
    used = set()

    def take(name):
        used.add(name)
        return sd[name]

    _convert_res_common(sd, out, used, num_layers)
    for i in range(3):
        out._set(out.params, f"backbone/deconv_{i}/kernel",
                 _deconv_w(take(f"deconv_layers.{3 * i}.weight")))
        bn = f"deconv_layers.{3 * i + 1}"
        out.bn(f"backbone/deconv_bn_{i}", take(f"{bn}.weight"),
               take(f"{bn}.bias"), take(f"{bn}.running_mean"),
               take(f"{bn}.running_var"))

    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


def convert_generic(state_dict: Dict[str, np.ndarray],
                    backbone: str = "mobilenet", neck: str = "dlaup",
                    num_layers: int = 18) -> Tuple[Dict, Dict, list]:
    """GenericNetwork: any reference backbone x neck combination
    (reference: networks/generic_network.py + backbones/{mobilenet,
    resnet, dla}.py + necks/{dlaup, msraup}.py). Torch tree:
    backbone.* / neck.* / <head> Sequentials."""
    sd = _strip_module(state_dict)
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

    bb = "backbone"
    dst_bb = "backbone/backbone"
    if backbone == "mobilenet":
        _convert_mobilenet_trunk(sd, out, used, src_prefix=bb,
                                 dst_prefix=dst_bb)
    elif backbone == "resnet":
        _convert_res_trunk(sd, out, used, num_layers,
                           src_prefix="backbone.", dst_prefix=dst_bb)
    elif backbone == "dla34":
        _convert_dla_base(sd, out, used, src_prefix="backbone",
                          dst_prefix=f"{dst_bb}/base")
    else:
        raise ValueError(f"unknown generic backbone {backbone}")

    def dcn_layer(src, dst):
        out._set(out.params, f"{dst}/conv_offset_mask/kernel",
                 _dcn_offset_mask_w(take(f"{src}.conv_offset_mask.weight")))
        out._set(out.params, f"{dst}/conv_offset_mask/bias",
                 _dcn_offset_mask_b(take(f"{src}.conv_offset_mask.bias")))
        out._set(out.params, f"{dst}/weight",
                 _conv_w(take(f"{src}.weight")))
        out._set(out.params, f"{dst}/bias", take(f"{src}.bias"))

    if neck == "dlaup":
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

        ida("neck.dla_up.ida_0", "backbone/neck/dla_up/ida_0", 2)
        ida("neck.dla_up.ida_1", "backbone/neck/dla_up/ida_1", 3)
        ida("neck.dla_up.ida_2", "backbone/neck/dla_up/ida_2", 4)
        ida("neck.ida_up", "backbone/neck/ida_up", 3)
    elif neck == "msraup":
        # 3x (DCN, BN, ReLU, deconv, BN, ReLU) at deconv_layers indices
        # (0,1,3,4)+6i (msraup.py:90-131)
        for i in range(3):
            base = f"neck.deconv_layers.{6 * i}"
            dcn_layer(base, f"backbone/neck/dcn_{i}")
            bn1 = f"neck.deconv_layers.{6 * i + 1}"
            out.bn(f"backbone/neck/dcn_bn_{i}", take(f"{bn1}.weight"),
                   take(f"{bn1}.bias"), take(f"{bn1}.running_mean"),
                   take(f"{bn1}.running_var"))
            out._set(out.params, f"backbone/neck/up_{i}/kernel",
                     _deconv_w(take(f"neck.deconv_layers.{6 * i + 3}"
                                    ".weight")))
            bn2 = f"neck.deconv_layers.{6 * i + 4}"
            out.bn(f"backbone/neck/up_bn_{i}", take(f"{bn2}.weight"),
                   take(f"{bn2}.bias"), take(f"{bn2}.running_mean"),
                   take(f"{bn2}.running_var"))
    else:
        raise ValueError(f"unknown generic neck {neck}")

    _convert_heads(sd, out, used, ("backbone", "neck"))
    unused = [k for k in sd if k not in used and "num_batches" not in k]
    return out.params, out.stats, unused


# back-compat alias
def convert_generic_mobilenet_dlaup(state_dict, num_layers=0):
    return convert_generic(state_dict, "mobilenet", "dlaup")


# ---------------------------------------------------------------------------
# Inverse direction: flax checkpoint -> torch state_dict.
# ---------------------------------------------------------------------------

def _flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(_flatten_tree(v, p))
        else:
            out[p] = v
    return out


def invert_to_torch(params, batch_stats, template_sd, convert_fn):
    """Map a flax (params, batch_stats) checkpoint back onto the
    reference's torch state_dict naming scheme.

    Works for ANY of this module's converters without duplicating their
    mapping logic: `template_sd` (a torch state_dict of the target
    architecture, values only used for shapes) is re-filled with global
    element indices and pushed through `convert_fn`; each flax leaf
    then records exactly which torch element every one of its values
    came from, and the real leaves are scattered back through that
    permutation. Layout-only converters (transpose/flip/reorder — all
    of this module) invert exactly; any arithmetic transform would
    break the integer probe and is detected.

    Intended for parity testing (running reference tooling on weights
    trained here, e.g. tests/test_full_pipeline_parity.py); the forward
    direction remains the production path (reference checkpoints in,
    src/lib/model/model.py:31-71 naming).

    Returns {torch_name: np.ndarray}. Tensors the converter never reads
    (e.g. num_batches_tracked) keep their template values.
    """
    shapes = {k: np.asarray(v).shape for k, v in template_sd.items()}
    spans, probe_sd, off = {}, {}, 0
    for name, shp in shapes.items():
        size = int(np.prod(shp)) if shp else 1
        probe_sd[name] = np.arange(
            off, off + size, dtype=np.float64).reshape(shp)
        spans[name] = (off, off + size)
        off += size

    probe_params, probe_stats, _ = convert_fn(probe_sd)
    probe = _flatten_tree(probe_params)
    probe.update({f"stats/{k}": v
                  for k, v in _flatten_tree(probe_stats).items()})
    real = _flatten_tree(params)
    real.update({f"stats/{k}": v
                 for k, v in _flatten_tree(batch_stats).items()})

    flat = np.full(off, np.nan, np.float64)
    for path, pleaf in probe.items():
        assert path in real, f"flax tree missing converted leaf {path}"
        ids = np.asarray(pleaf)
        int_ids = np.round(ids).astype(np.int64)
        assert np.array_equal(ids, int_ids), \
            f"{path}: converter applied arithmetic, cannot invert"
        rleaf = np.asarray(real[path], np.float64)
        assert rleaf.shape == ids.shape, \
            f"{path}: shape {rleaf.shape} vs probe {ids.shape}"
        flat[int_ids.ravel()] = rleaf.ravel()

    out = {}
    for name, shp in shapes.items():
        lo, hi = spans[name]
        vals = flat[lo:hi]
        nan = np.isnan(vals)
        if nan.all():  # fully untouched by the converter
            out[name] = np.asarray(template_sd[name])
        elif nan.any():
            # partially consumed: silently reverting to template would
            # hand the parity comparison random-init values for the
            # consumed slice — fail loudly instead
            raise ValueError(
                f"invert_to_torch: {name} is only partially covered by "
                f"the converter ({int(nan.sum())}/{vals.size} elements "
                f"untouched); cannot invert faithfully")
        else:
            t = np.asarray(template_sd[name])
            out[name] = vals.reshape(shp).astype(
                t.dtype if np.issubdtype(t.dtype, np.floating)
                else np.float32)
    return out


CONVERTERS = {
    "dla": lambda sd, n: convert_dla34(sd),
    "dlav0": convert_dlav0,
    "resdcn": convert_resdcn,
    "res": convert_res,
}


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--arch", default="dla_34")
    p.add_argument("--backbone", default="mobilenet",
                   help="for --arch generic")
    p.add_argument("--neck", default="dlaup", help="for --arch generic")
    p.add_argument("--backbone_only", default="",
                   choices=["", "dla", "res", "mobilenet"],
                   help="treat --pth as a backbone-only ImageNet "
                        "pretrain of this kind (for cli/main.py "
                        "--load_backbone)")
    args = p.parse_args()
    import torch
    payload = torch.load(args.pth, map_location="cpu",
                         weights_only=False)
    sd = payload.get("state_dict", payload)
    sd = {k: v.numpy() for k, v in sd.items()}
    base, _, depth = args.arch.partition("_")
    if args.backbone_only:
        params, stats, unused = convert_backbone(
            sd, args.backbone_only, int(depth or 18), args.arch)
    elif base == "generic":
        params, stats, unused = convert_generic(
            sd, args.backbone, args.neck, int(depth or 18))
    else:
        assert base in CONVERTERS, \
            f"converter supports {sorted(CONVERTERS)} + generic, " \
            f"got {base}"
        params, stats, unused = CONVERTERS[base](sd, int(depth or 18))
    if unused:
        print(f"WARNING: {len(unused)} unconverted keys, e.g. "
              f"{unused[:5]}")
    from centertrack_tpu.models.model import save_model
    save_model(args.out, payload.get("epoch", 0), params, stats)
    print(f"converted -> {args.out}")


if __name__ == "__main__":
    main()
