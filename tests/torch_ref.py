"""Torch-side reference helpers for activation-parity tests.

Provides:
  * ``modulated_deform_conv2d`` — a pure-torch forward reproducing the
    upstream DCNv2 CUDA kernel's semantics exactly (offset channel 2t =
    dy of tap t, 2t+1 = dx; per-corner zero-outside bilinear; mask
    multiply before the conv accumulate). This stands in for the CUDA
    extension, which the reference consumes as a git submodule
    (reference: src/lib/model/networks/dla.py:18-22, 513).
  * ``DCN`` — an nn.Module with the upstream interface and parameter
    names (weight/bias/conv_offset_mask), chunk/cat forward included.
  * ``build_reference_dlaseg`` — imports the REAL reference DLASeg from
    /root/reference/src/lib (injecting ``DCN`` for the absent
    submodule) and constructs it with a CenterTrack head set.

Test-support code only; nothing here ships in the framework.
"""

from __future__ import annotations

import math
import sys

import numpy as np
import torch
from torch import nn

REF_LIB = "/root/reference/src/lib"


def _bilinear_zero_outside(x: torch.Tensor, py: torch.Tensor,
                           px: torch.Tensor) -> torch.Tensor:
    """Sample (B,C,H,W) at float (B,Ho,Wo) positions; corners outside
    the image contribute zero (dmcn_im2col_bilinear semantics)."""
    b, c, h, w = x.shape
    y0 = torch.floor(py)
    x0 = torch.floor(px)
    fy = (py - y0).unsqueeze(1)
    fx = (px - x0).unsqueeze(1)
    y0 = y0.long()
    x0 = x0.long()
    x_flat = x.reshape(b, c, h * w)

    def corner(yi, xi):
        valid = (yi >= 0) & (yi < h) & (xi >= 0) & (xi < w)
        idx = (yi.clamp(0, h - 1) * w + xi.clamp(0, w - 1))
        vals = torch.gather(
            x_flat, 2, idx.reshape(b, 1, -1).expand(b, c, -1))
        vals = vals.reshape(b, c, *yi.shape[1:])
        return vals * valid.unsqueeze(1).to(x.dtype)

    v00 = corner(y0, x0)
    v01 = corner(y0, x0 + 1)
    v10 = corner(y0 + 1, x0)
    v11 = corner(y0 + 1, x0 + 1)
    return (v00 * (1 - fy) * (1 - fx) + v01 * (1 - fy) * fx +
            v10 * fy * (1 - fx) + v11 * fy * fx)


def modulated_deform_conv2d(x, offset, mask, weight, bias,
                            stride=1, padding=1, dilation=1):
    """DCNv2 forward, NCHW. offset (B, 2*kh*kw, Ho, Wo) interleaved
    (dy, dx) per tap; mask (B, kh*kw, Ho, Wo) already sigmoided."""
    b, cin, h, w = x.shape
    cout, _, kh, kw = weight.shape
    ho = (h + 2 * padding - dilation * (kh - 1) - 1) // stride + 1
    wo = (w + 2 * padding - dilation * (kw - 1) - 1) // stride + 1
    base_y = (torch.arange(ho, dtype=x.dtype) * stride - padding)
    base_x = (torch.arange(wo, dtype=x.dtype) * stride - padding)
    out = torch.zeros(b, cout, ho, wo, dtype=x.dtype)
    for i in range(kh):
        for j in range(kw):
            t = i * kw + j
            py = base_y[None, :, None] + i * dilation + offset[:, 2 * t]
            px = base_x[None, None, :] + j * dilation + offset[:, 2 * t + 1]
            sampled = _bilinear_zero_outside(x, py, px)
            sampled = sampled * mask[:, t:t + 1]
            out = out + torch.einsum("bchw,oc->bohw", sampled,
                                     weight[:, :, i, j])
    return out + bias.reshape(1, -1, 1, 1)


class DCN(nn.Module):
    """Upstream-interface DCNv2 module (CharlesShang/DCNv2 dcn_v2.DCN),
    forward in pure torch."""

    def __init__(self, chi, cho, kernel_size=(3, 3), stride=1, padding=1,
                 dilation=1, deformable_groups=1):
        super().__init__()
        if isinstance(kernel_size, int):
            kernel_size = (kernel_size, kernel_size)
        assert deformable_groups == 1
        kh, kw = kernel_size
        self.stride, self.padding, self.dilation = stride, padding, dilation
        self.weight = nn.Parameter(torch.empty(cho, chi, kh, kw))
        self.bias = nn.Parameter(torch.zeros(cho))
        self.conv_offset_mask = nn.Conv2d(
            chi, 3 * kh * kw, kernel_size=kernel_size, stride=stride,
            padding=padding, bias=True)
        n = chi * kh * kw
        stdv = 1.0 / math.sqrt(n)
        self.weight.data.uniform_(-stdv, stdv)
        self.bias.data.zero_()
        self.conv_offset_mask.weight.data.zero_()
        self.conv_offset_mask.bias.data.zero_()

    def forward(self, x):
        out = self.conv_offset_mask(x)
        o1, o2, mask = torch.chunk(out, 3, dim=1)
        offset = torch.cat((o1, o2), dim=1)  # layout no-op
        mask = torch.sigmoid(mask)
        return modulated_deform_conv2d(
            x, offset, mask, self.weight, self.bias,
            self.stride, self.padding, self.dilation)


class RefOpt:
    """Minimal opt namespace for the reference model constructors."""
    pre_img = True
    pre_hm = True
    dla_node = "dcn"
    load_model = "x"  # non-empty -> skips the ImageNet download
    head_kernel = 3
    prior_bias = -4.6
    model_output_list = False


def import_reference_networks(module: str):
    """Import a reference networks module (e.g. 'dla') with the DCNv2
    submodule replaced by the pure-torch DCN above."""
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    import importlib
    mod = importlib.import_module(f"model.networks.{module}")
    mod.DCN = DCN
    if hasattr(mod, "DLA_NODE"):
        # rebuild node map in case it captured DCN=None at import time
        pass
    return mod


def build_reference_dlaseg(heads, head_convs, opt=None):
    """Construct the real reference DLASeg (dla_34) with torch-DCN
    nodes. reference: src/lib/model/networks/dla.py:594-641."""
    dla = import_reference_networks("dla")
    if opt is None:
        opt = RefOpt()
    # DeformConv captured the module-global DCN at class-body time only
    # via forward references; __init__ reads the global each call, so
    # patching mod.DCN above suffices.
    model = dla.DLASeg(34, heads, head_convs, opt)
    return model


def randomize_(model: nn.Module, seed: int = 0,
               offset_scale: float = 0.05) -> None:
    """Deterministically randomize every parameter and BN running stat.

    conv_offset_mask weights get a smaller scale so the deformable
    offsets stay O(1) px — large random offsets would sample garbage and
    make the comparison numerically meaningless (while tiny ones would
    not exercise the bilinear path at all).
    """
    g = torch.Generator().manual_seed(seed)
    for name, p in model.named_parameters():
        if "conv_offset_mask" in name:
            p.data = torch.randn(p.shape, generator=g) * offset_scale
        elif p.ndim >= 2:
            # fan-in scaling keeps activation magnitudes O(1) through
            # the 30+ layer stack; a fixed std would blow them up
            # exponentially and make float comparisons meaningless
            fan_in = int(np.prod(p.shape[1:]))
            p.data = torch.randn(p.shape, generator=g) / math.sqrt(fan_in)
        elif "bias" in name:
            p.data = torch.randn(p.shape, generator=g) * 0.1
        else:  # BN scale
            p.data = 1.0 + torch.randn(p.shape, generator=g) * 0.1
    for name, buf in model.named_buffers():
        if name.endswith("running_mean"):
            buf.data = torch.randn(buf.shape, generator=g) * 0.1
        elif name.endswith("running_var"):
            buf.data = 0.5 + torch.rand(buf.shape, generator=g)


def build_reference_resdcn(heads, head_convs, num_layers=18):
    """Construct the real reference PoseResDCN with torch-DCN stages
    (reference: src/lib/model/networks/resdcn.py:145-290). The
    unconditional ImageNet download in init_weights is stubbed out
    (no egress here)."""
    import types
    resdcn = import_reference_networks("resdcn")
    resdcn.model_zoo = types.SimpleNamespace(load_url=lambda url: {})
    opt = RefOpt()
    opt.rgb = False
    model = resdcn.PoseResDCN(num_layers, heads, head_convs, opt)
    # BaseModel.forward reads self.opt.model_output_list but PoseResDCN
    # never stores opt (reference relies on DLASeg-style subclasses
    # doing it) — attach it for the forward pass
    model.opt = opt
    return model


def build_reference_generic(heads, head_convs, backbone="mobilenet",
                            neck="dlaup", num_layers=18,
                            with_pre=True):
    """Construct the real reference GenericNetwork (backbone x neck)
    with the torch-DCN stand-in injected into the neck module
    (reference: src/lib/model/networks/generic_network.py)."""
    if REF_LIB not in sys.path:
        sys.path.insert(0, REF_LIB)
    import importlib
    import types
    # the mobilenet backbone imports torchvision only for the ImageNet
    # download helper — stub it (no egress here anyway)
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tv_m = types.ModuleType("torchvision.models")
        tv_u = types.ModuleType("torchvision.models.utils")
        tv_u.load_state_dict_from_url = lambda *a, **k: {}
        tv.models = tv_m
        tv_m.utils = tv_u
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_m
        sys.modules["torchvision.models.utils"] = tv_u
    dlaup_mod = importlib.import_module("model.networks.necks.dlaup")
    dlaup_mod.DCN = DCN
    msraup_mod = importlib.import_module("model.networks.necks.msraup")
    msraup_mod.DCN = DCN
    # stub the ImageNet pretrained downloads in the backbones
    zoo_stub = types.SimpleNamespace(load_url=lambda *a, **k: {})
    bb_res = importlib.import_module("model.networks.backbones.resnet")
    bb_res.model_zoo = zoo_stub
    # GenericNetwork.forward always passes (x, pre_img, pre_hm), but the
    # stemless Resnet backbone's forward only accepts x — a latent
    # reference bug (it asserts no stems, then passes them anyway).
    # Accept-and-ignore to make the model callable.
    if "pre_img" not in bb_res.Resnet.forward.__code__.co_varnames:
        _orig_res_fwd = bb_res.Resnet.forward
        bb_res.Resnet.forward = (
            lambda self, x, pre_img=None, pre_hm=None:
            _orig_res_fwd(self, x))
    bb_dla = importlib.import_module("model.networks.backbones.dla")
    bb_dla.model_zoo = zoo_stub
    bb_dla.DLA.load_pretrained_model = lambda self, **k: None
    gen = importlib.import_module("model.networks.generic_network")
    opt = RefOpt()
    opt.backbone = backbone
    opt.neck = neck
    opt.num_layers = num_layers
    opt.msra_outchannel = 256
    if not with_pre:  # the generic resnet backbone asserts no stems
        opt.pre_img = False
        opt.pre_hm = False
    model = gen.GenericNetwork(num_layers, heads, head_convs, opt=opt)
    model.opt = opt
    return model


def build_reference_dlav0(heads, head_convs, num_layers=34):
    """Construct the real reference DLASegv0 (plain-conv IDA pyramid,
    reference: src/lib/model/networks/dlav0.py:531-556), stubbing the
    ImageNet download in its dla34(pretrained=True)."""
    import types
    dlav0 = import_reference_networks("dlav0")
    dlav0.model_zoo = types.SimpleNamespace(
        load_url=lambda url, **k: {})
    # load_pretrained_model also reads fc weights after load_url; easier
    # to skip it entirely
    dlav0.DLA.load_pretrained_model = lambda self, **k: None
    opt = RefOpt()
    model = dlav0.DLASegv0(num_layers, heads, head_convs, opt)
    model.opt = opt
    return model


def build_reference_posres(heads, head_convs, num_layers=18):
    """Construct the real reference PoseResNet (plain deconv stages,
    reference: src/lib/model/networks/resnet.py:134-290)."""
    import importlib
    import types
    resnet = import_reference_networks("resnet")
    resnet.model_zoo = types.SimpleNamespace(load_url=lambda url: {})
    # Reference bug: PoseResNet subclasses nn.Module yet calls
    # super().__init__(heads, head_convs, 1, 64) — the BaseModel
    # signature (its sibling PoseResDCN extends BaseModel correctly).
    # Rebase the class so the reference model is constructible at all.
    base_model = importlib.import_module("model.networks.base_model")
    if resnet.PoseResNet.__bases__ == (torch.nn.Module,):
        resnet.PoseResNet.__bases__ = (base_model.BaseModel,)
    opt = RefOpt()
    opt.rgb = False
    # ... its super() call also drops opt (needed for prior_bias), and
    # a SECOND bare super().__init__() at resnet.py:122 would wipe the
    # head modules — inject the opt and no-op the bare re-init, which
    # reconstructs the evident intent (PoseResDCN's working pattern)
    orig_init = base_model.BaseModel.__init__

    def _patched(self, heads=None, head_convs=None, num_stacks=None,
                 last_channel=None, opt_arg=None):
        if heads is None:
            return  # the vestigial bare re-init
        # the dead code passes last_channel=64 while the deconv stack
        # emits 256 channels; 256 is the consistent (CenterNet) value
        orig_init(self, heads, head_convs, num_stacks, 256,
                  opt_arg if opt_arg is not None else opt)

    base_model.BaseModel.__init__ = _patched
    try:
        model = resnet.PoseResNet(num_layers, heads, head_convs, opt)
    finally:
        base_model.BaseModel.__init__ = orig_init
    model.opt = opt
    return model
