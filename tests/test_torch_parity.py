"""Activation-level parity against the REAL reference network.

Builds the reference PyTorch DLASeg from /root/reference/src/lib (with
the absent DCNv2 CUDA submodule replaced by a pure-torch forward that
reproduces its kernel semantics — tests/torch_ref.py), converts its
state_dict with tools/convert_torch_weights, and asserts the Flax model
produces the same head maps. This is the test that fails if the weight
converter or any layer's semantics drift.

reference: src/lib/model/model.py:31-90 (checkpoint naming scheme),
src/lib/model/networks/dla.py:594-641 (DLASeg).
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from centertrack_tpu.models.model import CenterTrackNet
from centertrack_tpu.tools.convert_torch_weights import convert_dla34
from tests.torch_ref import (DCN, RefOpt, build_reference_dlaseg,
                             modulated_deform_conv2d, randomize_)

HEADS = {"hm": 1, "reg": 2, "wh": 2, "tracking": 2}
HEAD_CONVS = {"hm": [256], "reg": [256], "wh": [256], "tracking": [256]}


def test_dcn_layer_parity():
    """One DCN layer: torch (upstream interface, chunk/cat forward) vs
    ops/dcn.deform_conv2d with converter-mapped weights. Catches any
    offset/mask channel-layout mistake in the converter."""
    torch.manual_seed(0)
    layer = DCN(8, 16).eval()
    g = torch.Generator().manual_seed(1)
    layer.weight.data = torch.randn(layer.weight.shape, generator=g) * 0.2
    layer.bias.data = torch.randn(layer.bias.shape, generator=g) * 0.1
    layer.conv_offset_mask.weight.data = torch.randn(
        layer.conv_offset_mask.weight.shape, generator=g) * 0.1
    layer.conv_offset_mask.bias.data = torch.randn(
        layer.conv_offset_mask.bias.shape, generator=g) * 0.5

    x = torch.randn(2, 8, 13, 11, generator=g)
    with torch.no_grad():
        want = layer(x).numpy()

    from centertrack_tpu.ops.dcn import deform_conv2d
    from centertrack_tpu.tools.convert_torch_weights import (
        _conv_w, _dcn_offset_mask_b, _dcn_offset_mask_w)

    x_nhwc = jnp.asarray(x.numpy().transpose(0, 2, 3, 1))
    om_w = jnp.asarray(_dcn_offset_mask_w(
        layer.conv_offset_mask.weight.detach().numpy()))
    om_b = jnp.asarray(_dcn_offset_mask_b(
        layer.conv_offset_mask.bias.detach().numpy()))
    om = jax.lax.conv_general_dilated(
        x_nhwc, om_w, (1, 1), ((1, 1), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST) + om_b
    offset, mask = om[..., :18], jax.nn.sigmoid(om[..., 18:])
    got = deform_conv2d(
        x_nhwc, offset, mask,
        jnp.asarray(_conv_w(layer.weight.detach().numpy())),
        jnp.asarray(layer.bias.detach().numpy()))
    got = np.asarray(got).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_torch_dcn_zero_offset_is_plain_conv():
    """Sanity on the torch-side oracle itself: zero offsets + mask
    logits 0 (sigmoid = 0.5) must equal 0.5 * a plain 3x3 conv."""
    g = torch.Generator().manual_seed(2)
    x = torch.randn(1, 4, 9, 9, generator=g)
    w = torch.randn(6, 4, 3, 3, generator=g)
    b = torch.randn(6, generator=g)
    offset = torch.zeros(1, 18, 9, 9)
    mask = torch.full((1, 9, 9, 9), 0.5)
    got = modulated_deform_conv2d(x, offset, mask, w, b)
    # mask scales the sampled taps only; the bias is added once, unscaled
    want = 0.5 * torch.nn.functional.conv2d(x, w, padding=1) \
        + b.reshape(1, -1, 1, 1)
    np.testing.assert_allclose(got.numpy(), want.numpy(),
                               rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def ref_model():
    model = build_reference_dlaseg(HEADS, HEAD_CONVS)
    randomize_(model, seed=3)
    return model.eval()


def _flax_outputs(params, stats, x, pre_img, pre_hm, dla_node):
    net = CenterTrackNet(
        arch="dla", num_layers=34,
        heads=tuple(sorted(HEADS.items())),
        head_convs=tuple(sorted((k, tuple(v))
                                for k, v in HEAD_CONVS.items())),
        dla_node=dla_node, with_pre_img=True, with_pre_hm=True)
    with jax.default_matmul_precision("float32"):
        out = net.apply({"params": params, "batch_stats": stats},
                        x, pre_img, pre_hm, train=False)
    return out[-1]


def test_dlaseg_activation_parity(ref_model):
    """Full dla_34 (dcn nodes, pre_img+pre_hm stems): converted
    reference weights must reproduce every head map."""
    sd = {k: v.detach().numpy() for k, v in ref_model.state_dict().items()}
    params, stats, unused = convert_dla34(sd)
    assert not unused, unused[:10]

    g = torch.Generator().manual_seed(4)
    img = torch.randn(1, 3, 64, 64, generator=g)
    pre_img = torch.randn(1, 3, 64, 64, generator=g)
    pre_hm = torch.rand(1, 1, 64, 64, generator=g)
    with torch.no_grad():
        want = ref_model(img, pre_img, pre_hm)[-1]

    got = _flax_outputs(
        params, stats,
        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(pre_img.numpy().transpose(0, 2, 3, 1)),
        jnp.asarray(pre_hm.numpy().transpose(0, 2, 3, 1)),
        dla_node="dcn")

    assert set(got) == set(want)
    for head in want:
        w = want[head].numpy().transpose(0, 2, 3, 1)
        gmap = np.asarray(got[head])
        np.testing.assert_allclose(
            gmap, w, rtol=1e-3, atol=1e-3,
            err_msg=f"head {head} diverges "
                    f"(max abs diff {np.abs(gmap - w).max():.2e})")


def test_resdcn_activation_parity():
    """PoseResDCN (res_18 trunk + DCN/deconv stages): converted
    reference weights must reproduce every head map. Pins the
    full-ConvTranspose deconv mapping (_deconv_w) numerically.
    reference: src/lib/model/networks/resdcn.py:145-290."""
    from centertrack_tpu.tools.convert_torch_weights import convert_resdcn
    from tests.torch_ref import build_reference_resdcn

    model = build_reference_resdcn(HEADS, HEAD_CONVS)
    randomize_(model, seed=5)
    model = model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, stats, unused = convert_resdcn(sd, 18)
    assert not unused, unused[:10]

    g = torch.Generator().manual_seed(6)
    img = torch.randn(1, 3, 64, 64, generator=g)
    with torch.no_grad():
        want = model(img)[-1]

    net = CenterTrackNet(
        arch="resdcn", num_layers=18,
        heads=tuple(sorted(HEADS.items())),
        head_convs=tuple(sorted((k, tuple(v))
                                for k, v in HEAD_CONVS.items())))
    with jax.default_matmul_precision("float32"):
        got = net.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                        train=False)[-1]

    assert set(got) == set(want)
    for head in want:
        w = want[head].numpy().transpose(0, 2, 3, 1)
        gmap = np.asarray(got[head])
        np.testing.assert_allclose(
            gmap, w, rtol=1e-3, atol=1e-3,
            err_msg=f"head {head} diverges "
                    f"(max abs diff {np.abs(gmap - w).max():.2e})")


@pytest.mark.parametrize("backbone,neck,with_pre", [
    ("mobilenet", "dlaup", True),
    ("resnet", "msraup", False),   # generic resnet asserts no stems
    ("dla34", "dlaup", True),
])
def test_generic_activation_parity(backbone, neck, with_pre):
    """GenericNetwork (backbone x neck, dcn nodes): converted reference
    weights must reproduce every head map.
    reference: src/lib/model/networks/generic_network.py."""
    from centertrack_tpu.tools.convert_torch_weights import convert_generic
    from tests.torch_ref import build_reference_generic

    model = build_reference_generic(HEADS, HEAD_CONVS, backbone, neck,
                                    with_pre=with_pre)
    randomize_(model, seed=7)
    model = model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, stats, unused = convert_generic(sd, backbone, neck, 18)
    assert not unused, unused[:10]

    g = torch.Generator().manual_seed(8)
    img = torch.randn(1, 3, 64, 64, generator=g)
    pre_img = torch.randn(1, 3, 64, 64, generator=g)
    pre_hm = torch.rand(1, 1, 64, 64, generator=g)
    with torch.no_grad():
        want = (model(img, pre_img, pre_hm) if with_pre
                else model(img))[-1]

    net = CenterTrackNet(
        arch="generic", backbone=backbone, neck=neck, num_layers=18,
        dla_node="dcn",
        heads=tuple(sorted(HEADS.items())),
        head_convs=tuple(sorted((k, tuple(v))
                                for k, v in HEAD_CONVS.items())),
        with_pre_img=with_pre, with_pre_hm=with_pre)
    args = ((jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
             jnp.asarray(pre_img.numpy().transpose(0, 2, 3, 1)),
             jnp.asarray(pre_hm.numpy().transpose(0, 2, 3, 1)))
            if with_pre
            else (jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),))
    with jax.default_matmul_precision("float32"):
        got = net.apply({"params": params, "batch_stats": stats},
                        *args, train=False)[-1]

    assert set(got) == set(want)
    for head in want:
        w = want[head].numpy().transpose(0, 2, 3, 1)
        gmap = np.asarray(got[head])
        np.testing.assert_allclose(
            gmap, w, rtol=1e-3, atol=1e-3,
            err_msg=f"head {head} diverges "
                    f"(max abs diff {np.abs(gmap - w).max():.2e})")


def test_dlav0_activation_parity():
    """DLASegv0 (plain-conv IDA pyramid + temporal stems): converted
    reference weights must reproduce every head map.
    reference: src/lib/model/networks/dlav0.py:440-556."""
    from centertrack_tpu.tools.convert_torch_weights import convert_dlav0
    from tests.torch_ref import build_reference_dlav0

    model = build_reference_dlav0(HEADS, HEAD_CONVS)
    randomize_(model, seed=9)
    model = model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, stats, unused = convert_dlav0(sd)
    assert not unused, unused[:10]

    g = torch.Generator().manual_seed(10)
    img = torch.randn(1, 3, 64, 64, generator=g)
    pre_img = torch.randn(1, 3, 64, 64, generator=g)
    pre_hm = torch.rand(1, 1, 64, 64, generator=g)
    with torch.no_grad():
        want = model(img, pre_img, pre_hm)[-1]

    net = CenterTrackNet(
        arch="dlav0", num_layers=34,
        heads=tuple(sorted(HEADS.items())),
        head_convs=tuple(sorted((k, tuple(v))
                                for k, v in HEAD_CONVS.items())),
        with_pre_img=True, with_pre_hm=True)
    with jax.default_matmul_precision("float32"):
        got = net.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(pre_img.numpy().transpose(0, 2, 3, 1)),
                        jnp.asarray(pre_hm.numpy().transpose(0, 2, 3, 1)),
                        train=False)[-1]

    assert set(got) == set(want)
    for head in want:
        w = want[head].numpy().transpose(0, 2, 3, 1)
        gmap = np.asarray(got[head])
        np.testing.assert_allclose(
            gmap, w, rtol=1e-3, atol=1e-3,
            err_msg=f"head {head} diverges "
                    f"(max abs diff {np.abs(gmap - w).max():.2e})")


def test_posresnet_activation_parity():
    """PoseResNet (res_18 trunk + plain deconvs): converted reference
    weights must reproduce every head map (pins convert_res).
    reference: src/lib/model/networks/resnet.py:134-290."""
    from centertrack_tpu.tools.convert_torch_weights import convert_res
    from tests.torch_ref import build_reference_posres

    model = build_reference_posres(HEADS, HEAD_CONVS)
    randomize_(model, seed=11)
    model = model.eval()
    sd = {k: v.detach().numpy() for k, v in model.state_dict().items()}
    params, stats, unused = convert_res(sd, 18)
    assert not unused, unused[:10]

    g = torch.Generator().manual_seed(12)
    img = torch.randn(1, 3, 64, 64, generator=g)
    # the reference PoseResNet has no temporal stems (img2feats only)
    with torch.no_grad():
        want = model(img)[-1]

    net = CenterTrackNet(
        arch="res", num_layers=18,
        heads=tuple(sorted(HEADS.items())),
        head_convs=tuple(sorted((k, tuple(v))
                                for k, v in HEAD_CONVS.items())))
    with jax.default_matmul_precision("float32"):
        got = net.apply({"params": params, "batch_stats": stats},
                        jnp.asarray(img.numpy().transpose(0, 2, 3, 1)),
                        train=False)[-1]

    assert set(got) == set(want)
    for head in want:
        w = want[head].numpy().transpose(0, 2, 3, 1)
        gmap = np.asarray(got[head])
        np.testing.assert_allclose(
            gmap, w, rtol=1e-3, atol=1e-3,
            err_msg=f"head {head} diverges "
                    f"(max abs diff {np.abs(gmap - w).max():.2e})")
