"""Backbone-only (ImageNet-style) checkpoint ingestion.

The reference starts every training recipe from a pretrained trunk
downloaded at model build time (DLA: dla.py:318-329). Here a torch DLA
trunk with random weights stands in for the ImageNet checkpoint (same
unprefixed key schema); convert_backbone must map it so that (a) the
flax DLA pyramid reproduces the torch pyramid activations and (b)
load_model merges it onto a full CenterTrack model leaving neck/heads
at fresh init.
"""

import numpy as np
import torch

import jax.numpy as jnp

from centertrack_tpu.models.dla import DLA, DLA_CONFIGS
from centertrack_tpu.tools.convert_torch_weights import convert_backbone
from tests.torch_ref import build_reference_dlaseg, randomize_

HEADS = {"hm": 1, "reg": 2, "wh": 2, "tracking": 2}
HEAD_CONVS = {"hm": [256], "reg": [256], "wh": [256], "tracking": [256]}


def _imagenet_style_sd():
    """Torch DLA trunk state dict with the ImageNet checkpoint's key
    schema: unprefixed base_layer/levelN, no temporal stems."""
    torch.manual_seed(0)
    ref = build_reference_dlaseg(HEADS, HEAD_CONVS)
    randomize_(ref, seed=3)
    base = ref.base.eval()
    sd = {k: v.detach().numpy() for k, v in base.state_dict().items()
          if not k.startswith(("pre_img_layer", "pre_hm_layer", "fc"))
          and "num_batches" not in k}
    return base, sd


def test_backbone_only_dla_activation_parity():
    base, sd = _imagenet_style_sd()
    params, stats, unused = convert_backbone(sd, "dla", 34, "dla_34")
    assert not unused, unused

    x = torch.randn(1, 3, 64, 64, generator=torch.Generator()
                    .manual_seed(5))
    with torch.no_grad():
        want = base(x)  # 6-level pyramid

    levels, channels, block = DLA_CONFIGS[34]
    m = DLA(levels, channels, block)
    got = m.apply(
        {"params": params["backbone"]["base"],
         "batch_stats": stats["backbone"]["base"]},
        jnp.asarray(x.numpy().transpose(0, 2, 3, 1)), train=False)
    assert len(got) == len(want) == 6
    for lvl, (g, w) in enumerate(zip(got, want)):
        np.testing.assert_allclose(
            np.asarray(g).transpose(0, 3, 1, 2), w.numpy(),
            rtol=1e-4, atol=1e-4, err_msg=f"level {lvl}")


def test_backbone_only_merge_keeps_head_init(tmp_path):
    """save -> load_model onto a full model: trunk leaves replaced,
    head/neck leaves keep their fresh initialization."""
    import jax
    from centertrack_tpu.config import Config, parse_task, set_heads
    from centertrack_tpu.models.model import (create_model, init_model,
                                              load_model, save_model)

    _, sd = _imagenet_style_sd()
    params_bb, stats_bb, _ = convert_backbone(sd, "dla", 34, "dla_34")
    path = str(tmp_path / "imagenet_dla.ckpt")
    save_model(path, 0, params_bb, stats_bb)

    class Meta:
        num_categories = 1
        default_resolution = (64, 64)
        num_joints = 17

    cfg = set_heads(parse_task(Config(task="tracking", pre_hm=True)),
                    Meta)
    model = create_model(cfg.arch, cfg.heads_dict, cfg.head_convs_dict,
                         cfg)
    params, batch_stats = init_model(model, cfg)
    ckpt = load_model(path, params, batch_stats, verbose=False)
    merged = ckpt["params"]
    # trunk leaf replaced by the converted weights
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["base"]["base_layer"]["conv"]
                   ["kernel"]),
        np.asarray(params_bb["backbone"]["base"]["base_layer"]["conv"]
                   ["kernel"]))
    # temporal stems + heads keep their fresh init
    np.testing.assert_allclose(
        np.asarray(merged["backbone"]["base"]["pre_img_layer"]["conv"]
                   ["kernel"]),
        np.asarray(params["backbone"]["base"]["pre_img_layer"]["conv"]
                   ["kernel"]))
    np.testing.assert_allclose(
        np.asarray(jax.tree_util.tree_leaves(merged["heads"])[0]),
        np.asarray(jax.tree_util.tree_leaves(params["heads"])[0]))
