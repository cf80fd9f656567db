"""Network assembly, arch registry, checkpoint I/O
(reference: src/lib/model/model.py, base_model.py).

``create_model(arch, heads, head_convs, cfg)`` -> a Flax module whose
``__call__(x, pre_img, pre_hm, train)`` returns a list (per stack) of
dicts head->NHWC map, mirroring the reference forward contract
(reference: base_model.py:73-91).
"""

from __future__ import annotations

import pickle
from typing import Any, Dict, Optional, Tuple

import flax
import flax.linen as nn
import jax
import jax.numpy as jnp

from centertrack_tpu.models.dla import DLASeg
from centertrack_tpu.models.resnet import PoseResNet, PoseResDCN
from centertrack_tpu.models.heads import HeadSet


class CenterTrackNet(nn.Module):
    """Backbone+neck -> per-stack head maps."""
    arch: str = "dla_34"
    num_layers: int = 34
    heads: Tuple[Tuple[str, int], ...] = (("hm", 1), ("reg", 2), ("wh", 2))
    head_convs: Tuple[Tuple[str, Tuple[int, ...]], ...] = ()
    head_kernel: int = 3
    prior_bias: float = -4.6
    dla_node: str = "dcn"
    backbone: str = "dla34"
    neck: str = "dlaup"
    msra_outchannel: int = 256
    with_pre_img: bool = False
    with_pre_hm: bool = False
    dtype: object = None   # compute dtype; None/float32 = full precision

    @nn.compact
    def __call__(self, x, pre_img=None, pre_hm=None, train: bool = False):
        if self.arch == "dla":
            backbone = DLASeg(self.num_layers, dla_node=self.dla_node,
                              with_pre_img=self.with_pre_img,
                              with_pre_hm=self.with_pre_hm,
                              dtype=self.dtype, name="backbone")
        elif self.arch == "dlav0":
            from centertrack_tpu.models.dlav0 import DLASegV0
            backbone = DLASegV0(self.num_layers,
                                with_pre_img=self.with_pre_img,
                                with_pre_hm=self.with_pre_hm,
                                dtype=self.dtype, name="backbone")
        elif self.arch == "res":
            backbone = PoseResNet(self.num_layers,
                                  with_pre_img=self.with_pre_img,
                                  with_pre_hm=self.with_pre_hm,
                                  dtype=self.dtype, name="backbone")
        elif self.arch == "resdcn":
            # reference picks slimmed (256,128,64) up channels when the
            # first hm head conv is 64, else (256,256,256)
            # (resdcn.py:164-178)
            hm_convs = dict(self.head_convs).get("hm", (256,))
            slim = len(hm_convs) > 0 and hm_convs[0] == 64
            backbone = PoseResDCN(self.num_layers,
                                  deconv_channels=((256, 128, 64) if slim
                                                   else (256, 256, 256)),
                                  with_pre_img=self.with_pre_img,
                                  with_pre_hm=self.with_pre_hm,
                                  dtype=self.dtype, name="backbone")
        elif self.arch == "generic":
            from centertrack_tpu.models.generic import GenericNetwork
            backbone = GenericNetwork(self.num_layers,
                                      backbone=self.backbone,
                                      neck=self.neck,
                                      dla_node=self.dla_node,
                                      msra_outchannel=self.msra_outchannel,
                                      with_pre_img=self.with_pre_img,
                                      with_pre_hm=self.with_pre_hm,
                                      dtype=self.dtype, name="backbone")
        else:
            raise ValueError(f"unknown arch {self.arch}")
        if self.dtype is not None:
            x = x.astype(self.dtype)
            pre_img = None if pre_img is None else pre_img.astype(self.dtype)
            pre_hm = None if pre_hm is None else pre_hm.astype(self.dtype)
        feats = backbone(x, pre_img, pre_hm, train=train)
        head_set = HeadSet(self.heads, self.head_convs, self.head_kernel,
                           self.prior_bias, dtype=self.dtype, name="heads")
        return [head_set(f) for f in feats]


def create_model(arch: str, heads: Dict[str, int],
                 head_convs: Dict[str, Tuple[int, ...]],
                 cfg=None) -> CenterTrackNet:
    """arch string 'dla_34' -> module (reference: model.py:24-29)."""
    num_layers = int(arch[arch.find("_") + 1:]) if "_" in arch else 0
    arch_base = arch[: arch.find("_")] if "_" in arch else arch
    kwargs = {}
    if cfg is not None:
        kwargs = dict(
            dla_node=cfg.dla_node,
            backbone=cfg.backbone,
            neck=cfg.neck,
            msra_outchannel=cfg.msra_outchannel,
            with_pre_img=cfg.pre_img,
            with_pre_hm=cfg.pre_hm,
            head_kernel=cfg.head_kernel,
            prior_bias=cfg.prior_bias,
            dtype=(jnp.bfloat16 if cfg.compute_dtype == "bfloat16"
                   else None),
        )
    return CenterTrackNet(
        arch=arch_base, num_layers=num_layers,
        heads=tuple(sorted(heads.items())),
        head_convs=tuple(sorted(
            (k, tuple(v)) for k, v in head_convs.items())),
        **kwargs)


def init_model(model: CenterTrackNet, cfg, rng=None):
    """Initialize params + batch_stats with the config's static shapes."""
    if rng is None:
        rng = jax.random.PRNGKey(cfg.seed if cfg else 0)
    h = cfg.input_h if cfg and cfg.input_h > 0 else 128
    w = cfg.input_w if cfg and cfg.input_w > 0 else 128
    x = jnp.zeros((1, h, w, 3), jnp.float32)
    pre_img = x if model.with_pre_img else None
    pre_hm = (jnp.zeros((1, h, w, 1), jnp.float32)
              if model.with_pre_hm else None)
    variables = model.init(rng, x, pre_img, pre_hm, train=False)
    return variables["params"], variables.get("batch_stats", {})


def save_model(path: str, epoch: int, params, batch_stats,
               opt_state=None) -> None:
    """Persist {epoch, params, batch_stats, opt_state}
    (reference: model.py:92-101 writes {epoch, state_dict, optimizer})."""
    payload = {
        "epoch": epoch,
        "params": flax.serialization.to_state_dict(params),
        "batch_stats": flax.serialization.to_state_dict(batch_stats),
    }
    if opt_state is not None:
        payload["opt_state"] = flax.serialization.to_state_dict(opt_state)
    with open(path, "wb") as f:
        pickle.dump(payload, f)


def _out_axis(path: Tuple[str, ...], arr) -> int:
    """Axis holding output channels: last for conv kernels, 0 for
    bias/scale/BN-stat vectors."""
    return arr.ndim - 1 if path and path[-1] == "kernel" else 0


def _is_hm_head(path: Tuple[str, ...]) -> bool:
    """Heads whose name starts with 'hm' (hm, hm_hp) — the reference
    gates reset_hm on flat names 'hm*' (reference: model.py:49-50)."""
    return len(path) >= 2 and path[0] == "heads" and \
        path[1].startswith("hm")


def _merge_tree(tmpl, loaded, reset_hm: bool, reuse_hm: bool,
                log: list, path: Tuple[str, ...] = ()):
    """Checkpoint tree -> template tree with reference shape-drift
    tolerance (reference: model.py:46-71): mismatched (or reset_hm'd
    generic-pretrain hm) leaves are skipped, or class-channel overlap
    is copied when reuse_hm."""
    import numpy as np

    if not isinstance(tmpl, dict):
        want = np.asarray(tmpl)
        got = np.asarray(loaded)
        axis = _out_axis(path, want)
        force_reset = (reset_hm and _is_hm_head(path) and
                       got.shape[axis] in (80, 1))
        if got.shape == want.shape and not force_reset:
            return got.astype(want.dtype)
        if reuse_hm and got.shape[:axis] == want.shape[:axis] and \
                got.shape[axis + 1:] == want.shape[axis + 1:]:
            n = min(got.shape[axis], want.shape[axis])
            out = np.array(want)
            sl = tuple(slice(None) if a != axis else slice(0, n)
                       for a in range(want.ndim))
            out[sl] = got[sl]
            log.append(f"Reusing parameter {'/'.join(path)}: "
                       f"loaded {got.shape} -> required {want.shape}")
            return out.astype(want.dtype)
        log.append(f"Skip loading parameter {'/'.join(path)}: "
                   f"loaded {got.shape}, required {want.shape}")
        return np.asarray(want)
    out = {}
    for k, v in tmpl.items():
        if not isinstance(loaded, dict) or k not in loaded:
            log.append(f"No param {'/'.join(path + (k,))}")
            out[k] = v
        else:
            out[k] = _merge_tree(v, loaded[k], reset_hm, reuse_hm, log,
                                 path + (k,))
    if isinstance(loaded, dict):
        for k in loaded:
            if k not in tmpl:
                log.append(f"Drop parameter {'/'.join(path + (k,))}")
    return out


def load_model(path: str, params_template=None, batch_stats_template=None,
               opt_state_template=None, reset_hm: bool = False,
               reuse_hm: bool = False, verbose: bool = True):
    """Load a checkpoint saved by save_model. If templates are given,
    the state dicts are restored onto them with the reference's
    shape-drift tolerance (reference: model.py:31-90): leaves missing
    from the checkpoint keep their fresh init, mismatched shapes are
    skipped, ``reuse_hm`` copies the overlapping class channels, and
    ``reset_hm`` re-initializes hm heads loaded from a generic 80/1
    class pretrain. Without templates, raw dicts are returned."""
    with open(path, "rb") as f:
        payload = pickle.load(f)
    out = {"epoch": payload.get("epoch", 0)}
    if params_template is not None:
        log: list = []
        p_tmpl = flax.serialization.to_state_dict(params_template)
        merged_p = _merge_tree(p_tmpl, payload["params"], reset_hm,
                               reuse_hm, log)
        out["params"] = flax.serialization.from_state_dict(
            params_template, merged_p)
        if batch_stats_template is not None:
            b_tmpl = flax.serialization.to_state_dict(batch_stats_template)
            merged_b = _merge_tree(b_tmpl, payload["batch_stats"],
                                   reset_hm, reuse_hm, log)
            out["batch_stats"] = flax.serialization.from_state_dict(
                batch_stats_template, merged_b)
        if verbose:
            for line in log:
                print(line)
        if opt_state_template is not None and "opt_state" in payload:
            out["opt_state"] = flax.serialization.from_state_dict(
                opt_state_template, payload["opt_state"])
    else:
        out["params"] = payload["params"]
        out["batch_stats"] = payload["batch_stats"]
        if "opt_state" in payload:
            out["opt_state"] = payload["opt_state"]
    return out
