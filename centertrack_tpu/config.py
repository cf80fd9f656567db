"""Typed configuration for centertrack-tpu.

The reference threads a single argparse namespace (~150 flags) through every
layer (reference: src/lib/opts.py). We keep the same *semantic* contract —
"task = set of output heads", thresholds coupled through ``track_thresh`` —
but as a typed dataclass that is hashable/static so jitted functions can close
over it.

Head derivation mirrors ``opts.update_dataset_info_and_set_heads``
(reference: src/lib/opts.py:329-388); threshold coupling mirrors
``opts.parse`` (reference: src/lib/opts.py:280-287).
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Optional, Tuple


# Immutable mapping helper: dataclass fields holding dicts are stored as
# sorted tuples of (key, value) so the config stays hashable for jit.
def _freeze_dict(d: Dict[str, int]) -> Tuple[Tuple[str, int], ...]:
    return tuple(sorted(d.items()))


@dataclasses.dataclass(frozen=True)
class Config:
    """Full experiment configuration.

    Field groups follow the reference flag groups (src/lib/opts.py:12-255).
    Only fields that affect computation are here; purely-CLI concerns
    (progress-bar flags, window names) live in the CLI layer.
    """

    # --- basic / task ----------------------------------------------------
    task: str = ""                 # 'ctdet' | 'ddd' | 'multi_pose' | 'tracking' or combos
    dataset: str = "coco"
    test_dataset: str = ""
    exp_id: str = "default"
    debug: int = 0
    load_model: str = ""
    # backbone-only ImageNet pretrain (converted by
    # tools/convert_torch_weights.py --backbone_only); merged onto the
    # fresh init before training, reproducing the reference's
    # pretrain->finetune entry (reference: dla.py:318-329)
    load_backbone: str = ""
    resume: bool = False

    # --- system ----------------------------------------------------------
    seed: int = 317
    num_workers: int = 4
    # fork-based loader workers (torch-DataLoader analogue) for when
    # host-side aug/targets become the bottleneck at multi-chip batch
    # sizes; threads (default) suffice while cv2 holds the hot path
    process_workers: bool = False
    # dtype for network compute: 'float32' or 'bfloat16' (params stay fp32)
    compute_dtype: str = "float32"
    # rematerialize the forward in backward (jax.checkpoint): trades one
    # extra forward pass for O(model) activation memory — enables much
    # larger per-chip batches
    grad_checkpoint: bool = False

    # --- model -----------------------------------------------------------
    arch: str = "dla_34"
    dla_node: str = "dcn"          # dcn|dcn_mix|dcn_local|dcn_local1|gcn|conv
    # schedule of the clamped-DCN op (dla_node dcn_local*/dcn_mix fine
    # levels): 'auto' (default) mode-switches — taploop for training
    # AND batched (B>1) inference (the B-scaled padded transients of
    # the other schedules collapse multi-stream serving,
    # docs/dcn_ms_ab.json), premul/fused for B=1 inference (premul
    # when Cout<Cin or Cout=Cin=64, else fused; measured
    # docs/dcn_premul_ab.json).
    # Explicit 'taploop'|'premul'|'fused' forces one schedule for BOTH
    # train and inference. The CT_LOCAL_IMPL env var still overrides
    # everything (experiment escape hatch). All schedules compute the
    # same math (tests/test_dcn.py equivalence suite).
    local_impl: str = "auto"
    # matmul precision of the separable input warp (ops/warp.py):
    # 'auto' (default) uses one fast bf16 MXU pass when compute_dtype
    # is bfloat16 (the net quantizes its input to ~2x the warp's bf16
    # rounding at the first conv anyway; HIGHEST's 6-pass fp32
    # emulation measured 3.6 ms of the 14.4 ms serving step) and
    # pixel-exact HIGHEST otherwise; 'highest'|'default' force a mode.
    warp_precision: str = "auto"
    head_conv: int = -1            # -1 => 256 for dla, 64 otherwise
    num_head_conv: int = 1
    head_kernel: int = 3
    down_ratio: int = 4
    num_classes: int = -1
    num_layers: int = 101          # for 'generic' arch backbones
    backbone: str = "dla34"
    neck: str = "dlaup"
    msra_outchannel: int = 256
    prior_bias: float = -4.6
    model_output_list: bool = False

    # --- input -----------------------------------------------------------
    input_res: int = -1
    input_h: int = -1
    input_w: int = -1
    dataset_version: str = ""

    # --- train -----------------------------------------------------------
    optim: str = "adam"
    lr: float = 1.25e-4
    lr_step: Tuple[int, ...] = (60,)
    save_point: Tuple[int, ...] = (90,)
    num_epochs: int = 70
    batch_size: int = 32
    # split each optimizer step into N sequential micro-batches of
    # batch_size/N, accumulating fp32 gradients on device: effective
    # batch sizes past the per-chip compile/memory envelope (e.g. the
    # reference's MOT17 batch 32, readme/MODEL_ZOO.md:16-20) at the
    # HBM footprint of batch_size/N. One optimizer update per step;
    # BN stats advance once per micro-batch (same as torch would).
    grad_accum: int = 1
    num_iters: int = -1
    val_intervals: int = 10000
    ltrb: bool = False
    ltrb_weight: float = 0.1
    # checkpoint shape-drift handling in load_model (reference:
    # model.py:46-71): reset_hm re-inits hm heads loaded from a generic
    # 80/1-class pretrain; reuse_hm copies overlapping class channels
    reset_hm: bool = False
    reuse_hm: bool = False
    dense_reg: int = 1

    # --- test ------------------------------------------------------------
    flip_test: bool = False
    test_scales: Tuple[float, ...] = (1.0,)
    nms: bool = False
    K: int = 100
    fix_short: int = -1
    keep_res: bool = False
    trainval: bool = False
    kitti_split: str = "3dop"
    out_thresh: float = -1.0
    depth_scale: float = 1.0
    test_focal_length: int = -1
    pad: int = 31

    # --- dataset augmentation --------------------------------------------
    not_rand_crop: bool = False
    not_max_crop: bool = False
    shift: float = 0.0
    scale: float = 0.0
    aug_rot: float = 0.0
    rotate: float = 0.0
    flip: float = 0.5
    no_color_aug: bool = False

    # --- tracking --------------------------------------------------------
    tracking: bool = False
    pre_hm: bool = False
    same_aug_pre: bool = False
    zero_pre_hm: bool = False
    hm_disturb: float = 0.0
    lost_disturb: float = 0.0
    fp_disturb: float = 0.0
    pre_thresh: float = -1.0
    track_thresh: float = 0.3
    new_thresh: float = 0.3
    max_frame_dist: int = 3
    ltrb_amodal: bool = False
    ltrb_amodal_weight: float = 0.1
    public_det: bool = False
    no_pre_img: bool = False
    zero_tracking: bool = False
    hungarian: bool = False
    max_age: int = -1
    max_tracks: int = 256          # fixed capacity of the on-device tracker state

    # --- loss weights ----------------------------------------------------
    tracking_weight: float = 1.0
    reg_loss: str = "l1"
    hm_weight: float = 1.0
    off_weight: float = 1.0
    wh_weight: float = 0.1
    hp_weight: float = 1.0
    hm_hp_weight: float = 1.0
    amodel_offset_weight: float = 1.0
    dep_weight: float = 1.0
    dim_weight: float = 1.0
    rot_weight: float = 1.0
    nuscenes_att: bool = False
    nuscenes_att_weight: float = 1.0
    velocity: bool = False
    velocity_weight: float = 1.0

    # --- custom dataset ---------------------------------------------------
    custom_dataset_img_path: str = ""
    custom_dataset_ann_path: str = ""
    custom_num_categories: int = -1
    custom_input_h: int = -1
    custom_input_w: int = -1

    # --- parallelism (TPU-native; replaces reference DataParallel) --------
    # Data-parallel shard count; 1 = single chip. The mesh axis name is
    # fixed to 'data'. (reference: src/lib/model/data_parallel.py is the
    # GPU analogue; here pjit over a Mesh does the all-reduce.)
    num_devices: int = 1

    # --- derived (filled by finalize(); defaults are placeholders) -------
    pre_img: bool = False
    fix_res: bool = True
    num_stacks: int = 1
    output_h: int = -1
    output_w: int = -1
    heads: Tuple[Tuple[str, int], ...] = ()
    weights: Tuple[Tuple[str, float], ...] = ()
    head_convs: Tuple[Tuple[str, Tuple[int, ...]], ...] = ()
    vis_thresh: float = 0.3

    # ---------------------------------------------------------------------
    @property
    def heads_dict(self) -> Dict[str, int]:
        return dict(self.heads)

    @property
    def weights_dict(self) -> Dict[str, float]:
        return dict(self.weights)

    @property
    def head_convs_dict(self) -> Dict[str, List[int]]:
        return {k: list(v) for k, v in self.head_convs}

    @property
    def input_hw(self) -> Tuple[int, int]:
        return (self.input_h, self.input_w)

    @property
    def output_hw(self) -> Tuple[int, int]:
        return (self.output_h, self.output_w)


def parse_task(cfg: Config) -> Config:
    """Apply task-derived settings (reference: src/lib/opts.py:257-326)."""
    updates = {}
    if cfg.test_dataset == "":
        updates["test_dataset"] = cfg.dataset
    tracking = "tracking" in cfg.task
    if tracking:
        updates["tracking"] = True
        updates["out_thresh"] = max(cfg.track_thresh, cfg.out_thresh)
        updates["pre_thresh"] = max(cfg.track_thresh, cfg.pre_thresh)
        updates["new_thresh"] = max(cfg.track_thresh, cfg.new_thresh)
        updates["pre_img"] = not cfg.no_pre_img
    updates["fix_res"] = not cfg.keep_res
    if cfg.head_conv == -1:
        updates["head_conv"] = 256 if "dla" in cfg.arch else 64
    updates["pad"] = 127 if "hourglass" in cfg.arch else 31
    updates["num_stacks"] = 2 if cfg.arch == "hourglass" else 1
    return dataclasses.replace(cfg, **updates)


def set_heads(cfg: Config, dataset_meta) -> Config:
    """Derive input/output resolution and the head dict from task+dataset.

    ``dataset_meta`` needs attrs: num_categories, default_resolution,
    num_joints. (reference: src/lib/opts.py:329-388)
    """
    num_classes = (dataset_meta.num_categories
                   if cfg.num_classes < 0 else cfg.num_classes)
    input_h, input_w = dataset_meta.default_resolution
    input_h = cfg.input_res if cfg.input_res > 0 else input_h
    input_w = cfg.input_res if cfg.input_res > 0 else input_w
    input_h = cfg.input_h if cfg.input_h > 0 else input_h
    input_w = cfg.input_w if cfg.input_w > 0 else input_w
    output_h = input_h // cfg.down_ratio
    output_w = input_w // cfg.down_ratio

    heads = {"hm": num_classes, "reg": 2, "wh": 2}
    if "tracking" in cfg.task:
        heads["tracking"] = 2
    if "ddd" in cfg.task:
        heads.update({"dep": 1, "rot": 8, "dim": 3, "amodel_offset": 2})
    if "multi_pose" in cfg.task:
        heads.update({
            "hps": dataset_meta.num_joints * 2,
            "hm_hp": dataset_meta.num_joints,
            "hp_offset": 2,
        })
    if cfg.ltrb:
        heads["ltrb"] = 4
    if cfg.ltrb_amodal:
        heads["ltrb_amodal"] = 4
    if cfg.nuscenes_att:
        heads["nuscenes_att"] = 8
    if cfg.velocity:
        heads["velocity"] = 3

    weight_of = {
        "hm": cfg.hm_weight, "wh": cfg.wh_weight, "reg": cfg.off_weight,
        "hps": cfg.hp_weight, "hm_hp": cfg.hm_hp_weight,
        "hp_offset": cfg.off_weight, "dep": cfg.dep_weight,
        "rot": cfg.rot_weight, "dim": cfg.dim_weight,
        "amodel_offset": cfg.amodel_offset_weight, "ltrb": cfg.ltrb_weight,
        "tracking": cfg.tracking_weight,
        "ltrb_amodal": cfg.ltrb_amodal_weight,
        "nuscenes_att": cfg.nuscenes_att_weight,
        "velocity": cfg.velocity_weight,
    }
    weights = {h: weight_of[h] for h in heads}
    heads = {h: c for h, c in heads.items() if weights[h] != 0}
    weights = {h: w for h, w in weights.items() if h in heads}

    head_conv = cfg.head_conv if cfg.head_conv > 0 else (
        256 if "dla" in cfg.arch else 64)
    head_convs = {
        h: tuple(head_conv for _ in range(
            cfg.num_head_conv if h != "reg" else 1))
        for h in heads
    }

    return dataclasses.replace(
        cfg,
        num_classes=num_classes,
        input_h=input_h, input_w=input_w,
        input_res=max(input_h, input_w),
        output_h=output_h, output_w=output_w,
        heads=_freeze_dict(heads),
        weights=tuple(sorted(weights.items())),
        head_convs=tuple(sorted((k, v) for k, v in head_convs.items())),
        head_conv=head_conv,
    )


def finalize(cfg: Config, dataset_meta=None) -> Config:
    """parse_task + set_heads in one call."""
    cfg = parse_task(cfg)
    if dataset_meta is None:
        from centertrack_tpu.data.registry import get_dataset_meta
        dataset_meta = get_dataset_meta(cfg.dataset, cfg)
    return set_heads(cfg, dataset_meta)
