"""argparse <-> Config bridge (reference: src/lib/opts.py).

Flags are auto-generated from the Config dataclass, so every config
field is a CLI flag with the same name (booleans become --flag
store_true). The reference's derived-settings logic lives in
config.parse_task / config.set_heads.
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import Tuple

from centertrack_tpu.config import Config, finalize


_DERIVED = {"pre_img", "fix_res", "num_stacks", "output_h", "output_w",
            "heads", "weights", "head_convs"}


def build_parser() -> argparse.ArgumentParser:
    parser = argparse.ArgumentParser(description="centertrack-tpu")
    parser.add_argument(
        "task", default="", nargs="?",
        help="ctdet | ddd | multi_pose | tracking, or combined with ','")
    parser.add_argument("--demo", default="",
                        help="path to image/folder/video or 'webcam'")
    parser.add_argument("--save_video", action="store_true")
    parser.add_argument("--save_results", action="store_true")
    parser.add_argument("--save_framerate", type=int, default=30)
    parser.add_argument("--video_out", default="")
    parser.add_argument("--load_results", default="")
    parser.add_argument("--eval_val", action="store_true")
    parser.add_argument(
        "--multi_stream", type=int, default=0,
        help="evaluate N videos concurrently through one batched "
             "device program (MultiStreamDetector); tracking tasks "
             "only, incompatible with --load_results/--public_det")
    parser.add_argument(
        "--fused", action="store_true",
        help="demo: zero-host-sync FusedDetector engine (latency "
             "mode; results lag one frame)")
    parser.add_argument(
        "--chunk", type=int, default=0,
        help="demo: run_chunk throughput mode — one lax.scan dispatch "
             "per F frames; results lag up to 2F-1 frames")
    for f in dataclasses.fields(Config):
        if f.name in _DERIVED or f.name == "task":
            continue
        flag = "--" + f.name
        if f.type == "bool" or isinstance(f.default, bool):
            if f.default is False:
                parser.add_argument(flag, action="store_true")
            else:
                parser.add_argument(flag, action="store_false")
        elif isinstance(f.default, tuple):
            parser.add_argument(flag, default=None, type=str)
        elif isinstance(f.default, int):
            parser.add_argument(flag, default=f.default, type=int)
        elif isinstance(f.default, float):
            parser.add_argument(flag, default=f.default, type=float)
        else:
            parser.add_argument(flag, default=f.default, type=str)
    return parser


def args_to_config(args) -> Config:
    kwargs = {"task": args.task}
    for f in dataclasses.fields(Config):
        if f.name in _DERIVED or f.name == "task":
            continue
        v = getattr(args, f.name, None)
        if v is None:
            continue
        if isinstance(f.default, tuple) and isinstance(v, str):
            elt = float if any(
                isinstance(x, float) for x in f.default) else int
            v = tuple(elt(x) for x in v.split(","))
        kwargs[f.name] = v
    return Config(**kwargs)


def parse(argv=None) -> Tuple[Config, argparse.Namespace]:
    parser = build_parser()
    args = parser.parse_args(argv)
    cfg = args_to_config(args)
    cfg = finalize(cfg)
    return cfg, args


DEFAULT_DATASET_FOR_TASK = {
    # (reference: opts.py:390-403)
    "ctdet": "coco", "multi_pose": "coco_hp", "ddd": "nuscenes",
    "tracking": "coco", "tracking,ctdet": "coco",
    "tracking,multi_pose": "coco_hp", "tracking,ddd": "nuscenes",
}


def parse_demo(argv=None) -> Tuple[Config, argparse.Namespace]:
    """Demo-style init: dataset defaulted from the task
    (reference: opts.init, opts.py:390-403)."""
    parser = build_parser()
    args = parser.parse_args(argv)
    if args.dataset == "coco" and args.task in DEFAULT_DATASET_FOR_TASK:
        args.dataset = DEFAULT_DATASET_FOR_TASK[args.task]
    cfg = args_to_config(args)
    cfg = finalize(cfg)
    return cfg, args
