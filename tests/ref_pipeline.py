"""Run the reference's ENTIRE inference pipeline (torch, CPU) on real
frames: cv2 pre-process -> DLASeg -> generic_decode -> post_process ->
Tracker (reference: src/lib/detector.py:55-172, utils/tracker.py).

The real reference modules are imported from /root/reference/src/lib;
only environment gaps are stubbed (numba jit decorator, the removed
sklearn linear_assignment_, the progress bar, pycocotools — none of
which carry pipeline logic; the Hungarian path is not exercised because
the default tracker is greedy). The DCNv2 CUDA submodule is replaced by
tests/torch_ref.DCN (pure-torch, semantics-exact).

Test-support code only; nothing here ships in the framework.
"""

from __future__ import annotations

import sys
import types

import numpy as np

REF_SRC = "/root/reference/src"
REF_LIB = "/root/reference/src/lib"


def install_stubs() -> None:
    """sys.modules stubs for packages the reference imports but this
    environment lacks. Logic-free by construction."""
    if "numba" not in sys.modules:
        numba = types.ModuleType("numba")

        def jit(*args, **kwargs):
            if len(args) == 1 and callable(args[0]):
                return args[0]
            return lambda f: f

        numba.jit = jit
        sys.modules["numba"] = numba
    if "sklearn.utils.linear_assignment_" not in sys.modules:
        # removed from sklearn>=0.23; scipy is the canonical equivalent
        la = types.ModuleType("sklearn.utils.linear_assignment_")
        from scipy.optimize import linear_sum_assignment

        def linear_assignment(cost):
            rows, cols = linear_sum_assignment(cost)
            return np.stack([rows, cols], axis=1)

        la.linear_assignment = linear_assignment
        sys.modules["sklearn.utils.linear_assignment_"] = la
    if "progress" not in sys.modules:
        progress = types.ModuleType("progress")
        bar_mod = types.ModuleType("progress.bar")

        class Bar:
            def __init__(self, *a, **k):
                import datetime

                self.suffix = ""
                self.elapsed_td = datetime.timedelta(0)
                self.eta_td = datetime.timedelta(0)

            def next(self):
                pass

            def finish(self):
                pass

        bar_mod.Bar = Bar
        progress.bar = bar_mod
        sys.modules["progress"] = progress
        sys.modules["progress.bar"] = bar_mod
    if "pycocotools" not in sys.modules:
        # the detector pipeline only imports dataset classes for their
        # class attrs, but the reference TRAINING path constructs a real
        # COCO(ann_path) (generic_dataset.py:63) — provide the minimal
        # functional API (tests/coco_min.py)
        from tests.coco_min import COCO

        pc = types.ModuleType("pycocotools")
        pc.__path__ = []  # mark as package for submodule imports
        coco_mod = types.ModuleType("pycocotools.coco")
        coco_mod.COCO = COCO
        eval_mod = types.ModuleType("pycocotools.cocoeval")
        eval_mod.COCOeval = object
        pc.coco = coco_mod
        pc.cocoeval = eval_mod
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.coco"] = coco_mod
        sys.modules["pycocotools.cocoeval"] = eval_mod
    if "torchvision" not in sys.modules:
        # model.model imports it only for ImageNet download helpers
        # (no egress here anyway)
        tv = types.ModuleType("torchvision")
        tv_m = types.ModuleType("torchvision.models")
        tv_u = types.ModuleType("torchvision.models.utils")
        tv_u.load_state_dict_from_url = lambda *a, **k: {}
        tv.models = tv_m
        tv_m.utils = tv_u
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.models"] = tv_m
        sys.modules["torchvision.models.utils"] = tv_u
    if "pyquaternion" not in sys.modules:
        # imported at nuscenes-dataset module level; never constructed
        # on the MOT detector path exercised here
        pq = types.ModuleType("pyquaternion")
        pq.Quaternion = object
        sys.modules["pyquaternion"] = pq
    for p in (REF_SRC, REF_LIB):
        if p not in sys.path:
            sys.path.insert(0, p)


def build_reference_opt(args: list[str]):
    """Parse flags with the REAL reference opts parser and derive heads
    from the named dataset's class attrs (reference: src/lib/opts.py
    parse + update_dataset_info_and_set_heads)."""
    install_stubs()
    from opts import opts  # noqa: E402  (reference module)
    from dataset.dataset_factory import get_dataset  # noqa: E402

    o = opts()
    opt = o.parse(args)
    dataset = get_dataset(opt.dataset)
    opt = o.update_dataset_info_and_set_heads(opt, dataset)
    return opt


def build_reference_detector(opt):
    """Construct the real reference Detector with the torch DCN stand-in
    injected (reference: src/lib/detector.py:24-53)."""
    install_stubs()
    from tests.torch_ref import DCN  # noqa: E402
    import importlib

    dla = importlib.import_module("model.networks.dla")
    dla.DCN = DCN
    import torch

    if not torch.cuda.is_available():
        # detector.process calls torch.cuda.synchronize unconditionally
        # (reference: src/lib/detector.py:338) — no-op it on CPU
        torch.cuda.synchronize = lambda *a, **k: None
    detector_mod = importlib.import_module("detector")
    return detector_mod.Detector(opt)


def run_reference_pipeline(ckpt_path: str, frames: list[np.ndarray],
                           extra_args: list[str] | None = None):
    """Full reference loop over BGR uint8 frames; returns the per-frame
    `results` lists (reference: src/lib/detector.py:55-172)."""
    args = ["tracking", "--dataset", "mot", "--load_model", ckpt_path,
            "--gpus", "-1", "--pre_hm"] + (extra_args or [])
    opt = build_reference_opt(args)
    det = build_reference_detector(opt)
    out = []
    for img in frames:
        ret = det.run(img.copy())
        out.append(ret["results"])
    return out


def video_frames(path: str, count: int, stride: int = 1,
                 scale: float = 1.0) -> list[np.ndarray]:
    """Grab `count` BGR frames from a video, optionally downscaled."""
    import cv2

    cap = cv2.VideoCapture(path)
    frames: list[np.ndarray] = []
    i = 0
    while len(frames) < count:
        ok, img = cap.read()
        if not ok:
            break
        if i % stride == 0:
            if scale != 1.0:
                img = cv2.resize(img, None, fx=scale, fy=scale)
            frames.append(img)
        i += 1
    cap.release()
    return frames
