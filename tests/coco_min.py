"""Minimal functional pycocotools.coco.COCO stand-in.

pycocotools is not installed in this environment; the reference
GenericDataset only uses a tiny slice of its API
(reference: src/lib/dataset/generic_dataset.py:63-66,161-166):
COCO(ann_path).dataset / .getImgIds() / .loadImgs(ids=[i]) /
.getAnnIds(imgIds=[i]) / .loadAnns(ids=[...]).

Test-support code only; nothing here ships in the framework.
"""

from __future__ import annotations

import json


class COCO:
    def __init__(self, annotation_file=None):
        self.dataset = {}
        self.anns, self.imgs = {}, {}
        self.imgToAnns = {}
        if annotation_file is not None:
            with open(annotation_file) as f:
                self.dataset = json.load(f)
            self.createIndex()

    def createIndex(self):
        for img in self.dataset.get("images", []):
            self.imgs[img["id"]] = img
            self.imgToAnns.setdefault(img["id"], [])
        for ann in self.dataset.get("annotations", []):
            self.anns[ann["id"]] = ann
            self.imgToAnns.setdefault(ann["image_id"], []).append(ann)

    def getImgIds(self, imgIds=None, catIds=None):
        return list(self.imgs.keys())

    def loadImgs(self, ids=None):
        if isinstance(ids, int):
            ids = [ids]
        return [self.imgs[i] for i in ids]

    def getAnnIds(self, imgIds=None, catIds=None, areaRng=None,
                  iscrowd=None):
        if imgIds is None:
            return list(self.anns.keys())
        if isinstance(imgIds, int):
            imgIds = [imgIds]
        out = []
        for i in imgIds:
            out.extend(a["id"] for a in self.imgToAnns.get(i, []))
        return out

    def loadAnns(self, ids=None):
        if isinstance(ids, int):
            ids = [ids]
        return [self.anns[i] for i in ids]
