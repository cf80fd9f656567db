"""Data layer: COCO-json loading, augmentation, GT target generation
(reference: src/lib/dataset/)."""
