"""Hermetic evaluation harnesses.

The reference shells out to py-motmetrics, pycocotools COCOeval, the
KITTI devkit C++ binaries and the nuscenes-devkit (SURVEY.md 2.8/2.7).
None of those exist in this environment, so the metrics are implemented
here from their published definitions, with golden tests on small cases.
"""
