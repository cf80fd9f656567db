"""Inference engine: Detector, Tracker, post-processing
(reference: src/lib/detector.py, src/lib/utils/tracker.py,
src/lib/utils/post_process.py)."""
