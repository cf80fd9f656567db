"""Offline dataset converters and visualizers (reference: src/tools/)."""
