"""CLI entry points (reference: src/main.py, src/test.py, src/demo.py)."""
