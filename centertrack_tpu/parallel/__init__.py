"""Device-mesh parallelism (replaces reference
src/lib/model/data_parallel.py + scatter_gather.py)."""
