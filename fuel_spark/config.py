"""Engine configuration — analogue of fuel.config_parser
(reference ``fuel/config_parser.py``: FUEL_DATA_PATH, floatX, etc.).

fuel reads ``~/.fuelrc`` + ``FUEL_*`` env vars; here configuration is
environment-first (the Spark-native deployment style) with the same
knobs: where data lives, the float width ``force_floatx`` targets, and
the harness parallelism.
"""

from __future__ import annotations

import os


def data_path() -> str:
    """Root of the parquet tables (fuel's FUEL_DATA_PATH)."""
    return os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def floatx() -> str:
    """Target float width for force_floatx ('float' = float32,
    matching fuel's floatX default)."""
    return os.environ.get("FUEL_SPARK_FLOATX", "float")


def default_seed() -> int:
    """Seed for seeded schemes/augmentations (fuel's default_seed)."""
    return int(os.environ.get("FUEL_SPARK_SEED", "42"))


def cpus() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
