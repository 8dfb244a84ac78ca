"""Transformers — the Spark-first analogue of ``fuel.transformers``.

Each fuel Transformer wraps a pull-based stream and mutates tuples in
Python; here each operator is a pure function ``DataFrame ->
DataFrame`` built from Catalyst expressions, so chains of operators
fuse into whole-stage-codegen plans instead of nested Python
generators.
"""

from fuel_spark.ops import (
    core,
    curate,
    dedup,
    graph,
    linkage,
    multimodal,
    profile,
    sequences,
    similarity,
    sketch,
    text,
)

__all__ = [
    "core", "curate", "dedup", "graph", "linkage", "multimodal", "profile",
    "sequences", "similarity", "sketch", "text",
]
