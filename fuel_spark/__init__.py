"""fuel_spark — a PySpark-native re-expression of mila-iqia/fuel.

The reference (``/root/reference``) is a single-node, pull-based ML
data-pipeline framework (datasets → iteration schemes → streams →
transformers).  ``fuel_spark`` provides the same capabilities as lazy,
distributed DataFrame transformations: every operator is
``DataFrame -> DataFrame``, declared with the Spark SQL expression API
so Catalyst/Tungsten can optimize (pushdown, pruning, codegen,
broadcast), and nothing materializes on the driver.

Layout
------
- :mod:`fuel_spark.session` — tuned SparkSession factory
- :mod:`fuel_spark.sources` — dataset ingestion (parquet tables, text
  corpora, in-memory, synthetic toys, split views)
- :mod:`fuel_spark.schemes` — deterministic batch/order planners
  (fuel's iteration schemes, re-expressed as column expressions)
- :mod:`fuel_spark.ops` — transformers (core, sequences, text, dedup,
  similarity, multimodal)
- :mod:`fuel_spark.plans` — analytic query library (bench headliners)
- :mod:`fuel_spark.streaming` — Structured-Streaming equivalents of
  fuel.server
"""

__version__ = "0.1.0"
