from fuel_spark.plans import analytics  # noqa: F401

__all__ = ["analytics"]
