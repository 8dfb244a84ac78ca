from fuel_spark.streaming import serve  # noqa: F401

__all__ = ["serve"]
