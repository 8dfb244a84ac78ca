"""Synthetic toy datasets — analogue of fuel.datasets.toy
(reference ``fuel/datasets/toy.py:11`` Spiral, ``:77`` SwissRoll).

fuel synthesizes on the driver with numpy.random; here synthesis is
distributed (``spark.range`` + column trig) and deterministic from an
explicit seed via hashed uniforms, so a 10^12-row toy dataset is as
cheap to declare as a 10^3-row one.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession, functions as F


def _uniform(seed: int, salt: int, col) -> F.Column:
    """Deterministic U(0,1) per row from md5('<seed>-<salt>-<i>') —
    reproducible across partitionings (unlike F.rand, which depends on
    partition layout) AND engine-portable, so synthesis is
    oracle-checkable bit-for-bit."""
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws("-", F.lit(str(seed)), F.lit(str(salt)), col.cast("string"))),
            1, 6,
        ),
        16, 10,
    ).cast("bigint")
    return h.cast("double") / 16777216.0


def spiral(
    spark: SparkSession,
    num_examples: int = 1000,
    classes: int = 1,
    cycles: float = 1.0,
    noise: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """Archimedean spirals; columns (features: x, y), (label)."""
    df = spark.range(num_examples).withColumnRenamed("id", "i")
    label = (F.col("i") % classes).alias("label")
    pos = _uniform(seed, 0, F.col("i"))
    radius = pos * cycles
    angle = pos * cycles * 2.0 * math.pi + (
        F.col("i") % classes
    ).cast("double") * (2.0 * math.pi / classes)
    nx = (_uniform(seed, 1, F.col("i")) - 0.5) * 2.0 * noise
    ny = (_uniform(seed, 2, F.col("i")) - 0.5) * 2.0 * noise
    return df.select(
        F.col("i").alias("example_id"),
        (radius * F.cos(angle) + nx).alias("x"),
        (radius * F.sin(angle) + ny).alias("y"),
        label,
    )


def swiss_roll(
    spark: SparkSession,
    num_examples: int = 1000,
    noise: float = 0.0,
    seed: int = 42,
) -> DataFrame:
    """3-D swiss roll; columns (x, y, z) + unrolled position t."""
    df = spark.range(num_examples).withColumnRenamed("id", "i")
    t = 1.5 * math.pi * (1.0 + 2.0 * _uniform(seed, 0, F.col("i")))
    y = 21.0 * _uniform(seed, 1, F.col("i"))
    nx = (_uniform(seed, 2, F.col("i")) - 0.5) * 2.0 * noise
    nz = (_uniform(seed, 3, F.col("i")) - 0.5) * 2.0 * noise
    return df.select(
        F.col("i").alias("example_id"),
        (t * F.cos(t) + nx).alias("x"),
        y.alias("y"),
        (t * F.sin(t) + nz).alias("z"),
        t.alias("t"),
    )
