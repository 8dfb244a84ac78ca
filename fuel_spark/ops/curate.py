"""Corpus curation planning — the accounting layer between raw text
ops and a training run.

The reference engine (mila-iqia/fuel) stops at iteration schemes over
already-curated datasets; these operators answer the questions that
come BEFORE that at the 100 TB tier: how to weight domains in the
mixture (DoReMi/GPT-3-style tempered sampling), how much padding a
sequence-length choice wastes, where to cut curriculum phases, and
how many documents each quality screen drops.  Everything is exact
integer/decimal arithmetic over one or two aggregations — these run
as the cheap planning pass on the full corpus, not per-example work.

All float-bearing outputs follow the repo discipline: per-row
arithmetic on exact inputs, pinned double literals (repr), round-9
into DECIMAL for summed products, round-6 display.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from fuel_spark.functions import words


def domain_mixture_weights(
    df: DataFrame,
    domain_col: str,
    text_col: str,
    alpha: float = 0.7,
    budget_tokens: int = 1_000_000,
) -> DataFrame:
    """Tempered domain-mixture weights: weight ∝ tokens^alpha
    normalized over domains (alpha=1 is proportional sampling, 0 is
    uniform; 0.7 is the GPT-3-style smoothing that up-weights small
    domains), plus the epoch count each domain sustains at a token
    budget — epochs > 1 means that domain repeats, the overfitting
    signal a mixture review looks for.

    One token-count aggregation per domain, a 1-row total broadcast
    back, per-row arithmetic after that.  The tempered powers are
    rounded to 9 dp and summed as DECIMAL so the normalizing total is
    order-independent (engines sum in different orders).

    Output: domain, n_tokens, weight, epochs_at_budget.
    """
    toks = (
        df.select(F.col(domain_col), F.size(words(F.col(text_col))).alias("_n"))
        .groupBy(domain_col)
        .agg(F.sum("_n").cast("bigint").alias("n_tokens"))
    )
    w9 = F.round(
        F.pow(F.col("n_tokens").cast("double"), F.lit(float(alpha))), 9
    ).cast("decimal(38,9)")
    p = toks.withColumn("_w9", w9)
    total = p.agg(F.sum("_w9").alias("_tw"))
    out = p.crossJoin(F.broadcast(total)).withColumn(
        "weight",
        F.round(
            F.col("_w9").cast("double") / F.col("_tw").cast("double"), 6
        ),
    )
    return out.select(
        domain_col,
        "n_tokens",
        "weight",
        F.round(
            F.lit(float(budget_tokens))
            * F.col("weight")
            / F.col("n_tokens").cast("double"),
            6,
        ).alias("epochs_at_budget"),
    )


def packing_efficiency(
    df: DataFrame,
    text_col: str,
    seq_len: int = 512,
    bin_size: int = 64,
) -> DataFrame:
    """Padding-waste report for a sequence-length choice: documents
    bucketed by token-length bins, with the tokens each bin burns on
    pad-to-``seq_len`` batching (padded = ceil(n/seq_len)·seq_len per
    doc) — the table that justifies concat-packing (see
    ``ops.sequences``) or a different seq_len before a run commits.
    All-integer arithmetic (DIV-based ceil, no floats until the final
    display ratio); one groupBy on the bin key.

    Output: bin_lo, n_docs, n_tokens, n_padded, n_waste, waste_rate.
    """
    n = F.size(words(F.col(text_col))).cast("bigint")
    return (
        df.select(n.alias("_n"))
        # integer ceil/floor via DIV — no float truncation semantics
        .withColumn(
            "_p", F.expr(f"(_n + {seq_len - 1}) DIV {seq_len} * {seq_len}")
        )
        .withColumn("bin_lo", F.expr(f"_n DIV {bin_size} * {bin_size}"))
        .groupBy("bin_lo")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("_n").cast("bigint").alias("n_tokens"),
            F.sum("_p").cast("bigint").alias("n_padded"),
            (F.sum("_p") - F.sum("_n")).cast("bigint").alias("n_waste"),
        )
        .withColumn(
            "waste_rate",
            F.round(
                F.col("n_waste").cast("double")
                / F.col("n_padded").cast("double"),
                6,
            ),
        )
    )


def curriculum_phases(
    df: DataFrame,
    score_col: str = "n_chars",
    text_col: str = "text",
    phases: int = 3,
) -> DataFrame:
    """Curriculum phase assignment by exact score percentiles: phase
    cut points are the smallest score values whose cumulative count
    reaches i·N/phases (exact integer rank targets, no float
    percentile — engines disagree on interpolation), then per-phase
    accounting.  The easy→hard ordering pass of curriculum training
    (cf. ``schemes.curriculum_batches``, which consumes an existing
    difficulty column; this op DERIVES the phase table).

    Shuffle story: one groupBy onto the score VALUE GRID (distinct
    score values — bounded by the score's domain, not corpus size),
    one cumulative window over that grid (the allowlisted
    SinglePartition: grid-sized by construction), thresholds collapse
    to ONE broadcast row, and the assignment is a per-row CASE.

    Output: phase, n_docs, min_score, max_score, n_tokens.
    """
    grid = df.groupBy(F.col(score_col).alias("_s")).agg(
        F.count(F.lit(1)).alias("_c")
    )
    wcum = Window.orderBy("_s").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.withColumn("_cum", F.sum("_c").over(wcum))
    total = df.agg(F.count(F.lit(1)).alias("_n"))
    # threshold i (1..phases-1): min score with cum >= ceil(i*N/phases)
    cuts = cum.crossJoin(F.broadcast(total))
    thr = cuts.agg(
        *[
            F.min(
                F.when(
                    F.col("_cum")
                    >= F.expr(f"({i} * _n + {phases - 1}) DIV {phases}"),
                    F.col("_s"),
                )
            ).alias(f"_t{i}")
            for i in range(1, phases)
        ]
    )
    phase = F.lit(phases)
    for i in range(phases - 1, 0, -1):
        phase = F.when(F.col(score_col) <= F.col(f"_t{i}"), i).otherwise(
            phase
        )
    return (
        df.crossJoin(F.broadcast(thr))
        .withColumn("phase", phase.cast("bigint"))
        .groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(score_col).alias("min_score"),
            F.max(score_col).alias("max_score"),
            F.sum(F.size(words(F.col(text_col))))
            .cast("bigint")
            .alias("n_tokens"),
        )
    )


def curation_funnel(
    df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Per-stage survival accounting for the standard quality screen
    chain (C4/Gopher-flavor): minimum characters → minimum words →
    mean-word-length band → alphabetic ratio.  Reports rows in/out of
    each stage as applied IN ORDER — the funnel view a curation
    review reads before committing thresholds (the end-to-end apply
    tier is ``plans``' curation_pipeline; this is its dashboard).

    ONE pass: all four predicates evaluate per row in codegen and
    collapse into a single 1-row conditional-sum aggregate, then
    unpivot to 4 stage rows (constant-sized).  No joins, no second
    scan.

    Output: stage, stage_name, rows_in, rows_out.
    """
    t = F.col(text_col)
    w = words(t)
    n_chars = F.length(t)
    n_words = F.size(w)
    mwl = F.length(F.concat_ws("", w)).cast("double") / F.greatest(
        n_words, F.lit(1)
    ).cast("double")
    alpha_ratio = F.length(
        F.regexp_replace(F.lower(t), "[^a-z]", "")
    ).cast("double") / F.greatest(n_chars, F.lit(1)).cast("double")

    p1 = n_chars >= 200
    p2 = n_words >= 30
    p3 = (mwl >= 3.0) & (mwl <= 10.0)
    p4 = alpha_ratio >= 0.6
    s1 = p1
    s2 = s1 & p2
    s3 = s2 & p3
    s4 = s3 & p4

    def cnt(cond):
        return F.sum(F.when(cond, 1).otherwise(0)).cast("bigint")

    agg = df.agg(
        F.count(F.lit(1)).alias("_n0"),
        cnt(s1).alias("_n1"),
        cnt(s2).alias("_n2"),
        cnt(s3).alias("_n3"),
        cnt(s4).alias("_n4"),
    )
    names = ["min_chars_200", "min_words_30", "mean_word_len_3_10",
             "alpha_ratio_60"]
    stages = F.array(
        *[
            F.struct(
                F.lit(i + 1).cast("bigint").alias("stage"),
                F.lit(names[i]).alias("stage_name"),
                F.col(f"_n{i}").alias("rows_in"),
                F.col(f"_n{i + 1}").alias("rows_out"),
            )
            for i in range(4)
        ]
    )
    return agg.select(F.explode(stages).alias("_s")).select(
        "_s.stage", "_s.stage_name", "_s.rows_in", "_s.rows_out"
    )
