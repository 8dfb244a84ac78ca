"""Sequence windowing — analogue of ``fuel.transformers.sequences``
(reference ``fuel/transformers/sequences.py:4`` Window, ``:89`` NGrams).

fuel walks one sentence at a time with driver-side index state; here
each row carries a sequence (array column) and every (source, target)
window is produced by a vectorized ``transform(sequence(...))`` +
``posexplode`` — per-sequence work is data-parallel and the stream of
windows across sequences is a single exploded DataFrame.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def sliding_window(
    df: DataFrame,
    seq_col: str,
    offset: int,
    source_window: int,
    target_window: int,
    overlapping: bool,
    keep: list[str] | None = None,
) -> DataFrame:
    """All valid (source, target) window pairs per sequence.

    Window start i and target start ti = i + offset
    (+ source_window when non-overlapping) range over every position
    where both windows fit — the closed-form of fuel's incremental
    index walk (sequences.py:60-86).
    Output: keep... , win_pos, source (array), target (array).
    """
    shift = offset + (0 if overlapping else source_window)
    keep = keep or []
    # valid i: i >= 0, i+shift >= 0, i+sw <= n, i+shift+tw <= n
    lo = max(0, -shift)
    expr = (
        f"transform("
        f"  sequence({lo}, size({seq_col}) - greatest({source_window}, {shift + target_window})),"
        f"  i -> struct("
        f"    i AS win_pos,"
        f"    slice({seq_col}, i + 1, {source_window}) AS source,"
        f"    slice({seq_col}, i + {shift} + 1, {target_window}) AS target))"
    )
    out = df.where(
        F.size(F.col(seq_col)) >= max(source_window, shift + target_window) + lo
    )
    out = out.select(*keep, F.explode(F.expr(expr)).alias("_w"))
    return out.select(
        *keep, "_w.win_pos", "_w.source", "_w.target"
    )


def ngrams(
    df: DataFrame,
    seq_col: str,
    n: int,
    keep: list[str] | None = None,
) -> DataFrame:
    """n-gram + next-element target stream (fuel NGrams): for each
    position, gram = seq[i:i+n] and target = seq[i+n]."""
    out = sliding_window(
        df, seq_col, offset=0, source_window=n, target_window=1,
        overlapping=False, keep=keep,
    )
    return out.select(
        *(keep or []),
        F.col("win_pos"),
        F.col("source").alias("gram"),
        F.element_at(F.col("target"), 1).alias("target"),
    )
