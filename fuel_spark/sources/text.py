"""Text corpus ingestion — analogue of fuel.datasets.TextFile
(reference ``fuel/datasets/text.py:7``) and the shape of
OneBillionWord (``fuel/datasets/billion.py``).

fuel reads files line-by-line on one machine and dict-encodes each
line in Python; here the corpus is a DataFrame of documents, the
dictionary is *built distributed* (explode + count + rank) and
encoding is an explode/join/re-collect — every step shuffles on keys
Spark can balance, so the same code dict-encodes a 100 TB corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from fuel_spark.functions import words

BOS_ID = 0
EOS_ID = 1
UNK_ID = 2
FIRST_WORD_ID = 3


def read_text_lines(spark: SparkSession, path: str) -> DataFrame:
    """Line-per-row text source (TextFile's file reading)."""
    return spark.read.text(path).withColumnRenamed("value", "line")


def _tokens(text_col: str, level: str):
    """Token array for a text column: 'word' (normalized words) or
    'character' (raw chars — fuel TextFile's level option,
    reference text.py:89 ``level`` parameter)."""
    if level == "word":
        return words(F.col(text_col))
    if level == "character":
        return F.expr(
            f"transform(sequence(1, greatest(length({text_col}), 0)),"
            f" i -> substring({text_col}, i, 1))"
        )
    raise ValueError(f"level must be 'word' or 'character', got {level!r}")


def build_dictionary(
    df: DataFrame, text_col: str, vocab_size: int = 10000, level: str = "word"
) -> DataFrame:
    """Top-``vocab_size`` tokens by frequency → ids starting at
    FIRST_WORD_ID.  Ties break lexicographically so the dictionary is
    deterministic across engines and cluster sizes.
    Output: word, word_id.
    """
    counts = (
        df.select(F.explode(_tokens(text_col, level)).alias("word"))
        .where(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # top-vocab via sort-limit FIRST (per-partition TakeOrdered — the
    # corpus vocabulary is unbounded at scale, so ranking it with a
    # global row_number window would funnel every distinct token
    # through one task), then number the already-tiny result
    top = counts.orderBy(F.col("cnt").desc(), F.col("word")).limit(vocab_size)
    w = Window.orderBy(F.col("cnt").desc(), F.col("word"))
    return (
        top.withColumn("word_id", F.row_number().over(w) + FIRST_WORD_ID - 1)
        .select("word", F.col("word_id").cast("bigint"))
    )


def dictionary_from_mapping(spark: SparkSession, mapping) -> DataFrame:
    """Lift a user-supplied {word: id} vocabulary — fuel TextFile's
    ``dictionary`` parameter (reference fuel/datasets/text.py:64) —
    into the (word, word_id) relation ``dictionary_encode`` joins
    against."""
    return spark.createDataFrame(
        [(w, int(i)) for w, i in mapping.items()], "word string, word_id bigint"
    )


def dictionary_encode(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dictionary,
    bos: bool = True,
    eos: bool = True,
    level: str = "word",
) -> DataFrame:
    """Encode each document as <S> w1 … wn </S> token-id arrays with
    unknown-word fallback — TextFile's per-line encoding loop
    (text.py:129-144), distributed.

    ``dictionary`` is either a (word, word_id) DataFrame (e.g. from
    :func:`build_dictionary`) or a plain ``{word: id}`` mapping —
    fuel TextFile's pre-built-dictionary mode (text.py:64).

    The dictionary join is a broadcast (vocabularies are small); token
    order is restored with a positional re-collect.
    Output: id_col, token_ids (array<bigint>).
    """
    if not isinstance(dictionary, DataFrame):
        dictionary = dictionary_from_mapping(df.sparkSession, dictionary)
    toks = df.select(
        F.col(id_col),
        F.posexplode(_tokens(text_col, level)).alias("pos", "word"),
    ).where(F.col("word") != "")
    joined = toks.join(F.broadcast(dictionary), "word", "left").withColumn(
        "tok", F.coalesce(F.col("word_id"), F.lit(UNK_ID).cast("bigint"))
    )
    body = (
        joined.groupBy(id_col)
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos").alias("_k"), F.col("tok").alias("_v")))
                ),
                lambda s: s["_v"],
            ).alias("body")
        )
    )
    # Empty/punctuation-only documents produce no exploded tokens, but
    # fuel's TextFile still yields them as [<S>, </S>] (text.py:129-144)
    # — re-attach them with an empty body so every input id gets a row.
    body = (
        df.select(F.col(id_col))
        .join(body, id_col, "left")
        .withColumn("body", F.coalesce("body", F.array().cast("array<bigint>")))
    )
    pieces = []
    if bos:
        pieces.append(F.array(F.lit(BOS_ID).cast("bigint")))
    pieces.append(F.col("body"))
    if eos:
        pieces.append(F.array(F.lit(EOS_ID).cast("bigint")))
    return body.select(F.col(id_col), F.concat(*pieces).alias("token_ids"))
