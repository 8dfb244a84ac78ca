"""Structured-Streaming equivalents of fuel's data server.

Reference parity: ``fuel/server.py`` (start_server: ZMQ push of numpy
batches), ``fuel/streams.py:186`` ServerDataStream (pull side).

fuel ships minibatches over a socket to decouple producers from the
training loop; Spark's native decoupling is a stream: a source
(files/rate/kafka) → incremental query → sink.  Batches land as
micro-batch tables; watermarks handle the late data the ZMQ design
silently drops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stream_events_from_files(
    spark: SparkSession, path: str, schema: str
) -> DataFrame:
    """File-source stream — the 'fuel-server directory of shards'
    pattern: producers drop parquet shards, consumers read them
    incrementally (exactly-once, checkpointed)."""
    return spark.readStream.schema(schema).parquet(path)


def windowed_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Streaming twin of plans.analytics.events_tumbling_window:
    watermarked tumbling-window counts per event type."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("win"), F.col("event_type"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("win.start").alias("window_start"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def serve_batches(
    stream: DataFrame, sink_path: str, checkpoint: str, trigger_available_now: bool = True
):
    """Write the incremental result — the ServerDataStream consumer
    contract: downstream picks up batch files as they appear."""
    writer = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", sink_path)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


# -------------------- custom stateful operator ------------------------


SESSION_STATE_SCHEMA = "last_ts long, session_id long, n_events long, min_ts long"
SESSION_OUT_SCHEMA = (
    "user_id long, session_id long, n_events long, min_ts long, max_ts long"
)


def sessionize_stateful(events: DataFrame, gap_sec: int = 1800) -> DataFrame:
    """Gap-based sessions as a custom stateful streaming operator
    (applyInPandasWithState) — the pattern fuel cannot express at all:
    distributed, fault-tolerant per-key state.

    Cross-batch contract (update mode): state carries the *open*
    session's running accumulators (last_ts, session_id, n_events,
    min_ts), so a session spanning micro-batches re-emits its
    (user_id, session_id) row with cumulative counts that supersede
    the previous emission.  All Arrow chunks of a micro-batch are
    concatenated before sorting — chunk-local sorts would process a
    key's events out of time order and mis-assign sessions.

    Batch twin: plans.analytics.events_sessionize (oracle-checked).
    """
    import pandas as pd

    def fn(key, pdfs, state: GroupState):
        (user_id,) = key
        if state.exists:
            last_ts, session_id, n_events, min_ts = state.get
        else:
            last_ts, session_id, n_events, min_ts = None, 0, 0, 0
        chunks = [pdf for pdf in pdfs if len(pdf)]
        all_ts = (
            sorted(pd.concat(chunks)["ts_long"].tolist()) if chunks else []
        )
        rows = []
        for ts in all_ts:
            if last_ts is not None and ts - last_ts <= gap_sec:
                n_events += 1
            else:
                if last_ts is not None:
                    # close the previous session with its final totals
                    rows.append((user_id, session_id, n_events, min_ts, last_ts))
                session_id += 1
                n_events = 1
                min_ts = ts
            last_ts = ts
        if last_ts is not None and all_ts:
            # emit the (still open) session's cumulative row
            rows.append((user_id, session_id, n_events, min_ts, last_ts))
        state.update((last_ts, session_id, n_events, min_ts))
        yield pd.DataFrame(
            rows, columns=["user_id", "session_id", "n_events", "min_ts", "max_ts"]
        )

    prepared = events.select(
        F.col("user_id"), F.col("ts").cast("long").alias("ts_long")
    )
    return prepared.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
