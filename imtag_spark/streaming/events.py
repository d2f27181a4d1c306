"""Structured Streaming over the events table.

The reference is strictly batch (SURVEY.md §2.9) — this module is the
engine's forward extension for continuously-arriving data: the same
aggregates the batch engine computes, expressed as an incremental
``readStream`` plan with watermarked event-time windows, plus a custom
stateful operator (per-user running counters) via
``applyInPandasWithState``.

Scale notes: windowed aggregation state is keyed by (window, group) and
pruned by the watermark — state size is bounded by (#groups × #open
windows), not stream length. The stateful operator keys by user; a hot
user is one state row, not one partition.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

EVENT_SCHEMA = (
    "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, "
    "value DOUBLE, props STRING"
)


def read_events_stream(spark: SparkSession, path: str) -> DataFrame:
    """File-source stream over a directory of event parquet files."""
    return (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(path)
    )


def windowed_event_counts(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Tumbling-window counts + value sums per event type, late data bounded
    by the watermark. Works identically on a batch DataFrame (windows are
    plain expressions), which is how the oracle test checks it."""
    base = events
    if events.isStreaming:
        base = events.withWatermark("ts", watermark)
    return (
        base.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n_events",
            "total_value",
        )
    )


def _user_counter(key, pdfs, state: GroupState):
    """applyInPandasWithState kernel: running per-user event count/value."""
    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [user_id], "n_events": [n], "total_value": [round(total, 6)]}
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator: per-user running totals across triggers.

    Arrow-batched state updates (no per-row Python); state schema is a
    compact (count, sum) pair per user.
    """
    return events.groupBy("user_id").applyInPandasWithState(
        _user_counter,
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def run_stream_to_memory(
    stream_df: DataFrame, query_name: str, output_mode: str = "complete"
) -> None:
    """Drain a stream with availableNow into an in-memory table (tests)."""
    q = (
        stream_df.writeStream.format("memory")
        .queryName(query_name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
