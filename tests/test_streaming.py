"""Streaming: windowed counts and stateful per-user totals over the events
table, checked against the identical batch aggregation."""

from __future__ import annotations

import shutil

import pytest
from pyspark.sql import functions as F

from imtag_spark.streaming.events import (
    read_events_stream,
    run_stream_to_memory,
    running_user_totals,
    windowed_event_counts,
)

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def events_dir(spark, tmp_path_factory):
    # stream sources read directories; split the events table into parts so
    # maxFilesPerTrigger exercises multiple triggers
    d = tmp_path_factory.mktemp("events_stream")
    batch = spark.read.parquet(f"{SF_DIR}/events.parquet")
    batch.repartition(4).write.mode("overwrite").parquet(str(d / "events"))
    yield str(d / "events")
    shutil.rmtree(d, ignore_errors=True)


def test_windowed_counts_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_stream_to_memory(
        windowed_event_counts(stream), "win_counts", output_mode="complete"
    )
    got = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in spark.sql("SELECT * FROM win_counts").collect()
    }
    batch = spark.read.parquet(events_dir)
    want = {
        (r["window_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in windowed_event_counts(batch).collect()
    }
    assert got == want
    assert len(got) > 0


def test_running_user_totals_match_batch(spark, events_dir):
    stream = read_events_stream(spark, events_dir)
    run_stream_to_memory(
        running_user_totals(stream), "user_totals", output_mode="update"
    )
    # update-mode memory sink keeps one row per trigger per updated user;
    # the LAST row per user is the running total after all triggers
    rows = spark.sql("SELECT * FROM user_totals").collect()
    final: dict[int, tuple] = {}
    for r in rows:  # memory sink appends in trigger order
        final[r["user_id"]] = (r["n_events"], r["total_value"])
    batch = spark.read.parquet(events_dir)
    want = {
        r["user_id"]: (r["n_events"], r["total_value"])
        for r in batch.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .collect()
    }
    assert final == want
