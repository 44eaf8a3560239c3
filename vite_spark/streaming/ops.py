"""Structured Streaming surface (round-brief requirement: readStream →
transformations → writeStream; watermarks + windowed aggs for late data;
applyInPandasWithState for custom stateful operators).

The reference engine is batch-iterative (SURVEY.md §2.9 — its superstep
driver is the iterative analog), so this module covers the STREAMING side
of the training-data pipeline the engine feeds: continuous event/document
ingestion into the same operators the batch path provides — windowed
counts, dedup-within-watermark, per-key running stats, and streaming
co-occurrence EDGE construction (the incremental analog of
derive.cooccurrence_edges, so the link graph can be built from a feed).

Every op is defined on an unbounded stream but is deterministic under
Trigger.AvailableNow over a static directory — which is exactly how the
tests pin each op to its batch equivalent, and how the driver's DuckDB
oracle value-checks the windowed aggregate end-to-end.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

EVENT_SCHEMA = StructType(
    [
        StructField("event_id", LongType(), True),
        StructField("ts", TimestampType(), True),
        StructField("user_id", LongType(), True),
        StructField("event_type", StringType(), True),
        StructField("value", DoubleType(), True),
        StructField("props", StringType(), True),
    ]
)


def _epoch_ntz(col: str):
    """Epoch seconds of a TIMESTAMP_NTZ column via an NTZ-to-NTZ diff —
    session-timezone-independent (an LTZ cast would shift by the zone)."""
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def stream_events(spark: SparkSession, path: str) -> DataFrame:
    """File-source event stream (readStream over a parquet path/glob).

    File streams need an explicit schema — the source must not block on
    inference when the directory is initially empty. ``path`` must be a
    directory or a glob whose non-wildcard prefix is a directory (the
    source rejects a bare file path: basePath must be a directory)."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(path)


def windowed_event_counts(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
    by: str = "event_type",
) -> DataFrame:
    """Watermarked tumbling-window aggregate: (window_start_epoch, type,
    n, total_value). Late rows beyond the watermark are dropped; state for
    closed windows is evicted — the state store stays O(open windows), not
    O(stream length). Window starts are epoch-aligned, so the result is
    engine-portable (the driver oracle recomputes them in SQL)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), F.col(by))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            # ts is TIMESTAMP_NTZ in the parquet; extract epoch seconds
            # with an NTZ-to-NTZ diff — independent of the session zone
            _epoch_ntz("w.start").alias("window_start"),
            F.col(by),
            "n",
            "total_value",
        )
    )


def streaming_dedup(events: DataFrame, watermark: str = "30 minutes") -> DataFrame:
    """Exact dedup on event_id within the watermark horizon — the
    streaming analog of text/dedup.exact_duplicates: the dedup state is
    bounded by the watermark instead of growing with the stream."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        ["event_id"]
    )


def running_user_stats(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (n_events, total_value) maintained across micro-batches.

    This is the brief's 'custom stateful operator' surface: arbitrary
    per-key state the built-in aggregations can't express (here kept
    simple so the batch-parity test is exact; a real pipeline would hold
    e.g. per-user token budgets or session models)."""
    from pyspark.sql.streaming.state import GroupStateTimeout

    out_schema = StructType(
        [
            StructField("user_id", LongType(), False),
            StructField("n_events", LongType(), False),
            StructField("total_value", DoubleType(), False),
        ]
    )
    state_schema = StructType(
        [
            StructField("n", LongType(), False),
            StructField("tot", DoubleType(), False),
        ]
    )

    def update(key, pdfs, state):
        import pandas as pd

        n, tot = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            tot += float(pdf["value"].fillna(0.0).sum())
        state.update((n, tot))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(tot, 6)]}
        )

    return events.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def cooccur_edge_stream(
    events: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Streaming link-graph construction: users co-occurring in the same
    (event_type, window) bucket become weighted edges — the incremental
    analog of derive.cooccurrence_edges feeding the batch engine.

    Plan shape: watermarked windowed collect_set (bounded state), then a
    STATELESS pair expansion of each closed bucket — no stream-stream
    join, so state is O(open buckets · distinct users per bucket) and each
    bucket's pairs are emitted exactly once when its window closes."""
    buckets = (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.collect_set("user_id").alias("users"))
    )
    us = F.array_sort("users")
    return (
        buckets.select(
            _epoch_ntz("w.start").alias("window_start"),
            "event_type",
            F.explode(us).alias("src"),
            us.alias("all_users"),
        )
        .select(
            "window_start",
            "event_type",
            "src",
            F.explode("all_users").alias("dst"),
        )
        .filter(F.col("src") < F.col("dst"))
    )


def run_available_now(stream_df: DataFrame, output_mode: str = "append") -> DataFrame:
    """Drain a stream over a static source into a memory sink with
    Trigger.AvailableNow and return the materialized result — the
    deterministic finite-run harness used by tests and the driver oracle.
    (Append-mode windowed aggs would hold back windows newer than the
    final watermark; the callers that need every window use 'complete'.)"""
    name = f"vs_mem_{uuid.uuid4().hex[:12]}"
    q = (
        stream_df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return stream_df.sparkSession.table(name)
