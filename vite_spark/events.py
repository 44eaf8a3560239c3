"""Event-table analytics: batch gap sessionization.

Sessionization — splitting each user's event stream into sessions wherever
the inter-event gap exceeds a threshold — is the canonical event-pipeline
operator (the batch analog of the streaming per-key stateful ops in
vite_spark/streaming/ops.py). Implementation is two windows + one groupBy,
all whole-stage-codegen built-ins:

1. per (user) ordered by (ts, event_id): lag(ts) → new-session flag
   (gap > gap_s or first event);
2. running SUM of flags over the same window → 1-based session ordinal;
3. groupBy (user, session) → count / min / max / value sum.

Determinism: events sharing a timestamp are ordered by event_id (total
order), and all time arithmetic is integer epoch MICROSECONDS extracted
zone-free from the TIMESTAMP_NTZ column (the streaming module's r2-vetted
idiom — timestampdiff from the NTZ epoch literal ≡ DuckDB epoch_us()), so
every derived column except the value sum is exact int64; the value sum is
rounded to 6 (float SUM order is engine-specific).

Scale notes (100 TB): both windows partition BY USER — per-partition size
is one user's event count, never global; the groupBy is map-side
combinable. Hot users bound the window partition — the same skew knob as
every per-key op here (cap or salt upstream if a single key exceeds
executor memory).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

SESSION_GAP_S = 1800  # 30 min, the classic web-analytics default


def _epoch_us(col: str):
    """Zone-free epoch microseconds of a TIMESTAMP_NTZ column."""
    return F.expr(
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def sessionize(events: DataFrame, gap_s: int = SESSION_GAP_S) -> DataFrame:
    """(user_id, session_id, n_events, start_us, end_us, duration_us,
    sum_value): gap-based sessions per user; session_id is the user's
    1-based session ordinal by time."""
    ev = events.select(
        "user_id", "event_id", _epoch_us("ts").alias("us"),
        F.coalesce(F.col("value"), F.lit(0.0)).alias("value"),
    )
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    gap_us = int(gap_s) * 1_000_000
    flagged = ev.withColumn(
        "new_s",
        F.when(
            F.lag("us").over(w).isNull()
            | ((F.col("us") - F.lag("us").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    sid = flagged.withColumn(
        "session_id",
        F.sum("new_s").over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ).cast("long"),
    )
    return (
        sid.groupBy("user_id", "session_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(
            "user_id", "session_id", "n_events", "start_us", "end_us",
            (F.col("end_us") - F.col("start_us")).alias("duration_us"),
            "sum_value",
        )
    )
