"""Structured Streaming ops pinned to their batch equivalents: each op is
drained over the static events table with Trigger.AvailableNow and must
reproduce exactly what the batch DataFrame computation says."""

from __future__ import annotations

from pyspark.sql import functions as F

from vite_spark.streaming import (
    EVENT_SCHEMA,
    cooccur_edge_stream,
    run_available_now,
    running_user_stats,
    stream_events,
    streaming_dedup,
    windowed_event_counts,
)

SRC = "/root/testdata/sf0.001/events.parquet"
# the file-stream source requires a directory or glob (basePath must be a
# directory); the glob's non-wildcard prefix is the sf dir
SRC_GLOB = "/root/testdata/sf0.001/events.*"


def _batch_events(spark):
    return spark.read.parquet(SRC)


def _epoch(col: str):
    return F.expr(
        f"timestampdiff(SECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {col})"
    )


def test_windowed_counts_match_batch(spark):
    st = windowed_event_counts(stream_events(spark, SRC_GLOB))
    got = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in run_available_now(st, output_mode="complete").collect()
    }
    exp = {
        (r["window_start"], r["event_type"]): (r["n"], r["total_value"])
        for r in _batch_events(spark)
        .groupBy(
            (F.floor(_epoch("ts") / 600) * 600).alias("window_start"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .collect()
    }
    assert got == exp and len(got) > 10


def test_streaming_dedup_drops_replayed_files(spark, tmp_path):
    # two copies of the same file = every event arrives twice
    import shutil

    d = tmp_path / "events_dup"
    d.mkdir()
    shutil.copy(SRC, d / "a.parquet")
    shutil.copy(SRC, d / "b.parquet")
    st = streaming_dedup(stream_events(spark, str(d)))
    out = run_available_now(st, output_mode="append")
    n_distinct = _batch_events(spark).count()
    assert out.count() == n_distinct
    assert out.select("event_id").distinct().count() == n_distinct


def test_running_user_stats_match_batch(spark):
    st = running_user_stats(stream_events(spark, SRC_GLOB))
    rows = run_available_now(st, output_mode="update").collect()
    # keep the LAST update per user (multi-batch runs emit intermediates)
    got = {}
    for r in rows:
        prev = got.get(r["user_id"])
        if prev is None or r["n_events"] > prev[0]:
            got[r["user_id"]] = (r["n_events"], r["total_value"])
    exp = {
        r["user_id"]: (r["n"], r["tot"])
        for r in _batch_events(spark)
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 6).alias("tot"),
        )
        .collect()
    }
    assert got == exp


def test_cooccur_edge_stream_matches_batch(spark):
    st = cooccur_edge_stream(stream_events(spark, SRC_GLOB))
    got = {
        (r["window_start"], r["event_type"], r["src"], r["dst"])
        for r in run_available_now(st, output_mode="complete").collect()
    }
    b = (
        _batch_events(spark)
        .groupBy(
            (F.floor(_epoch("ts") / 600) * 600).alias("window_start"),
            "event_type",
        )
        .agg(F.collect_set("user_id").alias("users"))
    )
    us = F.array_sort("users")
    exp = {
        (r["window_start"], r["event_type"], r["src"], r["dst"])
        for r in b.select(
            "window_start", "event_type", F.explode(us).alias("src"), us.alias("au")
        )
        .select("window_start", "event_type", "src", F.explode("au").alias("dst"))
        .filter(F.col("src") < F.col("dst"))
        .collect()
    }
    assert got == exp and len(got) > 0


def test_cooccur_edge_stream_hot_bucket_cap(spark, tmp_path):
    """One hot (event_type, window) bucket with more users than the cap:
    the emitted pairs are bounded at C(K,2) over the K SMALLEST user_ids
    (r2 VERDICT wrong#3 — uncapped fan-out is k² per bucket)."""
    import datetime as dt

    import pandas as pd

    d = tmp_path / "events_hot"
    d.mkdir()
    n_users, cap = 20, 5
    base = dt.datetime(2024, 1, 1, 0, 1, 0)
    pdf = pd.DataFrame(
        {
            "event_id": range(n_users),
            "ts": [base] * n_users,
            "user_id": list(range(n_users)),
            "event_type": ["hot"] * n_users,
            "value": [1.0] * n_users,
            "props": ["{}"] * n_users,
        }
    )
    spark.createDataFrame(pdf, schema=EVENT_SCHEMA).coalesce(1).write.parquet(
        str(d / "part"), mode="overwrite"
    )
    st = cooccur_edge_stream(
        stream_events(spark, str(d / "part")), max_bucket_users=cap
    )
    rows = run_available_now(st, output_mode="complete").collect()
    # exactly C(cap, 2) pairs, all among the cap smallest user ids
    assert len(rows) == cap * (cap - 1) // 2
    assert all(r["src"] < r["dst"] < cap for r in rows)
    # uncapped control emits the full C(n_users, 2)
    st_all = cooccur_edge_stream(
        stream_events(spark, str(d / "part")), max_bucket_users=None
    )
    assert (
        run_available_now(st_all, output_mode="complete").count()
        == n_users * (n_users - 1) // 2
    )


def test_cooccur_bounded_hot_bucket_state_and_parity(spark, tmp_path):
    """The state-bounded co-occurrence variant (applyInPandasWithState,
    r3 VERDICT next#5): a hot bucket with 4x more users than the cap must
    (a) keep only the smallest-K set as state (asserted inside the update
    fn — O(K), not O(distinct users)), and (b) emit exactly the capped
    pairs the collect_set form emits. A far-future sentinel event pushes
    the watermark past the hot window so its bucket times out and emits
    within the finite drain."""
    import datetime as dt
    import os
    import time

    import pandas as pd

    from vite_spark.streaming import cooccur_edge_stream_bounded

    d = tmp_path / "events_bounded"
    d.mkdir()
    n_users, cap = 20, 5
    base = dt.datetime(2024, 1, 1, 0, 1, 0)
    hot = pd.DataFrame(
        {
            "event_id": range(n_users),
            "ts": [base] * n_users,
            "user_id": list(range(n_users)),
            "event_type": ["hot"] * n_users,
            "value": [1.0] * n_users,
            "props": ["{}"] * n_users,
        }
    )
    sentinel = pd.DataFrame(
        {
            "event_id": [10_000],
            "ts": [base + dt.timedelta(hours=6)],   # wm = 6h - 30min >> hot window end
            "user_id": [10_000],
            "event_type": ["sentinel"],
            "value": [0.0],
            "props": ["{}"],
        }
    )
    spark.createDataFrame(hot, schema=EVENT_SCHEMA).coalesce(1).write.parquet(
        str(d / "a"), mode="overwrite"
    )
    spark.createDataFrame(sentinel, schema=EVENT_SCHEMA).coalesce(1).write.parquet(
        str(d / "b"), mode="overwrite"
    )
    now = time.time()
    for sub, when in (("a", now - 60), ("b", now)):    # a strictly first
        for f in (d / sub).glob("*.parquet"):
            os.utime(f, (when, when))

    src = (
        spark.readStream.schema(EVENT_SCHEMA)
        .option("maxFilesPerTrigger", 1)               # force 2+ batches
        .parquet(str(d / "*"))
    )
    st = cooccur_edge_stream_bounded(src, max_bucket_users=cap)
    rows = run_available_now(st, output_mode="append").collect()

    got = {(r["window_start"], r["event_type"], r["src"], r["dst"])
           for r in rows}
    # identical to the collect_set form's capped output for the closed
    # (hot) bucket; the sentinel's bucket is still open -> withheld
    st_ref = cooccur_edge_stream(
        stream_events(spark, str(d / "*")), max_bucket_users=cap
    )
    ref = {(r["window_start"], r["event_type"], r["src"], r["dst"])
           for r in run_available_now(st_ref, output_mode="complete").collect()
           if r["event_type"] == "hot"}
    assert len(ref) == cap * (cap - 1) // 2
    assert got == ref


def test_session_stream_matches_batch_and_replay(spark):
    """session_stream drained over the static table equals (a) the same
    session_window expression evaluated in BATCH, and (b) a pure-Python
    replay of the >=-gap split rule."""
    from vite_spark.streaming import session_stream

    st = session_stream(stream_events(spark, SRC_GLOB))
    got = {
        (r["user_id"], r["start_us"]):
        (r["end_us"], r["n_events"], r["duration_us"], r["sum_value"])
        for r in run_available_now(st, output_mode="complete").collect()
    }

    # (a) batch session_window on the same frame
    ev = _batch_events(spark)
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)")
    batch = (
        ev.withColumn("__ts_us", F.timestamp_micros(us)).withColumn("us", us)
        .groupBy(F.session_window("__ts_us", "30 minutes"), "user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("us").alias("start_us"),
            F.max("us").alias("end_us"),
            F.round(F.sum(F.coalesce(F.col("value"), F.lit(0.0))), 6)
            .alias("sum_value"),
        )
    )
    exp = {
        (r["user_id"], r["start_us"]):
        (r["end_us"], r["n_events"], r["end_us"] - r["start_us"],
         r["sum_value"])
        for r in batch.collect()
    }
    assert got == exp and len(got) > 50

    # (b) pure-Python replay of the >= split rule
    rows = sorted(
        ((r["user_id"], int(r["us"]), 0.0 if r["value"] is None else r["value"])
         for r in ev.withColumn("us", us).select("user_id", "us", "value")
         .collect()),
    )
    gap = 1800 * 1_000_000
    sessions = {}
    cur = {}
    for uid, t, v in rows:
        c = cur.get(uid)
        if c is None or t - c["last"] > gap:
            if c is not None:
                sessions[(uid, c["start"])] = c
            c = {"start": t, "last": t, "n": 0, "sum": 0.0}
            cur[uid] = c
        c["last"] = t
        c["n"] += 1
        c["sum"] += v
    for uid, c in cur.items():
        sessions[(uid, c["start"])] = c
    assert set(got) == set(sessions)
    for k, c in sessions.items():
        e, n, d, s = got[k]
        assert (e, n, d) == (c["last"], c["n"], c["last"] - c["start"])
        assert abs(s - round(c["sum"], 6)) < 1e-9


def test_session_stream_gap_boundary(spark, tmp_path):
    """Exactly-gap-apart events still MERGE (session_window's split rule
    is strict >, same as batch sessionize); one microsecond beyond splits.
    This pins the measured boundary semantics the docstring and the
    driver oracle rely on."""
    import datetime as dt

    from vite_spark.streaming import session_stream

    t0 = dt.datetime(2024, 1, 1, 0, 0, 0)
    rows = [
        # user 1: second event 1800 s + 1 us later -> two sessions
        (1, t0, 1, "a", 1.0, None),
        (2, t0 + dt.timedelta(seconds=1800, microseconds=1), 1, "a", 1.0,
         None),
        # user 2: second event exactly 1800 s later -> ONE session
        (3, t0, 2, "a", 1.0, None),
        (4, t0 + dt.timedelta(seconds=1800), 2, "a", 1.0, None),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, et, v, p) for i, ts, u, et, v, p in rows], EVENT_SCHEMA)
    d = tmp_path / "events_gap"
    df.coalesce(1).write.parquet(str(d))
    st = session_stream(stream_events(spark, str(d)))
    out = run_available_now(st, output_mode="complete").collect()
    per_user = {}
    for r in out:
        per_user.setdefault(r["user_id"], []).append(r)
    assert len(per_user[1]) == 2
    assert all(r["n_events"] == 1 for r in per_user[1])
    assert len(per_user[2]) == 1 and per_user[2][0]["n_events"] == 2
