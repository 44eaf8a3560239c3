"""Gap sessionization (vite_spark/events.py) and tf-idf top terms
(text/analysis.py) vs hand-computed / pure-Python references."""

from __future__ import annotations

import datetime
import math

import pandas as pd

from vite_spark.events import sessionize
from vite_spark.text.analysis import tfidf_top_terms


def _ev(spark, rows):
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id", "value"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    df = spark.createDataFrame(pdf)
    return df.select(
        "event_id", df["ts"].cast("timestamp_ntz").alias("ts"),
        "user_id", "value")


def test_sessionize_gaps_and_ordinals(spark):
    t0 = datetime.datetime(2024, 1, 1, 0, 0, 0)
    mins = datetime.timedelta(minutes=1)
    rows = [
        # user 1: events at 0, 10, 29, then 70 (gap 41 > 30 → new session)
        (1, t0, 1, 1.0),
        (2, t0 + 10 * mins, 1, 2.0),
        (3, t0 + 29 * mins, 1, 3.0),
        (4, t0 + 70 * mins, 1, 4.0),
        # user 2: exactly-30-minute gap does NOT split (> , not ≥)
        (5, t0, 2, 1.5),
        (6, t0 + 30 * mins, 2, None),
    ]
    got = {(r["user_id"], r["session_id"]):
           (r["n_events"], r["duration_us"], r["sum_value"])
           for r in sessionize(_ev(spark, rows)).collect()}
    assert got == {
        (1, 1): (3, 29 * 60 * 1_000_000, 6.0),
        (1, 2): (1, 0, 4.0),
        (2, 1): (2, 30 * 60 * 1_000_000, 1.5),  # null value → 0
    }


def test_sessionize_same_ts_orders_by_event_id(spark):
    t0 = datetime.datetime(2024, 1, 1)
    rows = [(9, t0, 1, 1.0), (3, t0, 1, 1.0), (7, t0, 1, 1.0)]
    got = sessionize(_ev(spark, rows)).collect()
    assert len(got) == 1 and got[0]["n_events"] == 3


def test_tfidf_matches_python(spark):
    docs = [
        (1, "a b b c"),
        (2, "b c c d"),
        (3, "a a e e e"),
    ]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["doc_id", "text"]))
    got = {(r["doc_id"], r["rank"]): (r["term"], r["tf"], r["df"], r["tfidf"])
           for r in tfidf_top_terms(df, k=2).collect()}

    tf = {}
    for d, text in docs:
        for t in text.split(" "):
            tf[(d, t)] = tf.get((d, t), 0) + 1
    dfs = {}
    for (_, t) in tf:
        dfs[t] = dfs.get(t, 0) + 1
    n = len(docs)
    want = {}
    for d, _ in docs:
        terms = [(round(tf[(d, t)] * math.log(n / dfs[t]), 6), t)
                 for (dd, t) in tf if dd == d]
        terms.sort(key=lambda x: (-x[0], x[1]))
        for rank, (s, t) in enumerate(terms[:2], 1):
            want[(d, rank)] = (t, tf[(d, t)], dfs[t], s)
    assert got == want


def test_tfidf_rank_is_deterministic_on_ties(spark):
    # every term appears once in one doc → all scores equal → rank by term
    df = spark.createDataFrame(
        pd.DataFrame([(1, "z y x")], columns=["doc_id", "text"]))
    got = [(r["rank"], r["term"]) for r in
           tfidf_top_terms(df, k=3).orderBy("rank").collect()]
    assert got == [(1, "x"), (2, "y"), (3, "z")]


def test_bm25_topk_matches_pure_python(spark):
    """bm25_topk replayed in pure Python (same idf formulation, same
    round-6 + exact-decimal accumulation) on a corpus with shared and
    discriminating terms; includes self-exclusion and tie determinism."""
    import math
    from decimal import Decimal

    from vite_spark.text.analysis import BM25_B, BM25_K1, bm25_topk

    texts = {
        0: "spark shuffle join spark partition",
        1: "spark shuffle broadcast join hint",
        2: "parquet scan pushdown filter prune",
        3: "spark parquet scan shuffle",
        4: "join join join shuffle",
        5: "filter prune scan parquet pushdown prune",
    }
    docs = spark.createDataFrame(
        sorted(texts.items()), "doc_id long, text string")
    qt = spark.createDataFrame(
        [(0, "spark"), (0, "join"), (2, "prune"), (2, "scan")],
        "query_id long, term string",
    )
    got = {
        (r["query_id"], r["rank"]): (r["doc_id"], r["score"])
        for r in bm25_topk(docs, qt, k=3).collect()
    }

    tok = {d: t.split(" ") for d, t in texts.items()}
    n = len(texts)
    avgdl = float(sum(len(v) for v in tok.values())) / n
    dfs = {}
    for v in tok.values():
        for t in set(v):
            dfs[t] = dfs.get(t, 0) + 1
    queries = {0: ["spark", "join"], 2: ["prune", "scan"]}
    for qid, terms in queries.items():
        scores = {}
        for d, v in tok.items():
            if d == qid:
                continue
            s = Decimal(0)
            for t in terms:
                tf = v.count(t)
                if not tf:
                    continue
                idf = math.log((n - dfs[t] + 0.5) / (dfs[t] + 0.5) + 1.0)
                c = idf * (tf * (BM25_K1 + 1.0)) / (
                    tf + BM25_K1 * (1.0 - BM25_B + BM25_B * len(v) / avgdl))
                s += Decimal(str(round(c, 6)))
            if s:
                scores[d] = float(s)
        order = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
        for rank, (d, sc) in enumerate(order[:3], 1):
            assert got[(qid, rank)] == (d, sc), (qid, rank)


def test_ppmi_pairs_matches_pure_python(spark):
    """ppmi_pairs replayed in pure Python on a corpus with one planted
    always-co-occurring pair (must rank first with positive pmi) and
    chance-level fillers."""
    import math
    from collections import Counter

    from vite_spark.text.analysis import ppmi_pairs

    texts = {
        0: "alpha beta x y z w",
        1: "alpha beta p q r s",
        2: "alpha beta m n o k",
        3: "x p m y q n w s k z r o",
    }
    docs = spark.createDataFrame(sorted(texts.items()),
                                 "doc_id long, text string")
    rows = ppmi_pairs(docs, k=10, window=3, min_count=2).collect()

    pairs = Counter()
    for t in texts.values():
        tk = t.split(" ")
        for i in range(len(tk)):
            for j in range(i + 1, min(i + 4, len(tk))):
                if tk[i] != tk[j]:
                    pairs[(min(tk[i], tk[j]), max(tk[i], tk[j]))] += 1
    n = sum(pairs.values())
    marg = Counter()
    for (a, b), c in pairs.items():
        marg[a] += c
        marg[b] += c
    sc = [
        (a, b, c, round(math.log(c * n / (marg[a] * marg[b])), 6))
        for (a, b), c in pairs.items() if c >= 2
    ]
    sc.sort(key=lambda r: (-r[3], r[0], r[1]))
    exp = [(a, b, c, p, max(0.0, p)) for a, b, c, p in sc[:10]]
    got = [(r["tok_a"], r["tok_b"], r["n_ab"], r["pmi"], r["ppmi"])
           for r in rows]
    assert got == exp
    # the planted pair is present, thrice-counted, positively associated
    # (rarer fillers can legitimately outrank it — marginals are smaller)
    ab = next(r for r in got if r[:2] == ("alpha", "beta"))
    assert ab[2] == 3 and ab[3] > 0 and ab[4] == ab[3]


def test_repetition_scores_hand_oracle(spark):
    from vite_spark.text.analysis import repetition_scores

    docs = spark.createDataFrame(
        [
            (0, "a a a a b"),          # heavy repetition
            (1, "p q r s t"),          # all distinct
            (2, "x y"),                # <3 tokens: whole-text gram branch
            (3, "go go go go"),        # one token only
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in repetition_scores(docs).collect()}

    r0 = got[0]
    assert r0["n_tokens"] == 5
    assert r0["distinct_token_ratio"] == round(2 / 5, 6)
    # 3-grams: aaa, aaa, aab -> 2 distinct of 3
    assert r0["distinct_3gram_ratio"] == round(2 / 3, 6)
    assert r0["top_token_share"] == round(4 / 5, 6)

    r1 = got[1]
    assert (r1["distinct_token_ratio"], r1["distinct_3gram_ratio"],
            r1["top_token_share"]) == (1.0, 1.0, 0.2)

    r2 = got[2]     # one whole-text "gram"
    assert r2["n_tokens"] == 2 and r2["distinct_3gram_ratio"] == 1.0

    r3 = got[3]     # gograms: gogogo x2 -> 1 distinct of 2
    assert r3["distinct_token_ratio"] == 0.25
    assert r3["distinct_3gram_ratio"] == 0.5
    assert r3["top_token_share"] == 1.0
