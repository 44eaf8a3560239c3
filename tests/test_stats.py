"""Exact distributed quantiles (vite_spark/stats.py) vs the sorted-array
formula — correctness must be independent of bins/collect_limit knobs, so
tiny knobs (forcing many refinement rounds and the saturated-interval
path) are part of the matrix."""

from __future__ import annotations

import math
import random

import pytest


def _type7(sorted_vals, p):
    n = len(sorted_vals)
    h = (n - 1) * p
    lo = int(math.floor(h))
    hi = min(lo + 1, n - 1)
    return round(sorted_vals[lo] + (h - lo) * (sorted_vals[hi] - sorted_vals[lo]), 6)


PS = [0.0, 0.1, 0.5, 0.9, 0.99, 1.0]


@pytest.mark.parametrize(
    "bins,limit",
    [(4096, 4096), (4, 2), (16, 1)],
)
def test_exact_quantiles_random(spark, bins, limit):
    from vite_spark.stats import exact_quantiles

    rng = random.Random(7)
    # heavy duplicates + a wide-magnitude tail: the dup block saturates
    # whole buckets, the tail stretches early ranges
    vals = (
        [round(rng.uniform(0, 1), 3) for _ in range(400)]
        + [0.25] * 150
        + [rng.uniform(1e3, 1e9) for _ in range(50)]
    )
    df = spark.createDataFrame([(v,) for v in vals], "x double")
    got = {
        r["p"]: r["q"]
        for r in exact_quantiles(
            df, "x", PS, bins=bins, collect_limit=limit).collect()
    }
    sv = sorted(vals)
    for p in PS:
        assert got[p] == _type7(sv, p), (p, bins, limit)


def test_exact_quantiles_edge_cases(spark):
    from vite_spark.stats import exact_quantiles

    # all-equal: every quantile is the value
    df = spark.createDataFrame([(3.5,)] * 9, "x double")
    for r in exact_quantiles(df, "x", [0.0, 0.5, 1.0], bins=4).collect():
        assert r["q"] == 3.5

    # single row
    df1 = spark.createDataFrame([(42.0,)], "x double")
    assert exact_quantiles(df1, "x", [0.5]).collect()[0]["q"] == 42.0

    # integers + nulls dropped
    df2 = spark.createDataFrame(
        [(1,), (2,), (3,), (4,), (None,)], "x int")
    got = {r["p"]: r["q"]
           for r in exact_quantiles(df2, "x", [0.5, 1.0], bins=4,
                                    collect_limit=1).collect()}
    assert got[0.5] == 2.5 and got[1.0] == 4.0

    # two adjacent representable doubles: the saturated-interval path must
    # converge (the interval cannot shrink, so the sliver collect fires
    # even above collect_limit); the round-6 emit maps both to 1.0
    a = 1.0
    b = math.nextafter(a, math.inf)
    df3 = spark.createDataFrame([(a,), (a,), (b,)], "x double")
    got = {r["p"]: r["q"]
           for r in exact_quantiles(df3, "x", [0.0, 1.0], bins=4,
                                    collect_limit=1).collect()}
    assert got[0.0] == a and got[1.0] == round(b, 6) == 1.0
