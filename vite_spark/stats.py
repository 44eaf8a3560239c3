"""Exact distributed order statistics / quantiles — no global sort.

``exact_quantiles`` computes continuous (type-7 / linear-interpolation)
quantiles of a numeric column EXACTLY, the way a 100 TB engine has to:
the needed order statistics are located by iterative histogram
refinement — each round one full-scan aggregation (map-side combinable,
B+2 rows per target out) narrows every target's candidate value range by
~``bins``×, and the walk finishes with one bounded ``(value, count)``
collect inside the final sliver. Nothing is ever globally sorted and no
more than ``collect_limit`` distinct values cross the driver boundary.

This is the classic distributed-selection recipe (iterative bucket
refinement, cf. Blum et al. selection generalized to histograms); Spark's
own ``approxQuantile`` is sketch-based and NON-deterministic across
engines, which is why it cannot be driver-oracled — this operator is
exact, so DuckDB computing the same formula over a full sort must match
bit-for-bit after the shared round-6 emit.

Float-safety: bucket boundaries are re-derived in driver Python and then
WIDENED by one ulp on each side before becoming the next round's range —
rows are never attributed by inverting executor float arithmetic. Each
round recounts ``v < lo`` exactly, so a widened range costs one extra
shrink step, never correctness.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F


def _kth_values(
    base: DataFrame,
    ks: list[int],
    bins: int = 4096,
    collect_limit: int = 4096,
    max_rounds: int = 64,
) -> dict[int, float]:
    """Exact k-th smallest value (0-indexed) of column ``v`` for each k.

    ``base`` must be a single-column DataFrame named ``v`` (doubles,
    nulls already dropped) — typically persisted by the caller since it
    is scanned once per refinement round.
    """
    row = base.agg(F.min("v").alias("mn"), F.max("v").alias("mx")).collect()[0]
    results: dict[int, float] = {}
    state: dict[int, tuple[float, float]] = {
        k: (float(row["mn"]), float(row["mx"])) for k in ks
    }

    for _ in range(max_rounds):
        active = {k: r for k, r in state.items() if k not in results}
        for k, (lo, hi) in list(active.items()):
            if lo == hi:  # range collapsed to a single representable value
                results[k] = lo
                del active[k]
        if not active:
            break

        order = sorted(active)  # deterministic target indexing
        entries = []
        for i, k in enumerate(order):
            lo, hi = active[k]
            v = F.col("v")
            b = (
                F.when(v < lo, F.lit(-1))
                .when(v > hi, F.lit(None).cast("int"))
                .otherwise(
                    F.least(
                        F.lit(bins - 1),
                        F.greatest(
                            F.lit(0),
                            F.floor((v - lo) / (hi - lo) * bins).cast("int"),
                        ),
                    )
                )
            )
            entries.append(F.struct(F.lit(i).alias("t"), b.alias("b")))
        hist_rows = (
            base.select(F.explode(F.array(*entries)).alias("s"))
            .select("s.t", "s.b")
            .filter(F.col("b").isNotNull())
            .groupBy("t", "b")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        hist: dict[int, dict[int, int]] = {i: {} for i in range(len(order))}
        for r in hist_rows:
            hist[r["t"]][r["b"]] = r["c"]

        for i, k in enumerate(order):
            lo, hi = active[k]
            below = hist[i].get(-1, 0)
            local = k - below  # 0-indexed rank within [lo, hi]
            cum = 0
            j = None
            for bb in range(bins):
                c = hist[i].get(bb, 0)
                if cum + c > local:
                    j = bb
                    break
                cum += c
            assert j is not None, (k, lo, hi, below, local)
            c_j = hist[i][j]
            w = (hi - lo) / bins
            blo = lo if j == 0 else math.nextafter(lo + j * w, -math.inf)
            bhi = hi if j == bins - 1 else math.nextafter(
                lo + (j + 1) * w, math.inf)
            blo, bhi = max(blo, lo), min(bhi, hi)
            saturated = (blo, bhi) == (lo, hi)
            if c_j <= collect_limit or saturated:
                # finalize: bounded (value, count) collect in the sliver.
                # below/cum were counted against the PARENT range, so
                # recount v < blo exactly rather than trusting float
                # bucket inversion.
                inside = base.filter((F.col("v") >= blo) & (F.col("v") <= bhi))
                n_lt = base.filter(F.col("v") < blo).count()
                vals = sorted(
                    (rr["v"], rr["c"])
                    for rr in inside.groupBy("v")
                    .agg(F.count(F.lit(1)).alias("c"))
                    .collect()
                )
                idx = k - n_lt
                acc = 0
                for val, c in vals:
                    if acc + c > idx:
                        results[k] = float(val)
                        break
                    acc += c
                assert k in results, (k, n_lt, idx, len(vals))
            else:
                state[k] = (blo, bhi)

    missing = [k for k in ks if k not in results]
    if missing:
        raise RuntimeError(f"quantile refinement did not converge: {missing}")
    return results


def exact_quantiles(
    df: DataFrame,
    col: str,
    ps: list[float],
    bins: int = 4096,
    collect_limit: int = 4096,
    max_rounds: int = 64,
) -> DataFrame:
    """(p, q) — exact continuous quantiles of ``col`` (type-7: with
    h = (n−1)·p, q = v_⌊h⌋ + (h−⌊h⌋)·(v_⌊h⌋₊₁ − v_⌊h⌋) over the sorted
    values), rounded to 6dp. Distributed selection, no global sort."""
    spark = df.sparkSession
    base = (
        df.select(F.col(col).cast("double").alias("v"))
        .filter(F.col("v").isNotNull())
        .persist()
    )
    try:
        n = base.count()
        if n == 0:
            return spark.createDataFrame([], "p double, q double")
        targets: dict[float, tuple[int, int, float]] = {}
        ks: set[int] = set()
        for p in ps:
            h = (n - 1) * p
            lo = int(math.floor(h))
            hi = min(lo + 1, n - 1)
            targets[p] = (lo, hi, h)
            ks.update((lo, hi))
        kv = _kth_values(base, sorted(ks), bins, collect_limit, max_rounds)
        rows = []
        for p in ps:
            lo, hi, h = targets[p]
            vlo, vhi = kv[lo], kv[hi]
            rows.append((float(p), round(vlo + (h - lo) * (vhi - vlo), 6)))
        return spark.createDataFrame(rows, "p double, q double")
    finally:
        base.unpersist()
