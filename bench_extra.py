#!/usr/bin/env python
"""Extra benchmarks for the optimization round (guide §1.4 noop-sink
isolation + per-phase decomposition). NOT the driver bench — bench.py is
frozen; numbers from here are cited in OPTIMIZATION_r06.md.

Usage:
  python bench_extra.py [--reps N] [--only q1,q2] [--explain-dir DIR]

Per query it reports: wall per rep, and for the composite graph queries a
phase split (derivation vs algorithm) using a pre-persisted edge table for
the second timing (the algorithm-only wall), plus MetricsCollector
superstep walls where the operator records them.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(spark, name, fn, out, reps=1):
    walls = []
    for _ in range(reps):
        spark.sparkContext.setJobDescription(name)
        t0 = time.time()
        fn()
        walls.append(round(time.time() - t0, 3))
        spark.sparkContext.setJobDescription(None)
    out[name] = walls
    print(f"{name}: {walls}", flush=True)
    return walls


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--only", type=str, default=None)
    ap.add_argument("--explain-dir", type=str, default=None)
    args = ap.parse_args()
    only = set(args.only.split(",")) if args.only else None

    from pyspark.sql import functions as F

    from vite_spark.session import get_spark
    from vite_spark.derive import lineitem_part_edges
    from vite_spark.config import EngineConfig
    from vite_spark.runtime.metrics import MetricsCollector
    from vite_spark import queries as Q

    spark = get_spark(app_name="bench_extra",
                      cores=os.environ.get("SPARK_GRAFT_CPUS", "32"))
    out: dict = {}

    def want(n):
        return only is None or n in only

    def explain(df, name):
        if args.explain_dir:
            os.makedirs(args.explain_dir, exist_ok=True)
            with open(os.path.join(args.explain_dir, name + ".txt"), "w") as f:
                f.write(df._sc._jvm.PythonSQLUtils.explainString(
                    df._jdf.queryExecution(), "formatted"))

    # ---- derivation alone (noop sink) ----
    if want("derive"):
        timed(spark, "derive_noop",
              lambda: noop(lineitem_part_edges(spark, SF_DIR)), out,
              reps=args.reps)
        explain(lineitem_part_edges(spark, SF_DIR), "derive")

    # persisted edges for algorithm-only walls
    edges = lineitem_part_edges(spark, SF_DIR).persist()
    ne = edges.count()
    out["edges"] = ne

    # ---- louvain: full (cold edges NOT included; bench uses persisted) ----
    if want("louvain"):
        from vite_spark.algos.louvain import louvain

        def run_louvain():
            m = MetricsCollector()
            res = louvain(spark, edges, EngineConfig(), metrics=m)
            res.labels.count()
            sup = [r for r in m.rows if r.get("kind") == "superstep"]
            out["louvain_supersteps"] = [
                {k: (round(r[k], 3) if isinstance(r[k], float) else r[k])
                 for k in ("iter", "wall_s", "mode", "level")
                 if k in r} for r in sup]
            out["louvain_phase_rows"] = [
                {k: (round(r[k], 4) if isinstance(r[k], float) else r[k])
                 for k in r if k != "kind"}
                for r in m.rows if r.get("kind") in ("phase", "pack", "local_phase")]
        timed(spark, "louvain_total", run_louvain, out, reps=args.reps)

    # ---- pagerank: derivation+algo vs algo-only, with superstep walls ----
    if want("pagerank"):
        timed(spark, "pagerank_full",
              lambda: Q.q_pagerank(spark, SF_DIR).count(), out,
              reps=args.reps)

        def pr_algo():
            from vite_spark.algos.pagerank import pagerank
            m = MetricsCollector()
            pagerank(spark, edges, damping=0.85, tol=0.0,
                     max_iter=Q.PR_ITERS, metrics=m).count()
            out["pagerank_supersteps"] = [
                round(r["wall_s"], 3) for r in m.rows
                if r.get("kind") == "pagerank_superstep"]
            out["pagerank_other_rows"] = [
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in r.items()}
                for r in m.rows if r.get("kind") != "pagerank_superstep"]
        timed(spark, "pagerank_algo_only", pr_algo, out, reps=args.reps)

    # ---- cc ----
    if want("cc"):
        timed(spark, "cc_full",
              lambda: Q.q_cc_sizes(spark, SF_DIR).count(), out,
              reps=args.reps)

        def cc_algo():
            from vite_spark.algos.components import (
                connected_components_twophase,
            )
            m = MetricsCollector()
            connected_components_twophase(spark, edges, metrics=m).groupBy(
                "component").agg(F.count(F.lit(1)).alias("n")).count()
            out["cc2_rounds"] = [
                round(r["wall_s"], 3) for r in m.rows
                if r.get("kind") == "cc2_round"]
        timed(spark, "cc_algo_only", cc_algo, out, reps=args.reps)

        def cc_packed():
            from vite_spark.algos.components import connected_components
            m = MetricsCollector()
            connected_components(spark, edges, metrics=m).groupBy(
                "component").agg(F.count(F.lit(1)).alias("n")).count()
            out["cc_packed_supersteps"] = [
                round(r["wall_s"], 3) for r in m.rows
                if r.get("kind") == "cc_superstep"]
        timed(spark, "cc_packed_algo_only", cc_packed, out, reps=args.reps)

    # ---- triangles ----
    if want("triangles"):
        timed(spark, "triangles_full",
              lambda: Q.q_triangles_total(spark, SF_DIR).collect(), out,
              reps=args.reps)

        def tri_algo():
            from vite_spark.algos.triangles import triangle_count
            m = MetricsCollector()
            triangle_count(spark, edges, metrics=m)
            out["tri_rows"] = [
                {k: (round(v, 3) if isinstance(v, float) else v)
                 for k, v in r.items() if k != "kind"}
                for r in m.rows]
        timed(spark, "triangles_algo_only", tri_algo, out, reps=args.reps)

    # ---- text queries ----
    if want("minhash"):
        timed(spark, "minhash_full",
              lambda: Q.q_minhash_pairs(spark, SF_DIR).count(), out,
              reps=args.reps)
        explain(Q.q_minhash_pairs(spark, SF_DIR), "minhash")
    if want("ann"):
        timed(spark, "ann_full",
              lambda: Q.q_ann_topk(spark, SF_DIR).count(), out,
              reps=args.reps)
    if want("simhash"):
        timed(spark, "simhash_full",
              lambda: Q.q_simhash(spark, SF_DIR).count(), out,
              reps=args.reps)
        explain(Q.q_simhash(spark, SF_DIR), "simhash")
    if want("quality"):
        timed(spark, "quality_full",
              lambda: Q.q_quality(spark, SF_DIR).count(), out,
              reps=args.reps)

    edges.unpersist()
    print(json.dumps(out))
    with open("/tmp/bench_extra_out.json", "w") as f:
        json.dump(out, f, indent=1)
    spark.stop()


if __name__ == "__main__":
    main()
