"""CLI entrypoint — the reference getopt surface (main.cpp:609-769) for
spark-submit (a 2-line driver file importing ``main`` from the shipped
zip, since spark-submit takes a script, not a module):

    $ cat run_vite.py
    from vite_spark.cli import main
    main()
    $ spark-submit --master <url> --py-files vite_spark.zip run_vite.py \
        -f graph.bin [-b] [-c|-o] [-t 1..4] [-i] [-p] [-h 1e-6] \
        [-n NV [-e PCT]] [-s out.bin] [-g truth [-z]] [-o-dir OUT]

(locally, ``python -m vite_spark.cli ...`` is equivalent;
tests/test_cli.py smokes BOTH invocation paths, including the zip.)

Flag parity: -f input (binary CSR | .txt edge list | parquet edge table |
parquet repos table), -b edge-balanced read, -c coloring, -or vertex
ordering (reference -o), -t ET type, -i threshold cycling, -p one phase,
-h threshold, -n/-e RGG generate, -s save binary, -g ground truth
(-z zero-based is the default here; --one-based flips), plus Spark-native
--checkpoint-dir/--cores/--shuffle-partitions.
"""

from __future__ import annotations

import argparse
import json
import sys


def build_parser():
    p = argparse.ArgumentParser(prog="vite_spark")
    p.add_argument("-f", "--input", help="input graph (bin/txt/parquet)")
    p.add_argument("--input-format", default="auto",
                   choices=["auto", "vite-bin", "edgelist", "parquet-edges",
                            "parquet-repos"])
    p.add_argument("-b", "--edge-balanced", action="store_true")
    p.add_argument("-c", "--coloring", action="store_true")
    p.add_argument("--vertex-ordering", action="store_true")  # reference -o
    p.add_argument("-t", "--early-term", type=int, default=0, choices=[0, 1, 2, 3, 4])
    p.add_argument("-i", "--threshold-cycling", action="store_true")
    p.add_argument("-p", "--one-phase", action="store_true")
    p.add_argument("--threshold", type=float, default=1e-6)  # reference -h
    p.add_argument("-n", "--generate-nv", type=int, help="generate RGG with nv vertices")
    p.add_argument("-e", "--extra-edge-pct", type=float, default=0.0)
    p.add_argument("-s", "--save-binary", help="write the edge table as Vite binary CSR")
    p.add_argument("-g", "--ground-truth")
    p.add_argument("--one-based-truth", action="store_true")
    p.add_argument("--output", help="write .communities text + parquet assignment here")
    p.add_argument("--checkpoint-dir")
    p.add_argument("--cores", default=None)
    p.add_argument("--shuffle-partitions", type=int, default=None)
    p.add_argument("--algo", default="louvain",
                   choices=["louvain", "pagerank", "cc", "lpa", "triangles"])
    return p


def load_graph(spark, args):
    from pyspark.sql import functions as F

    if args.generate_nv:
        from vite_spark.io.generators import rgg_edges_np, extra_random_edges_np
        import pandas as pd

        parts = int(spark.conf.get("spark.sql.shuffle.partitions", "32"))
        s, d, w, nv = rgg_edges_np(args.generate_nv, max(1, min(parts, 8)))
        if args.extra_edge_pct > 0:
            s, d, w, nv = extra_random_edges_np(s, d, w, nv, args.extra_edge_pct)
        return spark.createDataFrame(
            pd.DataFrame({"src": s, "dst": d, "weight": w}),
            schema="src long, dst long, weight double",
        )

    path = args.input
    fmt = args.input_format
    if fmt == "auto":
        if path.endswith(".bin"):
            fmt = "vite-bin"
        elif path.endswith((".txt", ".edges", ".csv")):
            fmt = "edgelist"
        else:
            fmt = "parquet-edges"
    if fmt == "vite-bin":
        from vite_spark.io.vite_binary import read_vite_binary_dist

        return read_vite_binary_dist(spark, path, edge_balanced=args.edge_balanced)
    if fmt == "edgelist":
        from vite_spark.io.edgelist import load_simple

        return load_simple(spark, path)
    if fmt == "parquet-repos":
        from vite_spark.derive import repos_to_edges

        edges, _ = repos_to_edges(spark.read.parquet(path))
        return edges
    return spark.read.parquet(path)


def main(argv=None):
    args = build_parser().parse_args(argv)
    from vite_spark.session import get_spark
    from vite_spark.config import EngineConfig

    spark = get_spark(cores=args.cores, shuffle_partitions=args.shuffle_partitions)
    edges = load_graph(spark, args)

    if args.save_binary:
        from vite_spark.io.vite_binary import write_vite_binary
        import numpy as np

        pdf = edges.toPandas()
        nv = int(max(pdf["src"].max(), pdf["dst"].max())) + 1
        write_vite_binary(
            args.save_binary,
            pdf["src"].to_numpy(np.int64), pdf["dst"].to_numpy(np.int64),
            pdf["weight"].to_numpy(np.float64), nv,
        )

    out = {}
    if args.algo == "louvain":
        from vite_spark.algos.louvain import louvain
        from vite_spark.runtime.metrics import MetricsCollector

        cfg = EngineConfig(
            threshold=args.threshold,
            threshold_cycling=args.threshold_cycling,
            one_phase=args.one_phase,
            early_term=args.early_term,
            coloring=args.coloring,
            vertex_ordering=args.vertex_ordering,
            checkpoint_dir=args.checkpoint_dir,
        )
        metrics = MetricsCollector(out_dir=args.checkpoint_dir)
        res = louvain(spark, edges, cfg, metrics=metrics)
        tot = metrics.totals()
        # reference end-of-run metrics (main.cpp:517-540)
        out = {
            "final_q": res.final_q,
            "levels": res.levels,
            "iters_per_phase": res.iters_per_phase,
            "q_per_phase": res.q_per_phase,
            "TEPS": tot["edges_per_sec"],
            "MODS": res.final_q * tot["wall_s"],
        }
        if args.output:
            from vite_spark.eval.compare import write_communities

            res.labels.write.mode("overwrite").parquet(args.output + ".parquet")
            write_communities(res.labels, args.output + ".communities")
        if args.ground_truth:
            from vite_spark.eval.compare import (
                gini_coefficient,
                load_ground_truth,
                pair_counting_scores,
            )

            gt = load_ground_truth(spark, args.ground_truth,
                                   one_based=args.one_based_truth)
            out["compare"] = pair_counting_scores(gt, res.labels)
            out["gini"] = gini_coefficient(res.labels)
    elif args.algo == "pagerank":
        from vite_spark.algos.pagerank import pagerank

        df = pagerank(spark, edges)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
        out = {"rows": df.count()}
    elif args.algo == "cc":
        from vite_spark.algos.components import connected_components

        df = connected_components(spark, edges)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
        out = {"components": df.select("component").distinct().count()}
    elif args.algo == "lpa":
        from vite_spark.algos.lpa import label_propagation

        df = label_propagation(spark, edges)
        if args.output:
            df.write.mode("overwrite").parquet(args.output)
        out = {"labels": df.select("label").distinct().count()}
    elif args.algo == "triangles":
        from vite_spark.algos.triangles import triangle_count

        out = {"triangles": triangle_count(spark, edges)}

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
