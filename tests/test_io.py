"""IO: Vite binary CSR round-trip, converters, generators (SURVEY.md §2.1/2.2)."""

from __future__ import annotations

import os

import numpy as np
import pytest

from vite_spark import fixtures as fx
from vite_spark.io.generators import (
    lcg_drand,
    lcg_stream,
    rgg_edges_np,
    rgg_radius,
    seed_seq_1,
)
from vite_spark.io.vite_binary import (
    read_vite_binary_np,
    write_vite_binary,
)


def test_seed_seq_matches_cpp():
    """Bit-exact vs g++ (values captured from std::seed_seq)."""
    assert seed_seq_1(1) == 1967017404
    assert seed_seq_1(42) == 2934951935
    assert seed_seq_1(123) == 172569174
    assert seed_seq_1(2026) == 4187536447


def test_lcg_sequential_vs_jump():
    """Closed-form rank jump == sequentially generated stream
    (utils.hpp parallel_prefix_op semantics)."""
    full = lcg_stream(1, 1000)
    # sequential recurrence check
    x = full[0]
    for i in range(1, 50):
        x = (x * 16807) % 2147483647
        assert x == full[i]
    # jump: rank r of p=4, n=250 starts at index 500 for r=2
    part = lcg_stream(1, 250, start_index=500)
    assert np.array_equal(part, full[500:750])
    d = lcg_drand(1, 10)
    assert ((d >= 0) & (d < 1)).all()


def test_vite_binary_roundtrip(tmp_path):
    s, d, w, nv = fx.karate()
    p = str(tmp_path / "karate.bin")
    write_vite_binary(p, s, d, w, nv)
    s2, d2, w2, nv2 = read_vite_binary_np(p)
    assert nv2 == nv and len(s2) == len(s)
    # same multiset of edges
    a = sorted(zip(s.tolist(), d.tolist(), w.tolist()))
    b = sorted(zip(s2.tolist(), d2.tolist(), w2.tolist()))
    assert a == b
    # second write is byte-identical (deterministic CSR order)
    p2 = str(tmp_path / "karate2.bin")
    write_vite_binary(p2, s2, d2, w2, nv2)
    assert open(p, "rb").read() == open(p2, "rb").read()


def test_vite_binary_spark_readers(spark, tmp_path):
    from vite_spark.io.vite_binary import read_vite_binary, read_vite_binary_dist

    s, d, w, nv = fx.karate()
    p = str(tmp_path / "karate.bin")
    write_vite_binary(p, s, d, w, nv)
    for df in (
        read_vite_binary(spark, p),
        read_vite_binary_dist(spark, p, num_parts=4),
        read_vite_binary_dist(spark, p, num_parts=4, edge_balanced=True),
    ):
        rows = sorted((r["src"], r["dst"], r["weight"]) for r in df.collect())
        assert rows == sorted(zip(s.tolist(), d.tolist(), w.tolist()))


def test_rgg_generator_partition_independent():
    """Same graph for any logical p dividing nv (LCG jump correctness +
    distance rule; FIXTURES.md rgg_256_p4)."""
    e1 = rgg_edges_np(256, 1)
    e4 = rgg_edges_np(256, 4)
    # coordinates differ per-strip layout?? No: logical rank owns ids
    # [r*n,(r+1)*n) and uses stream slice [r*2n,(r+1)*2n) — p=1 vs p=4 give
    # DIFFERENT coords by design (reference behavior: the graph depends on
    # p). Assert instead: deterministic repeatability + symmetry.
    assert np.array_equal(e4[0], rgg_edges_np(256, 4)[0])
    s, d, w, nv = e4
    pairs = {(a, b): ww for a, b, ww in zip(s.tolist(), d.tolist(), w.tolist())}
    for (a, b), ww in pairs.items():
        assert pairs[(b, a)] == ww
    assert len(s) > 0
    assert (w <= rgg_radius(256) + 1e-15).all()


def test_rgg_spark_matches_numpy(spark):
    from vite_spark.io.generators import rgg_edges_spark

    s, d, w, nv = rgg_edges_np(128, 4)
    df = rgg_edges_spark(spark, 128, 4)
    rows = sorted((r["src"], r["dst"], round(r["weight"], 12)) for r in df.collect())
    ref = sorted(zip(s.tolist(), d.tolist(), np.round(w, 12).tolist()))
    assert rows == ref


def test_converters(spark, tmp_path):
    from vite_spark.io.edgelist import (
        load_dimacs,
        load_matrix_market,
        load_metis,
        load_pajek,
        load_simple,
        load_simple_strings,
        load_simple_undirected,
        load_snap,
    )

    # simple directed
    p = tmp_path / "g.txt"
    p.write_text("0 1 2.0\n1 2 1.0\n")
    e = load_simple(spark, str(p), weight_mode="org")
    rows = {(r["src"], r["dst"]): r["weight"] for r in e.collect()}
    assert rows == {(0, 1): 2.0, (1, 0): 2.0, (1, 2): 1.0, (2, 1): 1.0}

    # simple undirected (already doubled)
    p2 = tmp_path / "g2.txt"
    p2.write_text("0 1\n1 0\n")
    assert load_simple_undirected(spark, str(p2)).count() == 2

    # bio strings with threshold
    p3 = tmp_path / "g3.txt"
    p3.write_text("geneA geneB 0.001\ngeneA geneC 0.5\n")
    e3, mapping = load_simple_strings(spark, str(p3), threshold=1e-2)
    assert e3.count() == 2  # only the 0.001 row survives, symmetrized
    assert {r["name"] for r in mapping.collect()} >= {"geneA", "geneB"}

    # snap with comments and arbitrary ids
    p4 = tmp_path / "g4.txt"
    p4.write_text("# Nodes: 3 Edges: 2\n100 500\n500 900\n")
    e4, m4 = load_snap(spark, str(p4))
    ids = {r["orig_id"]: r["id"] for r in m4.collect()}
    assert ids == {100: 0, 500: 1, 900: 2}
    assert e4.count() == 4

    # matrix market symmetric
    p5 = tmp_path / "g5.mtx"
    p5.write_text("%%MatrixMarket matrix coordinate real symmetric\n3 3 2\n2 1 5.0\n3 2 1.5\n")
    e5 = load_matrix_market(spark, str(p5))
    rows5 = {(r["src"], r["dst"]): r["weight"] for r in e5.collect()}
    assert rows5 == {(1, 0): 5.0, (0, 1): 5.0, (2, 1): 1.5, (1, 2): 1.5}

    # metis
    p6 = tmp_path / "g6.graph"
    p6.write_text("3 2\n2 3\n1\n1\n")
    e6 = load_metis(spark, str(p6))
    rows6 = {(r["src"], r["dst"]) for r in e6.collect()}
    assert rows6 == {(0, 1), (0, 2), (1, 0), (2, 0)}

    # pajek
    p7 = tmp_path / "g7.net"
    p7.write_text("*Vertices 3\n1 \"a\"\n2 \"b\"\n3 \"c\"\n*Edges\n1 2\n2 3\n")
    e7 = load_pajek(spark, str(p7))
    assert e7.count() == 4

    # dimacs
    p8 = tmp_path / "g8.gr"
    p8.write_text("p sp 3 2\na 1 2 4\na 2 3 7\n")
    e8 = load_dimacs(spark, str(p8))
    rows8 = {(r["src"], r["dst"]): r["weight"] for r in e8.collect()}
    assert rows8 == {(0, 1): 4.0, (1, 0): 4.0, (1, 2): 7.0, (2, 1): 7.0}


def test_shards_glob(spark, tmp_path):
    from vite_spark.io.edgelist import load_shards

    (tmp_path / "c1.txt").write_text("1 2\n")
    (tmp_path / "c2.txt").write_text("2 3\n")
    e = load_shards(spark, str(tmp_path / "c*.txt"), one_based=True)
    rows = {(r["src"], r["dst"]) for r in e.collect()}
    assert rows == {(0, 1), (1, 0), (1, 2), (2, 1)}
