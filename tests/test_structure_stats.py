"""Round-4 structure stats (graph.py: reciprocity, avg_neighbor_degree,
rich_club) and pipeline gates (text/analysis.py: decontamination,
pii_scan) — hand-computed fixtures plus networkx cross-checks on a
seeded random graph (nx uses the same textbook definitions)."""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F


def _edges(spark, pairs, symmetrize=False):
    rows = [(int(a), int(b), 1.0) for a, b in pairs]
    if symmetrize:
        rows += [(int(b), int(a), 1.0) for a, b in pairs]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


# ------------------------------------------------------------ reciprocity

def test_reciprocity_hand(spark):
    from vite_spark.graph import reciprocity

    # 1<->2 reciprocated, 1->3 and 3->4 not; 5->5 loop ignored
    e = _edges(spark, [(1, 2), (2, 1), (1, 3), (3, 4), (5, 5)])
    row = reciprocity(e).collect()[0]
    assert (row["n_directed"], row["n_reciprocal"]) == (4, 2)
    assert row["reciprocity"] == 0.5


def test_reciprocity_vs_networkx(spark):
    import networkx as nx
    from vite_spark.graph import reciprocity

    rng = random.Random(11)
    pairs = {(rng.randrange(30), rng.randrange(30)) for _ in range(160)}
    pairs = [(a, b) for a, b in pairs if a != b]
    g = nx.DiGraph(pairs)
    row = reciprocity(_edges(spark, pairs)).collect()[0]
    assert row["reciprocity"] == round(nx.reciprocity(g), 6)


# ------------------------------------------------- average neighbor degree

def test_avg_neighbor_degree_star(spark):
    from vite_spark.graph import avg_neighbor_degree

    e = _edges(spark, [(0, i) for i in range(1, 5)], symmetrize=True)
    got = {r["deg"]: r for r in avg_neighbor_degree(e).collect()}
    assert got[4]["n_vertices"] == 1 and got[4]["knn"] == 1.0
    assert got[1]["n_vertices"] == 4 and got[1]["knn"] == 4.0


def test_avg_neighbor_degree_vs_networkx(spark):
    import networkx as nx
    from vite_spark.graph import avg_neighbor_degree

    g = nx.gnm_random_graph(40, 120, seed=7)
    got = {r["deg"]: r["knn"]
           for r in avg_neighbor_degree(
               _edges(spark, g.edges(), symmetrize=True)).collect()}
    want = nx.average_degree_connectivity(g)
    for k, v in want.items():
        if k == 0:
            continue  # isolated vertices never appear in an edge table
        assert got[k] == round(v, 6), k


# ----------------------------------------------------------- rich club

def test_rich_club_clique_plus_pendant(spark):
    from vite_spark.graph import rich_club

    # K4 on 1-4 plus pendant 5-1: deg(1)=4, deg(2..4)=3, deg(5)=1
    pairs = [(a, b) for a in range(1, 5) for b in range(a + 1, 5)] + [(1, 5)]
    out = {r["k"]: r for r in
           rich_club(_edges(spark, pairs, symmetrize=True),
                     ks=[1, 2, 3, 99]).collect()}
    assert (out[1]["n_nodes"], out[1]["n_edges"], out[1]["phi"]) == (4, 6, 1.0)
    assert (out[2]["n_nodes"], out[2]["n_edges"], out[2]["phi"]) == (4, 6, 1.0)
    assert (out[3]["n_nodes"], out[3]["n_edges"]) == (1, 0)
    assert out[3]["phi"] is None
    assert (out[99]["n_nodes"], out[99]["n_edges"]) == (0, 0)
    assert out[99]["phi"] is None


def test_rich_club_vs_networkx(spark):
    import networkx as nx
    from vite_spark.graph import rich_club

    g = nx.gnm_random_graph(60, 300, seed=3)
    ks = [1, 2, 4, 8, 12]
    out = {r["k"]: r["phi"]
           for r in rich_club(_edges(spark, g.edges(), symmetrize=True),
                              ks=ks).collect()}
    want = nx.rich_club_coefficient(g, normalized=False)
    for k in ks:
        if k in want:
            assert out[k] == round(want[k], 6), k


# ------------------------------------------------------- decontamination

def test_decontamination_hand(spark):
    from vite_spark.text.analysis import decontamination

    docs = spark.createDataFrame(
        [
            (0, "a b c d e"),        # benchmark (doc_id % 20 == 0)
            (1, "a b c x y"),        # shares shingle a_b_c -> 1/3
            (2, "z z z z"),          # one distinct shingle, no overlap
            (20, "q r s t"),         # benchmark too
            (3, "q r s t u"),        # q_r_s and r_s_t hit -> 2/3
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in decontamination(docs).collect()}
    assert set(got) == {1, 2, 3}  # benchmark docs are not scored
    assert (got[1]["n_shingles"], got[1]["n_hit"]) == (3, 1)
    assert got[1]["contamination"] == round(1 / 3, 6)
    assert (got[2]["n_shingles"], got[2]["n_hit"]) == (1, 0)
    assert got[2]["contamination"] == 0.0
    assert (got[3]["n_shingles"], got[3]["n_hit"]) == (3, 2)
    assert got[3]["contamination"] == round(2 / 3, 6)


# ------------------------------------------------------------- pii scan

def test_pii_scan_augmented_and_native(spark):
    from vite_spark.text.analysis import pii_scan

    docs = spark.createDataFrame(
        [
            (0, "plain words"),              # gains email + ipv4 + acct
            (1, "nothing here"),             # clean
            (3, "word"),                     # email only (3 % 3 == 0)
            (5, "word"),                     # ipv4 only
            (7, "word"),                     # longnum only
            (2, "mail me at bob@corp.example.org now"),  # native email
            (4, "server 192.168.001.200 port"),          # native ipv4
            (8, "ref 12345678 done"),                    # native long run
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in pii_scan(docs).collect()}
    assert (got[0]["n_email"], got[0]["n_ipv4"], got[0]["n_longnum"]) == (1, 1, 1)
    assert got[0]["any_pii"] is True
    assert (got[1]["n_email"], got[1]["n_ipv4"], got[1]["n_longnum"]) == (0, 0, 0)
    assert got[1]["any_pii"] is False
    assert (got[3]["n_email"], got[3]["n_ipv4"], got[3]["n_longnum"]) == (1, 0, 0)
    assert (got[5]["n_email"], got[5]["n_ipv4"], got[5]["n_longnum"]) == (0, 1, 0)
    assert (got[7]["n_email"], got[7]["n_ipv4"], got[7]["n_longnum"]) == (0, 0, 1)
    assert got[2]["n_email"] == 1 and got[2]["any_pii"] is True
    assert got[4]["n_ipv4"] == 1
    assert got[8]["n_longnum"] == 1


# ----------------------------------------------------------- butterflies

def test_butterfly_stats_hand(spark):
    from vite_spark.derive import butterfly_stats

    # k1:{e1,e2,e3}, k2:{e1,e2}: one butterfly (e1,e2,k1,k2),
    # P3 = sum (d_e-1)(d_k-1) = 2+2+0+1+1 = 6, bcc = 4/6
    df = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 10), (1, 20), (2, 20)], "e long, k long")
    row = butterfly_stats(df, "e", "k").collect()[0]
    assert (row["n_incidence"], row["n_butterflies"], row["n_threepaths"]) \
        == (5, 1, 6)
    assert row["bcc"] == round(4 / 6, 6)


def test_butterfly_stats_vs_networkx(spark):
    import networkx as nx
    from networkx.algorithms import bipartite
    from vite_spark.derive import butterfly_stats

    rng = random.Random(5)
    inc = {(rng.randrange(25), 100 + rng.randrange(12)) for _ in range(120)}
    g = nx.Graph(inc)
    row = butterfly_stats(
        spark.createDataFrame([(e, k) for e, k in inc], "e long, k long"),
        "e", "k").collect()[0]
    want = bipartite.robins_alexander_clustering(g)
    assert row["bcc"] == round(want, 6)


def test_butterfly_stats_no_copairs(spark):
    from vite_spark.derive import butterfly_stats

    # every key exclusive to one entity: no pairs, no three-paths
    df = spark.createDataFrame([(1, 10), (2, 20)], "e long, k long")
    row = butterfly_stats(df, "e", "k").collect()[0]
    assert (row["n_butterflies"], row["n_threepaths"]) == (0, 0)
    assert row["bcc"] is None


# ------------------------------------------------------- sanity + diff

def test_edge_table_sanity_canonical(spark):
    from vite_spark.graph import edge_table_sanity, symmetrize

    half = spark.createDataFrame(
        [(1, 2, 2.0), (2, 3, 1.0)], "src long, dst long, weight double")
    row = edge_table_sanity(symmetrize(half)).collect()[0]
    assert row["n_rows"] == 4 and row["is_canonical"] is True
    assert (row["n_self_loops"], row["n_dup_rows"], row["n_asym_rows"],
            row["n_nonpos_weight"]) == (0, 0, 0, 0)


def test_edge_table_sanity_flags_defects(spark):
    from vite_spark.graph import edge_table_sanity

    bad = spark.createDataFrame(
        [
            (1, 2, 2.0), (2, 1, 2.0),   # fine
            (3, 3, 1.0),                 # loop
            (4, 5, 1.0), (4, 5, 1.0), (5, 4, 1.0), (5, 4, 1.0),  # dups
            (6, 7, 1.0),                 # missing mirror
            (8, 9, -1.0), (9, 8, -1.0),  # non-positive weight
        ],
        "src long, dst long, weight double",
    )
    row = edge_table_sanity(bad).collect()[0]
    assert row["n_self_loops"] == 1
    assert row["n_dup_rows"] == 2
    assert row["n_asym_rows"] == 1
    assert row["n_nonpos_weight"] == 2
    assert row["is_canonical"] is False


def test_snapshot_diff_hand(spark):
    from vite_spark.graph import snapshot_diff, symmetrize

    old = symmetrize(spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 1.0), (3, 4, 2.0)],
        "src long, dst long, weight double"))
    new = symmetrize(spark.createDataFrame(
        [(1, 2, 1.0), (3, 4, 5.0), (7, 8, 1.0)],
        "src long, dst long, weight double"))
    row = snapshot_diff(old, new).collect()[0]
    assert (row["n_added"], row["n_removed"], row["n_kept"],
            row["n_weight_changed"]) == (1, 1, 2, 1)
    assert row["jaccard"] == 0.5


def test_snapshot_diff_identical(spark):
    from vite_spark.graph import snapshot_diff, symmetrize

    e = symmetrize(spark.createDataFrame(
        [(1, 2, 1.0), (2, 3, 4.0)], "src long, dst long, weight double"))
    row = snapshot_diff(e, e).collect()[0]
    assert (row["n_added"], row["n_removed"], row["n_kept"],
            row["n_weight_changed"]) == (0, 0, 2, 0)
    assert row["jaccard"] == 1.0
