"""Evaluation kernels (E3/E4), repos→edges derivation (sha256 gate), and
text/dedup operator internals not covered by the oracle-SQL harness."""

from __future__ import annotations

import numpy as np
import pytest

from pyspark.sql import functions as F

from vite_spark import fixtures as fx
from vite_spark.derive import repos_to_edges, sha256_gate
from vite_spark.eval.compare import (
    gini_coefficient,
    load_ground_truth,
    pair_counting_scores,
    write_communities,
)


def test_pair_counting_perfect_match(spark):
    truth = spark.createDataFrame([(i, i % 3) for i in range(9)], "id long, comm long")
    s = pair_counting_scores(truth, truth)
    assert s["precision"] == 1.0 and s["recall"] == 1.0 and s["f1"] == 1.0


def test_pair_counting_reference_semantics(spark):
    """Hand-computed contingency: truth {0,1},{2,3}; out {0,1,2},{3}.
    pairs same-in-truth: (0,1),(2,3) → 2; same-in-out: (0,1),(0,2),(1,2) → 3;
    TP=(0,1) → 1; FN=1; FP=2."""
    truth = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 1), (3, 1)], "id long, comm long"
    )
    out = spark.createDataFrame(
        [(0, 0), (1, 0), (2, 0), (3, 1)], "id long, comm long"
    )
    s = pair_counting_scores(truth, out)
    assert s["tp"] == 1 and s["fn"] == 1 and s["fp"] == 2
    assert s["precision"] == pytest.approx(1 / 3)
    assert s["recall"] == pytest.approx(1 / 2)


def test_gini(spark):
    # equal sizes → 0; skewed → > 0 (compare.cpp:310-336 formula)
    eq = spark.createDataFrame([(i, i % 4) for i in range(16)], "id long, comm long")
    assert gini_coefficient(eq) == pytest.approx(0.0, abs=1e-12)
    skew = spark.createDataFrame(
        [(i, 0 if i < 9 else i) for i in range(12)], "id long, comm long"
    )
    assert gini_coefficient(skew) > 0.4


def test_louvain_recovers_planted_partition_fscore(spark):
    from vite_spark.algos.louvain import louvain

    s, d, w, nv, truth = fx.planted_partition()
    edges = fx.to_spark_edges(spark, (s, d, w, nv))
    res = louvain(spark, edges)
    tdf = spark.createDataFrame(
        [(int(i), int(t)) for i, t in enumerate(truth)], "id long, comm long"
    )
    scores = pair_counting_scores(tdf, res.labels)
    assert scores["f1"] > 0.95


def test_ground_truth_roundtrip(spark, tmp_path):
    p = str(tmp_path / "gt.txt")
    open(p, "w").write("0 5\n1 5\n2 7\n")
    gt = load_ground_truth(spark, p)
    assert {(r["id"], r["comm"]) for r in gt.collect()} == {(0, 5), (1, 5), (2, 7)}
    # 1-based variant (-z)
    gt1 = load_ground_truth(spark, p, one_based=True)
    assert (0, 4) in {(r["id"], r["comm"]) for r in gt1.collect()}

    out = str(tmp_path / "x.communities")
    write_communities(gt, out)
    assert open(out).read() == "5\n5\n7\n"


def test_sharded_writer_concatenates_to_root_writer_output(spark, tmp_path):
    """write_communities_sharded: cat(part-*) in lexicographic name order
    is byte-equal to the root writer's single file — range partitioning
    keeps global id order across shard boundaries, no driver collect."""
    import os

    from vite_spark.eval.compare import write_communities_sharded

    rng_rows = [(i, (i * 7) % 5) for i in range(257)]
    asg = spark.createDataFrame(rng_rows, "id long, comm long").repartition(8)

    root = str(tmp_path / "root.communities")
    write_communities(asg, root)

    shard_dir = str(tmp_path / "sharded.communities")
    write_communities_sharded(asg, shard_dir, num_files=4)
    parts = sorted(
        f for f in os.listdir(shard_dir)
        if f.startswith("part-") and not f.endswith(".crc")
    )
    assert len(parts) > 1   # genuinely sharded, not one file
    cat = b"".join(open(os.path.join(shard_dir, p), "rb").read() for p in parts)
    assert cat == open(root, "rb").read()


def test_repos_derivation_sha_gate(spark):
    rows = fx.repos_table(n_repos=10, rows_per_repo=6)
    repos = spark.createDataFrame(
        rows, "repo string, path string, commit string, lang string, content string"
    )
    gated = sha256_gate(repos)
    assert "content_sha256" in gated.columns
    assert gated.count() == repos.count()

    # rows with corrupted expected hash are dropped
    with_hash = repos.withColumn("content_sha256", F.sha2("content", 256))
    corrupted = with_hash.withColumn(
        "content_sha256",
        F.when(F.col("repo") == "repo0000", F.lit("bad")).otherwise(
            F.col("content_sha256")
        ),
    )
    kept = sha256_gate(corrupted).count()
    assert kept == repos.filter(F.col("repo") != "repo0000").count()

    edges, repo_ids = repos_to_edges(repos)
    # symmetric, positive weights, dense ids
    from vite_spark.graph import check_symmetry

    assert check_symmetry(edges) == 0
    ids = {r["id"] for r in repo_ids.collect()}
    assert ids == set(range(10))
    assert edges.filter(F.col("weight") <= 0).count() == 0


def test_lsh_ann_recall(spark):
    from vite_spark.text.ann import auto_bits, cosine_topk, lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, k=3).collect()}
    base = {(r["query_id"], r["neighbor_id"])
            for r in lsh_topk(emb, k=3, bits=2, multiprobe=0).collect()}
    recall = len(exact & base) / len(exact)
    # random 64-d vectors have weak locality; 4 buckets → recall well above
    # the 3/499 ≈ 0.006 chance floor proves the bucketing works
    assert recall > 0.15

    # multiprobe (flip-1-bit) probes strictly more buckets → recall ≥ base
    mp = {(r["query_id"], r["neighbor_id"])
          for r in lsh_topk(emb, k=3, bits=2, multiprobe=1).collect()}
    assert len(exact & mp) >= len(exact & base)

    # bits=2 + multiprobe=2 probes ALL 4 buckets → exhaustive: the
    # approximate result must EQUAL the brute-force top-k exactly (also
    # proves the per-(query, bucket) pre-prune drops nothing it shouldn't)
    full = {(r["query_id"], r["neighbor_id"])
            for r in lsh_topk(emb, k=3, bits=2, multiprobe=2).collect()}
    assert full == exact

    # auto_bits scales bucket count with corpus size (100 TB path): ~64
    # rows per bucket, clamped
    assert auto_bits(64) == 4
    assert auto_bits(1_000_000) == 14
    assert auto_bits(10**12) == 24


def test_blocked_topk_equals_broadcast_topk(spark):
    """cosine_topk_blocked (no driver collect; block-nested-loop cells +
    window merge) returns EXACTLY the broadcast path's rows — including
    rank and rounded cos_sim — on every block-grid shape, degenerate and
    non-square included."""
    from vite_spark.text.ann import cosine_topk, cosine_topk_blocked

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    exact = {(r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
             for r in cosine_topk(emb, k=3).collect()}
    for qb, ib in [(1, 1), (4, 4), (3, 7)]:
        got = {(r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
               for r in cosine_topk_blocked(
                   emb, k=3, query_blocks=qb, index_blocks=ib).collect()}
        assert got == exact, f"grid {qb}x{ib}"
    # auto-sizing path (count-derived block grid) also matches
    got = {(r["query_id"], r["neighbor_id"], r["rank"], r["cos_sim"])
           for r in cosine_topk_blocked(emb, k=3, rows_per_block=128).collect()}
    assert got == exact


def test_ivf_ann_recall(spark):
    from vite_spark.text.ann import cosine_topk
    from vite_spark.text.ivf import ivf_assign, ivf_topk, ivf_train, _collect_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()

    # every vector lands in exactly one cell; cells partition the corpus
    cents = _collect_centroids(ivf_train(emb, n_cells=8, iters=2))
    asg = ivf_assign(emb, cents)
    assert asg.count() == n
    assert asg.select("vec_id").distinct().count() == n

    exact = {(r["query_id"], r["neighbor_id"])
             for r in cosine_topk(emb, k=3).collect()}
    approx = {(r["query_id"], r["neighbor_id"])
              for r in ivf_topk(emb, k=3, n_cells=8, nprobe=2).collect()}
    recall = len(exact & approx) / len(exact)
    # probing 2 of 8 cells ≈ 25% of the corpus; spherical cells group
    # cosine-similar vectors, so recall must beat the random-subset floor
    assert recall > 0.3

    # nprobe = n_cells probes every cell → exhaustive == brute force
    full = {(r["query_id"], r["neighbor_id"])
            for r in ivf_topk(emb, k=3, n_cells=8, nprobe=8).collect()}
    assert full == exact


def test_simhash_near_pairs_close_texts(spark):
    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "the quick brown fox jumps over the lazy dog again and once"),
            (2, "completely different words about spark catalyst optimizer joins"),
        ],
        "doc_id long, text string",
    )
    from vite_spark.text.dedup import simhash_near_pairs

    pairs = {(r["doc_a"], r["doc_b"]) for r in
             simhash_near_pairs(docs, max_hamming=8).collect()}
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_exact_dups_planted(spark):
    docs = spark.createDataFrame(
        [(0, "same text"), (1, "same text"), (2, "other")],
        "doc_id long, text string",
    )
    from vite_spark.text.dedup import exact_duplicates

    rows = exact_duplicates(docs).collect()
    assert len(rows) == 1
    assert rows[0]["dup_count"] == 2 and rows[0]["min_doc_id"] == 0


def test_multimodal_plumbing(spark):
    from vite_spark.text.multimodal import docs_as_media, extract_features

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = docs_as_media(docs)
    feats = extract_features(media, fake=True)
    rows = feats.collect()
    assert len(rows) == docs.count()
    r0 = [r for r in rows if r["media_id"] == 0][0]
    assert r0["n_bytes"] > 0 and len(r0["features"]) == 8
    assert 1 <= r0["width"] <= 4096

    # real decode is stubbed
    import pytest as _pytest

    with _pytest.raises(Exception):
        extract_features(media, fake=False).collect()


def test_multimodal_resize_and_frames(spark):
    from vite_spark.text.multimodal import (
        docs_as_media,
        resize_media,
        sample_frames,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    media = docs_as_media(docs)
    n = docs.count()

    rs = resize_media(media, 64, 64, fake=True)
    rows = rs.collect()
    assert len(rows) == n
    # payload is the re-encoded output; sha column matches its utf-8 bytes
    assert all(r["payload"].decode() == r["resized_sha"] for r in rows[:10])
    assert all(r["width"] == 64 and r["height"] == 64 for r in rows[:10])

    fr = sample_frames(media, max_frames=4, fake=True)
    frows = fr.collect()
    # fan-out: between 1 and 4 frames per media row, frame_idx dense from 0
    per = {}
    for r in frows:
        per.setdefault(r["media_id"], []).append(r)
    assert len(per) == n
    for mid, rs_ in list(per.items())[:20]:
        idxs = sorted(r["frame_idx"] for r in rs_)
        assert idxs == list(range(len(idxs))) and 1 <= len(idxs) <= 4
        assert all(r["ts_s"] >= 0.0 for r in rs_)

    import pytest as _pytest

    with _pytest.raises(Exception):
        resize_media(media, fake=False).collect()
    with _pytest.raises(Exception):
        sample_frames(media, fake=False).collect()


def test_near_dup_clusters_planted(spark):
    """Two planted near-dup groups (A: docs 0,1,2 chained; B: docs 5,6) plus
    unrelated docs — clusters must be the transitive closure of the LSH
    pairs with cluster_id = min doc_id and one canonical row each."""
    base_a = "the quick brown fox jumps over the lazy dog again and again " \
             "while the rain falls softly on the quiet green hills today"
    base_b = "spark catalyst optimizer pushes filters below joins and prunes " \
             "columns before the shuffle stage runs on every executor node"
    docs = spark.createDataFrame(
        [
            (0, base_a),
            (1, base_a.replace("today", "tonight")),
            (2, base_a.replace("quick", "swift")),
            (3, "completely different words about nothing in particular here"),
            (5, base_b),
            (6, base_b.replace("every", "each")),
        ],
        "doc_id long, text string",
    )
    from vite_spark.text.dedup import minhash_lsh_pairs, near_dup_clusters

    rows = near_dup_clusters(docs, threshold=0.5).collect()
    got = {r["doc_id"]: r for r in rows}
    # closure must agree with an explicit union-find over the pair list
    pairs = [(r["doc_a"], r["doc_b"])
             for r in minhash_lsh_pairs(docs, threshold=0.5).collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expect = {}
    for x in parent:
        expect.setdefault(find(x), []).append(x)
    assert set(got) == set(parent)
    for root, members in expect.items():
        assert root == min(members)
        for m in members:
            r = got[m]
            assert r["cluster_id"] == root
            assert r["cluster_size"] == len(members)
            assert r["is_canonical"] == (m == root)
    # the planted structure itself: A-group and B-group are separate, doc 3
    # is a singleton (absent)
    assert got[0]["cluster_id"] == got[1]["cluster_id"] == got[2]["cluster_id"] == 0
    assert got[5]["cluster_id"] == got[6]["cluster_id"] == 5
    assert 3 not in got


def test_kmeans_clusters_contract(spark):
    """kmeans_clusters is a partition of the corpus whose (cell, cos_sim)
    agree with a driver-side brute-force argmax over the trained centroids,
    and whose cell_size really counts the cell's members."""
    import math

    from vite_spark.text.ivf import (
        _collect_centroids, ivf_train, kmeans_clusters,
    )

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    n = emb.count()
    rows = kmeans_clusters(emb, n_cells=8, iters=2).collect()
    assert len(rows) == n
    assert len({r["vec_id"] for r in rows}) == n

    cents = _collect_centroids(ivf_train(emb, n_cells=8, iters=2))
    vecs = {r["vec_id"]: [float(x) for x in r["embedding"]]
            for r in emb.collect()}
    sizes = {}
    for r in rows:
        v = vecs[r["vec_id"]]
        nv = math.sqrt(sum(x * x for x in v))
        best = max(
            ((round(sum(a * b for a, b in zip(v, c)) / (nv * cn), 6)
              if cn else 0.0), -cell)
            for cell, c, cn in cents
        )
        assert r["cell"] == -best[1]
        assert r["cos_sim"] == best[0]
        sizes[r["cell"]] = sizes.get(r["cell"], 0) + 1
    for r in rows:
        assert r["cell_size"] == sizes[r["cell"]]


def test_key_skew_report(spark):
    """Tier math on a planted skew: one hot key with 5 entities, two keys
    with 2, fan-out shares computed against the exact total."""
    from vite_spark.derive import key_skew_report

    rows = (
        [(e, 100) for e in range(5)]          # hot key: C(5,2)=10 pairs
        + [(1, 200), (2, 200)]                # C(2,2)=1
        + [(3, 300), (4, 300)]                # 1
        + [(9, 400)]                          # singleton: 0 pairs
        + [(1, 100)]                          # duplicate (entity,key) row
    )
    df = spark.createDataFrame(rows, "ent long, key long")
    got = {r["key_freq"]: r for r in
           key_skew_report(df, "ent", "key", k=10).collect()}
    # dedup keeps key 100 at freq 5; total pairs = 10 + 1 + 1 + 0 = 12
    assert set(got) == {5, 2, 1}
    assert got[5]["n_keys"] == 1 and got[5]["pair_fanout"] == 10
    assert got[2]["n_keys"] == 2 and got[2]["pair_fanout"] == 2
    assert got[1]["n_keys"] == 1 and got[1]["pair_fanout"] == 0
    assert got[5]["pair_share"] == round(10 / 12, 6)
    assert got[2]["pair_share"] == round(2 / 12, 6)
    assert [got[f]["rank"] for f in (5, 2, 1)] == [1, 2, 3]
