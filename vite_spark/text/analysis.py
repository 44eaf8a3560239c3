"""Text analysis operators for the training-data pipeline.

All pure `pyspark.sql.functions` (JVM-side, whole-stage codegen — no Python
in the hot path): language-ID (lexicon voting), quality scoring, token
counting (whitespace + BPE-ish sub-word estimate), rolling-hash document
fingerprinting. Each has an exact DuckDB-SQL twin in
vite_spark/queries.py generated from the same constants.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from vite_spark.text.common import (
    FP_BASE,
    FP_MOD,
    LANG_LEXICONS,
    STOPWORDS,
)


def tokens(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, pos, tok) — whitespace tokenization with positions."""
    return docs.select(
        "doc_id", F.posexplode(F.split(F.col(text_col), " ")).alias("pos", "tok")
    )


def token_counts(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, n_bpe) — whitespace count + BPE-ish sub-word
    estimate: each word contributes ceil(len/4) pieces (standard ~4
    chars/token heuristic, computed exactly the same in the SQL oracle)."""
    toks = F.split(F.col(text_col), " ")
    return docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.aggregate(
            toks,
            F.lit(0).cast("long"),
            lambda acc, t: acc + F.floor((F.length(t) + 3) / 4).cast("long"),
        ).alias("n_bpe"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, stopword_ratio, mean_word_len, quality) — a
    deterministic arithmetic quality score:

        quality = min(n_tokens, 100)/100 * (0.25 + 0.75*stopword_ratio_clamped)

    where stopword_ratio_clamped = min(4*stopword_ratio, 1). All values
    rounded to 6dp for engine-portable comparison."""
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    sw = F.array([F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    ratio = n_stop / n
    mean_len = (F.length(F.col(text_col)) - (n - 1)) / n
    quality = (
        F.least(n, F.lit(100)) / 100.0
        * (0.25 + 0.75 * F.least(ratio * 4.0, F.lit(1.0)))
    )
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(ratio, 6).alias("stopword_ratio"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(quality, 6).alias("quality"),
    )


def language_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, lang_pred, lang_hits) — lexicon-vote language ID.

    Score per language = number of tokens (with multiplicity) found in that
    language's lexicon; argmax with ties → alphabetically first language;
    all-zero → 'und'. Pure built-in functions.
    """
    toks = F.split(F.col(text_col), " ")

    def _hits(lex):
        arr = F.array([F.lit(x) for x in lex])
        return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))

    scored = docs.select("doc_id", *[
        _hits(lex).alias(f"hits_{lang}")
        for lang, lex in sorted(LANG_LEXICONS.items())
    ])
    langs = sorted(LANG_LEXICONS)
    best = F.greatest(*[F.col(f"hits_{l}") for l in langs])
    pred = F.lit("und")
    for lang in reversed(langs):  # earlier langs win ties → apply last
        pred = F.when(F.col(f"hits_{lang}") == best, F.lit(lang)).otherwise(pred)
    pred = F.when(best == 0, F.lit("und")).otherwise(pred)
    return scored.select(
        "doc_id", pred.alias("lang_pred"), best.cast("long").alias("lang_hits")
    )


def tfidf_top_terms(docs: DataFrame, k: int = 3,
                    text_col: str = "text") -> DataFrame:
    """(doc_id, rank, term, tf, df, tfidf) — the top-``k`` terms per
    document by tf-idf, idf = ln(N/df) over the corpus.

    Ranking is (ROUND(tfidf, 6) DESC, term ASC): tf and df are exact
    int64, so the only float entering the order is one ln per distinct
    df value, absorbed by the repo's round-6 emit convention — the
    selection is engine-portable.

    Plan / scale: one explode → (doc, term) counts (map-side combinable),
    one groupBy for document frequencies (shuffle bounded by vocabulary),
    one window PARTITIONED PER DOCUMENT (rows per partition = the doc's
    distinct terms, never global), and the corpus size N as a broadcast
    1-row aggregate."""
    tf = tokens(docs, text_col).groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"))
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    scored = (
        tf.join(dfs, "tok")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id", F.col("tok").alias("term"), "tf", "df",
            F.round(
                F.col("tf") * F.log(F.col("n").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("doc_id", "rank", "term", "tf", "df", "tfidf")
    )


def fingerprints(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, fingerprint) — min over 3-gram polynomial rolling hashes of
    token ids (winnowing-style document fingerprint).

    Token ids are the dense rank of the token string over the corpus
    vocabulary (deterministic in any engine). Hash of gram (t0,t1,t2) =
    ((t0*B + t1)*B + t2) mod M with B=31, M=1000003. Docs shorter than 3
    tokens fall back to min token id.
    """
    from vite_spark.kernels.ids import dense_ids

    tk = tokens(docs, text_col)
    # dense vocabulary ids ordered by token string — scalable dense-rank
    # (no single-partition window; same values as SQL dense_rank - 1)
    vocab = dense_ids(tk.select("tok"), "tok", out_col="tid")
    tid = tk.join(vocab, "tok").select("doc_id", "pos", "tid")
    w = Window.partitionBy("doc_id").orderBy("pos")
    grams = tid.select(
        "doc_id",
        "tid",
        F.lead("tid", 1).over(w).alias("t1"),
        F.lead("tid", 2).over(w).alias("t2"),
    )
    gram_hash = (
        (F.col("tid") * FP_BASE + F.col("t1")) * FP_BASE + F.col("t2")
    ) % FP_MOD
    h = grams.select(
        "doc_id",
        F.when(F.col("t2").isNotNull(), gram_hash).otherwise(F.col("tid")).alias("h"),
    )
    return h.groupBy("doc_id").agg(F.min("h").alias("fingerprint"))


BM25_K1 = 1.2
BM25_B = 0.75


def bm25_topk(
    docs: DataFrame,
    query_terms: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
) -> DataFrame:
    """(query_id, rank, doc_id, score) — BM25 ranked retrieval: the top-k
    documents per query, query_terms = (query_id, term).

    idf = ln((N − df + ½)/(df + ½) + 1) (the Robertson/Lucene non-negative
    formulation); per-(term, doc) contributions are rounded to 6dp and
    summed in DECIMAL(38,6) (exact in any accumulation order — the
    HyperANF discipline), so scores and the (score DESC, doc_id) ranking
    are engine-portable. avgdl is the one exact division
    CAST(Σdl AS DOUBLE)/N, never a float-ordered AVG. A doc equal to the
    query id is excluded (retrieval, not self-lookup).

    Scale shape: tf is one map-side-combinable groupBy; df shuffles
    bounded by vocabulary; the query join touches only rows whose term
    appears in some query (queries ≪ corpus — broadcast); the final
    window partitions per query."""
    tf = tokens(docs, text_col).groupBy("doc_id", "tok").agg(
        F.count(F.lit(1)).alias("tf"))
    dl = docs.select(
        "doc_id", F.size(F.split(F.col(text_col), " ")).alias("dl"))
    stats = docs.select(
        F.size(F.split(F.col(text_col), " ")).alias("dl0")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        (F.sum("dl0").cast("double") / F.count(F.lit(1))).alias("avgdl"),
    )
    dfs = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    qt = query_terms.select("query_id", F.col("term").alias("tok"))
    idf = F.log(
        (F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    denom = F.col("tf") + k1 * (
        1.0 - b + b * F.col("dl") / F.col("avgdl"))
    contrib = F.round(idf * (F.col("tf") * (k1 + 1.0)) / denom, 6)
    scored = (
        F.broadcast(qt)
        .join(tf, "tok")
        .join(dl, "doc_id")
        .join(F.broadcast(dfs.join(qt.select("tok").distinct(), "tok")), "tok")
        .crossJoin(F.broadcast(stats))
        .filter(F.col("doc_id") != F.col("query_id"))
        .groupBy("query_id", "doc_id")
        .agg(
            F.sum(contrib.cast("decimal(38,6)")).cast("double").alias("score")
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select("query_id", "rank", "doc_id", "score")
    )


PPMI_WINDOW = 4
PPMI_MIN_COUNT = 2


def ppmi_pairs(
    docs: DataFrame,
    k: int = 50,
    window: int = PPMI_WINDOW,
    min_count: int = PPMI_MIN_COUNT,
    text_col: str = "text",
) -> DataFrame:
    """(tok_a, tok_b, n_ab, pmi, ppmi) — the top-k token associations by
    pointwise mutual information over within-window co-occurrences, with
    the SPPMI clamp max(0, pmi) carried as its own column (the
    word2vec/SPPMI statistic; Levy & Goldberg 2014). Ranking is by
    SIGNED pmi so the top-k is well-populated even on corpora with few
    positively-associated pairs; a pipeline building SPPMI vectors
    consumes the ppmi column.

    Pair distribution: unordered token pairs co-occurring within
    ``window`` positions inside a document (tok_a < tok_b, multiplicity
    counted); marginals are the pair-table row sums, so
    pmi = ln(n_ab·N / (n_a·n_b)) is a true log-odds over the SAME
    distribution. All counts exact int64; one ln per surviving pair,
    rounded 6; ranking (pmi DESC, tok_a, tok_b) is total, so the global
    top-k is engine-portable.

    Scale shape: pair generation is a per-document positional self-join
    bounded by doc_len·window (never doc_len²); both count aggregations
    are map-side combinable; marginals shuffle bounded by vocabulary;
    the top-k is a distributed TakeOrdered, k rows to the driver."""
    tk = tokens(docs, text_col)
    a = tk.select("doc_id", F.col("pos").alias("pa"), F.col("tok").alias("ta"))
    b = tk.select("doc_id", F.col("pos").alias("pb"), F.col("tok").alias("tb"))
    pairs = (
        a.join(b, "doc_id")
        .filter(
            (F.col("pb") > F.col("pa"))
            & (F.col("pb") - F.col("pa") <= window)
            & (F.col("ta") != F.col("tb"))
        )
        .select(
            F.least("ta", "tb").alias("tok_a"),
            F.greatest("ta", "tb").alias("tok_b"),
        )
        .groupBy("tok_a", "tok_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .persist()
    )
    tot = pairs.agg(F.sum("n_ab").alias("n"))
    marg = (
        pairs.select(F.col("tok_a").alias("tok"), "n_ab")
        .unionAll(pairs.select(F.col("tok_b").alias("tok"), "n_ab"))
        .groupBy("tok")
        .agg(F.sum("n_ab").alias("m"))
    )
    scored = (
        pairs.filter(F.col("n_ab") >= min_count)
        .join(marg.select(F.col("tok").alias("tok_a"),
                          F.col("m").alias("ma")), "tok_a")
        .join(marg.select(F.col("tok").alias("tok_b"),
                          F.col("m").alias("mb")), "tok_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "tok_a", "tok_b", F.col("n_ab").cast("long").alias("n_ab"),
            F.round(
                F.log(
                    F.col("n_ab").cast("double") * F.col("n")
                    / (F.col("ma") * F.col("mb"))
                ),
                6,
            ).alias("pmi"),
        )
        .withColumn("ppmi", F.greatest(F.lit(0.0), F.col("pmi")))
    )
    return scored.orderBy(
        F.col("pmi").desc(), "tok_a", "tok_b").limit(k)


def repetition_scores(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_tokens, distinct_token_ratio, distinct_3gram_ratio,
    top_token_share) - the repetitiveness quality signals real pretraining
    pipelines gate on (the Gopher/MassiveText repetition rules): heavily
    repeated tokens or n-grams mark boilerplate/spam.

    distinct_token_ratio  = n_distinct_tokens / n_tokens
    distinct_3gram_ratio  = n_distinct_3grams / max(n_tokens - 2, 1)
    top_token_share       = count of the most frequent token / n_tokens
                            (ties irrelevant - the max count is unique)

    All ratios exact-integer divisions rounded 6; everything per-doc
    (map-side combinable groupBys, no global state)."""
    tk = tokens(docs, text_col)
    per_tok = tk.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("c"))
    tok_stats = per_tok.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("c").alias("top_c"),
    )
    toks = F.split(F.col(text_col), " ")
    n = F.size(toks)
    grams = F.when(
        n >= 3,
        F.transform(
            F.sequence(F.lit(0), n - 3),
            lambda i: F.concat_ws("", F.slice(toks, i + 1, 3)),
        ),
    ).otherwise(F.array(F.concat_ws("", toks)))
    g = docs.select("doc_id", F.explode(grams).alias("g"))
    gram_stats = g.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_g"),
        F.count_distinct("g").alias("d_g"),
    )
    return (
        tok_stats.join(gram_stats, "doc_id")
        .select(
            "doc_id",
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.round(F.col("n_distinct") / F.col("n_tokens"), 6).alias(
                "distinct_token_ratio"),
            F.round(F.col("d_g") / F.col("n_g"), 6).alias(
                "distinct_3gram_ratio"),
            F.round(F.col("top_c") / F.col("n_tokens"), 6).alias(
                "top_token_share"),
        )
    )


DECON_BENCH_MOD = 20

# PII patterns — written in the regex subset Java (Spark) and RE2
# (DuckDB) interpret IDENTICALLY: literal classes, \d, \b, bounded
# repetition; no lookaround, no backreferences.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_LONGNUM_RE = r"\d{7,}"


def decontamination(
    docs: DataFrame, bench_mod: int = DECON_BENCH_MOD, text_col: str = "text"
) -> DataFrame:
    """(doc_id, n_shingles, n_hit, contamination) for every NON-benchmark
    document: the fraction of the doc's distinct token 3-grams that occur
    anywhere in the benchmark split (docs with doc_id ≡ 0 mod
    ``bench_mod`` — a deterministic stand-in for a held-out eval suite).
    This is the standard n-gram-overlap decontamination gate of
    training-data pipelines (filter or flag docs whose contamination
    exceeds a threshold before training).

    Scale shape: reuses the dedup shingle machinery (distinct 3-grams per
    doc, exploded — never a per-row Python path). The benchmark shingle
    set is |corpus|/bench_mod-sized and duplicate-free, so the membership
    probe is one equi-join on `shingle` (broadcast-able when the
    benchmark is small — the common case: eval suites are tiny next to
    the corpus) followed by a map-side-combinable count per doc; no
    all-pairs term anywhere. Exact int64 counts, one final double
    division rounded 6."""
    from vite_spark.text.dedup import shingles

    sh = shingles(docs, text_col)
    is_bench = (F.col("doc_id") % bench_mod) == 0
    bench = sh.filter(is_bench).select("shingle").distinct()
    rest = sh.filter(~is_bench)
    sizes = rest.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_shingles"))
    hits = rest.join(bench, "shingle").groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit"))
    return (
        sizes.join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce(F.col("n_hit"), F.lit(0)).cast("long").alias("n_hit"),
            F.round(
                F.coalesce(F.col("n_hit"), F.lit(0)) / F.col("n_shingles"), 6
            ).alias("contamination"),
        )
    )


def pii_augmented_text(text_col: str = "text"):
    """Deterministic PII-bearing text expression: the synthetic corpus
    contains no personal identifiers, so the scan surface is exercised by
    appending per-doc markers derived from doc_id — docs ≡ 0 mod 3 gain
    an email, ≡ 0 mod 5 an IPv4, ≡ 0 mod 7 a long account number. The
    SQL oracle builds the identical string; the SCAN below is the
    production operator and runs unchanged on real text."""
    return F.concat(
        F.col(text_col),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(F.lit(" u"), F.col("doc_id").cast("string"),
                     F.lit("@example.com")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(F.lit(" 10.0."), (F.col("doc_id") % 256).cast("string"),
                     F.lit(".1")),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 7 == 0,
            F.concat(F.lit(" acct 88"),
                     (F.col("doc_id") + 1000000).cast("string")),
        ).otherwise(F.lit("")),
    )


def pii_scan(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """(doc_id, n_email, n_ipv4, n_longnum, any_pii) — per-document PII
    detection counts via non-overlapping regex matches: email-shaped
    tokens, dotted-quad IPv4 literals, and ≥7-digit runs (account/phone
    shaped). The redaction-or-drop decision downstream keys off
    `any_pii`; counts keep the readout auditable.

    Pure built-in `regexp_extract_all` (JVM regex inside whole-stage
    codegen — no Python), one projection, no shuffle: the per-doc scan is
    embarrassingly parallel and the patterns live in the Java∩RE2
    dialect subset so the DuckDB oracle counts the identical matches."""
    txt = F.col("__pii_txt")
    return (
        docs.select("doc_id", pii_augmented_text(text_col).alias("__pii_txt"))
        .select(
            "doc_id",
            F.size(F.regexp_extract_all(txt, F.lit(PII_EMAIL_RE), 0))
            .cast("long").alias("n_email"),
            F.size(F.regexp_extract_all(txt, F.lit(PII_IPV4_RE), 0))
            .cast("long").alias("n_ipv4"),
            F.size(F.regexp_extract_all(txt, F.lit(PII_LONGNUM_RE), 0))
            .cast("long").alias("n_longnum"),
        )
        .withColumn(
            "any_pii",
            (F.col("n_email") + F.col("n_ipv4") + F.col("n_longnum")) > 0,
        )
    )
