"""Corpus-curation query inventory: the operations a training-data pipeline
runs between "raw documents" and "training set".

Same contract as the rest of the registry: identical aliases on both sides,
floats rounded, integer/string sort keys under every LIMIT, no
timezone-dependent outputs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import load_events, load_table
from ..operators.dedup import minhash_lsh_pairs
from ..operators.graph import connected_components
from ..operators.similarity import cosine_near_pairs_blocked
from .registry import query


@query(
    "dup_cluster_components",
    """
    WITH RECURSIVE p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) a
        JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
    ), e AS (
        SELECT id1 AS v, id2 AS w FROM p UNION SELECT id2, id1 FROM p
    ), reach AS (
        SELECT v, w AS r FROM e
        UNION
        SELECT reach.v, e.w FROM reach JOIN e ON reach.r = e.v
    ), lab AS (
        SELECT v, least(v, min(r)) AS component FROM reach GROUP BY v
    )
    SELECT component, count(*) AS n_members, max(v) AS max_member
    FROM lab GROUP BY component
    """,
    tags=("dedup", "graph", "corpus"),
    bench=True,
)
def dup_cluster_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate *clusters*: connected components over the
    embedding-cosine near-pair graph (τ=0.35), one row per cluster with its
    canonical id (min member). Pairs → clusters is the step that makes
    dedup actually droppable: keep one doc per component.

    The pair set is the exact tiled-matmul near-pairs plan (hash-matches
    the all-pairs oracle); components come from iterative min-label
    propagation (operators/graph.py) whose fixpoint is
    partitioning-independent. The oracle reaches the same fixpoint via a
    recursive-CTE transitive closure — feasible at sf0.01, which is the
    point: the oracle checks semantics, the engine path is the one that
    scales.

    Routing note (r17): under CONTINUOUS ingestion the cluster labels no
    longer require this batch recompute — the near-dup gate now CHAINS
    its verified pairs into the maintained component store inside each
    micro-batch (``start_near_dedup_stream(...,
    components_out_dir=...)``, streaming/near_dedup_stream.py →
    streaming/components_stream.py, O(touched components) per batch,
    stream==batch-pinned end to end), so ``current_components`` over the
    live pipeline IS the dup-cluster view with zero user plumbing. This
    query remains the offline/full-recluster form — which RETRACTIONS
    still require (``rebuild_components_store``): deletions can split
    clusters, which no incremental min-label fold can undo."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_near_pairs_blocked(emb, threshold=0.35)
    labels = connected_components(pairs, src="id1", dst="id2")
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("vertex").alias("max_member"),
    )


@query(
    "cluster_aware_split_docs",
    """
    WITH RECURSIVE p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) a
        JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
    ), e AS (
        SELECT id1 AS v, id2 AS w FROM p UNION SELECT id2, id1 FROM p
    ), reach AS (
        SELECT v, w AS r FROM e
        UNION
        SELECT reach.v, e.w FROM reach JOIN e ON reach.r = e.v
    ), lab AS (
        SELECT v, least(v, min(r)) AS component FROM reach GROUP BY v
    ), u AS (
        SELECT em.vec_id, coalesce(lab.component, em.vec_id) AS split_key
        FROM embeddings em LEFT JOIN lab ON em.vec_id = lab.v
    )
    SELECT vec_id, split_key,
           CASE WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 2) < 'cd'
                THEN 'train'
                WHEN substr(md5(CAST(split_key AS VARCHAR)), 1, 2) < 'e6'
                THEN 'val'
                ELSE 'test' END AS split
    FROM u
    """,
    tags=("corpus", "sampling", "split", "graph"),
)
def cluster_aware_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/val/test split
    (``operators/sampling.cluster_aware_split``): split keys are
    near-duplicate CLUSTER representatives (connected components over
    the exact embedding-cosine near-pair graph, τ=0.35; singletons are
    their own key), so no near-duplicate pair ever straddles the split
    boundary — the eval set measures generalization, not memorization.
    Assignment is the deterministic md5-prefix rule ('cd'/'e6' ≈
    80/10/10 of cluster mass). The oracle reaches the same components
    via a recursive-CTE transitive closure; the engine path is the
    partitioning-independent min-label fixpoint that scales."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_near_pairs_blocked(emb, threshold=0.35)
    from ..operators.sampling import cluster_aware_split

    return cluster_aware_split(
        emb.select("vec_id"), "vec_id", pairs, src="id1", dst="id2"
    )


@query(
    "dup_cluster_components_ann",
    None,  # xxhash64-seeded MinHash pair graph — engine-specific, rows-only.
    tags=("dedup", "graph", "corpus", "ann"),
)
def dup_cluster_components_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-safe twin of ``dup_cluster_components``: the pair graph comes
    from MinHash+LSH bucket collisions (linear candidate generation,
    exact-Jaccard verified at τ=0.5) instead of the exact tiled matmul,
    then feeds the same connected-components fixpoint. At 100 TB this is
    the path that survives — no O(n²) FLOPs anywhere; the exact query
    remains the sf0.01 semantic anchor (see
    tests/test_operators.py::test_ann_clusters_match_exact_on_controlled_corpus).

    Deterministic across replays: every hash is seeded xxhash64, the LSH
    band join is a pure function of signatures, and the CC fixpoint is
    partitioning-independent (component = min reachable vertex id)."""
    docs = load_table(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        docs, "doc_id", "text", n=3, num_hashes=32, bands=8, min_jaccard=0.5
    )
    labels = connected_components(pairs, src="doc1", dst="doc2")
    return labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("n_members"),
        F.max("vertex").alias("max_member"),
    )


@query(
    "sample_hash_split",
    """
    WITH s AS (
        SELECT source, n_chars,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < 'e6'
                    THEN 'train' ELSE 'eval' END AS split
        FROM documents
    )
    SELECT split, source, count(*) AS n_docs, round(avg(n_chars), 2) AS avg_chars
    FROM s GROUP BY split, source
    """,
    tags=("sampling", "corpus"),
)
def sample_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/eval split by content-free key hash: doc_id →
    md5 → first byte < 0xe6 (≈90%) is train. The standard reproducible
    split for corpora — stable under re-runs, re-partitioning, and engine
    choice (md5 hex is md5 hex everywhere), unlike ``rand()``-based
    sampling. Profiled per (split, source) to keep the check compact."""
    docs = load_table(spark, sf_dir, "documents")
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "e6", "train"
    ).otherwise("eval")
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 2).alias("avg_chars"),
        )
    )


@query(
    "tfidf_top20",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), tf AS (
        SELECT doc_id, term, count(*) AS tf
        FROM toks WHERE term <> '' GROUP BY doc_id, term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.term, tf.tf, df.df,
           round(tf.tf * ln(CAST(n_docs AS DOUBLE) / df.df), 6) AS tfidf
    FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    ORDER BY tf.tf DESC, df.df ASC, tf.term, tf.doc_id
    LIMIT 20
    """,
    tags=("text", "corpus", "agg"),
)
def tfidf_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 most distinctive (doc, term) pairs by TF-IDF. The ranking key
    is the integer pair (tf DESC, df ASC) plus (term, doc_id) tiebreaks —
    monotone in tf·ln(N/df) along each axis and engine-stable where a
    float sort key could flip on a ULP of ``ln``; the tfidf value itself is
    reported rounded.

    Shape at scale: explode → two keyed aggregations (both with map-side
    partial combine) → join on term. The scalar N broadcasts; the df join
    shuffles on term, which is the correct key at any corpus size."""
    docs = load_table(spark, sf_dir, "documents")
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(dfc, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            F.round(
                F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df")), 6
            ).alias("tfidf"),
        )
        .orderBy(F.col("tf").desc(), F.col("df").asc(), "term", "doc_id")
        .limit(20)
    )


#: The fixed retrieval query for bm25_top20: one rare corpus term plus
#: two common ones, so idf separation actually exercises the ranking.
_BM25_TERMS = ("dup", "spark", "merge")
_BM25_K1 = 1.2
_BM25_B = 0.75



def _bm25_scored(docs: DataFrame, terms: "list[str]") -> DataFrame:
    """Shared Okapi BM25 scoring core (k1=1.2, b=0.75, Robertson +1
    idf): returns (doc_id, s) with s rounded to 6 — ONE implementation
    behind bm25_top20, bm25_multiquery_top5's shape, and the hybrid
    fusion, so a parameter or tokenization change cannot silently
    diverge between them. Shape: explode filtered to the query's terms
    before any aggregation (tf is query-sized), df broadcast, N/avgdl
    broadcast scalars, the tf⋈dl join the only corpus-sized join.

    ``dl`` (per-doc non-empty token count) is ROW-LOCAL —
    ``size(filter(split(text)))`` per document row — never an explode +
    doc-keyed re-aggregation of the corpus: the old shape paid three
    corpus explode passes (dl, avgdl's recompute of dl, tf); this one
    pays exactly one, for the query-filtered tf (guide §1.2 remove
    passes, §2.4 remove shuffles). avgdl is unchanged bit-for-bit: dl
    values are integers, so their double sum is exact and
    order-independent."""
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    dl = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("dl"),
    ).filter(F.col("dl") > 0)
    tf = (
        toks.filter(F.col("term").isin(*terms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    ad = dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    return (
        tf.join(F.broadcast(dfc), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ad))
        .groupBy("doc_id")
        .agg(F.round(F.sum(_bm25_contrib()), 6).alias("s"))
    )


def _bm25_contrib():
    """Per-(doc, term) BM25 contribution over columns tf/df/dl/n_docs/
    avgdl — the ONE copy of the scoring arithmetic."""
    idf = F.log(
        (F.col("n_docs").cast("double") - F.col("df") + F.lit(0.5))
        / (F.col("df") + F.lit(0.5))
        + F.lit(1.0)
    )
    return idf * (F.col("tf") * F.lit(_BM25_K1 + 1.0)) / (
        F.col("tf")
        + F.lit(_BM25_K1)
        * (F.lit(1.0 - _BM25_B) + F.lit(_BM25_B) * F.col("dl") / F.col("avgdl"))
    )


@query(
    "bm25_top20",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM toks WHERE term <> '' GROUP BY doc_id
    ), q AS (
        SELECT unnest(['{"','".join(_BM25_TERMS)}']) AS term
    ), tf AS (
        SELECT t.doc_id, t.term, count(*) AS tf
        FROM toks t JOIN q ON t.term = q.term GROUP BY t.doc_id, t.term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    ad AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl)
    SELECT tf.doc_id,
           round(sum(
               ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
               * (tf * {_BM25_K1 + 1.0})
               / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
           ), 6) AS bm25
    FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
    CROSS JOIN n CROSS JOIN ad
    GROUP BY tf.doc_id
    ORDER BY bm25 DESC, tf.doc_id LIMIT 20
    """,
    tags=("text", "corpus", "retrieval", "agg"),
    bench=True,
)
def bm25_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-20 retrieval for a fixed term query (k1=1.2,
    b=0.75, the Robertson +1 idf so scores stay positive even for terms
    in most docs) — the lexical-retrieval primitive a training-data
    pipeline needs for eval-set mining and targeted corpus pulls.

    Shape at scale: the explode is filtered to the QUERY's terms before
    any aggregation, so the tf frame is (docs containing a query term) ×
    (≤|query| terms), never the full postings table; df is a ≤|query|-row
    broadcast; avgdl and N are broadcast scalars; the only corpus-sized
    shuffles are the per-doc length aggregation and the tf⋈dl join on
    doc_id; top-20 is TakeOrderedAndProject. Scores are rounded to 6
    before the hash compare (the sum over ≤3 per-term contributions
    tolerates association-order ULPs)."""
    docs = load_table(spark, sf_dir, "documents")
    return (
        _bm25_scored(docs, list(_BM25_TERMS))
        .select("doc_id", F.col("s").alias("bm25"))
        .orderBy(F.col("bm25").desc(), "doc_id")
        .limit(20)
    )


#: The fixed query BATCH for bm25_multiquery_top5 — batch retrieval is
#: the eval-mining shape: many queries against one corpus in one pass.
_BM25_QUERIES: tuple[tuple[int, str], ...] = (
    (1, "dup"), (1, "spark"),
    (2, "merge"), (2, "batch"),
    (3, "window"), (3, "vector"), (3, "dup"),
)


@query(
    "bm25_multiquery_top5",
    f"""
    WITH q(qid, term) AS (
        SELECT * FROM (VALUES {", ".join(f"({i}, '{t}')" for i, t in _BM25_QUERIES)})
    ), toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM toks WHERE term <> '' GROUP BY doc_id
    ), qt AS (SELECT DISTINCT term FROM q),
    tf AS (
        SELECT t.doc_id, t.term, count(*) AS tf
        FROM toks t JOIN qt ON t.term = qt.term GROUP BY t.doc_id, t.term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    ad AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
    scored AS (
        SELECT q.qid, tf.doc_id,
               round(sum(
                   ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * {_BM25_K1 + 1.0})
                   / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               ), 6) AS bm25
        FROM q JOIN tf USING (term) JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN n CROSS JOIN ad
        GROUP BY q.qid, tf.doc_id
    )
    SELECT qid, doc_id, bm25, CAST(rnk AS INT) AS rnk FROM (
        SELECT qid, doc_id, bm25,
               row_number() OVER (PARTITION BY qid ORDER BY bm25 DESC, doc_id) AS rnk
        FROM scored
    ) WHERE rnk <= 5
    """,
    tags=("text", "corpus", "retrieval", "window"),
)
def bm25_multiquery_top5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BATCH BM25 retrieval: a whole query set scored against the corpus
    in one pass, top-5 docs per query — the eval-mining / targeted-pull
    shape (thousands of benchmark queries at once), vs. the single-query
    :func:`bm25_top20`.

    Shape at scale: one corpus pass shared by EVERY query — the explode
    is semi-filtered to the batch's distinct terms, the (qid, term)
    table broadcasts, scores aggregate per (qid, doc), and the per-query
    top-5 is a rank-filter window that Spark executes as
    WindowGroupLimit (group-local top-k maintained on both the partial
    and final side of the shuffle — plan-pinned), never a global sort.
    Ranking happens on the ROUNDED score so rank ties resolve
    identically on both engines."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    qdf = spark.createDataFrame(list(_BM25_QUERIES), "qid int, term string")
    qterms = sorted({t for _, t in _BM25_QUERIES})
    toks = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    # row-local dl — same rewrite as _bm25_scored (r18): one corpus
    # explode pass (the query-filtered tf) instead of three
    dl = docs.select(
        "doc_id",
        F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
        .cast("long")
        .alias("dl"),
    ).filter(F.col("dl") > 0)
    tf = (
        toks.filter(F.col("term").isin(qterms))
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    dfc = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    ad = dl.agg(F.avg(F.col("dl").cast("double")).alias("avgdl"))
    scored = (
        F.broadcast(qdf)
        .join(tf, "term")
        .join(F.broadcast(dfc), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(n))
        .crossJoin(F.broadcast(ad))
        .groupBy("qid", "doc_id")
        .agg(F.round(F.sum(_bm25_contrib()), 6).alias("bm25"))
    )
    w = Window.partitionBy("qid").orderBy(F.desc("bm25"), "doc_id")
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 5)
        .select("qid", "doc_id", "bm25", "rnk")
    )


@query(
    "events_funnel",
    """
    WITH s AS (
        SELECT user_id, min(ts) AS t_signup
        FROM events WHERE event_type = 'signup' GROUP BY user_id
    ), v AS (
        SELECT e.user_id, min(e.ts) AS t_view
        FROM events e JOIN s ON e.user_id = s.user_id
        WHERE e.event_type = 'view' AND e.ts > s.t_signup
        GROUP BY e.user_id
    ), p AS (
        SELECT e.user_id, min(e.ts) AS t_purchase
        FROM events e JOIN v ON e.user_id = v.user_id
        WHERE e.event_type = 'purchase' AND e.ts > v.t_view
        GROUP BY e.user_id
    )
    SELECT (SELECT count(*) FROM s) AS n_signup,
           (SELECT count(*) FROM v) AS n_view_after,
           (SELECT count(*) FROM p) AS n_purchase_after
    """,
    tags=("events", "funnel", "agg"),
)
def events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered signup → view → purchase funnel: each stage counts users
    whose first qualifying event strictly follows their previous stage's
    first event. Three keyed min-aggregations chained by join on user_id —
    the same partitioning key every stage, so at scale the shuffles line up
    (and with a user-bucketed table they disappear). Timestamps compared at
    µs precision on both engines; only counts are emitted."""
    ev = load_events(spark, sf_dir)
    s = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_signup"))
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .join(s, "user_id")
        .filter(F.col("ts") > F.col("t_signup"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    return (
        s.agg(F.count(F.lit(1)).alias("n_signup"))
        .crossJoin(v.agg(F.count(F.lit(1)).alias("n_view_after")))
        .crossJoin(p.agg(F.count(F.lit(1)).alias("n_purchase_after")))
    )


@query(
    "stratified_sample_per_source",
    """
    SELECT doc_id, source, samp_rank FROM (
        SELECT doc_id, source,
               row_number() OVER (
                   PARTITION BY source
                   ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id
               ) AS samp_rank
        FROM documents
    ) WHERE samp_rank <= 10
    """,
    tags=("sampling", "corpus", "window"),
)
def stratified_sample_per_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exactly 10 documents per source, selected by deterministic key hash
    (operators/sampling.py). Exact per-stratum counts with a run- and
    engine-stable pick — what `df.sample(fraction)` cannot give — via a
    partitioned window, so it scales with the stratum count."""
    from ..operators.sampling import stratified_sample

    docs = load_table(spark, sf_dir, "documents")
    return stratified_sample(docs, ("source",), 10, "doc_id").select(
        "doc_id", "source", "samp_rank"
    )


@query(
    "top_terms_per_lang",
    """
    WITH toks AS (
        SELECT lang, unnest(string_split(text, ' ')) AS term FROM documents
    ), tc AS (
        SELECT lang, term, count(*) AS cnt
        FROM toks WHERE term <> '' GROUP BY lang, term
    )
    SELECT lang, term, cnt, rnk FROM (
        SELECT lang, term, cnt,
               row_number() OVER (PARTITION BY lang ORDER BY cnt DESC, term) AS rnk
        FROM tc
    ) WHERE rnk <= 5
    """,
    tags=("text", "corpus", "window"),
)
def top_terms_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 terms per language — grouped top-k via a lang-partitioned
    window over pre-aggregated counts (two partial-agg shuffles + a
    partitioned rank; never a global sort).

    Differs from ``top_words_per_lang`` ONLY in empty-token handling: this variant FILTERS the empty token consecutive spaces produce, the other counts it — both kept registered as the pair documents the split semantics."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    tc = (
        docs.select("lang", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("cnt").desc(), "term")
    return tc.withColumn("rnk", F.row_number().over(w).cast("long")).filter(
        F.col("rnk") <= 5
    )


@query(
    "stopword_pruned_stats",
    """
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), t AS (SELECT doc_id, term FROM toks WHERE term <> ''),
    stop AS (
        SELECT term FROM (
            SELECT term, count(*) AS cnt FROM t GROUP BY term
            ORDER BY cnt DESC, term LIMIT 10
        )
    )
    SELECT doc_id,
           count(*) AS n_tokens,
           count(*) FILTER (WHERE term NOT IN (SELECT term FROM stop))
               AS n_content_tokens
    FROM t GROUP BY doc_id
    """,
    tags=("text", "corpus"),
)
def stopword_pruned_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counts before/after dropping the corpus's own
    top-10 most frequent terms (dynamic stopword pruning — the list is
    computed from the data, broadcast back, and applied in one pass)."""
    docs = load_table(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id", F.explode(F.split(F.col("text"), " ")).alias("term")
    ).filter(F.col("term") != "")
    stop = (
        t.groupBy("term")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy(F.col("cnt").desc(), "term")
        .limit(10)
        .select(F.col("term").alias("stop_term"), F.lit(1).alias("__is_stop"))
    )
    return (
        t.join(
            F.broadcast(stop), F.col("term") == F.col("stop_term"), "left"
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(F.when(F.col("__is_stop").isNull(), 1).otherwise(0)).alias(
                "n_content_tokens"
            ),
        )
    )


@query(
    "pack_greedy_bins",
    """
    WITH RECURSIVE t AS (
        SELECT source, doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS tok,
               row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
        FROM documents
    ), r AS (
        SELECT source, rn, tok, CAST(0 AS BIGINT) AS bin, tok AS fill
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.source, t.rn, t.tok,
               CASE WHEN r.fill + t.tok <= 120 THEN r.bin ELSE r.bin + 1 END,
               CASE WHEN r.fill + t.tok <= 120 THEN r.fill + t.tok ELSE t.tok END
        FROM r JOIN t ON t.source = r.source AND t.rn = r.rn + 1
    )
    SELECT source, bin, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS bin_tokens,
           round(sum(tok) * 1.0 / 120, 4) AS fill_ratio
    FROM r GROUP BY source, bin
    """,
    tags=("packing", "corpus"),
    bench=True,
)
def pack_greedy_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: greedy sequential first-fit of each source's
    documents (doc_id order) into 120-token training bins, reported as one
    row per bin with its fill ratio. The packer itself is the
    applyInPandas recurrence in operators/packing.py (one shuffle on the
    group key, linear walk per group); the recursive-CTE oracle replays the
    identical recurrence row by row — feasible at sf0.01, which is the
    point: the oracle checks the recurrence, the engine path is the one
    that scales."""
    from ..operators.packing import pack_sequences

    docs = load_table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    toks = docs.select(
        "source",
        "doc_id",
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("bigint")
        .alias("tok"),
    )
    packed = pack_sequences(toks, "source", "doc_id", "tok", capacity=120)
    return packed.groupBy("source", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("bin_tokens"),
        F.round(F.sum("tok") / F.lit(120.0), 4).alias("fill_ratio"),
    )


@query(
    "pack_greedy_bins_sharded",
    """
    WITH RECURSIVE t AS (
        SELECT source, CAST(((doc_id % 8) + 8) % 8 AS INT) AS shard, doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS tok,
               row_number() OVER (PARTITION BY source, ((doc_id % 8) + 8) % 8
                                  ORDER BY doc_id) AS rn
        FROM documents
    ), r AS (
        SELECT source, shard, rn, tok, CAST(0 AS BIGINT) AS bin, tok AS fill
        FROM t WHERE rn = 1
        UNION ALL
        SELECT t.source, t.shard, t.rn, t.tok,
               CASE WHEN r.fill + t.tok <= 120 THEN r.bin ELSE r.bin + 1 END,
               CASE WHEN r.fill + t.tok <= 120 THEN r.fill + t.tok ELSE t.tok END
        FROM r JOIN t ON t.source = r.source AND t.shard = r.shard
                     AND t.rn = r.rn + 1
    )
    SELECT source, shard, bin, count(*) AS n_docs,
           CAST(sum(tok) AS BIGINT) AS bin_tokens
    FROM r GROUP BY source, shard, bin
    """,
    tags=("packing", "corpus"),
)
def pack_greedy_bins_sharded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 100 TB form of ``pack_greedy_bins``: greedy first-fit packing per
    (source, shard) so no single Python task ever walks an unbounded group.
    Here the shard is ``pmod(doc_id, 8)`` — a pure function of the order
    key that DuckDB can replay exactly (``((doc_id % 8) + 8) % 8``, which
    matches pmod even for negative ids — DuckDB's bare ``%`` yields
    negative remainders), so the recursive-CTE oracle re-runs the identical
    recurrence per
    (source, shard). Production uses the default ``pmod(xxhash64(order),
    n_shards)`` shard; the semantics (bins never cross shards, walk order
    within a shard fixed by the order column) are the same."""
    from ..operators.packing import pack_sequences_sharded

    docs = load_table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    toks = docs.select(
        "source",
        "doc_id",
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("bigint")
        .alias("tok"),
    )
    packed = pack_sequences_sharded(
        toks,
        "source",
        "doc_id",
        "tok",
        capacity=120,
        n_shards=8,
        shard=F.pmod(F.col("doc_id"), F.lit(8)),
    )
    return packed.groupBy("source", "shard", "bin").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tok").alias("bin_tokens"),
    )


@query(
    "profile_orders_columns",
    """
    SELECT 'o_custkey' AS col_name, count(*) AS n_rows,
           count(*) - count(o_custkey) AS n_nulls,
           count(DISTINCT o_custkey) AS n_distinct FROM orders
    UNION ALL
    SELECT 'o_orderdate', count(*), count(*) - count(o_orderdate),
           count(DISTINCT o_orderdate) FROM orders
    UNION ALL
    SELECT 'o_orderkey', count(*), count(*) - count(o_orderkey),
           count(DISTINCT o_orderkey) FROM orders
    UNION ALL
    SELECT 'o_orderpriority', count(*), count(*) - count(o_orderpriority),
           count(DISTINCT o_orderpriority) FROM orders
    UNION ALL
    SELECT 'o_orderstatus', count(*), count(*) - count(o_orderstatus),
           count(DISTINCT o_orderstatus) FROM orders
    UNION ALL
    SELECT 'o_totalprice', count(*), count(*) - count(o_totalprice),
           count(DISTINCT o_totalprice) FROM orders
    """,
    tags=("profiling", "corpus"),
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct profile of ``orders`` in ONE scan
    (operators/profiling.py: wide multi-distinct aggregate + stack
    unpivot). The oracle is the naive per-column UNION ALL — six scans —
    making the test also a statement of why the operator exists."""
    from ..operators.profiling import profile_columns

    orders = load_table(spark, sf_dir, "orders")
    cols = [
        "o_custkey",
        "o_orderdate",
        "o_orderkey",
        "o_orderpriority",
        "o_orderstatus",
        "o_totalprice",
    ]
    return profile_columns(orders, cols).withColumnRenamed("column", "col_name")


@query(
    "decontam_eval_overlap",
    """
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM documents),
    sh AS (
        SELECT doc_id, source,
               unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                     for i in range(1, len(t) - 1)])) AS s
        FROM toks WHERE len(t) >= 3
    ),
    ev AS (SELECT doc_id AS eval_doc, s FROM sh WHERE source = 'src0'),
    tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0')
    SELECT tr.doc_id AS doc_id,
           count(DISTINCT tr.s) AS n_shared,
           count(DISTINCT ev.eval_doc) AS n_eval_docs
    FROM tr JOIN ev ON tr.s = ev.s
    GROUP BY tr.doc_id
    """,
    tags=("decontam", "corpus"),
    bench=True,
)
def decontam_eval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: treat source src0 as the held-out eval
    set and report, per training document (all other sources), how many
    distinct 3-gram shingles and eval docs it overlaps. The eval shingle
    table broadcasts — the training corpus is scanned once and never
    shuffled (operators/decontam.py)."""
    from ..operators.decontam import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("source") == "src0")
    tr = docs.filter(F.col("source") != "src0")
    return contamination_report(tr, ev, "doc_id", "text", n=3)


@query(
    "decontam_threshold_profile",
    """
    WITH toks AS (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM documents),
    sh AS (
        SELECT doc_id, source,
               unnest(list_distinct([array_to_string(t[i:i+2], ' ')
                                     for i in range(1, len(t) - 1)])) AS s
        FROM toks WHERE len(t) >= 3
    ),
    ev AS (SELECT DISTINCT s FROM sh WHERE source = 'src0'),
    tr AS (SELECT doc_id, s FROM sh WHERE source <> 'src0'),
    ns AS (SELECT tr.doc_id, count(DISTINCT tr.s) AS n_shared
           FROM tr JOIN ev USING (s) GROUP BY 1),
    tot AS (SELECT count(*) AS n FROM documents WHERE source <> 'src0'),
    th AS (SELECT CAST(unnest([1, 2, 4, 8, 16, 32]) AS BIGINT) AS min_shared)
    SELECT th.min_shared AS min_shared,
           CAST(count(ns.doc_id) AS BIGINT) AS n_diverted,
           round(count(ns.doc_id) * 1.0 / (SELECT n FROM tot), 6)
             AS frac_diverted
    FROM th LEFT JOIN ns ON ns.n_shared >= th.min_shared
    GROUP BY th.min_shared
    """,
    tags=("decontam", "corpus"),
)
def decontam_threshold_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Threshold FITTING for benchmark decontamination — the pass a
    pipeline runs before committing a gate's ``min_shared`` (the round-9
    funnel measurement caught the default 2 diverting ~90% of a
    templated corpus): for each candidate threshold, how many training
    docs the gate would divert and the diverted fraction. Plan: the one
    broadcast-eval overlap pass (corpus never shuffles,
    operators/decontam.py) feeds SIX conditional partial aggregates in a
    single map-side-combinable agg (the shuffle carries 6 longs per
    partition, never per-doc rows), unpivoted via stack; the total is a
    broadcast single-row aggregate."""
    from ..operators.decontam import contamination_report

    docs = load_table(spark, sf_dir, "documents")
    ev = docs.filter(F.col("source") == "src0")
    tr = docs.filter(F.col("source") != "src0")
    rep = contamination_report(tr, ev, "doc_id", "text", n=3)
    ths = (1, 2, 4, 8, 16, 32)
    row = rep.agg(
        *[
            F.sum(F.when(F.col("n_shared") >= t, 1).otherwise(0))
            .cast("long")
            .alias(f"t{t}")
            for t in ths
        ]
    )
    stacked = row.selectExpr(
        "stack(6, "
        + ", ".join(f"CAST({t} AS BIGINT), t{t}" for t in ths)
        + ") AS (min_shared, n_diverted)"
    )
    tot = tr.agg(F.count(F.lit(1)).alias("n_total"))
    return stacked.crossJoin(F.broadcast(tot)).select(
        "min_shared",
        "n_diverted",
        F.round(F.col("n_diverted") / F.col("n_total"), 6).alias("frac_diverted"),
    )


@query(
    "corpus_mix_weighted",
    """
    WITH w AS (
        SELECT doc_id, source,
               CASE CAST(substr(source, 4) AS INT) % 3
                    WHEN 0 THEN 'ff' WHEN 1 THEN '80' ELSE '1a' END AS thr
        FROM documents
    )
    SELECT source,
           count(*) AS n_total,
           CAST(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           round(sum(CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < thr
                          THEN 1 ELSE 0 END) * 1.0 / count(*), 4) AS kept_rate
    FROM w GROUP BY source
    """,
    tags=("sampling", "corpus"),
)
def corpus_mix_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing: deterministic per-source keep rates (declared tiers
    ~100% / ~50% / ~10% by source index mod 3) applied with the same
    md5-of-key rule as the train/eval split — reproducible across runs,
    engines, and partitionings, unlike rand()-based sampling. One scan,
    one partial-agg shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    thr = (
        F.when(F.substring("source", 4, 10).cast("int") % 3 == 0, F.lit("ff"))
        .when(F.substring("source", 4, 10).cast("int") % 3 == 1, F.lit("80"))
        .otherwise(F.lit("1a"))
    )
    kept = (F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < thr).cast("long")
    return docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(kept).alias("n_kept"),
        F.round(F.sum(kept) / F.count(F.lit(1)), 4).alias("kept_rate"),
    )


@query(
    "doc_repetition_filter",
    """
    WITH t AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
    g AS (
        SELECT doc_id,
               CAST(greatest(len(t) - 1, 0) AS BIGINT) AS n2_total,
               CAST(CASE WHEN len(t) >= 2 THEN
                    len(list_distinct([array_to_string(t[i:i+1], ' ')
                                       for i in range(1, len(t))]))
                    ELSE 0 END AS BIGINT) AS n2_distinct,
               CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n3_total,
               CAST(CASE WHEN len(t) >= 3 THEN
                    len(list_distinct([array_to_string(t[i:i+2], ' ')
                                       for i in range(1, len(t) - 1)]))
                    ELSE 0 END AS BIGINT) AS n3_distinct
        FROM t
    )
    SELECT doc_id, n2_total, n2_distinct, n3_total, n3_distinct,
           round(CASE WHEN n2_total = 0 THEN 0.0
                      ELSE 1.0 - n2_distinct * 1.0 / n2_total END, 4) AS dup2_frac,
           round(CASE WHEN n3_total = 0 THEN 0.0
                      ELSE 1.0 - n3_distinct * 1.0 / n3_total END, 4) AS dup3_frac
    FROM g
    """,
    tags=("text", "quality", "corpus"),
)
def doc_repetition_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Within-document repetition stats (the Gopher-rules repetition
    filter): per doc, total vs distinct 2-/3-gram counts and the duplicate
    fraction. Integer counts compare exactly; the fractions are ratios of
    small integers, which cannot land on round-4 midpoints. Pure map +
    array ops — no shuffle."""
    from ..functions.textfn import word_shingles

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    n2_total = F.greatest(F.size(toks) - 1, F.lit(0)).cast("bigint")
    n3_total = F.greatest(F.size(toks) - 2, F.lit(0)).cast("bigint")
    n2_distinct = F.size(word_shingles(toks, 2)).cast("bigint")
    n3_distinct = F.size(word_shingles(toks, 3)).cast("bigint")
    frac = lambda d, t: F.round(  # noqa: E731
        F.when(t == 0, F.lit(0.0)).otherwise(F.lit(1.0) - d / t), 4
    )
    return docs.select(
        "doc_id",
        n2_total.alias("n2_total"),
        n2_distinct.alias("n2_distinct"),
        n3_total.alias("n3_total"),
        n3_distinct.alias("n3_distinct"),
        frac(n2_distinct, n2_total).alias("dup2_frac"),
        frac(n3_distinct, n3_total).alias("dup3_frac"),
    )


@query(
    "source_vocab_overlap_top20",
    """
    WITH v AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS term
        FROM documents
    ), vv AS (SELECT source, term FROM v WHERE term <> ''),
    sizes AS (SELECT source, count(*) AS n FROM vv GROUP BY source),
    inter AS (
        SELECT a.source AS source1, b.source AS source2, count(*) AS inter
        FROM vv a JOIN vv b ON a.term = b.term AND a.source < b.source
        GROUP BY 1, 2
    )
    SELECT source1, source2, inter, sa.n AS n1, sb.n AS n2,
           round(inter * 1.0 / (sa.n + sb.n - inter), 6) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.source = source1
    JOIN sizes sb ON sb.source = source2
    ORDER BY jaccard DESC, source1, source2
    LIMIT 20
    """,
    tags=("text", "corpus", "jaccard"),
)
def source_vocab_overlap_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary Jaccard between sources (which corpora say the
    same things?) — the same inverted-index shape as document Jaccard but
    keyed at source granularity, so the candidate space is sources², not
    documents². Integer (inter, n1, n2) plus deterministic (source1,
    source2) tiebreak under the LIMIT."""
    docs = load_table(spark, sf_dir, "documents")
    vv = (
        docs.select("source", F.explode(F.split(F.col("text"), " ")).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    sizes = vv.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = vv.alias("a"), vv.alias("b")
    inter = (
        a.join(b, (F.col("a.term") == F.col("b.term")) & (F.col("a.source") < F.col("b.source")))
        .groupBy(
            F.col("a.source").alias("source1"), F.col("b.source").alias("source2")
        )
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("source").alias("source1"), F.col("n").alias("n1"))
    s2 = sizes.select(F.col("source").alias("source2"), F.col("n").alias("n2"))
    return (
        inter.join(F.broadcast(s1), "source1")
        .join(F.broadcast(s2), "source2")
        .select(
            "source1",
            "source2",
            "inter",
            "n1",
            "n2",
            F.round(
                F.col("inter") / (F.col("n1") + F.col("n2") - F.col("inter")), 6
            ).alias("jaccard"),
        )
        .orderBy(F.col("jaccard").desc(), "source1", "source2")
        .limit(20)
    )


@query(
    "snapshot_diff_orders",
    """
    WITH old AS (
        SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders
        WHERE o_orderdate < TIMESTAMP '2001-06-01 00:00:00'
    ), new AS (
        SELECT o_orderkey, o_orderstatus,
               CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice * 2
                    ELSE o_totalprice END AS o_totalprice
        FROM orders
        WHERE o_orderdate < TIMESTAMP '2001-09-01 00:00:00'
          AND o_orderkey % 13 <> 0
    ), d AS (
        SELECT CASE WHEN old.o_orderkey IS NULL THEN 'added'
                    WHEN new.o_orderkey IS NULL THEN 'removed'
                    WHEN old.o_orderstatus IS NOT DISTINCT FROM new.o_orderstatus
                     AND old.o_totalprice IS NOT DISTINCT FROM new.o_totalprice
                    THEN 'unchanged' ELSE 'changed' END AS change_type
        FROM old FULL OUTER JOIN new USING (o_orderkey)
    )
    SELECT change_type, count(*) AS n_rows FROM d GROUP BY change_type
    """,
    tags=("diff", "cdc", "corpus"),
)
def snapshot_diff_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC snapshot diff: two deterministic versions of the orders table
    (three months of new rows, every 7th price doubled, every 13th key
    deleted) classified added/removed/changed/unchanged by
    operators/diff.table_diff — one full-outer shuffle on the key,
    null-safe column compare — then counted per class."""
    from ..operators.diff import table_diff

    o = load_table(spark, sf_dir, "orders")
    cutoff_old = F.lit("2001-06-01 00:00:00").cast("timestamp_ntz")
    cutoff_new = F.lit("2001-09-01 00:00:00").cast("timestamp_ntz")
    old = o.filter(F.col("o_orderdate") < cutoff_old).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    new = (
        o.filter((F.col("o_orderdate") < cutoff_new) & (F.col("o_orderkey") % 13 != 0))
        .select(
            "o_orderkey",
            "o_orderstatus",
            F.when(
                F.col("o_orderkey") % 7 == 0, F.col("o_totalprice") * 2
            )
            .otherwise(F.col("o_totalprice"))
            .alias("o_totalprice"),
        )
    )
    d = table_diff(old, new, ["o_orderkey"])
    return d.groupBy("change_type").agg(F.count(F.lit(1)).alias("n_rows"))


@query(
    "dedup_survivors",
    """
    WITH RECURSIVE p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) a
        JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
    ), e AS (
        SELECT id1 AS v, id2 AS w FROM p UNION SELECT id2, id1 FROM p
    ), reach AS (
        SELECT v, w AS r FROM e
        UNION
        SELECT reach.v, e.w FROM reach JOIN e ON reach.r = e.v
    ), lab AS (
        SELECT v, least(v, min(r)) AS component FROM reach GROUP BY v
    ), nrm AS (
        SELECT vec_id, sqrt(list_dot_product(embedding::DOUBLE[],
                                             embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ), ranked AS (
        SELECT lab.component, lab.v AS vec_id, nrm.nrm,
               row_number() OVER (PARTITION BY lab.component
                                  ORDER BY nrm.nrm DESC, lab.v) AS rn
        FROM lab JOIN nrm ON nrm.vec_id = lab.v
    )
    SELECT component, vec_id AS survivor_id, round(nrm, 6) AS survivor_norm,
           (SELECT count(*) FROM lab l2 WHERE l2.component = ranked.component) - 1
               AS n_dropped
    FROM ranked WHERE rn = 1
    """,
    tags=("dedup", "graph", "corpus"),
)
def dedup_survivors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The last step of near-dup removal: per duplicate cluster, KEEP the
    best member (max L2 norm, min id on ties) and count what gets
    dropped. Composes the near-pair plan, connected components, and an
    argmax expressed as max(struct(norm, -vec_id)) — one aggregation, no
    window over the full table. The norm is a sequential left-fold double
    (bit-equal to DuckDB), so tie membership is engine-stable."""
    from ..functions.vectorfn import as_double, l2_norm

    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_near_pairs_blocked(emb, threshold=0.35)
    labels = connected_components(pairs, src="id1", dst="id2")
    norms = emb.select(
        F.col("vec_id").alias("vertex"),
        l2_norm(as_double(F.col("embedding"))).alias("nrm"),
    )
    best = (
        labels.join(norms, "vertex")
        .groupBy("component")
        .agg(
            F.max(F.struct(F.col("nrm"), (-F.col("vertex")).alias("neg_id"))).alias("b"),
            (F.count(F.lit(1)) - 1).alias("n_dropped"),
        )
    )
    return best.select(
        "component",
        (-F.col("b.neg_id")).alias("survivor_id"),
        F.round("b.nrm", 6).alias("survivor_norm"),
        "n_dropped",
    )


@query(
    "sample_token_budget",
    """
    WITH t AS (
        SELECT source, doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END AS BIGINT) AS tok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), c AS (
        SELECT source, doc_id, tok,
               sum(tok) OVER (PARTITION BY source ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    )
    SELECT source, count(*) AS n_docs, CAST(sum(tok) AS BIGINT) AS n_tokens
    FROM c WHERE cum - tok < 2000 GROUP BY source
    """,
    tags=("sampling", "corpus"),
)
def sample_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus mixing to a TOKEN budget: per source, take documents in the
    deterministic md5-of-key order until 2000 tokens are reached (a doc is
    taken if the budget was not yet exhausted when it arrived, so the
    budget can overshoot by at most one document). Token budgets — not row
    counts — are what training mixes are specified in.

    Shape at scale (r15 re-plan): the cumulative sum runs
    operators/ranking.py's grouped range-partition + offset plan
    (``with_grouped_cumsum`` — a row number is a cumsum of 1s, a token
    budget a cumsum of token counts), never
    ``Window.partitionBy(source)`` over the raw corpus where one hot
    source serializes; integer token weights keep the offsets exact."""
    from ..operators.ranking import with_grouped_cumsum

    docs = load_table(spark, sf_dir, "documents")
    trimmed = F.trim(F.col("text"))
    t = docs.select(
        "source",
        "doc_id",
        F.when(trimmed == "", F.lit(0))
        .otherwise(F.size(F.split(trimmed, r"\s+")))
        .cast("bigint")
        .alias("tok"),
        F.md5(F.col("doc_id").cast("string")).alias("h"),
    )
    c = with_grouped_cumsum(t, ["source"], ["h", "doc_id"], "tok", out="cum")
    return (
        c.filter(F.col("cum") - F.col("tok") < 2000)
        .groupBy("source")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("tok").alias("n_tokens"))
    )


@query(
    "group_texts_blocks_256",
    """
    WITH t AS (
        SELECT doc_id,
               CAST(CASE WHEN trim(text) = '' THEN 0
                    ELSE len(string_split_regex(trim(text), '\\s+')) END
                    AS BIGINT) AS tok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ), o AS (
        SELECT substr(h, 1, 2) AS shard, doc_id, tok,
               sum(tok) OVER (PARTITION BY substr(h, 1, 2) ORDER BY h, doc_id
                              ROWS UNBOUNDED PRECEDING) - tok AS off
        FROM t WHERE tok > 0
    ), e AS (
        SELECT shard, doc_id, tok, off,
               unnest(range(CAST(floor(off / 256.0) AS BIGINT),
                            CAST(floor((off + tok - 1) / 256.0) AS BIGINT) + 1
               )) AS block_id
        FROM o
    )
    SELECT shard, block_id, doc_id,
           CAST(least(off + tok, (block_id + 1) * 256)
               - greatest(off, block_id * 256) AS BIGINT) AS n_tokens,
           CAST(greatest(0, block_id * 256 - off) AS BIGINT) AS doc_off,
           CAST(greatest(0, off - block_id * 256) AS BIGINT) AS block_off
    FROM e
    """,
    tags=("corpus", "packing", "grouping"),
)
def group_texts_blocks_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The LM "group texts" step as a declared query
    (``operators/packing.group_texts_blocks``): concatenate each md5
    shard's documents (256 two-hex-char shards — the cumsum's
    parallelism ceiling is the shard count) in md5 order and cut the
    token stream into 256-token training blocks that CROSS doc
    boundaries — one row per
    (shard, block, doc) with the doc's token contribution plus the
    explicit slice coordinates (``doc_off`` start within the doc,
    ``block_off`` start within the block), so a reader can materialize
    any block from exactly the docs listed without re-deriving offsets
    (VERDICT r12 #6). Complement
    of the packing family (whole-doc bins, no splitting): zero padding
    waste, at most one partial tail block per shard. Scale shape: one
    shard-keyed window cumsum + a touched-block-RANGE explode
    (|tokens|/256 rows per doc, never |tokens|), no global sort."""
    from ..functions.textfn import token_count
    from ..operators.packing import group_texts_blocks

    docs = load_table(spark, sf_dir, "documents")
    t = docs.select("doc_id", token_count(F.col("text")).alias("tok"))
    return group_texts_blocks(t, "doc_id", "tok", block_len=256)


@query(
    "group_texts_block_text_256",
    """
    WITH t AS (
        SELECT doc_id,
               string_split_regex(trim(text), '\\s+') AS arr,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents WHERE trim(text) <> ''
    ), o AS (
        SELECT substr(h, 1, 2) AS shard, doc_id, arr,
               CAST(len(arr) AS BIGINT) AS tok,
               sum(CAST(len(arr) AS BIGINT))
                   OVER (PARTITION BY substr(h, 1, 2) ORDER BY h, doc_id
                         ROWS UNBOUNDED PRECEDING)
                   - CAST(len(arr) AS BIGINT) AS off
        FROM t
    ), e AS (
        SELECT shard, doc_id, arr, tok, off,
               unnest(range(CAST(floor(off / 256.0) AS BIGINT),
                            CAST(floor((off + tok - 1) / 256.0) AS BIGINT) + 1
               )) AS block_id
        FROM o
    ), s AS (
        SELECT shard, block_id,
               greatest(off, block_id * 256) - block_id * 256 AS block_off,
               CAST(least(off + tok, (block_id + 1) * 256)
                   - greatest(off, block_id * 256) AS BIGINT) AS n_tok,
               list_slice(arr,
                          CAST(greatest(0, block_id * 256 - off) AS BIGINT) + 1,
                          CAST(greatest(0, block_id * 256 - off)
                               + least(off + tok, (block_id + 1) * 256)
                               - greatest(off, block_id * 256) AS BIGINT)
               ) AS sub
        FROM e
    )
    SELECT shard, block_id,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           string_agg(array_to_string(sub, ' '), ' ' ORDER BY block_off)
               AS seq_text
    FROM s
    GROUP BY shard, block_id
    """,
    tags=("corpus", "packing", "grouping"),
)
def group_texts_block_text_256(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized group-texts training sequences
    (``operators/packing.materialize_block_texts`` over the
    :func:`group_texts_blocks_256` assignment map): every 256-token
    block's ACTUAL token stream, reassembled from per-doc slices in
    block_off order — the step that turns the assignment map into data
    a trainer can read. Every block except each shard's tail is exactly
    256 tokens. Scale shape: map ⋈ corpus equi-join on doc_id + one
    slice per contribution + groupBy(shard, block) whose state is one
    block's tokens; no window over the corpus, no UDF."""
    from ..operators.packing import (
        group_texts_blocks,
        materialize_block_texts,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim(F.col("text")), r"\s+").alias("toks")
    )
    t = docs.select("doc_id", F.size("toks").alias("tok")).filter(
        # split('') yields [''], not []: mirror token_count's empty rule
        ~((F.size("toks") == 1) & (F.element_at("toks", 1) == ""))
    )
    blocks = group_texts_blocks(t, "doc_id", "tok", block_len=256)
    return materialize_block_texts(blocks, docs, "doc_id", "toks")


@query(
    "mixture_sqrt_sample",
    """
    WITH r AS (
        SELECT source, doc_id,
               row_number() OVER (PARTITION BY source
                                  ORDER BY md5(CAST(doc_id AS VARCHAR)),
                                           doc_id) AS rnk,
               count(*) OVER (PARTITION BY source) AS n_s
        FROM documents
    )
    SELECT source, doc_id FROM r
    WHERE rnk <= least(n_s, CAST(ceil(8 * sqrt(n_s)) AS BIGINT))
    """,
    tags=("corpus", "sampling", "mixture"),
)
def mixture_sqrt_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-smoothed mixture sampling
    (``operators/sampling.sqrt_temperature_sample``): per source keep
    the ceil(8·sqrt(n)) smallest-md5 docs — over-represented domains
    damped toward sqrt of their size, small domains kept whole, the
    standard multilingual/domain-mixing smoothing. The quota arithmetic
    is sqrt → multiply → ceil, all IEEE correctly-rounded, so the
    integer quota (and therefore the kept SET) is engine-stable and
    hash-checkable — the reason this uses sqrt smoothing rather than
    normalized pow-alpha weights, whose cross-source summation order is
    not. One stratum-keyed window shuffle; membership is md5 order."""
    from ..operators.sampling import sqrt_temperature_sample

    docs = load_table(spark, sf_dir, "documents")
    return sqrt_temperature_sample(
        docs.select("source", "doc_id"), "source", "doc_id", scale=8.0
    )


@query(
    "docs_embedding_label_profile",
    """
    SELECT e.label, d.lang,
           count(*) AS n_docs,
           round(avg(d.n_chars), 4) AS avg_chars
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    GROUP BY 1, 2
    """,
    tags=("corpus", "join", "multimodal"),
)
def docs_embedding_label_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-modal metadata join: text documents keyed to their embedding
    rows (doc_id = vec_id), profiled by embedding label × language — the
    join every multimodal corpus runs between modality tables. At 100 TB
    both tables are bucketed on the shared key so this joins co-located;
    here it is a plain shuffled equi-join on one key."""
    d = load_table(spark, sf_dir, "documents")
    e = load_table(spark, sf_dir, "embeddings")
    return (
        d.join(e, d["doc_id"] == e["vec_id"])
        .groupBy("label", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.round(F.avg("n_chars"), 4).alias("avg_chars"),
        )
    )


@query(
    "corpus_length_trim",
    """
    WITH r AS (
        SELECT source, n_chars,
               percent_rank() OVER (PARTITION BY source
                                    ORDER BY n_chars, doc_id) AS pr
        FROM documents
    )
    SELECT source, count(*) AS n_kept,
           CAST(sum(n_chars) AS BIGINT) AS kept_chars
    FROM r WHERE pr >= 0.1 AND pr <= 0.9
    GROUP BY source
    """,
    tags=("corpus", "filter", "window"),
)
def corpus_length_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tail-trimming corpus pruner: drop each source's shortest and
    longest 10% of documents by percent_rank — rank arithmetic
    ((rank-1)/(n-1)) is integer-derived and engine-exact, unlike
    interpolated quantile cutoffs whose float interpolation can disagree
    across engines at the keep/drop boundary.

    Shape at scale (r15 re-plan, the docs_length_percentile fix applied
    family-wide): percent_rank comes from operators/ranking.py's
    grouped range-partition + offset plan — never
    ``Window.partitionBy(source)`` over the raw table, where one hot
    source would serialize into a single task; the keep-band filter is
    map-side after the rank and the report is one combinable groupBy."""
    from ..operators.ranking import with_grouped_rank_stats

    d = load_table(spark, sf_dir, "documents")
    ranked = with_grouped_rank_stats(
        d.select("source", "doc_id", "n_chars"),
        ["source"],
        ["n_chars", "doc_id"],
        percent_rank_col="pr",
    )
    return (
        ranked.filter((F.col("pr") >= 0.1) & (F.col("pr") <= 0.9))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_kept"),
            F.sum("n_chars").cast("bigint").alias("kept_chars"),
        )
    )


@query(
    "top_words_per_lang",
    """
    WITH w AS (
        SELECT lang, unnest(string_split(text, ' ')) AS word FROM documents
    ), c AS (
        SELECT lang, word, count(*) AS n FROM w GROUP BY 1, 2
    ), r AS (
        SELECT lang, word, n,
               CAST(row_number() OVER (PARTITION BY lang
                                       ORDER BY n DESC, word) AS BIGINT) AS rn
        FROM c
    )
    SELECT lang, word, n, rn FROM r WHERE rn <= 5
    """,
    tags=("corpus", "text", "topn"),
)
def top_words_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 words per language: explode → two-phase count → per-group
    top-N. The rank predicate triggers Spark's WindowGroupLimit rewrite,
    so each shuffle partition forwards only its local top-5 per language —
    the exploded token table (the 100 TB part) is never globally sorted.

    Differs from ``top_terms_per_lang`` ONLY in empty-token handling: this variant counts the empty token consecutive spaces produce (split-faithful), the other filters it — both kept registered as the pair documents the split semantics."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    counts = (
        d.select("lang", F.explode(F.split(F.col("text"), " ")).alias("word"))
        .groupBy("lang", "word")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), "word")
    return (
        counts.withColumn("rn", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rn") <= 5)
    )

from ..functions.textfn import STOPWORDS as _SW  # noqa: E402

_PSI_STOP_SQL = ", ".join(f"'{w}'" for w in _SW)

_PSI_ORACLE = f"""
    WITH t AS (
        SELECT n_chars, string_split(text, ' ') AS toks,
               CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '80'
                    THEN 'ref' ELSE 'cmp' END AS split
        FROM documents
    ),
    s AS (
        SELECT split,
               CAST(least(greatest(floor(round(ln(1 + n_chars) *
                    (1 - len(list_filter(toks, x -> x IN ({_PSI_STOP_SQL}))) * 1.0 / len(toks)) *
                    (len(list_distinct(toks)) * 1.0 / len(toks)), 4)), 0), 9) AS INT) AS bin
        FROM t
    ),
    c AS (SELECT bin, split, count(*) AS n FROM s GROUP BY bin, split),
    b AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS bin),
    tot AS (SELECT
        sum(CASE WHEN split = 'ref' THEN 1 ELSE 0 END) AS nt_ref,
        sum(CASE WHEN split = 'cmp' THEN 1 ELSE 0 END) AS nt_cmp
        FROM s),
    j AS (
        SELECT b.bin,
               coalesce(r.n, 0) AS n_ref, coalesce(cm.n, 0) AS n_cmp,
               (coalesce(r.n, 0) + 0.5) / (tot.nt_ref + 5.0) AS pr,
               (coalesce(cm.n, 0) + 0.5) / (tot.nt_cmp + 5.0) AS pc
        FROM b
        LEFT JOIN (SELECT bin, n FROM c WHERE split = 'ref') r USING (bin)
        LEFT JOIN (SELECT bin, n FROM c WHERE split = 'cmp') cm USING (bin)
        CROSS JOIN tot
    )
    SELECT bin,
           CAST(n_ref AS BIGINT) AS n_ref,
           CAST(n_cmp AS BIGINT) AS n_cmp,
           round(pr, 6) AS p_ref,
           round(pc, 6) AS p_cmp,
           round((pr - pc) * ln(pr / pc), 6) AS psi_term
    FROM j
"""


@query(
    "quality_drift_psi",
    _PSI_ORACLE,
    tags=("corpus", "quality", "drift"),
)
def quality_drift_psi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the quality-score distribution
    between two deterministic md5 halves of the corpus — the drift
    check a production pipeline runs between a reference window and the
    latest arrivals before trusting a tuned quality threshold (PSI
    > 0.2 conventionally means "re-fit your gate"). Bins are integer
    floors of the SAME score ``text_quality_score`` declares (rounded
    first, so bin edges are exact at 4 decimals — engine libm ulp can't
    flip a bin), Laplace-smoothed shares so empty bins stay finite, the
    bin spine is a literal range (all 10 bins always present). One
    corpus scan + two tiny aggregates; the per-split totals reach each
    bin via a broadcast single-row frame."""
    from ..functions.textfn import distinct_token_ratio, stopword_ratio

    docs = load_table(spark, sf_dir, "documents")
    toks = F.split(F.col("text"), " ")
    score = F.round(
        F.log(F.lit(1) + F.col("n_chars"))
        * (F.lit(1) - stopword_ratio(toks))
        * distinct_token_ratio(toks),
        4,
    )
    split = F.when(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2) < "80", "ref"
    ).otherwise("cmp")
    s = docs.select(
        split.alias("split"),
        F.least(F.greatest(F.floor(score), F.lit(0)), F.lit(9))
        .cast("int")
        .alias("bin"),
    )
    c = s.groupBy("bin", "split").agg(F.count(F.lit(1)).alias("n"))
    totals = s.agg(
        F.sum(F.when(F.col("split") == "ref", 1).otherwise(0)).alias("nt_ref"),
        F.sum(F.when(F.col("split") == "cmp", 1).otherwise(0)).alias("nt_cmp"),
    )
    bins = spark.range(10).select(F.col("id").cast("int").alias("bin"))
    j = (
        bins.join(
            c.filter(F.col("split") == "ref").select(
                "bin", F.col("n").alias("nr")
            ),
            "bin",
            "left",
        )
        .join(
            c.filter(F.col("split") == "cmp").select(
                "bin", F.col("n").alias("nc")
            ),
            "bin",
            "left",
        )
        .crossJoin(F.broadcast(totals))
    )
    p_ref = (F.coalesce(F.col("nr"), F.lit(0)) + 0.5) / (F.col("nt_ref") + 5.0)
    p_cmp = (F.coalesce(F.col("nc"), F.lit(0)) + 0.5) / (F.col("nt_cmp") + 5.0)
    return j.select(
        "bin",
        F.coalesce(F.col("nr"), F.lit(0)).cast("long").alias("n_ref"),
        F.coalesce(F.col("nc"), F.lit(0)).cast("long").alias("n_cmp"),
        F.round(p_ref, 6).alias("p_ref"),
        F.round(p_cmp, 6).alias("p_cmp"),
        F.round((p_ref - p_cmp) * F.log(p_ref / p_cmp), 6).alias("psi_term"),
    )



_STOP_SQL = ", ".join(f"'{w}'" for w in _SW)


@query(
    "contrastive_negatives_top3",
    """
    WITH a AS (
        SELECT doc_id AS anchor_id, source AS a_source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
        FROM documents WHERE doc_id < 16
    ), c AS (
        SELECT doc_id AS neg_id, source AS c_source,
               substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
        FROM documents
    ), r AS (
        SELECT anchor_id, neg_id,
               row_number() OVER (
                   PARTITION BY anchor_id
                   ORDER BY md5(CAST(anchor_id AS VARCHAR) || ':'
                                || CAST(neg_id AS VARCHAR)), neg_id
               ) AS rnk
        FROM a JOIN c USING (bucket)
        WHERE c_source <> a_source AND neg_id <> anchor_id
    )
    SELECT anchor_id, neg_id, CAST(rnk AS INT) AS rnk FROM r WHERE rnk <= 3
    """,
    tags=("corpus", "sampling", "contrastive"),
)
def contrastive_negatives_top3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive training: for each
    anchor doc, 3 pseudo-random negatives from a DIFFERENT source,
    reproducible across runs/engines (md5 of ``anchor:candidate`` is the
    randomness, exactly the multi-epoch-order trick).

    Scale shape: candidates per anchor come from ONE md5-derived hash
    bucket (1/16 slice) joined on bucket EQUALITY — a broadcast hash
    join of the tiny anchor set against a pruned corpus slice, never an
    anchors × corpus cross product; per-anchor ranking is a rank-filter
    window (WindowGroupLimit), never a global sort. The 1/16-slice
    sampling is the documented trade: negatives are drawn from a
    deterministic subset, which is what sampling means — scanning every
    candidate per anchor would be the non-scalable alternative."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    bucket = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    a = docs.filter(F.col("doc_id") < 16).select(
        F.col("doc_id").alias("anchor_id"),
        F.col("source").alias("a_source"),
        bucket.alias("bucket"),
    )
    c = docs.select(
        F.col("doc_id").alias("neg_id"),
        F.col("source").alias("c_source"),
        bucket.alias("bucket"),
    )
    rnd = F.md5(
        F.concat_ws(
            ":", F.col("anchor_id").cast("string"), F.col("neg_id").cast("string")
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(rnd, "neg_id")
    return (
        F.broadcast(a)
        .join(c, "bucket")
        .filter(
            (F.col("c_source") != F.col("a_source"))
            & (F.col("neg_id") != F.col("anchor_id"))
        )
        .select("anchor_id", "neg_id", F.row_number().over(w).cast("int").alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@query(
    "contrastive_negatives_all_top2",
    """
    WITH c AS (
        SELECT doc_id, source, md5(CAST(doc_id AS VARCHAR)) AS hx FROM documents
    ),
    p AS (
        SELECT doc_id AS neg_id, source AS c_source,
               substr(hx, 1, 1) AS bucket,
               row_number() OVER (PARTITION BY substr(hx, 1, 1)
                                  ORDER BY hx, doc_id) - 1 AS pos,
               count(*) OVER (PARTITION BY substr(hx, 1, 1)) AS n_bucket
        FROM c
    ),
    d AS (SELECT CAST(unnest(range(0, 10)) AS INT) AS draw),
    pk AS (
        SELECT a.doc_id AS anchor_id, a.source AS a_source,
               substr(a.hx, 1, 1) AS bucket, d.draw,
               CAST(concat('0x', substr(md5(CAST(a.doc_id AS VARCHAR) || ':'
                    || CAST(d.draw AS VARCHAR)), 1, 15)) AS BIGINT) AS pick
        FROM c a, d
    ),
    hit AS (
        SELECT pk.anchor_id, p.neg_id, min(pk.draw) AS draw
        FROM pk JOIN p ON pk.bucket = p.bucket
                      AND (pk.pick % p.n_bucket) = p.pos
        WHERE p.c_source <> pk.a_source AND p.neg_id <> pk.anchor_id
        GROUP BY pk.anchor_id, p.neg_id
    ),
    r AS (
        SELECT anchor_id, neg_id,
               row_number() OVER (PARTITION BY anchor_id ORDER BY draw) AS rnk
        FROM hit
    )
    SELECT anchor_id, neg_id, CAST(rnk AS INT) AS rnk FROM r WHERE rnk <= 2
    """,
    tags=("corpus", "sampling", "contrastive"),
)
def contrastive_negatives_all_top2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contrastive negatives with EVERY doc as an anchor — the
    corpus-scale generalization of ``contrastive_negatives_top3``
    (``operators/sampling.contrastive_negatives``): draw-by-position
    instead of scan-the-slice, so output and work are LINEAR in the
    anchor count (each anchor makes k+extra md5-derived draws joined to
    md5-ranked bucket positions on a well-distributed (bucket, pos)
    shuffle key) — no broadcast of the anchor side, no anchors × slice
    candidate blow-up. Deterministic end to end; an anchor whose draws
    all hit its own source may get fewer than k rows (documented
    shortfall, pushed down by extra_draws)."""
    docs = load_table(spark, sf_dir, "documents")
    from ..operators.sampling import contrastive_negatives

    return contrastive_negatives(docs, "doc_id", "source", k=2, extra_draws=8)


@query(
    "training_order_epochs",
    """
    WITH h AS (
        SELECT doc_id,
               e.epoch AS epoch,
               md5(CAST(e.epoch AS VARCHAR) || ':' || CAST(doc_id AS VARCHAR)) AS hx
        FROM documents, (SELECT CAST(unnest(range(0, 2)) AS INT) AS epoch) e
    ),
    r AS (
        SELECT epoch, doc_id,
               CAST(substr(hx, 1, 1) AS VARCHAR) AS shard,
               row_number() OVER (PARTITION BY epoch, substr(hx, 1, 1)
                                  ORDER BY hx, doc_id) AS pos
        FROM h
    )
    SELECT epoch, shard, pos, doc_id FROM r WHERE pos <= 5
    """,
    tags=("corpus", "sampling", "ordering"),
)
def training_order_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic multi-epoch training order — every epoch is a
    different but REPRODUCIBLE shuffle (md5 of ``epoch:doc_id``), the
    property a training run needs for exact resume/repro that
    ``rand()`` cannot give. Scale shape: position ranks are windowed
    WITHIN (epoch, first-hex-digit shard), never one global ordering —
    a global row_number would drag the corpus into a single partition;
    a reader streams shards in order and concatenates. Checked on the
    first 5 positions of every (epoch, shard)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    epochs = spark.range(2).select(F.col("id").cast("int").alias("epoch"))
    h = docs.select("doc_id").crossJoin(F.broadcast(epochs)).select(
        "epoch",
        "doc_id",
        F.md5(
            F.concat_ws(":", F.col("epoch").cast("string"),
                        F.col("doc_id").cast("string"))
        ).alias("hx"),
    )
    w = Window.partitionBy("epoch", F.substring("hx", 1, 1)).orderBy(
        "hx", "doc_id"
    )
    return (
        h.select(
            "epoch",
            F.substring("hx", 1, 1).alias("shard"),
            F.row_number().over(w).cast("long").alias("pos"),
            "doc_id",
        )
        .filter(F.col("pos") <= 5)
    )


@query(
    "dup_cluster_size_histogram",
    """
    WITH RECURSIVE p AS (
        SELECT a.vec_id AS id1, b.vec_id AS id2
        FROM (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) a
        JOIN (SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings) b
          ON a.vec_id < b.vec_id
        WHERE list_cosine_similarity(a.emb, b.emb) >= 0.35
    ), e AS (
        SELECT id1 AS v, id2 AS w FROM p UNION SELECT id2, id1 FROM p
    ), reach AS (
        SELECT v, w AS r FROM e
        UNION
        SELECT reach.v, e.w FROM reach JOIN e ON reach.r = e.v
    ), lab AS (
        SELECT v, least(v, min(r)) AS component FROM reach GROUP BY v
    ), sizes AS (
        SELECT component, count(*) AS cluster_size FROM lab GROUP BY component
    )
    SELECT cluster_size, count(*) AS n_clusters,
           CAST(cluster_size * count(*) AS BIGINT) AS n_members,
           CAST((cluster_size - 1) * count(*) AS BIGINT) AS n_droppable
    FROM sizes GROUP BY cluster_size
    """,
    tags=("dedup", "graph", "corpus", "stats"),
)
def dup_cluster_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate cluster-size distribution — the dedup-impact
    report read before committing to a drop policy: for each cluster
    size, how many clusters, how many member docs, and how many docs a
    keep-one-per-cluster policy would remove (``n_droppable``). The
    pair graph and components are exactly
    :func:`dup_cluster_components`'s (tiled-matmul near pairs +
    min-label propagation); this adds two small post-agg groupBys over
    the component-sized frame — the histogram costs nothing beyond the
    clustering that was already running."""
    emb = load_table(spark, sf_dir, "embeddings")
    pairs = cosine_near_pairs_blocked(emb, threshold=0.35)
    labels = connected_components(pairs, src="id1", dst="id2")
    sizes = labels.groupBy("component").agg(
        F.count(F.lit(1)).alias("cluster_size")
    )
    return sizes.groupBy("cluster_size").agg(
        F.count(F.lit(1)).alias("n_clusters"),
        (F.col("cluster_size") * F.count(F.lit(1)))
        .cast("long")
        .alias("n_members"),
        ((F.col("cluster_size") - 1) * F.count(F.lit(1)))
        .cast("long")
        .alias("n_droppable"),
    )


#: RRF rank-smoothing constant (Cormack/Clarke/Buettcher 2009's k=60).
_RRF_K = 60
#: Candidate depth per list for the hybrid fusion.
_RRF_DEPTH = 50


@query(
    "retrieval_hybrid_rrf_top10",
    f"""
    WITH toks AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ), dl AS (
        SELECT doc_id, count(*) AS dl FROM toks WHERE term <> '' GROUP BY doc_id
    ), q AS (
        SELECT unnest(['{"','".join(_BM25_TERMS)}']) AS term
    ), tf AS (
        SELECT t.doc_id, t.term, count(*) AS tf
        FROM toks t JOIN q ON t.term = q.term GROUP BY t.doc_id, t.term
    ), df AS (
        SELECT term, count(*) AS df FROM tf GROUP BY term
    ), n AS (SELECT count(*) AS n_docs FROM documents),
    ad AS (SELECT avg(CAST(dl AS DOUBLE)) AS avgdl FROM dl),
    bm AS (
        SELECT tf.doc_id AS id,
               round(sum(
                   ln((CAST(n_docs AS DOUBLE) - df + 0.5) / (df + 0.5) + 1.0)
                   * (tf * {_BM25_K1 + 1.0})
                   / (tf + {_BM25_K1} * (1.0 - {_BM25_B} + {_BM25_B} * dl / avgdl))
               ), 6) AS s
        FROM tf JOIN df USING (term) JOIN dl USING (doc_id)
        CROSS JOIN n CROSS JOIN ad
        WHERE tf.doc_id != 0
        GROUP BY tf.doc_id
        ORDER BY s DESC, id LIMIT {_RRF_DEPTH}
    ), bmr AS (
        SELECT id, row_number() OVER (ORDER BY s DESC, id) AS r FROM bm
    ), e AS (
        SELECT vec_id, embedding::DOUBLE[] AS emb FROM embeddings
    ), qv AS (SELECT emb AS q_emb FROM e WHERE vec_id = 0),
    cos AS (
        SELECT vec_id AS id,
               list_cosine_similarity(e.emb, qv.q_emb) AS sim
        FROM e, qv WHERE e.vec_id != 0
        ORDER BY sim DESC, id LIMIT {_RRF_DEPTH}
    ), cosr AS (
        SELECT id, row_number() OVER (ORDER BY sim DESC, id) AS r FROM cos
    ), fused AS (
        SELECT coalesce(b.id, c.id) AS doc_id,
               coalesce(1.0 / ({_RRF_K} + b.r), 0.0)
                   + coalesce(1.0 / ({_RRF_K} + c.r), 0.0) AS rrf,
               b.r AS bm25_rank, c.r AS cos_rank
        FROM bmr b FULL JOIN cosr c ON b.id = c.id
    )
    SELECT doc_id, round(rrf, 8) AS rrf_score,
           CAST(bm25_rank AS INT) AS bm25_rank, CAST(cos_rank AS INT) AS cos_rank
    FROM fused ORDER BY rrf DESC, doc_id LIMIT 10
    """,
    tags=("text", "corpus", "retrieval", "similarity"),
    bench=True,
)
def retrieval_hybrid_rrf_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid lexical+semantic retrieval fused by Reciprocal Rank Fusion:
    the BM25 top-50 for the fixed term query and the cosine top-50 around
    doc 0's embedding each contribute 1/(60+rank); missing membership in a
    list contributes 0 — the standard zero-training fusion for RAG-style
    corpus pulls (doc 0 itself is excluded from both lists).

    Determinism across engines: the BM25 list ranks on the ROUNDED score
    (the sum over per-term contributions tolerates association-order
    ULPs — see bm25_top20) and the cosine list on the raw fold (bit-equal
    on both engines — see knn_cosine_top20), each with the id tie-break;
    the fused score is two IEEE divisions summed in a fixed order.

    Shape at scale: both candidate lists are TakeOrderedAndProject
    top-50s (never a global sort); the rank row_number then runs over a
    50-row frame — single-partition by construction and bounded by the
    fusion depth, not the corpus. The fusion join is 50x50 ids. The
    cosine side here is the exact brute-force scan (the oracle-checkable
    baseline); swapping in the partition-pruned ANN serving path
    (operators/similarity.ann_topk over a maintained index) changes only
    the candidate generator, not the fusion."""
    from pyspark.sql import Window

    from ..operators.similarity import knn_bruteforce, rrf_fuse

    docs = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")
    # doc 0 (the query doc) is dropped from the CANDIDATES only — corpus
    # statistics (df, N, avgdl) stay full-corpus, exactly as the oracle's
    # WHERE on the aggregated frame does.
    bm = (
        _bm25_scored(docs, list(_BM25_TERMS))
        .filter(F.col("doc_id") != 0)
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(_RRF_DEPTH)
    )
    bmr = bm.select(
        F.col("doc_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("s").desc(), F.col("doc_id")))
        .alias("r"),
    )
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding")
    cos = knn_bruteforce(emb.filter(F.col("vec_id") != 0), qvec, k=_RRF_DEPTH)
    cosr = cos.select(
        F.col("vec_id").alias("id"),
        F.row_number()
        .over(Window.orderBy(F.col("sim").desc(), F.col("vec_id")))
        .alias("r"),
    )
    # rrf_fuse orders by the RAW fused double (bit-identical on both
    # engines — two IEEE divisions summed in list order), matching the
    # oracle's ORDER BY on the raw rrf; only the OUTPUT is rounded.
    return rrf_fuse([bmr, cosr], k=_RRF_K, topk=10).select(
        F.col("id").alias("doc_id"),
        F.round("rrf_score", 8).alias("rrf_score"),
        F.col("rank_1").alias("bm25_rank"),
        F.col("rank_2").alias("cos_rank"),
    )
