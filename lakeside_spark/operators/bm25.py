"""BM25 lexical retrieval over a document corpus.

The exact-match complement to the embedding ANN family
(operators/similarity.py): classic Okapi BM25 with the Lucene idf form
``ln(1 + (N - df + 0.5)/(df + 0.5))`` and the standard k1/b length
normalization — the scoring every search engine's lexical leg runs, and
the baseline half of the hybrid (BM25 + dense) retrieval that
training-data curation pipelines use for decontamination-by-retrieval
and hard-negative mining.

Spark-first shape, all JVM-side:
- doc term frequencies: one explode + (doc, term) aggregation — the one
  corpus-sized shuffle, map-side combined;
- document frequencies and avgdl: vocabulary-sized / scalar aggregates
  off that same table;
- query terms (a handful of rows) broadcast-join against the postings,
  partial scores summed per (query, doc), top-k per query via
  row_number over a (rounded score, doc id) ordering.

The rank orders by the 6-decimal ROUNDED score (ties broken by doc id)
so the ordering is reproducible across engines — raw-double ordering
would let a 1-ulp ln() difference flip equal-scored neighbors. Scale:
postings are (corpus tokens)-sized but the only join fan-out is
|query terms| × their postings lists — bounded by the panel, never
all-pairs; the reference's trigram index covers the same "find docs
containing these terms" need at segment granularity, this scores them.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakeside_spark.functions.text import words


def bm25_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` corpus docs per query by BM25. Returns
    (q_id, doc_id, score, rank); score rounded to 6 decimals and rank
    assigned on the rounded value for cross-engine determinism."""
    tf = (
        corpus.select(F.col(id_col).alias("doc_id"), F.explode(words(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .groupBy("doc_id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # doc length straight off the words array — map-only, no dependence
    # on the tf aggregation (which Catalyst can then compute once and
    # reuse between the df table and the scoring join via ReusedExchange)
    w = words(text_col)
    doclen = corpus.select(
        F.col(id_col).alias("doc_id"),
        F.size(F.filter(w, lambda x: x != F.lit(""))).cast("long").alias("dl"),
    ).filter(F.col("dl") > 0)
    stats = doclen.agg(
        F.count(F.lit(1)).alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    qterms = (
        queries.select(F.col(id_col).alias("q_id"), F.explode(words(text_col)).alias("term"))
        .filter(F.col("term") != "")
        .distinct()
    )
    # resolve idf on the BOUNDED query-term set first (broadcast qterms
    # into the vocab-sized df table, never the reverse — the vocabulary
    # is 100M+ terms at corpus scale, the query panel is a handful), so
    # only |query terms| idf rows ever broadcast toward the postings
    q_scored_terms = (
        df_t.join(F.broadcast(qterms), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5))
            ),
        )
        .select("q_id", "term", "idf", "avgdl")
    )
    scored = (
        tf.join(F.broadcast(q_scored_terms), "term")
        .join(doclen, "doc_id")
        .withColumn(
            "part",
            F.col("idf")
            * F.col("tf")
            * F.lit(k1 + 1.0)
            / (
                F.col("tf")
                + F.lit(k1)
                * (F.lit(1.0 - b) + F.lit(b) * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("q_id", "doc_id")
        .agg(F.round(F.sum("part"), 6).alias("score"))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "score", "rank")
    )


def hybrid_rrf_topk(
    docs: DataFrame,
    emb: DataFrame,
    query_ids_below: int = 5,
    k: int = 10,
    pool: int = 20,
    k0: int = 60,
) -> DataFrame:
    """Hybrid retrieval via reciprocal-rank fusion (Cormack et al. 2009):
    fuse the BM25 lexical leg over ``docs`` with the exact-cosine dense
    leg over ``emb`` (aligned id spaces) as
    ``rrf = Σ_legs 1/(k0 + rank_leg)`` over each leg's top-``pool``.

    Rank-based fusion sidesteps score-scale mismatch between the legs —
    the standard production hybrid. Both legs re-rank their pools on the
    6-decimal ROUNDED leg score (id tiebreak) before fusing, so the
    integer ranks — and therefore the fused score, a sum of two exact
    reciprocals — are reproducible across engines. Scale: each leg is
    its own documented plan; the fusion is a pool-sized (|queries| ×
    pool) full-outer join + window, negligible at any corpus size.

    Output: (q_id, doc_id, rrf, rank), top-``k`` per query.
    """
    from lakeside_spark.operators.similarity import cosine_topk

    bm = bm25_topk(
        docs.filter(F.col("doc_id") >= query_ids_below),
        docs.filter(F.col("doc_id") < query_ids_below),
        k=pool,
    )
    cs = cosine_topk(
        emb.filter(F.col("vec_id") >= query_ids_below),
        emb.filter(F.col("vec_id") < query_ids_below),
        k=pool,
    )
    # re-rank each pool on the rounded score so leg ranks are
    # engine-independent (bm25's rank already is; cosine's row_number
    # ran on the raw double)
    wb = Window.partitionBy("q_id").orderBy(F.col("score").desc(), F.col("doc_id"))
    wc = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    bmr = bm.select("q_id", "doc_id", F.row_number().over(wb).alias("r_lex"))
    csr = cs.select(
        "q_id",
        F.col("n_id").alias("doc_id"),
        F.row_number().over(wc).alias("r_dense"),
    )
    fused = (
        bmr.join(csr, ["q_id", "doc_id"], "full_outer")
        .withColumn(
            "rrf",
            F.round(
                F.coalesce(F.lit(1.0) / (F.lit(k0) + F.col("r_lex")), F.lit(0.0))
                + F.coalesce(
                    F.lit(1.0) / (F.lit(k0) + F.col("r_dense")), F.lit(0.0)
                ),
                6,
            ),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "doc_id", "rrf", "rank")
    )


def retrieval_eval(
    docs: DataFrame,
    emb: DataFrame,
    query_ids_below: int = 5,
    k: int = 10,
    pool: int = 20,
    k0: int = 60,
) -> DataFrame:
    """Rank-metric evaluation of the three retrieval legs — recall@k,
    MRR and binary-relevance nDCG@k per system, averaged over the query
    panel — against the exact-cosine top-``k`` truth set (so the dense
    row is the =1.0 sanity anchor and the bm25/hybrid rows measure how
    much of the semantic neighborhood the lexical and fused legs
    recover; the standard offline eval a retrieval-based curation
    pipeline runs before trusting a cheaper leg).

    Determinism: every leg's ranks are already engine-independent
    (rounded-score re-rank, id tiebreak); DCG terms are fixed-point
    integers ``round(1e9·ln2/ln(rank+1))`` summed exactly, and both
    engines spell the log as ``ln`` (log2 builtins may differ by an
    ulp between libm and the JVM), so nDCG is a ratio of exact
    integers. Scale: everything after the legs runs on
    |systems|×|queries|×k rows — the eval is free; the legs are the
    documented plans.

    Output: (system, recall_at_k, mrr, ndcg), one row per system.
    """
    from lakeside_spark.operators.similarity import cosine_topk

    spark = docs.sparkSession
    cs = cosine_topk(
        emb.filter(F.col("vec_id") >= query_ids_below),
        emb.filter(F.col("vec_id") < query_ids_below),
        k=k,
    )
    truth = cs.select("q_id", F.col("n_id").alias("doc_id"))
    # dense run: same raw-order top-k pool, ranks re-assigned on the
    # rounded cosine (cosine_topk's row_number ran on the raw double)
    wd = Window.partitionBy("q_id").orderBy(
        F.round("cos", 6).desc(), F.col("n_id")
    )
    dense = cs.select(
        "q_id", F.col("n_id").alias("doc_id"), F.row_number().over(wd).alias("rank")
    )
    bm = bm25_topk(
        docs.filter(F.col("doc_id") >= query_ids_below),
        docs.filter(F.col("doc_id") < query_ids_below),
        k=k,
    ).select("q_id", "doc_id", "rank")
    hy = hybrid_rrf_topk(
        docs, emb, query_ids_below=query_ids_below, k=k, pool=pool, k0=k0
    ).select("q_id", "doc_id", "rank")
    runs = (
        bm.withColumn("system", F.lit("bm25"))
        .unionByName(dense.withColumn("system", F.lit("dense")))
        .unionByName(hy.withColumn("system", F.lit("hybrid")))
    )
    # fixed-point DCG term: round(1e9 * ln2 / ln(rank+1)) as exact int
    dcg_term = F.round(
        F.lit(1.0e9) * F.log(F.lit(2.0)) / F.log(F.col("rank") + F.lit(1.0)), 0
    ).cast("long")
    per_q = (
        runs.join(truth.withColumn("hit", F.lit(1)), ["q_id", "doc_id"], "left")
        .withColumn("hit", F.coalesce("hit", F.lit(0)))
        .groupBy("system", "q_id")
        .agg(
            F.sum("hit").alias("hits"),
            F.max(F.col("hit") * (F.lit(1.0) / F.col("rank"))).alias("mrr_q"),
            F.sum(F.col("hit") * dcg_term).alias("dcg_int"),
        )
    )
    n_rel = truth.groupBy("q_id").agg(F.count(F.lit(1)).alias("n_rel"))
    idcg = n_rel.withColumn(
        "idcg_int",
        F.expr(
            f"aggregate(sequence(1, int(least(n_rel, {k}))), 0L, "
            "(acc, i) -> acc + cast(round(1e9 * ln(2.0) / ln(i + 1.0), 0) "
            "as long))"
        ),
    )
    systems = spark.createDataFrame(
        [("bm25",), ("dense",), ("hybrid",)], "system string"
    )
    spine = (
        docs.filter(F.col("doc_id") < query_ids_below)
        .select(F.col("doc_id").alias("q_id"))
        .crossJoin(F.broadcast(systems))
    )
    per_q_full = (
        spine.join(per_q, ["system", "q_id"], "left")
        .join(F.broadcast(idcg), "q_id")
        .select(
            "system",
            (F.coalesce("hits", F.lit(0)) / F.col("n_rel")).alias("recall_q"),
            F.coalesce("mrr_q", F.lit(0.0)).alias("mrr_q"),
            (
                F.coalesce("dcg_int", F.lit(0)).cast("double")
                / F.col("idcg_int").cast("double")
            ).alias("ndcg_q"),
        )
    )
    return per_q_full.groupBy("system").agg(
        F.round(F.avg("recall_q"), 6).alias("recall_at_k"),
        F.round(F.avg("mrr_q"), 6).alias("mrr"),
        F.round(F.avg("ndcg_q"), 6).alias("ndcg"),
    )
