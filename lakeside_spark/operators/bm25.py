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
