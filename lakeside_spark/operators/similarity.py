"""Similarity search over embedding columns.

- brute-force cosine top-k: broadcast the (small) query set against the
  corpus; one pass, no shuffle of the corpus. The correct baseline and the
  oracle-checkable path.
- LSH-bucketed ANN: deterministic random-hyperplane signatures; candidates
  only within matching buckets (plus verification), bounding the join
  fan-out at scale. Recall < 1 by design — the 100 TB path.
- embedding near-dup pairs: cosine ≥ τ via bucketed or brute-force pairing.

Vector kernels are higher-order-function expressions (functions/vectors.py)
— JVM-side, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from lakeside_spark.functions.vectors import as_double_array, cosine


def _with_vec(df: DataFrame, vec_col: str) -> DataFrame:
    return df.withColumn("_v", as_double_array(vec_col))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query vector (self-matches excluded).

    Output: (q_id, n_id, cos, rank). Deterministic ordering: cos desc then
    neighbor id."""
    c = _with_vec(corpus, vec_col).select(
        F.col(id_col).alias("n_id"), F.col("_v").alias("nv")
    )
    q = _with_vec(queries, vec_col).select(
        F.col(id_col).alias("q_id"), F.col("_v").alias("qv")
    )
    scored = (
        c.join(F.broadcast(q), F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )


def embedding_dup_pairs(
    emb: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """All pairs (id_a < id_b) with cosine ≥ threshold (exact)."""
    v = _with_vec(emb, vec_col)
    a = v.select(F.col(id_col).alias("id_a"), F.col("_v").alias("va"))
    b = v.select(F.col(id_col).alias("id_b"), F.col("_v").alias("vb"))
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .withColumn("cos", cosine(F.col("va"), F.col("vb")))
        .filter(F.col("cos") >= threshold)
        .select("id_a", "id_b", F.round("cos", 6).alias("cos"))
    )


def _hyperplane_sign(vec: F.Column, plane: int, dim: int) -> F.Column:
    """Deterministic pseudo-random hyperplane: component i ∈ {-1,+1} from
    md5(plane:i); sign of <v, plane>. Portable: no RNG state, same planes on
    every executor and every engine."""
    comps = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.when(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(f"{plane}:"), i.cast("string"))), 1, 4
                ),
                16,
                10,
            ).cast("int") % 2
            == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0)),
    )
    dotp = F.aggregate(
        F.zip_with(vec, comps, lambda x, c: x * c), F.lit(0.0), lambda a, x: a + x
    )
    return (dotp > 0).cast("int")


def lsh_bucket(vec: F.Column, num_planes: int, dim: int) -> F.Column:
    """Bit-string bucket id from num_planes hyperplane signs."""
    return F.concat_ws(
        "", *[_hyperplane_sign(vec, p, dim).cast("string") for p in range(num_planes)]
    )


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    num_planes: int = 8,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Approximate top-k: candidates share the query's hyperplane bucket.

    At scale the corpus is hash-partitioned by bucket, so each query probes
    one partition instead of the full corpus (recall traded for fan-out)."""
    c = _with_vec(corpus, vec_col).select(
        F.col(id_col).alias("n_id"),
        F.col("_v").alias("nv"),
        lsh_bucket(F.col("_v"), num_planes, dim).alias("bucket"),
    )
    q = _with_vec(queries, vec_col).select(
        F.col(id_col).alias("q_id"),
        F.col("_v").alias("qv"),
        lsh_bucket(F.col("_v"), num_planes, dim).alias("bucket"),
    )
    scored = (
        c.join(F.broadcast(q), "bucket")
        .filter(F.col("q_id") != F.col("n_id"))
        .withColumn("cos", cosine(F.col("qv"), F.col("nv")))
    )
    w = Window.partitionBy("q_id").orderBy(F.col("cos").desc(), F.col("n_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("q_id", "n_id", F.round("cos", 6).alias("cos"), "rank")
    )
