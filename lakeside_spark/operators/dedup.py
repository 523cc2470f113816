"""Document deduplication operators: exact, n-gram Jaccard, MinHash+LSH,
SimHash.

Scale design (100 TB):
- exact: one hash-groupBy on a 16-byte key — the minimal shuffle.
- jaccard: explode(shingles) self-join blocks only docs sharing a shingle;
  ultra-frequent shingles create skew, so at scale pair generation goes
  through MinHash LSH (bounded candidates per band bucket) and exact Jaccard
  only verifies candidates. Both paths share the verification code.
- minhash: signatures are per-doc map work (no shuffle); the only shuffle is
  the band-bucket join. Bands are computed as one array column and exploded,
  so a doc moves bands-times, not signature-length-times.
- simhash: 64-bit signature per doc; candidate pairing via band-substrings
  of the signature (here: exact hamming verification over modest candidate
  sets).

Cross-engine determinism: every hash derives from md5 (first 15 hex chars →
60-bit int), reproducible in DuckDB as
``CAST('0x' || substr(md5(x), 1, 15) AS BIGINT)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import md5_long, normalized, shingles


def _parallelize(df: DataFrame) -> DataFrame:
    """Spread rows across all cores before CPU-heavy per-doc work.

    Needed when the upstream scan is coarse (single-row-group files → one
    task); on a real cluster the scan is already parallel and this becomes a
    cheap rebalance. Round-robin, no key skew."""
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def exact_dedup(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Group identical (normalized) texts; keep the smallest id per group."""
    return (
        docs.select(F.md5(normalized(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


def _shingled(docs: DataFrame, text_col: str, id_col: str, n: int) -> DataFrame:
    # NOTE: no filter below this projection — a predicate referencing the
    # shingle expression gets pushed beneath the repartition exchange and
    # forces the (interpreted) HOF to evaluate in the single scan task.
    # The shingle array is never empty (sequence(0, greatest(·,0)) ≥ 1 elem).
    return _parallelize(docs).select(
        F.col(id_col).alias("doc_id"), shingles(text_col, n).alias("sh")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    threshold: float,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Exact Jaccard near-dup pairs (id_a < id_b, jaccard ≥ threshold).

    explode → join on shingle → |A∩B| per pair, |A∪B| = |A|+|B|-|A∩B|.
    """
    sh = _shingled(docs, text_col, id_col, n)
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("sh").alias("shingle"))
    a, b = exploded.alias("a"), exploded.alias("b")
    common = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def minhash_signatures(
    docs: DataFrame,
    num_hashes: int = 16,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, sig: array<bigint>[num_hashes]) — sig[i] = min over shingles
    of md5_long(i || '|' || shingle).

    Computed on flat (doc_id, shingle) rows with one static md5/conv column
    per hash index: everything stays in whole-stage codegen (nested
    higher-order lambdas would fall back to interpreted eval, ~20× slower),
    then a single groupBy(doc_id) min-aggregates the signature."""
    sh = _shingled(docs, text_col, id_col, n)
    flat = sh.select("doc_id", F.explode("sh").alias("s"))
    hash_cols = [
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{i}|"), F.col("s"))), 1, 15), 16, 10
        )
        .cast("bigint")
        .alias(f"h{i}")
        for i in range(num_hashes)
    ]
    per_shingle = flat.select("doc_id", *hash_cols)
    mins = per_shingle.groupBy("doc_id").agg(
        *[F.min(f"h{i}").alias(f"h{i}") for i in range(num_hashes)]
    )
    return mins.select(
        "doc_id", F.array(*[F.col(f"h{i}") for i in range(num_hashes)]).alias("sig")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    threshold: float,
    num_hashes: int = 16,
    bands: int = 4,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash→banded-LSH candidates, verified with exact Jaccard.

    rows-per-band = num_hashes/bands; a pair collides if any band's slice of
    the signature matches exactly. Candidates are then verified, so output ⊆
    ngram_jaccard_pairs(threshold) (LSH may miss pairs — that is the
    documented recall trade-off of the scale path).
    """
    rows = num_hashes // bands
    sig = minhash_signatures(docs, num_hashes, n, text_col, id_col)
    band_keys = F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat(
            b.cast("string"),
            F.lit(":"),
            F.md5(F.concat_ws(",", F.slice(F.col("sig"), b * rows + 1, rows))),
        ),
    )
    banded = sig.select("doc_id", F.explode(band_keys).alias("band"))
    a, b = banded.alias("a"), banded.alias("b")
    candidates = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .select(F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b"))
        .distinct()
    )
    # verify ONLY the candidate pairs (this bounded verification is the whole
    # point of LSH at scale — never the all-pairs join)
    sh = _shingled(docs, text_col, id_col, n)
    ex = sh.select("doc_id", F.explode("sh").alias("shingle"))
    sizes = sh.select("doc_id", F.size("sh").alias("n_sh"))
    ex_a = ex.select(F.col("doc_id").alias("id_a"), "shingle")
    ex_b = ex.select(F.col("doc_id").alias("_id_b"), F.col("shingle").alias("_sh_b"))
    common = (
        candidates.join(ex_a, "id_a")
        .join(ex_b, (F.col("id_b") == F.col("_id_b")) & (F.col("shingle") == F.col("_sh_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            F.col("n_common") / (F.col("n_a") + F.col("n_b") - F.col("n_common")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )


def simhash64(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over word tokens: bit j = sign of Σ_tokens (±1 per
    token's md5-derived bit j). Deterministic and portable (md5-based)."""
    from lakeside_spark.functions.text import words

    toks = _parallelize(docs).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.array_distinct(words(text_col))).alias("tok"),
    )
    h = toks.withColumn("h", md5_long(F.col("tok")))
    # per (doc, bit): contribution +1 when bit set else -1; simhash bit =
    # (sum > 0). 60 bit positions of the 60-bit md5 int, statically unrolled.
    bit_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("bit"),
                (F.shiftright(F.col("h"), j).bitwiseAND(F.lit(1)) * 2 - 1).alias("c"),
            )
            for j in range(60)
        ]
    )
    bits = h.select("doc_id", F.explode(bit_structs).alias("bc")).select(
        "doc_id", F.col("bc.bit").alias("bit"), F.col("bc.c").alias("c")
    )
    # 2^bit is exact in double for bit<60, so pow→bigint reconstructs the word
    return (
        bits.groupBy("doc_id", "bit")
        .agg(F.sum("c").alias("s"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(
                    F.col("s") > 0, F.pow(F.lit(2.0), F.col("bit")).cast("bigint")
                ).otherwise(F.lit(0).cast("bigint"))
            ).alias("simhash")
        )
    )


def simhash_pairs(docs: DataFrame, max_hamming: int = 8, **kw) -> DataFrame:
    """Near-dup pairs with hamming(simhash) ≤ max_hamming."""
    sh = simhash64(docs, **kw)
    a = sh.select(F.col("doc_id").alias("id_a"), F.col("simhash").alias("ha"))
    b = sh.select(F.col("doc_id").alias("id_b"), F.col("simhash").alias("hb"))
    pairs = a.join(b, F.col("id_a") < F.col("id_b"))
    hamming = F.bit_count(F.col("ha").bitwiseXOR(F.col("hb")))
    return pairs.select("id_a", "id_b", hamming.alias("hamming")).filter(
        F.col("hamming") <= max_hamming
    )
