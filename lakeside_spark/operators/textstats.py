"""Text analysis operators: language ID, quality scoring, token counting,
document fingerprinting.

Every function is a pure Column-expression pipeline (codegen'd) designed to
be cross-engine deterministic: regex patterns restricted to RE2∩Java syntax,
hashes md5-based, ratios single-division doubles.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import normalized, shingles, words

# marker stopwords per language; priority order breaks score ties
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "und", "die", "nicht"),
    "es": ("el", "la", "que", "los"),
    "fr": ("le", "et", "les", "une"),
}

# BPE-ish tokenizer: letter runs | digit runs | single non-space symbol
BPE_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

_EN_STOPWORDS = ("the", "and", "of", "is", "a", "to", "in")


def _marker_count(text_col: str, markers: tuple[str, ...]) -> F.Column:
    pattern = r"\b(" + "|".join(markers) + r")\b"
    return F.regexp_count(normalized(text_col), F.lit(pattern)).cast("long")


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of marker-word hits, 'und' when no
    marker occurs. Tie-break = LANG_MARKERS declaration order."""
    out = docs.select(F.col(id_col).alias("doc_id"), F.col(text_col))
    for lang, markers in LANG_MARKERS.items():
        out = out.withColumn(f"c_{lang}", _marker_count(text_col, markers))
    score_cols = [F.col(f"c_{lang}") for lang in LANG_MARKERS]
    best = F.greatest(*score_cols)
    guess = F.when(best <= 0, F.lit("und"))
    for lang in LANG_MARKERS:
        guess = guess.when(F.col(f"c_{lang}") == best, F.lit(lang))
    return out.select(
        "doc_id", guess.alias("lang_guess"), *[f"c_{lang}" for lang in LANG_MARKERS]
    )


def quality_expr(text_col: str = "text") -> Column:
    """The rounded quality score as a plain Column, so gate pipelines can
    filter on it inline (pure codegen predicate at the scan) instead of
    semi-joining against a quality_score() projection."""
    w = words(text_col)
    n_chars = F.length(F.col(text_col)).cast("double")
    n_words = F.size(w).cast("double")
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
    stops = _marker_count(text_col, _EN_STOPWORDS).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stops / F.greatest(n_words, F.lit(1.0))
    return F.round(
        F.least(n_words / 100.0, F.lit(1.0)) * 0.4
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
        + (1.0 - punct_ratio) * 0.3,
        6,
    )


def quality_score(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Length/punctuation/stopword heuristic quality features + score.

    score = 0.4·min(words/100,1) + 0.3·stop_ratio·5 (cap 0.3) + 0.3·(1-punct_ratio)
    """
    w = words(text_col)
    n_chars = F.length(F.col(text_col)).cast("double")
    n_words = F.size(w).cast("double")
    punct = F.regexp_count(F.col(text_col), F.lit(r"[^\w\s]")).cast("double")
    stops = _marker_count(text_col, _EN_STOPWORDS).cast("double")
    punct_ratio = punct / F.greatest(n_chars, F.lit(1.0))
    stop_ratio = stops / F.greatest(n_words, F.lit(1.0))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_chars.alias("n_chars_m"),
        n_words.alias("n_words"),
        F.round(punct_ratio, 6).alias("punct_ratio"),
        F.round(stop_ratio, 6).alias("stop_ratio"),
        quality_expr(text_col).alias("quality"),
    )


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Whitespace token count + BPE-ish regex token count."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words(text_col)).cast("long").alias("ws_tokens"),
        F.regexp_count(F.col(text_col), F.lit(BPE_PATTERN)).cast("long").alias("bpe_tokens"),
    )


def fingerprints(
    docs: DataFrame, n: int = 8, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Content fingerprints: md5 of normalized text (exact identity) + the
    minimum md5 over char-level rolling n-gram windows (winnowing-style
    robust fingerprint; reference analog: Commons.computeFingerprint's
    field:trigram hashing).

    Arrow kernel, not a transform() Column: the per-window md5 lambda is
    interpreted JVM-side (~0.2 ms/doc at 300 windows); one hashlib pass
    per batch is ~3× faster and byte-identical (md5 hex of ASCII
    windows)."""
    import hashlib
    from collections.abc import Iterator

    import pandas as pd

    from lakeside_spark.operators.dedup import _parallelize
    from lakeside_spark.operators.repetition import _normalize_py

    src = _parallelize(
        docs.select(F.col(id_col).alias("doc_id"), F.col(text_col).alias("text"))
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content, rolling = [], []
            for text in pdf["text"]:
                norm = _normalize_py(text)
                b = norm.encode()
                content.append(hashlib.md5(b).hexdigest())
                rolling.append(
                    min(
                        hashlib.md5(b[i : i + n]).hexdigest()
                        for i in range(max(len(b) - n + 1, 1))
                    )
                )
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "content_fp": content,
                    "rolling_fp": rolling,
                }
            )

    return src.mapInPandas(
        kernel, schema="doc_id long, content_fp string, rolling_fp string"
    )


def shingle_profile(docs: DataFrame, n: int = 3, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Per-doc shingle counts — building block reused by dedup tests."""
    return docs.select(
        F.col(id_col).alias("doc_id"), F.size(shingles(text_col, n)).alias("n_shingles")
    )


def unigram_nll(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus's own
    unigram LM — the CCNet-style perplexity quality signal (Wenzek et al.
    2020 score against a reference LM; self-trained here so the operator
    is closed over its input).

    Scale shape: one shuffle builds the vocabulary (map-side combined,
    vocabulary-sized result), the corpus total rides in via a broadcast
    single-row cross join, and scoring is an explode + broadcast hash
    join + one aggregation. Per-word log-probs are snapped to 1e-9 and
    summed as exact integers so the per-doc mean is order-independent
    (double sums are not, and the oracle compares 6 decimals).

    Output: (doc_id, n_words, nll, ppl) for every doc with ≥1 word.
    """
    wds = (
        docs.select(
            F.col(id_col).alias("doc_id"),
            F.explode(words(text_col)).alias("w"),
        )
        .filter(F.col("w") != "")
    )
    vocab = wds.groupBy("w").agg(F.count("*").alias("cnt"))
    total = vocab.agg(F.sum("cnt").alias("__total"))
    lp = vocab.crossJoin(F.broadcast(total)).select(
        "w",
        F.round(F.log(F.col("cnt") / F.col("__total")) * 1e9)
        .cast("long")
        .alias("lp9"),
    )
    scored = wds.join(F.broadcast(lp), "w")
    nll = -F.sum("lp9") / (F.count("*") * 1e9)
    return scored.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.round(nll, 6).alias("nll"),
        F.round(F.exp(F.round(nll, 6)), 6).alias("ppl"),
    )


def compression_ratio(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """DEFLATE compression ratio as a text-quality signal: highly
    repetitive or templated documents compress far below natural prose
    (the RefinedWeb/MassiveText-family "compressibility" heuristic —
    boilerplate and spam sit at the low-ratio tail, random noise near
    1.0; a useful complement to the Gopher n-gram repetition fractions
    which only see word-level structure).

    Output: ``(doc_id, n_bytes, zlib_ratio)`` with ``zlib_ratio =
    compressed_size / raw_size`` (level 6, raw UTF-8), rounded to 6.

    Scale shape: an Arrow-batched ``mapInPandas`` kernel — zero
    shuffles, embarrassingly parallel; zlib is C-speed so the kernel is
    I/O-bound like the other map-only curation signals. No oracle:
    DuckDB has no DEFLATE scalar, so correctness is pinned by pytest
    invariants (determinism, bounds, repetitive < diverse ordering).
    """
    import zlib

    from collections.abc import Iterator as _Iter

    import pandas as pd

    def _kernel(batches: _Iter["pd.DataFrame"]) -> _Iter["pd.DataFrame"]:
        for pdf in batches:
            raw = [
                (t or "").encode("utf-8", errors="replace")
                for t in pdf[text_col]
            ]
            n = [len(b) for b in raw]
            ratio = [
                round(len(zlib.compress(b, 6)) / len(b), 6) if len(b) else None
                for b in raw
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "n_bytes": pd.Series(n, dtype="int64"),
                    "zlib_ratio": pd.Series(ratio, dtype="float64"),
                }
            )

    return docs.select(F.col(id_col), F.col(text_col)).mapInPandas(
        _kernel, schema="doc_id long, n_bytes long, zlib_ratio double"
    )


def collocations(
    docs: DataFrame,
    min_count: int = 5,
    k: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k word collocations by pointwise mutual information:
    PMI(a,b) = ln(c_ab · N / (c_a · c_b)) over adjacent word pairs —
    the standard phrase-mining signal (Church & Hanks 1990; word2vec's
    phrase pass uses the same count ratio) for building tokenizer merge
    seeds and phrase vocabularies from a corpus.

    Scale shape: three corpus passes — the eager bigram total (runs at
    build time, like the DSIR fit pass), the bigram-keyed aggregation
    (map-side combined, bigram-vocabulary-sized result), and the
    unigram aggregation — with the unigram tables broadcast into the
    bigram table. Counts are exact integers; each PMI is a single ln
    rounded to 6 (the c_a·c_b denominator multiplies in DOUBLE — at
    ~1e11-count stopwords a long product would wrap), so the oracle
    compare is safe (no float summation anywhere). Repeat callers at
    scale should persist the bigram-count table to amortize the passes.

    Output: (a, b, c_ab, pmi) — the k highest-PMI pairs with
    c_ab ≥ min_count, ties broken lexicographically.
    """
    w = words(text_col)
    # guard docs under 2 words: Spark's sequence(1, 0) DESCENDS instead
    # of being empty, which would index element_at(w, 0) and throw
    pairs = F.when(
        F.size(w) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - 1),
            lambda i: F.struct(
                F.element_at(w, i).alias("a"), F.element_at(w, i + 1).alias("b")
            ),
        ),
    ).otherwise(F.array().cast("array<struct<a:string,b:string>>"))
    bg = (
        docs.select(F.explode(pairs).alias("p"))
        .select(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
        .filter((F.col("a") != "") & (F.col("b") != ""))
    )
    bg_counts = bg.groupBy("a", "b").agg(F.count("*").alias("c_ab"))
    uni = (
        docs.select(F.explode(w).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("c"))
    )
    n_bg = bg.count()  # exact scalar; bigram total is the PMI normalizer
    scored = (
        bg_counts.filter(F.col("c_ab") >= min_count)
        .join(F.broadcast(uni.select(F.col("w").alias("a"), F.col("c").alias("c_a"))), "a")
        .join(F.broadcast(uni.select(F.col("w").alias("b"), F.col("c").alias("c_b"))), "b")
        .select(
            "a",
            "b",
            "c_ab",
            F.round(
                F.log(
                    F.col("c_ab")
                    * F.lit(float(n_bg))
                    / (F.col("c_a").cast("double") * F.col("c_b"))
                ),
                6,
            ).alias("pmi"),
        )
    )
    return scored.orderBy(F.col("pmi").desc(), "a", "b").limit(k)
