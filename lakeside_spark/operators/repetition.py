"""Gopher-style repetition signals for pre-training corpus curation.

Rae et al. 2021 ("Scaling Language Models: ... Gopher", §A1.1) filter
documents whose character mass concentrates in a few repeated n-grams.
This module computes, per document:

- ``top{n}_chars``  — char mass (count × gram length) of the single most
  character-covering word n-gram (n = ``top_n``, default 2);
- ``dup{m}_chars``  — total char mass of word m-grams occurring more than
  once (m = ``dup_n``, default 5);
- the corresponding fractions of the document's total n-gram char mass.

Scale design: everything is computed *inside the row* — the gram array is
sorted (``array_sort``) and run-length scanned with one ``F.aggregate``
fold, so the operator is embarrassingly parallel with ZERO shuffles and
full column pruning; cost is O(L log L) per doc in the JVM, never a
groupBy over exploded grams (which would shuffle ~L rows per document —
at 100 TB that is the difference between a map-only pass and a corpus-
sized exchange). Cross-engine determinism: integer char-mass numerators,
one final double division, round 6.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import normalized


def _word_ngrams(w: Column, n: int) -> Column:
    """Word n-grams as array<string>; empty array for docs shorter than n."""
    if n == 1:
        return w
    return F.when(
        F.size(w) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(w) - (n - 1)),
            lambda i: F.concat_ws(" ", F.slice(w, i, n)),
        ),
    ).otherwise(F.array().cast("array<string>"))


def _run_stats(grams: Column) -> Column:
    """One in-row pass over sorted grams -> struct(top_chars, dup_chars, tot_chars).

    top_chars = max over distinct grams of count*length; dup_chars = char
    mass of grams with count > 1; tot_chars = total gram char mass. A
    run-length scan of the sorted array in a single ``aggregate`` fold.
    """
    s = F.array_sort(grams)
    zero = F.lit(0).cast("long")

    init = F.struct(
        F.lit("").alias("prev"),
        zero.alias("run"),
        zero.alias("top"),
        zero.alias("dup"),
        zero.alias("tot"),
    )

    def flush_top(acc: Column) -> Column:
        return F.greatest(acc.top, acc.run * F.length(acc.prev).cast("long"))

    def flush_dup(acc: Column) -> Column:
        mass = acc.run * F.length(acc.prev).cast("long")
        return acc.dup + F.when(acc.run > 1, mass).otherwise(zero)

    def step(acc: Column, g: Column) -> Column:
        cont = F.struct(
            acc.prev.alias("prev"),
            (acc.run + 1).alias("run"),
            acc.top.alias("top"),
            acc.dup.alias("dup"),
            (acc.tot + F.length(g).cast("long")).alias("tot"),
        )
        start = F.struct(
            g.alias("prev"),
            F.lit(1).cast("long").alias("run"),
            flush_top(acc).alias("top"),
            flush_dup(acc).alias("dup"),
            (acc.tot + F.length(g).cast("long")).alias("tot"),
        )
        return F.when(acc.prev == g, cont).otherwise(start)

    def finish(acc: Column) -> Column:
        return F.struct(
            flush_top(acc).alias("top_chars"),
            flush_dup(acc).alias("dup_chars"),
            acc.tot.alias("tot_chars"),
        )

    return F.aggregate(s, init, step, finish)


def _signal_cols(text_col: str, top_n: int, dup_n: int) -> dict[str, Column]:
    """The shared per-row expressions; every consumer inlines these so the
    operator family stays a single map-only projection (no self-join)."""
    w = F.filter(F.split(normalized(text_col), " "), lambda x: x != F.lit(""))
    t = _run_stats(_word_ngrams(w, top_n))
    d = _run_stats(_word_ngrams(w, dup_n))
    one = F.lit(1).cast("long")
    return {
        "n_words": F.size(w).cast("long"),
        "norm_chars": F.length(normalized(text_col)).cast("long"),
        "top_chars": t.top_chars,
        "dup_chars": d.dup_chars,
        "top_frac": F.round(t.top_chars / F.greatest(t.tot_chars, one), 6),
        "dup_frac": F.round(d.dup_chars / F.greatest(d.tot_chars, one), 6),
    }


def repetition_signals(
    docs: DataFrame,
    top_n: int = 2,
    dup_n: int = 5,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    c = _signal_cols(text_col, top_n, dup_n)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        c["n_words"].alias("n_words"),
        c["top_chars"].alias(f"top{top_n}_chars"),
        c["dup_chars"].alias(f"dup{dup_n}_chars"),
        c["top_frac"].alias(f"top{top_n}_frac"),
        c["dup_frac"].alias(f"dup{dup_n}_frac"),
    )


def gopher_filter(
    docs: DataFrame,
    min_words: int = 20,
    max_words: int = 90,
    min_mean_word_len: float = 3.0,
    max_mean_word_len: float = 12.0,
    max_top2_frac: float = 0.20,
    max_dup5_frac: float = 0.15,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher rule filter: word-count band, mean-word-length band, and the
    repetition caps, evaluated in one map-only projection+filter (zero
    shuffles, full pushdown of the untouched columns)."""
    c = _signal_cols(text_col, 2, 5)
    # mean word length over the normalized text: (chars - separators) / words
    mean_wl = (c["norm_chars"] - (c["n_words"] - 1)) / F.greatest(
        c["n_words"], F.lit(1).cast("long")
    )
    out = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col("lang"),
        F.col("source"),
        c["n_words"].alias("n_words"),
        F.round(mean_wl, 6).alias("mean_word_len"),
        c["top_frac"].alias("top2_frac"),
        c["dup_frac"].alias("dup5_frac"),
    )
    return out.filter(
        (F.col("n_words") >= min_words)
        & (F.col("n_words") <= max_words)
        & (F.col("mean_word_len") >= min_mean_word_len)
        & (F.col("mean_word_len") <= max_mean_word_len)
        & (F.col("top2_frac") <= max_top2_frac)
        & (F.col("dup5_frac") <= max_dup5_frac)
    )
