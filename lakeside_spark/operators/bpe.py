"""Byte-pair-encoding tokenizer: corpus-trained merges + distributed encode.

The real version of the token-counting story (textstats.token_counts is
the regex approximation): `bpe_train` learns merge rules from the
corpus's word-frequency table (Sennrich et al. 2016 — the algorithm GPT/
LLaMA-family tokenizers build on), `bpe_encode` applies them per
document in an Arrow kernel.

Scale shape: training consumes the VOCABULARY (one map-side-combined
aggregation; vocabulary-sized collect, same bounded-driver-work pattern
as the PQ/IVF quantizer training — never the corpus), and encoding is
map-only with the merge table broadcast. Word→tokens results are
memoised per batch, so a doc of repeated words pays one merge walk.

Determinism: ties in pair frequency break lexicographically, so the
merge list is a pure function of the corpus.
"""

from __future__ import annotations

from collections import Counter
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import words

END = "</w>"


def _word_freqs(docs: DataFrame, text_col: str) -> list[tuple[str, int]]:
    """(word, count) — ONE aggregation; result is vocabulary-sized."""
    rows = (
        docs.select(F.explode(words(text_col)).alias("w"))
        .filter(F.col("w") != "")
        .groupBy("w")
        .agg(F.count("*").alias("cnt"))
        .collect()
    )
    return [(r["w"], r["cnt"]) for r in rows]


def bpe_train(
    docs: DataFrame,
    num_merges: int = 200,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> list[tuple[str, str]]:
    """Learn up to ``num_merges`` merge rules from the corpus vocabulary."""
    freqs = _word_freqs(docs, text_col)
    # each vocab word as a symbol tuple: chars + end-of-word marker
    symbolized: dict[tuple[str, ...], int] = {}
    for w, cnt in freqs:
        key = tuple(w) + (END,)
        symbolized[key] = symbolized.get(key, 0) + cnt
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        pairs: Counter[tuple[str, str]] = Counter()
        for sym, cnt in symbolized.items():
            for a, b in zip(sym, sym[1:]):
                pairs[(a, b)] += cnt
        if not pairs:
            break
        # deterministic argmax: highest count, then lexicographic pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        joined = best[0] + best[1]
        new_sym: dict[tuple[str, ...], int] = {}
        for sym, cnt in symbolized.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            key = tuple(out)
            new_sym[key] = new_sym.get(key, 0) + cnt
        symbolized = new_sym
    return merges


def _encode_word(word: str, ranks: dict[tuple[str, str], int]) -> list[str]:
    sym = list(word) + [END]
    while len(sym) > 1:
        ranked = [
            (ranks[(a, b)], i)
            for i, (a, b) in enumerate(zip(sym, sym[1:]))
            if (a, b) in ranks
        ]
        if not ranked:
            break
        _, i = min(ranked)
        sym[i : i + 2] = [sym[i] + sym[i + 1]]
    return sym


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(doc_id, n_words, n_tokens, tokens) via a map-only Arrow kernel
    with the merge table broadcast and per-batch word memoisation."""
    spark = docs.sparkSession
    bc = spark.sparkContext.broadcast(list(merges))
    schema = (
        f"{id_col} bigint, n_words bigint, n_tokens bigint, "
        "tokens array<string>"
    )

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        from lakeside_spark.operators.repetition import _normalize_py

        ranks = {tuple(p): i for i, p in enumerate(bc.value)}
        cache: dict[str, list[str]] = {}
        for pdf in batches:
            n_words, n_tokens, toks = [], [], []
            for text in pdf[text_col]:
                ws = [w for w in _normalize_py(text).split(" ") if w]
                doc_tokens: list[str] = []
                for w in ws:
                    enc = cache.get(w)
                    if enc is None:
                        enc = _encode_word(w, ranks)
                        cache[w] = enc
                    doc_tokens.extend(enc)
                n_words.append(len(ws))
                n_tokens.append(len(doc_tokens))
                toks.append(doc_tokens)
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col].astype("int64"),
                    "n_words": pd.Series(n_words, dtype="int64"),
                    "n_tokens": pd.Series(n_tokens, dtype="int64"),
                    "tokens": toks,
                }
            )

    return docs.select(id_col, text_col).mapInPandas(kernel, schema)
