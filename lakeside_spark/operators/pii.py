"""PII redaction and C4-style heuristic filtering for corpus curation.

Two standard pre-training curation stages the reference lacks but any
large-scale text pipeline runs:

- ``pii_scrub``: regex redaction of emails, SSNs, IPv4 addresses, and
  phone numbers (the C4/CCNet-style scrub). Counts are taken on the
  *progressively scrubbed* text — each category counts only what the
  earlier categories did not already consume — so the numbers are
  deterministic and engine-independent (an SSN never double-counts as a
  phone number).
- ``c4_filter`` / ``c4_signals``: document-level heuristics after Raffel
  et al. 2020 (C4, §2.2) — word-count floor, max-word-length cap,
  sentence (terminal-punctuation) floor, distinct-word ratio,
  curly-brace and "lorem ipsum" drops.

Scale design: everything is a pure Column expression — codegen'd,
map-only, zero shuffles, filters evaluable at the scan. The regexes use
only syntax with identical semantics in Java regex (Spark) and RE2
(DuckDB oracle): no lookbehind, no \\s (Java includes \\x0B, RE2 does
not), ASCII word boundaries only.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeside_spark.functions.text import words

EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
SSN_RE = r"\b\d{3}-\d{2}-\d{4}\b"
IPV4_RE = r"\b(?:\d{1,3}\.)(?:\d{1,3}\.)(?:\d{1,3}\.)\d{1,3}\b"
# no '.' in the phone body class so IPv4 octets can't read as phone digits
PHONE_RE = r"\+?\d[\d() -]{7,}\d"

# (name, pattern, replacement) — scrub order matters and is part of the
# contract: email first (contains digits/dots), then SSN before the
# looser phone pattern can consume it, then IP, then phone.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
)


def pii_scrub(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """doc_id, n_email/n_ssn/n_ip/n_phone counts, scrubbed text.

    Each category is counted on the text as already scrubbed by the
    previous categories, then replaced — single pass, pure codegen."""
    cur: Column = F.col(text_col)
    counts = []
    for name, pat, repl in PII_PATTERNS:
        counts.append(F.regexp_count(cur, F.lit(pat)).cast("long").alias(f"n_{name}"))
        cur = F.regexp_replace(cur, pat, repl)
    return docs.select(
        F.col(id_col).alias("doc_id"), *counts, cur.alias("scrubbed")
    )


def c4_signals(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document C4 heuristic signals as typed columns."""
    w = words(text_col)
    n_words = F.size(w)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.cast("long").alias("n_words"),
        F.regexp_count(F.col(text_col), F.lit(r"[.!?]")).cast("long").alias(
            "n_sentences"
        ),
        F.coalesce(
            F.array_max(F.transform(w, lambda x: F.length(x))), F.lit(0)
        ).cast("long").alias("max_word_len"),
        F.round(
            F.size(F.array_distinct(w))
            / F.greatest(n_words, F.lit(1)).cast("double"),
            6,
        ).alias("distinct_ratio"),
        F.col(text_col).contains("{").cast("boolean").alias("has_brace"),
        F.lower(F.col(text_col)).contains("lorem ipsum").alias("has_lorem"),
    )


def c4_filter(
    docs: DataFrame,
    min_words: int = 15,
    max_word_len: int = 25,
    min_sentences: int = 0,
    min_distinct_ratio: float = 0.4,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4 rule filter over ``c4_signals`` (drop braces / lorem ipsum /
    short / shouty / low-diversity docs). ``min_sentences=3`` is the
    faithful C4 setting; the default 0 keeps the rule available without
    assuming the corpus has terminal punctuation."""
    sig = c4_signals(docs, text_col, id_col)
    return sig.filter(
        (F.col("n_words") >= min_words)
        & (F.col("max_word_len") <= max_word_len)
        & (F.col("n_sentences") >= min_sentences)
        & (F.col("distinct_ratio") >= min_distinct_ratio)
        & ~F.col("has_brace")
        & ~F.col("has_lorem")
    )
