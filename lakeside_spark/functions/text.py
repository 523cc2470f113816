"""Text expression helpers: normalization, tokenization, shingling.

All built-in Column expressions (codegen'd, no Python row path). The shingle
builder uses higher-order array functions so the explode→join dedup
pipelines stay JVM-side.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def normalized(text: Column | str) -> Column:
    """lower + trim + whitespace-collapse — the canonical doc key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_replace(F.lower(F.trim(c)), r"\s+", " ")


def words(text: Column | str) -> Column:
    return F.split(normalized(text), " ")


def shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    transform(sequence(0, size-n), i -> concat_ws(' ', slice(words, i+1, n)))
    — whole plan stays in codegen; docs shorter than n words get their full
    text as the single shingle.
    """
    w = words(text)
    ngrams = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(w) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(w, i + 1, n)),
    )
    return F.array_distinct(ngrams)


def md5_long(c: Column, salt: str = "") -> Column:
    """Deterministic 60-bit integer hash portable across engines:
    first 15 hex chars of md5 → bigint. DuckDB equivalent:
    CAST('0x' || substr(md5(salt || s), 1, 15) AS BIGINT)."""
    salted = F.concat(F.lit(salt), c) if salt else c
    return F.conv(F.substring(F.md5(salted), 1, 15), 16, 10).cast("bigint")
