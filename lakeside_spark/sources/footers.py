"""Driver-side parquet footer access shared by the metadata gates.

Two gates read footers instead of running Spark jobs: the
under-parallel repartition gate (operators/similarity.
_effective_input_parallelism caps achievable scan parallelism by row-
group count) and BM25's strategy gate (operators/bm25._metadata_count
answers "how many rows" for a bare file scan with zero jobs). Both
encode the same policy — LOCAL plain-parquet files only, anything else
falls back to the caller's Spark-side path — so the policy lives here
once.
"""

from __future__ import annotations

from urllib.parse import unquote, urlparse


def local_parquet_meta(uri: str):
    """Parquet footer metadata for one LOCAL ``.parquet`` file URI, or
    None when the URI is remote / not parquet (the caller falls back to
    its Spark-side path). Percent-encoded paths (spaces etc.) are
    unquoted before the filesystem read."""
    import pyarrow.parquet as pq

    parsed = urlparse(uri)
    if parsed.scheme not in ("file", "") or not uri.endswith(".parquet"):
        return None
    return pq.read_metadata(unquote(parsed.path) if parsed.path else uri)
