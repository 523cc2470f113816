"""lakeside_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of cardinalhq/lakeside.

The reference engine (Scala/Akka + DuckDB, see /root/reference) compiles a
JSON query AST to SQL pushed down to DuckDB over parquet segments. Here the
same AST compiles to a PySpark DataFrame plan so Catalyst/Tungsten handle
optimization, pushdown, and distribution.
"""

from lakeside_spark.ast.model import (
    BaseExpr,
    BinaryClause,
    ChartOptions,
    Compute,
    Extractor,
    Filter,
    NotClause,
    ast_input_from_json,
    base_expr_from_json,
)
from lakeside_spark.engine import QueryEngine
from lakeside_spark.operators.asof import asof_join
from lakeside_spark.operators.ddsketch import (
    ddsketch_buckets,
    ddsketch_merge,
    ddsketch_quantile,
    ddsketch_quantiles,
)
from lakeside_spark.operators.decontam import decontaminate, ngram_overlap, vocab_topk
from lakeside_spark.operators.fill import fill_steps
from lakeside_spark.operators.rangejoin import range_join
from lakeside_spark.operators.repetition import gopher_filter, repetition_signals
from lakeside_spark.operators.sessions import session_stats, sessionize
from lakeside_spark.operators.similarity import ann_pq, semdedup
from lakeside_spark.operators.tagcompress import compress_tag_stream
from lakeside_spark.session import get_spark

__all__ = [
    "BaseExpr",
    "BinaryClause",
    "ChartOptions",
    "Compute",
    "Extractor",
    "Filter",
    "NotClause",
    "QueryEngine",
    "ann_pq",
    "asof_join",
    "ast_input_from_json",
    "base_expr_from_json",
    "compress_tag_stream",
    "ddsketch_buckets",
    "ddsketch_merge",
    "ddsketch_quantile",
    "ddsketch_quantiles",
    "decontaminate",
    "fill_steps",
    "get_spark",
    "gopher_filter",
    "ngram_overlap",
    "range_join",
    "repetition_signals",
    "semdedup",
    "session_stats",
    "sessionize",
    "vocab_topk",
]

__version__ = "0.1.0"
