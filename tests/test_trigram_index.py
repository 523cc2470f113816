"""Trigram segment index: soundness (never skips a matching segment),
effectiveness (selective predicates actually skip files), and the
regex→required-literal compiler (reference NLPUtils.scala:90-131)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from lakeside_spark import schema as S
from lakeside_spark.ast.filters import filter_to_column
from lakeside_spark.ast.model import BinaryClause, Filter, NotClause
from lakeside_spark.schema import load_telemetry
from lakeside_spark.sources.segments import write_segments
from lakeside_spark.sources.trigram_index import (
    build_trigram_index,
    clause_to_trigram_query,
    prune_segments,
    read_segments_indexed,
    required_literals,
)

IDX = dict(indexed_dims=("message",), full_value_dims=("name",))


@pytest.fixture(scope="module")
def indexed_lake(spark, sf_dir):
    path = tempfile.mkdtemp(prefix="triglake_")
    write_segments(load_telemetry(spark, sf_dir), path, dataset="logs")
    build_trigram_index(spark, path, **IDX)
    full = spark.read.option("mergeSchema", "true").parquet(path)
    yield path, full
    shutil.rmtree(path, ignore_errors=True)


CLAUSES = {
    "contains": Filter(k="message", v=('"k": 87',), op=S.CONTAINS),
    "eq_full_value": Filter(k="name", v=("signup",), op=S.EQ),
    "regex": Filter(k="message", v=('"k": 9[0-9]',), op=S.REGEX),
    "and": BinaryClause(
        Filter(k="message", v=('"k": 87',), op=S.CONTAINS),
        Filter(k="name", v=("error",), op=S.EQ),
        "and",
    ),
    "or": BinaryClause(
        Filter(k="message", v=('"k": 87',), op=S.CONTAINS),
        Filter(k="message", v=('"k": 88',), op=S.CONTAINS),
        "or",
    ),
    "in": Filter(k="name", v=("signup", "error"), op=S.IN),
    "not": NotClause(Filter(k="name", v=("error",), op=S.EQ)),
    "has": Filter(k="user_id", op=S.HAS),
    "missing_column": Filter(k="no_such_col", v=("x",), op=S.EQ),
}


@pytest.mark.parametrize("label", sorted(CLAUSES))
def test_pruned_read_matches_full_scan(spark, indexed_lake, label):
    path, full = indexed_lake
    clause = CLAUSES[label]
    got = read_segments_indexed(spark, path, clause, **IDX)
    exp = full.filter(filter_to_column(clause, set(full.columns)))
    assert got.count() == exp.count()


def test_selective_predicates_skip_files(spark, indexed_lake):
    path, _ = indexed_lake
    files, total = prune_segments(
        spark, path, CLAUSES["contains"], **IDX
    )
    assert total > 50
    assert len(files) < total / 4  # a needle literal must skip most files


def test_missing_column_prunes_everything(spark, indexed_lake):
    path, _ = indexed_lake
    files, _ = prune_segments(spark, path, CLAUSES["missing_column"], **IDX)
    assert files == []


def test_not_clause_is_sound_match_all(spark, indexed_lake):
    path, _ = indexed_lake
    files, total = prune_segments(spark, path, CLAUSES["not"], **IDX)
    assert len(files) == total


def test_required_literals():
    assert required_literals("error.*timeout") == ["error", "timeout"]
    assert required_literals("abc(def)+x") == ["abc", "def"]
    assert required_literals("ab") is None  # too short for a trigram
    assert required_literals(".*") is None
    assert required_literals("[a-z]+") is None
    # optional groups guarantee nothing
    assert required_literals("abc(def)?") == ["abc"]


def test_branch_regex_compiles_to_or():
    tq = clause_to_trigram_query(
        Filter(k="message", v=("(foobar|bazqux)",), op=S.REGEX),
        indexed_dims=("message",),
    )
    assert tq.op == "or"
    assert len(tq.sub) == 2
    # one unconstrained branch must degrade the whole pattern to exists
    tq2 = clause_to_trigram_query(
        Filter(k="message", v=("(foobar|.*)",), op=S.REGEX),
        indexed_dims=("message",),
    )
    assert tq2.fps == frozenset({"message:.*"})
