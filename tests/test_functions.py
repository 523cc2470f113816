"""Unit tests for the parser/utility layer (reference test parity:
QuantityParserTest, StringsTest, FormulaListenerTest)."""

from datetime import datetime, timezone

import pytest
from hypothesis import given
from hypothesis import strategies as st

from lakeside_spark.ast.formula import Const, Node, Var, parse_formula
from lakeside_spark.ast.model import base_expr_from_json
from lakeside_spark.functions.quantity import parse_quantity
from lakeside_spark.functions.timerange import time_range


class TestQuantityParser:
    def test_durations(self):
        assert parse_quantity("1s", "duration") == 1e9
        assert parse_quantity("1.5ms", "duration") == 1.5e6
        assert parse_quantity("2m", "duration") == 2 * 60e9
        assert parse_quantity("3h", "duration") == 3 * 3600e9
        assert parse_quantity("1d", "duration") == 24 * 3600e9
        assert parse_quantity("100ns", "duration") == 100
        assert parse_quantity("5µs", "duration") == 5000

    def test_datasizes(self):
        assert parse_quantity("1kb", "datasize") == 1000
        assert parse_quantity("2mb", "datasize") == 2e6
        assert parse_quantity("1gb", "datasize") == 1e9
        # reference's idiosyncratic binary factors preserved exactly
        assert parse_quantity("1kib", "datasize") == 128
        assert parse_quantity("1mib", "datasize") == 131072

    def test_invalid(self):
        assert parse_quantity("xyz", "duration") is None
        assert parse_quantity("1zz", "duration") is None

    @given(st.floats(min_value=0.001, max_value=1e6), st.sampled_from(["s", "ms", "h"]))
    def test_roundtrip_scaling(self, num, unit):
        factor = {"s": 1e9, "ms": 1e6, "h": 3600e9}[unit]
        got = parse_quantity(f"{num}{unit}", "duration")
        assert got == pytest.approx(float(f"{num}") * factor)


class TestTimeRange:
    NOW = datetime(2026, 8, 13, 12, 0, 0, tzinfo=timezone.utc)

    def test_default_last_hour(self):
        start, end = time_range("e-1h", "now", now=self.NOW)
        assert end - start == 3_600_000

    def test_absolute_unix(self):
        start, end = time_range("1700000000", "1700003600", now=self.NOW)
        assert (start, end) == (1_700_000_000_000, 1_700_003_600_000)

    def test_relative_to_start(self):
        start, end = time_range("1700000000", "s+30m", now=self.NOW)
        assert end - start == 1_800_000

    def test_iso(self):
        start, end = time_range("2026-01-01T00:00:00Z", "2026-01-02T00:00:00Z", now=self.NOW)
        assert end - start == 86_400_000

    def test_both_relative_rejected(self):
        with pytest.raises(ValueError):
            time_range("e-1h", "s+1h", now=self.NOW)

    def test_end_before_start_rejected(self):
        with pytest.raises(ValueError):
            time_range("1700003600", "1700000000", now=self.NOW)


class TestFormulaParser:
    def test_precedence(self):
        ast = parse_formula("a + b * c")
        assert isinstance(ast, Node) and ast.op == "add"
        assert isinstance(ast.e2, Node) and ast.e2.op == "mul"

    def test_parens(self):
        ast = parse_formula("(a + b) * 100")
        assert ast.op == "mul"
        assert isinstance(ast.e1, Node) and ast.e1.op == "add"
        assert ast.e2 == Const(100.0)

    def test_div_ratio(self):
        ast = parse_formula("(a / b) * 100")
        assert ast.op == "mul" and ast.e1.op == "div"
        assert ast.e1.e1 == Var("a") and ast.e1.e2 == Var("b")

    def test_unary_minus(self):
        ast = parse_formula("-a + b")
        assert ast.op == "add" and ast.e1.op == "mul" and ast.e1.e1 == Const(-1.0)

    def test_unbalanced_rejected(self):
        with pytest.raises(ValueError):
            parse_formula("(a + b")

    def test_garbage_rejected(self):
        with pytest.raises(ValueError):
            parse_formula("a ++")


class TestASTJson:
    def test_nested_filter_json(self):
        payload = {
            "dataset": "logs",
            "filter": {
                "op": "and",
                "q1": {"k": "name", "v": ["error"], "op": "eq"},
                "q2": {"not": {"k": "user_id", "v": ["5"], "op": "eq"}},
            },
            "chart": {"aggregation": "count", "groupBys": ["user_id"]},
            "limit": 50,
        }
        expr = base_expr_from_json(payload)
        assert expr.dataset == "logs"
        assert expr.chart.group_bys == ("user_id",)
        assert expr.limit == 50

    def test_extract_compute_json(self):
        payload = {
            "dataset": "logs",
            "filter": {"k": "k_num", "op": "exists", "extracted": True},
            "extract": {
                "regex": '"k": ([0-9]+)',
                "fields": [{"name": "k_num", "type": "number"}],
            },
            "compute": {
                "labelName": "score",
                "functionCall": {
                    "name": "mul",
                    "arguments": [
                        {"type": "label", "name": "k_num", "dataType": "number"},
                        {"type": "literal", "value": 2},
                    ],
                },
            },
        }
        expr = base_expr_from_json(payload)
        assert expr.extractor.fields[0].name == "k_num"
        assert expr.compute.function_call.name == "mul"

    def test_missing_filter_rejected(self):
        with pytest.raises(ValueError):
            base_expr_from_json({"dataset": "logs"})

    def test_unknown_function_rejected(self):
        with pytest.raises(ValueError):
            base_expr_from_json(
                {
                    "filter": {"k": "a", "op": "exists"},
                    "compute": {
                        "labelName": "x",
                        "functionCall": {"name": "nope", "arguments": []},
                    },
                }
            )


class TestClustering:
    def test_small_passthrough(self):
        from lakeside_spark.operators.clustering import cluster_names

        names = ["a.count", "a.max"]
        assert cluster_names(names) == [names]

    def test_clusters_cover_all(self):
        from lakeside_spark.operators.clustering import cluster_names

        names = [f"ingestion.metric_{i}.{suffix}" for i in range(4) for suffix in ("count", "max", "avg")]
        clusters = cluster_names(names, max_cluster_size=50)
        flat = sorted(n for c in clusters for n in c)
        assert flat == sorted(names)

    def test_jaccard(self):
        from lakeside_spark.operators.clustering import jaccard_similarity

        assert jaccard_similarity("abc", "abc") == 1.0
        assert jaccard_similarity("abc", "xyz") == 0.0


def test_function_specs_catalog():
    """/api/v1/functionSpecs parity: same six functions, same arities."""
    from lakeside_spark.ast.compute import FUNCTION_SPECS, function_specs

    specs = function_specs()
    assert set(specs) == {"mul", "div", "add", "sub", "concat", "strpos"}
    assert specs["div"]["num_arguments"] == 2
    assert specs["mul"]["num_arguments"] is None  # variadic
    assert specs["concat"]["return_type"] == "string"
    specs["mul"]["return_type"] = "mutated"
    assert FUNCTION_SPECS["mul"]["return_type"] != "mutated"  # copies out
