"""End-to-end: reference-shaped JSON request → AST → engine → DataFrame.

Mirrors the reference's query-api flow (ASTUtils.toBaseExpr on the request
payload, then SQL generation — here, plan compilation)."""

import json

from lakeside_spark import schema as S
from lakeside_spark.ast.model import base_expr_from_json
from lakeside_spark.engine import QueryEngine
from lakeside_spark.schema import load_telemetry

REQUEST = {
    "id": "a",
    "dataset": "logs",
    "filter": {
        "op": "and",
        "q1": {"k": "name", "v": ["error", "purchase"], "op": "in"},
        "q2": {"k": "value", "v": ["10"], "op": "gt", "dataType": "number"},
    },
    "chart": {"aggregation": "avg", "groupBys": ["user_id"], "type": "count"},
}


def test_json_request_end_to_end(spark, sf_dir):
    expr = base_expr_from_json(json.dumps(REQUEST))
    tele = load_telemetry(spark, sf_dir)
    out = QueryEngine(spark, step_ms=86_400_000).run(expr, tele)
    rows = out.collect()
    assert rows
    assert set(out.columns) == {S.STEP_TS, S.NAME, "user_id", S.VALUE}
    assert all(r[S.NAME] in ("error", "purchase") for r in rows)


def test_json_exemplar_request(spark, sf_dir):
    req = {
        "dataset": "logs",
        "filter": {"k": "message", "v": ['"k": 9'], "op": "contains"},
        "limit": 25,
        "order": "ASC",
    }
    expr = base_expr_from_json(json.dumps(req))
    out = QueryEngine(spark).run(expr, load_telemetry(spark, sf_dir))
    rows = out.collect()
    assert 0 < len(rows) <= 25
    ts = [r[S.TIMESTAMP] for r in rows]
    assert ts == sorted(ts)


def test_cli_runner_graph_request(tmp_path, sf_dir):
    """python -m lakeside_spark: the /api/v1/graph stand-in end-to-end."""
    import json as _json
    import subprocess
    import sys

    req = {
        "baseExpressions": {
            "a": {"filter": {"k": "name", "v": ["error"], "op": "eq"},
                  "chart": {"aggregation": "count"}},
        },
        "formulae": [],
    }
    p = tmp_path / "req.json"
    p.write_text(_json.dumps(req))
    out = subprocess.run(
        [sys.executable, "-m", "lakeside_spark", str(p), "--sf-dir", sf_dir,
         "--step-ms", "86400000"],
        capture_output=True, text=True, timeout=300,
    )
    assert out.returncode == 0, out.stderr[-800:]
    rows = [_json.loads(l) for l in out.stdout.splitlines() if l.strip()]
    assert rows and all(r["label"] == "a" and r["name"] == "error" for r in rows)


def test_cli_runner_rejects_bad_request(tmp_path, sf_dir):
    import subprocess
    import sys

    p = tmp_path / "bad.json"
    p.write_text("{not json")
    out = subprocess.run(
        [sys.executable, "-m", "lakeside_spark", str(p), "--sf-dir", sf_dir],
        capture_output=True, text=True, timeout=120,
    )
    assert out.returncode == 2 and "not valid JSON" in out.stderr


def test_json_traces_exemplar_request(spark, sf_dir):
    """dataset=traces dispatch through the JSON surface: raw-span output
    must lead with the SPANS projection (timestamp, value, span.name,
    span.kind — reference BaseExpr.scala:44-45, dispatched at :210-214)."""
    from lakeside_spark.schema import load_traces

    req = {
        "dataset": "traces",
        "filter": {"k": "span_name", "op": "exists"},
        "limit": 25,
        "order": "DESC",
    }
    expr = base_expr_from_json(json.dumps(req))
    out = QueryEngine(spark).run(expr, load_traces(spark, sf_dir))
    rows = out.collect()
    assert 0 < len(rows) <= 25
    assert out.columns[:4] == [S.TIMESTAMP, S.VALUE, S.SPAN_NAME, S.SPAN_KIND]
    ts = [r[S.TIMESTAMP] for r in rows]
    assert ts == sorted(ts, reverse=True)
