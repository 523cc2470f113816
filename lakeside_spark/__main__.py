"""CLI query runner: the local stand-in for the reference's /api/v1/graph
endpoint (query-api/routes/QueryApi.scala:187).

    python -m lakeside_spark --sf-dir /root/testdata/sf0.001 request.json
    echo '{"baseExpressions": {...}, "formulae": [...]}' | python -m lakeside_spark -

The request body is the same ASTInput JSON the reference accepts: a map of
labeled baseExpressions plus formula strings. A bare single-expression body
(with a top-level "filter") is also accepted, like POSTing one query.
Results stream to stdout as JSON lines tagged with their label — the batch
analog of the reference's per-label SSE events.
"""

from __future__ import annotations

import argparse
import json
import sys

from lakeside_spark.ast.model import ast_input_from_json, base_expr_from_json
from lakeside_spark.engine import QueryEngine
from lakeside_spark.schema import load_telemetry
from lakeside_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(
        prog="lakeside_spark", description="Run a graph-request JSON against the engine"
    )
    ap.add_argument(
        "request",
        nargs="?",
        help="path to request JSON, or '-' for stdin (omit with --list)",
    )
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001", help="table directory")
    ap.add_argument("--step-ms", type=int, default=3_600_000)
    ap.add_argument("--approx", action="store_true", help="sketch aggregations (100 TB path)")
    ap.add_argument("--limit", type=int, default=1000, help="max rows printed per label")
    ap.add_argument(
        "--list",
        action="store_true",
        help="list every registry query key (oracle-backed keys marked)",
    )
    args = ap.parse_args(argv)

    if args.list:
        from lakeside_spark.registry import ORACLES, QUERIES

        for name, fn in QUERIES.items():
            doc = (fn.__doc__ or "").strip().splitlines()
            summary = doc[0] if doc else ""
            mark = "oracle" if name in ORACLES else "rows-only"
            print(f"{name:28s} [{mark:9s}] {summary}")
        return 0
    if not args.request:
        ap.error("request is required unless --list is given")

    body = sys.stdin.read() if args.request == "-" else open(args.request).read()
    try:
        payload = json.loads(body)
    except json.JSONDecodeError as exc:
        print(f"error: request is not valid JSON: {exc}", file=sys.stderr)
        return 2

    spark = get_spark("lakeside-cli")
    spark.sparkContext.setLogLevel("ERROR")
    engine = QueryEngine(spark, step_ms=args.step_ms, approx=args.approx)
    tele = load_telemetry(spark, args.sf_dir)

    try:
        if "baseExpressions" in payload:
            exprs, formulae = ast_input_from_json(payload)
            results = engine.run_graph(exprs, formulae, tele)
        else:
            results = {payload.get("id", "q"): engine.run(base_expr_from_json(payload), tele)}
    except ValueError as exc:
        print(f"error: bad request: {exc}", file=sys.stderr)
        return 2

    for label, df in results.items():
        for row in df.limit(args.limit).collect():
            print(json.dumps({"label": label, **row.asDict()}, default=str))
    return 0


if __name__ == "__main__":
    sys.exit(main())
