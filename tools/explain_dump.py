"""Dump .explain("formatted") for registry keys to plans/<outdir>/<key>_<tag>.txt.

Usage:
    python tools/explain_dump.py --tag before --out plans/r12 key1 key2 ...
    python tools/explain_dump.py --tag before --out plans/r12 --all

Plan construction only (no jobs run for lazy keys; keys that do eager
driver-side work at build time pay that work once here).
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeside_spark.registry import QUERIES
from lakeside_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    tag, out, keys, run_all = "before", "plans/r12", [], False
    it = iter(args)
    for a in it:
        if a == "--tag":
            tag = next(it)
        elif a == "--out":
            out = next(it)
        elif a == "--sf":
            global SF
            SF = next(it)
        elif a == "--all":
            run_all = True
        else:
            keys.append(a)
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    if run_all:
        keys = sorted(QUERIES)
    os.makedirs(out, exist_ok=True)
    spark = get_spark("explain-dump")
    spark.sparkContext.setLogLevel("ERROR")
    for k in keys:
        try:
            df = QUERIES[k](spark, sf)
            txt = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # a broken key must not kill the dump
            txt = f"ERROR building plan: {exc}"
        path = os.path.join(out, f"{k}_{tag}.txt")
        with open(path, "w") as fh:
            fh.write(txt)
        print(f"wrote {path} ({len(txt)} chars)", file=sys.stderr)


if __name__ == "__main__":
    main()
