"""Strict oracle-parity sweep — the driver's correctness gate, run locally.

For every key in ``__spark_entry__.oracle_sql()`` run the Spark callable AND
the DuckDB oracle at sf0.01, then compare md5(sorted CSV, round 6) AND pandas
dtypes (the driver's schema compare is strict; pytest's normalizer is laxer).

Usage:
    python tools/strict_sweep.py                 # all oracle keys
    python tools/strict_sweep.py tpch_q4 tpch_q5 # just these keys
    python tools/strict_sweep.py --top50         # only keys in driver slots 1-50
    python tools/strict_sweep.py --slots 51-100  # an arbitrary slot range (1-based)

Prints one line per key and a final summary; exits non-zero on any mismatch.
"""
from __future__ import annotations

import hashlib
import sys
import time

import duckdb

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def _hash(pdf) -> str:
    pdf = pdf[sorted(pdf.columns)].sort_values(sorted(pdf.columns)).reset_index(drop=True)
    return hashlib.md5(pdf.round(6).to_csv(index=False).encode()).hexdigest()[:12]


def main() -> int:
    sys.path.insert(0, ".")
    import __spark_entry__ as e
    from lakeside_spark.session import get_spark

    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = "/root/testdata/sf0.01"

    spark = get_spark("strict-sweep")
    spark.sparkContext.setLogLevel("ERROR")
    # Warm the Python-worker pool so the first mapInPandas key isn't timed cold.
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{sf}/{t}.parquet'")

    oracles = e.oracle_sql()
    queries = e.queries()
    if "--slots" in sys.argv:
        spec = sys.argv[sys.argv.index("--slots") + 1]
        lo, _, hi = spec.partition("-")
        lo_i, hi_i = int(lo), int(hi or lo)
        keys = [k for k in list(queries)[lo_i - 1 : hi_i] if k in oracles]
    elif "--top50" in sys.argv:
        keys = [k for k in list(queries)[:50] if k in oracles]
    elif args:
        keys = args
    else:
        keys = sorted(oracles)

    bad: list[str] = []
    for name in keys:
        t0 = time.time()
        try:
            sdf = queries[name](spark, sf).toPandas()
            odf = con.sql(oracles[name]).df()
            ok_hash = _hash(sdf) == _hash(odf)
            ok_dtype = dict(sdf.dtypes) == dict(odf.dtypes)
            ok_rows = len(sdf) == len(odf)
            status = "OK" if (ok_hash and ok_dtype and ok_rows) else (
                f"FAIL hash={ok_hash} dtype={ok_dtype} rows={len(sdf)}/{len(odf)}"
            )
        except Exception as exc:  # noqa: BLE001 - report and keep sweeping
            status = f"ERROR {type(exc).__name__}: {exc}"
        if status != "OK":
            bad.append(name)
        print(f"{name:28s} {status}  ({time.time() - t0:.1f}s)", flush=True)

    print(f"\n{len(keys) - len(bad)}/{len(keys)} green" + (f"; FAILED: {bad}" if bad else ""))
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
