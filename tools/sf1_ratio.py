"""Spark-vs-DuckDB ratio at 10x sf0.1 ("sf1") for the bench tripwire set.

The per-key vs-oracle tripwire at sf0.1 fires mostly on scheduling-floor
artifacts (sub-2s keys swing 2x with host load). At 10x data the floor
stops dominating and the ratio becomes signal. Uses the scale_probe
replica dir (build first: python tools/scale_probe.py 10 <any key>).

Usage: python tools/sf1_ratio.py [key ...]
"""
from __future__ import annotations

import os
import sys
import time

DIR = "/tmp/lakeside_probe_sf10x"
DEFAULT = [
    "event_attribution",
    "ann_lsh",
    "dedup_simhash",
    "vocab_pmi",
    "text_winnow_overlap",
]
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def main() -> int:
    sys.path.insert(0, ".")
    args = sys.argv[1:]
    # --n N: runs per engine per key (min is reported). The default 2 is
    # fine for steady-state keys; AQE-stage-reuse plans (attribution)
    # JIT-converge over ~4 runs — use --n 5 for their honest warm floor.
    n_runs = 2
    if "--n" in args:
        i = args.index("--n")
        n_runs = int(args[i + 1])
        del args[i : i + 2]
    keys = args or DEFAULT
    if not os.path.exists(DIR):
        print(f"build the replica dir first: python tools/scale_probe.py 10 ts_count")
        return 1

    import duckdb

    from lakeside_spark.registry import ORACLES, QUERIES
    from lakeside_spark.session import get_spark

    spark = get_spark("sf1-ratio")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(64).repartition(32).mapInPandas(
        lambda it: (p for p in it), schema="id long"
    ).count()
    con = duckdb.connect()
    for t in TABLES:
        p = f"{DIR}/{t}.parquet"
        if os.path.isdir(p):  # Spark writes a directory of part files
            con.sql(f"create view {t} as select * from '{p}/*.parquet'")
        elif os.path.exists(p):
            con.sql(f"create view {t} as select * from '{p}'")
    for k in keys:
        s_best = d_best = float("inf")
        for _ in range(n_runs):
            t0 = time.perf_counter()
            QUERIES[k](spark, DIR).count()
            s_best = min(s_best, time.perf_counter() - t0)
        for _ in range(n_runs):
            t0 = time.perf_counter()
            con.sql(ORACLES[k]).fetchall()
            d_best = min(d_best, time.perf_counter() - t0)
        print(
            f"{k:28s} spark {s_best:7.2f}s  duckdb {d_best:7.2f}s  "
            f"ratio {s_best / max(d_best, 1e-9):6.2f}x",
            flush=True,
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
