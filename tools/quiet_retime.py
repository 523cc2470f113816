"""Standalone quiet-host per-key retime: min-of-N wall for named registry
keys at a given sf dir. Usage:
  python tools/quiet_retime.py key1 key2 ... [--sf DIR] [--n 2]
Prints one JSON line {key: min_sec, ...}."""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeside_spark.registry import QUERIES
from lakeside_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    n = 2
    keys = []
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--n":
            n = int(next(it))
        else:
            keys.append(a)
    spark = get_spark()
    # warm the session (JVM, parquet footers) with one cheap action
    spark.range(1).count()
    out = {}
    for k in keys:
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            QUERIES[k](spark, sf).count()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[k] = round(best, 3)
        print(f"## {k}: {out[k]}", file=sys.stderr, flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
