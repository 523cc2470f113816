"""Per-kernel fan-out probe (§2.2 task right-sizing): time a heavy Arrow
kernel over the documents table at several forced partition counts and
print the per-target min-of-N wall, so bytes_per_task values are derived
from MEASURED kernel throughput, not guessed.

Usage: python tools/fanout_probe.py [--sf DIR] [--n 3] [--kernel shingle|winnow|grams]
Prints one JSON line {target: min_sec, ...} plus input size context.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeside_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    n = 3
    kernel = "shingle"
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--n":
            n = int(next(it))
        elif a == "--kernel":
            kernel = next(it)
    spark = get_spark("fanout-probe")
    spark.sparkContext.setLogLevel("ERROR")
    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, sf, "documents")
    # warm: JVM, file listing, Python workers
    docs.count()
    spark.range(64).repartition(32).mapInPandas(
        lambda b: (p for p in b), schema="id long"
    ).count()

    def build(target: int):
        src = docs.repartition(target)
        if kernel == "shingle":
            from lakeside_spark.operators.dedup import _shingled_rows

            # bypass _parallelize by repartitioning first (the gate sees
            # an already-parallel input and passes through)
            return _shingled_rows(src, "text", "doc_id", 3)
        if kernel == "winnow":
            from lakeside_spark.operators.winnow import winnow_fingerprints

            return winnow_fingerprints(src, 8, 4, "text", "doc_id")
        if kernel == "grams":
            from lakeside_spark.operators.decontam import _doc_grams

            return _doc_grams(src, 5, "text", "doc_id")
        raise SystemExit(f"unknown kernel {kernel}")

    out = {}
    for target in (1, 2, 4, 8, 16, 32):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            build(target).write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[str(target)] = round(best, 3)
        print(f"# {kernel} target={target}: {best:.3f}s", file=sys.stderr)
    files = docs.inputFiles()
    total = sum(
        os.path.getsize(f[len("file:"):] if f.startswith("file:") else f)
        for f in files
    )
    print(json.dumps({"kernel": kernel, "input_bytes": total, "wall": out}))


if __name__ == "__main__":
    main()
