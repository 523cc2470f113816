"""Stage decomposition for corpus_curate (r13): time the gate+gopher
checkpoint, the decontamination stage, the jaccard pair stage, and the
full key — min-of-N through the noop sink. Usage:
  python tools/curate_profile.py [--sf DIR] [--n 2]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from lakeside_spark.session import get_spark


def main() -> None:
    args = sys.argv[1:]
    sf = "/root/testdata/sf0.1"
    n = 2
    it = iter(args)
    for a in it:
        if a == "--sf":
            sf = next(it)
        elif a == "--n":
            n = int(next(it))
    spark = get_spark("curate-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from lakeside_spark.operators.decontam import decontaminate
    from lakeside_spark.operators.dedup import ngram_jaccard_pairs
    from lakeside_spark.operators.repetition import gopher_filter
    from lakeside_spark.operators.textstats import quality_expr
    from lakeside_spark.registry import QUERIES
    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, sf, "documents")
    docs.count()
    spark.range(64).repartition(32).mapInPandas(
        lambda b: (p for p in b), schema="id long"
    ).count()

    out: dict = {}
    noop = lambda df: df.write.format("noop").mode("overwrite").save()

    def timed(label, fn):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[label] = round(best, 3)
        print(f"# {label}: {best:.3f}s", file=sys.stderr, flush=True)

    pre = docs.filter(
        (F.col("n_chars") >= 200)
        & (F.col("n_chars") <= 20_000)
        & (F.col("doc_id") % 20 != 0)
        & (quality_expr("text") >= 0.5)
    )
    ev = docs.filter(F.col("doc_id") % 20 == 0)

    def gate_ckpt():
        return gopher_filter(
            pre, keep=("lang", "source", "n_chars", "text")
        ).localCheckpoint(eager=True)

    timed("gate_gopher_ckpt", lambda: gate_ckpt())
    gated = gate_ckpt()
    timed("decontam_from_ckpt", lambda: noop(decontaminate(gated, ev, n=5)))
    kept = decontaminate(gated, ev, n=5)
    timed("jaccard_pairs_from_kept", lambda: noop(ngram_jaccard_pairs(kept, threshold=0.12)))
    timed("full_key", lambda: noop(QUERIES["corpus_curate"](spark, sf)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
