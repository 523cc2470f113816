"""Stage decomposition for dedup_incremental (VERDICT r12 #4): time each
stage of minhash_lsh_match separately — shingle kernels (per side),
signature+banding+candidate join, verify chain, full key — min-of-N
through the noop sink. Usage:
  python tools/incremental_profile.py [--sf DIR] [--n 2]
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
    spark = get_spark("incremental-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from lakeside_spark.operators.dedup import (
        _band_keys,
        _shingled_rows,
        minhash_lsh_match,
        minhash_signatures,
    )
    from lakeside_spark.sources.tables import load_table

    docs = load_table(spark, sf, "documents")
    docs.count()  # warm
    spark.range(64).repartition(32).mapInPandas(
        lambda b: (p for p in b), schema="id long"
    ).count()
    incoming = docs.filter(F.col("doc_id") % 5 == 0)
    index = docs.filter(F.col("doc_id") % 5 != 0)

    def timed(label, fn):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[label] = round(best, 3)
        print(f"# {label}: {best:.3f}s", file=sys.stderr)

    out: dict = {}
    noop = lambda df: df.write.format("noop").mode("overwrite").save()
    timed("shingle_in", lambda: noop(_shingled_rows(incoming, "text", "doc_id", 3)))
    timed("shingle_ix", lambda: noop(_shingled_rows(index, "text", "doc_id", 3)))
    timed("shingle_all_one_pass", lambda: noop(_shingled_rows(docs, "text", "doc_id", 3)))

    def cand_stage():
        ex_in = _shingled_rows(incoming, "text", "doc_id", 3).persist()
        ex_ix = _shingled_rows(index, "text", "doc_id", 3).persist()

        def banded(d, ex):
            sig = minhash_signatures(d, 16, 3, "text", "doc_id", shingle_rows=ex)
            return sig.select(
                "doc_id", F.explode(_band_keys(F.col("sig"), 4, 4)).alias("band")
            )

        cand = (
            banded(incoming, ex_in).alias("a")
            .join(banded(index, ex_ix).alias("b"), F.col("a.band") == F.col("b.band"))
            .select(F.col("a.doc_id").alias("in_id"), F.col("b.doc_id").alias("ix_id"))
            .distinct()
        )
        noop(cand)
        ex_in.unpersist()
        ex_ix.unpersist()

    timed("shingles_sigs_bands_cand", cand_stage)
    timed("full_key", lambda: noop(minhash_lsh_match(index, incoming, threshold=0.12)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
