"""Stage decomposition for ann_recall_report (VERDICT r13 #3): time the
two driver-side training collects, each index build serially, and the
full key — min-of-N through collect() (the key's own action). Usage:
  python tools/recall_profile.py [--sf DIR] [--n 2]
Prints one JSON line.
"""
from __future__ import annotations

import json
import os
import sys
import time
import uuid

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
    spark = get_spark("recall-profile")
    spark.sparkContext.setLogLevel("ERROR")
    from lakeside_spark.operators.similarity import (
        _CODEBOOK_CACHE,
        _train_mat_sample,
        _train_unit_sample,
        ann_ivf,
        ann_lsh,
        ann_pq,
        ann_sq8,
        cosine_topk,
    )
    from lakeside_spark.registry import QUERIES
    from lakeside_spark.sources.tables import load_table

    emb = load_table(spark, sf, "embeddings")
    emb.count()  # warm
    spark.range(64).repartition(32).mapInPandas(
        lambda b: (p for p in b), schema="id long"
    ).count()
    qs = emb.filter(F.col("vec_id") < 20)

    out: dict = {}

    def timed(label, fn):
        best = None
        for _ in range(n):
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        out[label] = round(best, 3)
        print(f"# {label}: {best:.3f}s", file=sys.stderr, flush=True)

    timed("train_mat_collect", lambda: _train_mat_sample(emb, "vec_id", "embedding", 10_000, None))
    timed("train_unit_collect", lambda: _train_unit_sample(emb, "embedding", 10_000, None))
    timed("exact_cosine", lambda: cosine_topk(emb, qs, k=5).collect())
    timed("lsh", lambda: ann_lsh(emb, qs, k=5).collect())

    def ivf_pair():
        ck = f"p-{uuid.uuid4()}"
        ann_ivf(emb, qs, k=5, cache_key=ck).collect()
        ann_ivf(emb, qs, k=5, n_assign=2, cache_key=ck).collect()
        for k in [k for k in _CODEBOOK_CACHE if ck in k]:
            _CODEBOOK_CACHE.pop(k, None)

    def pq_pair():
        ck = f"p-{uuid.uuid4()}"
        ann_pq(emb, qs, k=5, cache_key=ck).collect()
        ann_pq(emb, qs, k=5, rotation="opq", cache_key=ck).collect()
        for k in [k for k in _CODEBOOK_CACHE if ck in k]:
            _CODEBOOK_CACHE.pop(k, None)

    timed("ivf_plus_ivf_ma_serial", ivf_pair)
    timed("pq_plus_opq_serial", pq_pair)
    timed("sq8", lambda: ann_sq8(emb, qs, k=5).collect())
    timed("full_key", lambda: QUERIES["ann_recall_report"](spark, sf).collect())
    print(json.dumps(out))


if __name__ == "__main__":
    main()
