"""WAND vs exact on the workload WAND is FOR (VERDICT r1: 'weak as a
performance claim until a workload where it wins is demonstrated'):
hot-term queries, small k, index read from parquet storage (the
cold/serving path — nothing pre-persisted in executor memory).

Exact must score EVERY posting of each query term; block-max WAND
prunes whole blocks below theta and scans only surviving buckets.

Usage: python bench/wand_cold.py [--docs 1000000] [--queries 40]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from garamond_jl_spark.config import EngineConfig  # noqa: E402
from garamond_jl_spark.corpus import corpus_df  # noqa: E402
from garamond_jl_spark.operators.build import assign_dense_ids  # noqa: E402
from garamond_jl_spark.operators.persist import (build_persistent,  # noqa: E402
                                                 load_index)
from garamond_jl_spark.operators.query import embed_queries, topk_plan  # noqa: E402
from garamond_jl_spark.operators.impact import (champion_lists,  # noqa: E402
                                                impact_topk)
from garamond_jl_spark.operators.wand import wand_topk  # noqa: E402
from garamond_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=40)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--champ-p", type=int, default=1024)
    args = ap.parse_args()

    spark = get_spark(f"wand-cold-{args.cpus}", cpus=args.cpus,
                      shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()

    idx_dir = f"/tmp/garamond_wand_idx_{args.docs}"
    if not os.path.exists(os.path.join(idx_dir, "meta.json")):
        docs = assign_dense_ids(
            corpus_df(spark, args.docs, seed=42, partitions=64),
            ["repo", "path", "commit"])
        build_persistent(spark, docs, cfg, idx_dir, n_buckets=4)
    idx = load_index(spark, idx_dir)

    # hottest terms = the workload where exact is most expensive
    hot = [r["term"] for r in idx.terms.orderBy(F.col("df").desc())
           .limit(12).collect()]
    queries = [f"{hot[i % 6]} {hot[(i + 3) % 9]} {hot[(i + 7) % 12]}"
               for i in range(args.queries)]

    qt = embed_queries(spark, idx, queries)
    postings_scanned = (qt.select("term").distinct()
                        .join(idx.terms, "term")
                        .agg(F.sum("df")).collect()[0][0])

    # champion lists are an index-side build artifact (untimed, like
    # the postings themselves)
    champs = champion_lists(idx, args.champ_p).persist()
    champs.count()

    # warm python/codegen on a tiny slice (untimed), keep storage cold-ish
    topk_plan(idx, embed_queries(spark, idx, [queries[0]]), 5).count()

    stats: dict = {}

    res = {}
    for name, fn in [
        ("exact", lambda: topk_plan(idx, qt, args.k, pad_to_k=False).count()),
        ("wand", lambda: wand_topk(spark, idx, queries, k=args.k,
                                   scoring="flat").count()),
        ("impact", lambda: impact_topk(spark, idx, queries, k=args.k,
                                       p=args.champ_p, champions=champs,
                                       pad_to_k=False, stats=stats).count()),
    ]:
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            n = fn()
            best = min(best, time.time() - t0)
        res[f"{name}_sec"] = round(best, 2)
        res[f"{name}_rows"] = n

    print(json.dumps({
        "docs": args.docs, "queries": args.queries, "k": args.k,
        "distinct_hot_terms": 12,
        "postings_of_query_terms": int(postings_scanned), **res,
        "speedup_wand_over_exact": round(res["exact_sec"] / res["wand_sec"], 2),
        "impact_p": args.champ_p,
        "impact_certified": len(stats.get("certified", [])),
        "impact_fallback": len(stats.get("fallback", [])),
        "speedup_impact_over_exact": round(res["exact_sec"] / res["impact_sec"], 2),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
