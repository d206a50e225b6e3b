"""A/B: classic two-shuffle weighting vs weighted_postings_local.

Interleaved min-of-N inside ONE JVM so host noise hits both arms
equally (this box shows 2-3x external load spikes — BENCH.md noise
note).  Usage:

    python bench/norms_ab.py --cpus 32 --docs 1000000 [--repeat 3]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garamond_jl_spark.config import EngineConfig  # noqa: E402
from garamond_jl_spark.corpus import corpus_df  # noqa: E402
from garamond_jl_spark.operators.build import (term_stats,  # noqa: E402
                                               tokenize_to_postings,
                                               weighted_postings)
from garamond_jl_spark.session import get_spark  # noqa: E402

from pyspark.sql import functions as F  # noqa: E402
from pyspark.storagelevel import StorageLevel  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=3)
    ap.add_argument("--arms", default="",
                    help="comma list of arms to run (default: all) — "
                         "e.g. 'window,arrow' for the >8M-doc duel "
                         "where norms='broadcast' is out of budget")
    args = ap.parse_args()

    spark = get_spark(f"norms-ab-{args.cpus}", cpus=args.cpus,
                      shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()

    corpus_dir = f"/tmp/garamond_profile_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        from garamond_jl_spark.operators.build import assign_dense_ids
        assign_dense_ids(corpus_df(spark, args.docs, seed=42,
                                   partitions=args.partitions),
                         ["repo", "path", "commit"]) \
            .write.mode("overwrite").parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)
    n_docs = docs.count()

    tokenize_to_postings(docs.sample(0.02, seed=1), cfg, "doc_id",
                         "content").count()  # warm worker pool

    raw_p = tokenize_to_postings(docs, cfg, "doc_id", "content") \
        .persist(StorageLevel.MEMORY_AND_DISK)
    raw_p.count()
    terms_p = term_stats(raw_p, n_docs, cfg).persist()
    terms_p.count()
    total_len = raw_p.agg(F.sum("tf")).collect()[0][0] or 0
    avgdl = float(total_len) / n_docs

    ARMS = {
        # classic: shuffle join idf + window norms (two full shuffles)
        "window": dict(broadcast_idf=False, norms="window"),
        # broadcast idf only (one full shuffle left: the norm window)
        "bidf_window": dict(broadcast_idf=True, norms="window"),
        # broadcast idf + tiny-agg broadcast norms (no full shuffle)
        "broadcast": dict(broadcast_idf=True, norms="broadcast"),
        # broadcast idf + contiguity mapInArrow norms (no shuffle at all)
        "arrow": dict(broadcast_idf=True, norms="arrow"),
    }
    if args.arms:
        keep = {a.strip() for a in args.arms.split(",") if a.strip()}
        unknown = keep - set(ARMS)
        if unknown:
            raise SystemExit(f"unknown arms: {sorted(unknown)}")
        ARMS = {a: kw for a, kw in ARMS.items() if a in keep}
    out = "/tmp/garamond_norms_ab_pw"
    t = {a: [] for a in ARMS}
    for rep in range(args.repeat):
        for arm, kw in ARMS.items():
            t0 = time.time()
            weighted_postings(raw_p, terms_p, avgdl, cfg, **kw) \
                .write.mode("overwrite").parquet(out)
            t[arm].append(round(time.time() - t0, 2))
    print(json.dumps({
        "cpus": args.cpus, "docs": n_docs,
        "postings": raw_p.count(),
        **{f"{a}_sec": v for a, v in t.items()},
        **{f"{a}_min": min(v) for a, v in t.items()},
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
