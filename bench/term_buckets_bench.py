"""A/B: exact-plan query batch on a flat vs term-bucketed persistent index.

`build_persistent(term_buckets=N)` partitions the postings parquet by
pmod(xxhash64(term), N); `query.pruned_postings` then restricts each
batch's exact/impact scan to the buckets holding the batch's terms
(PartitionFilters prune files at planning).  This harness measures the
end-to-end effect: same corpus, same query batch, two indexes in ONE
JVM, interleaved min-of-N.

    python bench/term_buckets_bench.py --docs 1000000 --queries 100 \
        [--buckets 64] [--repeat 2]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garamond_jl_spark.config import EngineConfig  # noqa: E402
from garamond_jl_spark.corpus import corpus_df, query_set  # noqa: E402
from garamond_jl_spark.operators.build import (assign_dense_ids,  # noqa: E402
                                               build_index)
from garamond_jl_spark.operators.persist import (build_persistent,  # noqa: E402
                                                 load_index)
from garamond_jl_spark.operators.query import (embed_queries,  # noqa: E402
                                               pruned_postings, search)
from garamond_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--queries", type=int, default=100)
    ap.add_argument("--buckets", type=int, default=64)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--selective", type=int, default=8,
                    help="single-query requests timed per arm "
                         "(interleaved) — the pruning win case")
    args = ap.parse_args()

    spark = get_spark(f"tb-bench-{args.cpus}", cpus=args.cpus,
                      shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()

    corpus_dir = f"/tmp/garamond_profile_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        assign_dense_ids(corpus_df(spark, args.docs, seed=42,
                                   partitions=args.partitions),
                         ["repo", "path", "commit"]) \
            .write.mode("overwrite").parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)

    # warm the python worker pool + JIT before timing anything
    build_index(spark, docs.sample(0.02, seed=1), cfg).postings.count()

    builds = {}
    idx = {}
    for arm, tb in (("flat", 0), ("bucketed", args.buckets)):
        out = f"/tmp/garamond_tb_idx_{arm}"
        shutil.rmtree(out, ignore_errors=True)
        t0 = time.time()
        build_persistent(spark, docs, cfg, out, n_buckets=32,
                         champion_p=0, term_buckets=tb)
        builds[arm] = round(time.time() - t0, 2)
        idx[arm] = load_index(spark, out)

    queries = query_set(seed=42, n=args.queries)
    t = {a: [] for a in idx}
    for rep in range(args.repeat):
        for arm, ix in idx.items():
            t0 = time.time()
            search(spark, ix, queries, k=10, hydrate=False,
                   pad_to_k=False).count()
            t[arm].append(round(time.time() - t0, 2))

    # selective workload — the layout's designed regime: one query per
    # request touches ~|q| buckets, so pruning actually bites.  The
    # arms interleave per query; totals over args.selective requests.
    sel = {a: 0.0 for a in idx}
    for q in queries[:args.selective]:
        for arm, ix in idx.items():
            t0 = time.time()
            search(spark, ix, [q], k=10, hydrate=False,
                   pad_to_k=False).count()
            sel[arm] += time.time() - t0
    sel = {a: round(v, 2) for a, v in sel.items()}

    # untimed observability: rows the exact plan scans per batch, and
    # for ONE selective request
    qterms = embed_queries(spark, idx["bucketed"], queries)
    scanned = {a: pruned_postings(ix, qterms).count()
               for a, ix in idx.items()}
    q1 = embed_queries(spark, idx["bucketed"], queries[:1])
    scanned1 = {a: pruned_postings(ix, q1).count()
                for a, ix in idx.items()}
    print(json.dumps({
        "cpus": args.cpus, "docs": args.docs, "queries": len(queries),
        "term_buckets": args.buckets,
        "build_sec": builds,
        **{f"query_{a}_sec": v for a, v in t.items()},
        **{f"query_{a}_min": min(v) for a, v in t.items()},
        "selective_requests": args.selective,
        **{f"selective_{a}_sec": v for a, v in sel.items()},
        "postings_scanned": scanned,
        "postings_scanned_1q": scanned1,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
