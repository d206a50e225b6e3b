"""1M-doc near-dup dedup benchmark (VERDICT r1 #6 done-criterion):
MinHash+LSH production path and the df-capped Jaccard verifier must
both complete with no quadratic blow-up on a corpus with injected
near-duplicates.

Usage: python bench/dedup_bench.py [--docs 1000000] [--dup-frac 0.01]
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

from garamond_jl_spark.corpus import corpus_df  # noqa: E402
from garamond_jl_spark.operators.build import assign_dense_ids  # noqa: E402
from garamond_jl_spark.plans.pipeline_queries import (JACCARD_T,  # noqa: E402
                                                      _jaccard_pairs,
                                                      minhash_lsh_pairs,
                                                      shingles_from)
from garamond_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--dup-frac", type=float, default=0.01)
    ap.add_argument("--cpus", type=int, default=32)
    args = ap.parse_args()

    spark = get_spark(f"dedup-bench-{args.cpus}", cpus=args.cpus,
                      shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_dir = f"/tmp/garamond_dedup_corpus_{args.docs}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        base = assign_dense_ids(
            corpus_df(spark, args.docs, seed=42, partitions=64),
            ["repo", "path", "commit"]) \
            .select("doc_id", F.col("content").alias("text"))
        # inject near-duplicates: a deterministic sample re-emitted with
        # one token replaced (Jaccard stays ≥ the 0.8 threshold)
        dups = (base.where(F.pmod(F.col("doc_id"), F.lit(int(1 / args.dup_frac))) == 0)
                .select((F.col("doc_id") + args.docs).alias("doc_id"),
                        F.regexp_replace("text", r"^\S+", "dupmarker")
                        .alias("text")))
        base.unionByName(dups).write.mode("overwrite").parquet(corpus_dir)
    d = spark.read.parquet(corpus_dir)
    n = d.count()

    shd = shingles_from(d).persist()
    n_shingles = shd.count()  # materialize (untimed vs the pair phases)

    t0 = time.time()
    mh = minhash_lsh_pairs(shd, int_hash=True, n_rows=2,
                           bucket_cap=64)
    mh_pairs = mh.where(F.col("jacc") >= JACCARD_T).count()
    t_minhash = time.time() - t0

    t0 = time.time()
    jc = _jaccard_pairs(shd)
    jc_pairs = jc.where(F.col("jacc") >= JACCARD_T).count()
    t_jaccard = time.time() - t0

    shd.unpersist()
    print(json.dumps({
        "docs": n, "shingle_rows": n_shingles,
        "minhash_lsh_sec": round(t_minhash, 1), "minhash_pairs": mh_pairs,
        "jaccard_capped_sec": round(t_jaccard, 1), "jaccard_pairs": jc_pairs,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
