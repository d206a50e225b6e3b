"""One scaling-protocol leg for the round-4 doc2vec embedders: build
the BOE / SIF / CPMean / DisC doc-embedding tables over an N-doc corpus
at a given parallelism, print one JSON line.  Invoked in a FRESH JVM
per parallelism level (a single JVM cannot change ``local[N]``):

    for c in 8 32; do python bench/embedders_scale.py --cpus $c; done

Protocol (BENCH.md rules): corpus materialized to parquet first, worker
pool warmed with .sample(), per-phase min-of-2, one JVM at a time.
Each embedding is forced with a count() over the long-form output.
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
from garamond_jl_spark.operators.semantic import (  # noqa: E402
    boe_doc_embeddings, cpmean_doc_embeddings, disc_doc_embeddings,
    sif_doc_embeddings, synthetic_word_vectors)
from garamond_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--repeat", type=int, default=2)
    ap.add_argument("--out", default="/tmp/embedders_scale")
    args = ap.parse_args()

    spark = get_spark(f"emb-scale-{args.cpus}", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    corpus_path = f"{args.out}/corpus_{args.docs}.parquet"
    if not os.path.exists(corpus_path):
        docs = assign_dense_ids(
            corpus_df(spark, args.docs, seed=42, partitions=256),
            ["repo", "path", "commit"])
        (docs.select("doc_id", "content")
         .write.mode("overwrite").parquet(corpus_path))
    d = spark.read.parquet(corpus_path)
    d.sample(0.001).count()                       # warm the worker pool

    tokp = (d.select("doc_id", F.posexplode(F.split("content", " "))
                     .alias("pos", "term"))
            .where(F.col("term") != ""))
    tf = (tokp.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
          .persist())
    n_tok = tf.count()                            # shared input, cached
    wv = synthetic_word_vectors(tf.select("term"), dim=args.dim, seed=0)
    lex = tf.groupBy("term").agg(F.sum("tf").alias("count")).persist()
    lex.count()

    def timed(fn) -> float:
        best = float("inf")
        for _ in range(args.repeat):
            t0 = time.time()
            fn()
            best = min(best, time.time() - t0)
        return round(best, 2)

    phases = {
        "boe": lambda: boe_doc_embeddings(tf, wv).count(),
        "sif": lambda: sif_doc_embeddings(tf, wv, lex).count(),
        "cpmean": lambda: cpmean_doc_embeddings(tf, wv,
                                                dim=args.dim).count(),
        "disc": lambda: disc_doc_embeddings(tokp, wv, dim=args.dim,
                                            n=2).count(),
    }
    out = {"cpus": args.cpus, "docs": args.docs, "dim": args.dim,
           "tf_rows": n_tok,
           "loadavg": [round(x, 2) for x in os.getloadavg()]}
    for name, fn in phases.items():
        out[name] = timed(fn)
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
