"""IVFADC incremental extend at 1M vectors: O(batch), not O(corpus).

Backs the README/COVERAGE claim that ``IVFADCIndex.extend`` (the M1
push! analog for the ADC structure) takes appends in ONE pass over the
new rows under frozen quantizers: build over 990k vectors, append the
remaining 10k, and compare the extend cost against the full rebuild.

Protocol (BENCH.md rules): corpus materialized to parquet first, worker
pool warmed, one Spark JVM; build/extend forced with .count() actions.

Run: python bench/ann_extend.py [--docs 1000000] [--delta 10000]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from garamond_jl_spark.operators.ann import IVFADCIndex  # noqa: E402
from garamond_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--delta", type=int, default=10_000)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--clusters", type=int, default=1000)
    ap.add_argument("--out", default="/tmp/ann_env_bench")
    args = ap.parse_args()

    spark = get_spark("ann-extend-bench")
    spark.sparkContext.setLogLevel("ERROR")
    n, dim = args.docs, args.dim

    packed_path = f"{args.out}/packed_{n}_{dim}.parquet"
    long_path = f"{args.out}/long_{n}_{dim}.parquet"
    rng = np.random.default_rng(11)
    centers = rng.normal(size=(args.clusters, dim)) * 3.0
    if not os.path.exists(packed_path):
        cent_df = spark.createDataFrame(
            [(int(c), [float(x) for x in vec])
             for c, vec in enumerate(centers)], "cl INT, cv ARRAY<DOUBLE>")
        base = (spark.range(n).select(
            F.col("id").alias("doc_id"),
            (F.col("id") % args.clusters).cast("int").alias("cl")))
        noise = F.expr(
            f"transform(sequence(1, {dim}), j -> "
            "cast(conv(substring(md5(concat(doc_id, ':', j)), 1, 6), 16, 10)"
            " as double) / 8388608.0 - 1.0)")
        packed = (base.join(F.broadcast(cent_df), "cl")
                  .withColumn("nz", noise)
                  .select("doc_id",
                          F.expr("zip_with(cv, nz, (a, b) -> a + 0.3 * b)")
                          .alias("emb")))
        packed.write.mode("overwrite").parquet(packed_path)
        (spark.read.parquet(packed_path)
         .select("doc_id", F.posexplode("emb").alias("i0", "dv"))
         .select("doc_id", (F.col("i0") + 1).cast("int").alias("i"), "dv")
         .write.mode("overwrite").parquet(long_path))

    packed = spark.read.parquet(packed_path)
    dv = spark.read.parquet(long_path)
    packed.sample(0.01).count()          # warm the worker pool
    dv.sample(0.01).count()

    cut = n - args.delta
    base_p, delta_p = (packed.where(F.col("doc_id") < cut),
                       packed.where(F.col("doc_id") >= cut))
    base_l, delta_l = (dv.where(F.col("doc_id") < cut),
                       dv.where(F.col("doc_id") >= cut))

    kw = dict(dim=dim, n_centroids=256, m=4, n_codes=16, n_probe=8,
              n_iter=3, seed=0, sample_ratio=0.02, persist=True)

    t0 = time.time()
    base_idx = IVFADCIndex.build(base_l, packed=base_p, **kw)
    n_base = base_idx.codes.count()
    t_build = time.time() - t0

    t0 = time.time()
    ext = base_idx.extend(delta_l, packed=delta_p)
    n_ext = ext.codes.count()            # cached base + coded delta
    t_extend = time.time() - t0

    t0 = time.time()                     # warm floor: pure cached scan
    ext.codes.count()
    t_warm = time.time() - t0

    t0 = time.time()                     # the alternative: full rebuild
    full_idx = IVFADCIndex.build(dv, packed=packed, **kw)
    full_idx.codes.count()
    t_rebuild = time.time() - t0

    # sanity: an appended doc is findable through the extended index
    q_doc = cut + 7
    qv = [(int(r["i"]), float(r["dv"]))
          for r in dv.where(F.col("doc_id") == q_doc).collect()]
    got = [r["doc_id"] for r in ext.search(dv, qv, k=3, rerank=500)
           .collect()]

    print(json.dumps({
        "docs": n, "delta": args.delta, "dim": dim,
        "build_base_sec": round(t_build, 2),
        "extend_sec": round(t_extend, 2),
        "extend_warm_scan_sec": round(t_warm, 2),
        "rebuild_full_sec": round(t_rebuild, 2),
        "codes_base": n_base, "codes_extended": n_ext,
        "appended_doc_found": q_doc in got,
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
