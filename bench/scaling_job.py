"""One scaling-protocol run: build + query the code-corpus index at a
given parallelism, print one JSON line.  Invoked in a FRESH JVM per
parallelism level by bench/scaling.py (a single JVM cannot change
``local[N]``)."""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garamond_jl_spark.config import EngineConfig  # noqa: E402
from garamond_jl_spark.corpus import corpus_df, query_set  # noqa: E402
from garamond_jl_spark.operators.build import build_index  # noqa: E402
from garamond_jl_spark.operators.query import search  # noqa: E402
from garamond_jl_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--repeat", type=int, default=2,
                    help="repetitions; min is reported (variance control)")
    ap.add_argument("--executors", type=int, default=0,
                    help="N > 0 switches to local-cluster[N, exec-cores, "
                         "exec-mem-mb]: N SEPARATE executor JVMs — the "
                         "faithful multi-executor topology (constant "
                         "per-executor heap as executors are added, no "
                         "shared-GC artifact; package shipped via the "
                         "spark-submit --py-files mechanism)")
    ap.add_argument("--exec-cores", type=int, default=4)
    ap.add_argument("--exec-mem-mb", type=int, default=6144)
    ap.add_argument("--shuffle", type=int, default=0,
                    help="fixed shuffle partition count (0 = the "
                         "session default 8x cores). Pin it when "
                         "comparing legs at large inputs so per-task "
                         "shuffle state is identical AND small enough "
                         "for the per-executor heap")
    ap.add_argument("--mode", choices=("flat", "persistent"),
                    default="flat",
                    help="flat = in-memory build_index (postings cached "
                         "in the JVM); persistent = build_persistent "
                         "(postings written as parquet tables — the "
                         "north-star production shape, no 600M-row "
                         "executor cache)")
    ap.add_argument("--scratch", default="/tmp",
                    help="base dir for the materialized corpus, the "
                         "persistent index output AND spark.local.dir "
                         "(shuffle/spill).  Point it at /dev/shm to run "
                         "the I/O-removal experiment: same topology, "
                         "shared-disk bottleneck excised, isolating the "
                         "memory-bus ceiling from the disk ceiling")
    args = ap.parse_args()

    # derive the AQE wide-start from the workload size — the in-code
    # replacement for the hand-pinned --shuffle 512 the round-4
    # protocol needed: the wide (query_id, doc_id) aggregation's input
    # is ∝ docs × queries, and per-task state must stay bounded under
    # an 8 g heap.  Anchor: 3M docs × 2400 q needed ≥512 partitions
    # (GCLocker crash at 256, BENCH.md r4) → one partition per ~14M of
    # the docs×queries product, clamped to [shuffle default, 4096].
    initial_parts = None
    product = args.docs * args.queries
    derived = -(-product // 14_000_000)
    # compare against the shuffle width the session will ACTUALLY
    # resolve (get_spark's max(8·cpus, 64) default when --shuffle is
    # unset) — the old hardcoded 256 stand-in could set a derived start
    # NARROWER than the unconfigured fallback at high --cpus (ADVICE r5)
    cpus_resolved = (args.executors * args.exec_cores
                     if args.executors else args.cpus)
    resolved_shuffle = args.shuffle or max(8 * cpus_resolved, 64)
    if derived > resolved_shuffle:
        initial_parts = min(int(derived), 4096)

    if args.scratch != "/tmp":
        local_dir = os.path.join(args.scratch, "spark-local")
        os.makedirs(local_dir, exist_ok=True)
        # both routes: executors launched by local-cluster workers read
        # the env; local-mode reads the conf
        os.environ["SPARK_LOCAL_DIRS"] = local_dir
        os.environ.setdefault("SPARK_WORKER_DIR",
                              os.path.join(args.scratch, "spark-worker"))

    if args.executors:
        import subprocess
        import tempfile
        total = args.executors * args.exec_cores
        zip_path = os.path.join(tempfile.gettempdir(), "garamond_pkg.zip")
        if not os.path.exists(zip_path):
            repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
            subprocess.run(["zip", "-qr", zip_path, "garamond_jl_spark"],
                           cwd=repo, check=True)
        spark = get_spark(
            f"scaling-exec{args.executors}", cpus=total,
            shuffle_partitions=args.shuffle or None,
            initial_partitions=initial_parts,
            master=f"local-cluster[{args.executors}, {args.exec_cores}, "
                   f"{args.exec_mem_mb}]",
            executor_memory=f"{args.exec_mem_mb - 1024}m")
        spark.sparkContext.addPyFile(zip_path)
        args.cpus = total
    else:
        spark = get_spark(f"scaling-{args.cpus}", cpus=args.cpus,
                          shuffle_partitions=args.shuffle or None,
                          initial_partitions=initial_parts)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()

    # identical input at every parallelism level: the corpus is
    # MATERIALIZED once as a parquet table (the north-rule input is an
    # Iceberg table on storage, not a generator) and reused across
    # levels; only executor threads vary between runs
    corpus_dir = os.path.join(args.scratch,
                              f"garamond_scaling_corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        corpus_df(spark, args.docs, seed=42,
                  partitions=args.partitions).write.mode("overwrite") \
            .parquet(corpus_dir)
    docs = spark.read.parquet(corpus_dir)

    # untimed warmup: spin up the FULL Python worker pool (one per core;
    # sample() keeps every partition — limit() would collapse to one and
    # warm a single worker) and JIT codegen, so the measurement is
    # steady-state throughput, a long-lived cluster's normal condition
    build_index(spark, docs.sample(0.02, seed=1), cfg,
                id_col=None).postings.count()

    t_build, t_query, n_postings, n_hits = None, None, 0, 0
    queries = query_set(seed=42, n=args.queries)
    for rep in range(args.repeat):
        if args.mode == "persistent":
            import shutil
            from garamond_jl_spark.operators.build import assign_dense_ids
            from garamond_jl_spark.operators.persist import (build_persistent,
                                                             load_index)
            out_dir = os.path.join(
                args.scratch, f"garamond_scaling_pidx_{args.cpus}_{rep}")
            shutil.rmtree(out_dir, ignore_errors=True)
            ddocs = assign_dense_ids(docs, ["repo", "path", "commit"])
            t0 = time.time()
            # n_buckets fixed across legs (identical work per leg)
            build_persistent(spark, ddocs, cfg, out_dir,
                             n_buckets=32, champion_p=0)
            tb = time.time() - t0
            idx = load_index(spark, out_dir)
            n_postings = idx.postings.count()
            t0 = time.time()
            n_hits = search(spark, idx, queries, k=10, hydrate=False,
                            pad_to_k=False).count()
            tq = time.time() - t0
            shutil.rmtree(out_dir, ignore_errors=True)
        else:
            t0 = time.time()
            idx = build_index(spark, docs, cfg, id_col=None)
            n_postings = idx.postings.count()
            tb = time.time() - t0
            t0 = time.time()
            n_hits = search(spark, idx, queries, k=10, hydrate=False,
                            pad_to_k=False).count()
            tq = time.time() - t0
            idx.postings.unpersist()
        t_build = tb if t_build is None else min(t_build, tb)
        t_query = tq if t_query is None else min(t_query, tq)

    print(json.dumps({
        "cpus": args.cpus, "docs": args.docs, "n_postings": n_postings,
        "queries": len(queries), "n_hits": n_hits,
        "build_sec": round(t_build, 2), "query_sec": round(t_query, 2),
        "build_docs_per_sec": round(args.docs / t_build, 1),
        "query_qps": round(len(queries) / t_query, 1),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
