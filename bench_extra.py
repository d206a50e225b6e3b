"""Round-6 optimization measurement harness (guide §1).

NOT the driver contract — bench.py is frozen for measurement.  This
file isolates each headline phase with the noop sink (guide §1.4) so
the computation is timed without the count()-pruning ambiguity, labels
every job (§1.5), and dumps .explain("formatted") per phase into
plans/r06/ for the before/after plan evidence.

Usage:
    python bench_extra.py [--explain-tag before|after] [--phases a,b,...]

Prints one JSON line: {"phases": {name: [t1, t2, ...]}, ...} with every
repeat's wall time (min is the steady-state figure, CLAUDE.md policy).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from garamond_jl_spark.config import EngineConfig  # noqa: E402
from garamond_jl_spark.corpus import corpus_df, query_set  # noqa: E402
from garamond_jl_spark.operators.build import build_index  # noqa: E402
from garamond_jl_spark.operators.query import search  # noqa: E402
from garamond_jl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_CODE_DOCS = int(os.environ.get("BENCH_CODE_DOCS", "50000"))
N_QUERIES = int(os.environ.get("BENCH_QUERIES", "100"))
K = 10
REPEATS = int(os.environ.get("BENCH_REPEATS", "3"))
PLANS_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "plans", "r06")


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def explain_to(df, name: str, tag: str | None):
    if not tag:
        return
    os.makedirs(PLANS_DIR, exist_ok=True)
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    with open(os.path.join(PLANS_DIR, f"{name}_{tag}.txt"), "w") as f:
        f.write(txt)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--explain-tag", default=None)
    ap.add_argument("--phases", default=None,
                    help="comma list; default all")
    ap.add_argument("--repeats", type=int, default=REPEATS)
    args = ap.parse_args()
    want = set(args.phases.split(",")) if args.phases else None
    tag = args.explain_tag

    spark = get_spark("garamond-bench-extra", cpus=CPUS,
                      shuffle_partitions=None)
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    out: dict[str, list[float]] = {}

    def timed_phase(name, fn, cleanup=None, repeats=None):
        if want is not None and name not in want:
            return
        ts, prev = [], None
        for i in range(repeats or args.repeats):
            if cleanup is not None and prev is not None:
                cleanup(prev)
            sc.setJobDescription(f"{name} rep{i}")
            t0 = time.time()
            prev = fn()
            ts.append(round(time.time() - t0, 3))
            sc.setJobDescription(None)
        out[name] = ts
        print(f"# {name}: {ts} (min {min(ts)})", file=sys.stderr)
        return prev

    def _retire_index(ix):
        for f in (ix.postings, ix.terms,
                  *(ix.meta or {}).get("_aux_persist", [])):
            try:
                f.unpersist()
            except Exception:
                pass

    # --- documents index build + query batch -------------------------
    from garamond_jl_spark.plans.testdata_queries import _ft_index

    def _build_docs():
        ix = _ft_index(spark, SF_DIR)
        ix.postings.count()
        return ix

    idx = timed_phase("build_docs", _build_docs, cleanup=_retire_index)

    if idx is not None:
        base_queries = ["spark join data", "window batch merge",
                        "query filter", "table scan fast",
                        "agg hash value"]
        doc_queries = (base_queries * ((N_QUERIES + 4) // 5))[:N_QUERIES]
        hits = search(spark, idx, doc_queries, k=K, hydrate=False,
                      pad_to_k=False)
        explain_to(hits, "query_batch", tag)
        timed_phase("query_batch", lambda: search(
            spark, idx, doc_queries, k=K, hydrate=False,
            pad_to_k=False).count())

    # --- code corpus -------------------------------------------------
    cfg = EngineConfig()
    import hashlib
    import inspect
    gen_sig = hashlib.md5(
        inspect.getsource(corpus_df).encode()).hexdigest()[:8]
    corpus_dir = f"/tmp/garamond_bench_corpus_{N_CODE_DOCS}_{gen_sig}"
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        corpus_df(spark, N_CODE_DOCS, seed=42, partitions=CPUS * 2) \
            .write.mode("overwrite").parquet(corpus_dir)
    code = spark.read.parquet(corpus_dir)
    build_index(spark, code.sample(0.02, seed=1), cfg,
                id_col=None).postings.count()   # warm worker pool

    def _build_code():
        ix = build_index(spark, code, cfg, id_col=None)
        ix.postings.count()
        return ix

    cidx = timed_phase("build_code", _build_code, cleanup=_retire_index)
    if cidx is not None:
        explain_to(cidx.postings, "build_code_postings", tag)
        code_queries = query_set(seed=42, n=N_QUERIES)
        ch = search(spark, cidx, code_queries, k=K, hydrate=False,
                    pad_to_k=False)
        explain_to(ch, "query_code_batch", tag)
        timed_phase("query_code_batch", lambda: search(
            spark, cidx, code_queries, k=K, hydrate=False,
            pad_to_k=False).count())

    # --- pipeline phases (noop sink isolation) -----------------------
    from garamond_jl_spark.plans.pipeline_queries import (
        ann_cosine_topk, ann_lsh_topk, dedup_minhash_lsh,
        dedup_simhash_pairs, semantic_boe_topk)

    for name, fn in [("dedup_minhash", dedup_minhash_lsh),
                     ("ann_cosine", ann_cosine_topk),
                     ("ann_lsh", ann_lsh_topk),
                     ("dedup_simhash64", dedup_simhash_pairs),
                     ("semantic_boe", semantic_boe_topk)]:
        if want is None or name in want:
            explain_to(fn(spark, SF_DIR), name, tag)
        timed_phase(name, lambda fn=fn: noop(fn(spark, SF_DIR)))

    print(json.dumps({"phases": out, "sf": SF_DIR,
                      "loadavg": [round(x, 2) for x in os.getloadavg()]}))
    spark.stop()


if __name__ == "__main__":
    main()
