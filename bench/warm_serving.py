"""Warm single-request serving latency through the line-JSON socket
server — the evidence for the resident posture (operators/resident.py):
the reference is an interactive server whose env answers instantly once
loaded; this measures what ONE request costs end-to-end (client socket →
SocketServer → lifecycle.search → response_json) in the lazy vs the
resident posture.

Protocol (single JVM, legs interleave-safe):
  1. build (or reuse) the N-doc persistent index on disk;
  2. LAZY leg first — its requests must not benefit from frames the
     resident leg persists;
  3. RESIDENT leg (fresh load_index(resident=True)) in the same JVM;
  4. per-leg: one cold request, then R warm requests (distinct queries,
     so nothing is answered from an identical-plan cache) — report
     cold, warm-min, warm-median.

One JSON line on stdout.
"""

from __future__ import annotations

import argparse
import json
import os
import socket
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from garamond_jl_spark.config import EngineConfig  # noqa: E402
from garamond_jl_spark.corpus import corpus_df, query_set  # noqa: E402
from garamond_jl_spark.session import get_spark  # noqa: E402


def _request_line(query: str, k: int) -> bytes:
    req = {"operation": "search", "query": query, "max_matches": k,
           "max_suggestions": 0, "search_method": "exact",
           "return_fields": [], "sort_fields": [], "sort_reverse": False,
           "custom_weights": {}, "request_id_key": "", "response_size": k,
           "response_page": 1, "ranker": "noop_ranker",
           "input_parser": "noop_input_parser",
           "recommender": "noop_recommender", "searchable_filters": []}
    return json.dumps(req).encode() + b"\n"


def _one_request(conn: socket.socket, query: str, k: int) -> float:
    t0 = time.perf_counter()
    conn.sendall(_request_line(query, k))
    buf = b""
    while not buf.endswith(b"\n"):
        chunk = conn.recv(1 << 16)
        if not chunk:
            raise RuntimeError("server closed mid-response")
        buf += chunk
    dt = time.perf_counter() - t0
    body = json.loads(buf.decode() or "{}")
    if not body.get("n_total_results"):
        raise RuntimeError(f"empty response for {query!r}")
    return dt


def _leg(env, queries: list[str], k: int) -> dict:
    from garamond_jl_spark.server.socket import socket_server
    srv = socket_server(env)
    try:
        conn = socket.create_connection(("127.0.0.1", srv.port))
        try:
            cold = _one_request(conn, queries[0], k)
            warm = [_one_request(conn, q, k) for q in queries[1:]]
        finally:
            conn.close()
    finally:
        srv.shutdown()
    return {"cold_sec": round(cold, 3),
            "warm_min_sec": round(min(warm), 3),
            "warm_median_sec": round(statistics.median(warm), 3),
            "n_warm": len(warm)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=1_000_000)
    ap.add_argument("--requests", type=int, default=9,
                    help="warm requests per leg (distinct queries)")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--scratch", default="/tmp")
    args = ap.parse_args()

    spark = get_spark("warm-serving", cpus=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    cfg = EngineConfig()

    corpus_dir = os.path.join(args.scratch,
                              f"garamond_scaling_corpus_{args.docs}")
    if not os.path.exists(os.path.join(corpus_dir, "_SUCCESS")):
        corpus_df(spark, args.docs, seed=42, partitions=64) \
            .write.mode("overwrite").parquet(corpus_dir)
    idx_dir = os.path.join(args.scratch, f"garamond_warm_idx_{args.docs}")
    t_build = None
    if not os.path.exists(os.path.join(idx_dir, "meta.json")):
        from garamond_jl_spark.operators.build import assign_dense_ids
        from garamond_jl_spark.operators.persist import build_persistent
        docs = assign_dense_ids(spark.read.parquet(corpus_dir),
                                ["repo", "path", "commit"])
        t0 = time.perf_counter()
        # term_buckets is the SERVING layout (postings partitioned by
        # pmod(xxhash64(term), 64) → per-request scans prune to the
        # query's buckets); n_buckets only shards the build checkpoints
        build_persistent(spark, docs, cfg, idx_dir, n_buckets=16,
                         term_buckets=64)
        t_build = round(time.perf_counter() - t0, 1)

    from garamond_jl_spark.operators.persist import load_index
    from garamond_jl_spark.plans.lifecycle import SearchEnv

    # 1 + R distinct single requests; reuse the bench query generator
    # but drop the OOV tail (an OOV request returns 0 rows by design
    # and would not measure scoring)
    qs = [q for q in query_set(seed=5, n=args.requests + 8)
          if q and "zzz" not in q and "qqqq" not in q
          and q != "the of und"][:args.requests + 1]

    t0 = time.perf_counter()
    lazy_env = SearchEnv(spark=spark, index=load_index(spark, idx_dir))
    t_load_lazy = round(time.perf_counter() - t0, 3)
    lazy = _leg(lazy_env, qs, args.k)

    t0 = time.perf_counter()
    res_env = SearchEnv(spark=spark,
                        index=load_index(spark, idx_dir, resident=True))
    t_load_res = round(time.perf_counter() - t0, 3)
    resident = _leg(res_env, qs, args.k)

    print(json.dumps({
        "metric": "single-request serving latency via socket server",
        "docs": args.docs, "cpus": args.cpus, "k": args.k,
        "build_sec": t_build,
        "load_lazy_sec": t_load_lazy, "load_resident_sec": t_load_res,
        "lazy": lazy, "resident": resident,
        "speedup_warm_min": round(lazy["warm_min_sec"]
                                  / resident["warm_min_sec"], 2),
        "loadavg": os.getloadavg(),
    }))
    spark.stop()


if __name__ == "__main__":
    main()
