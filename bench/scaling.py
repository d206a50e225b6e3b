"""Scaling-efficiency protocol (BASELINE.json north rule).

No real cluster exists in this sandbox, so the two-cluster-size
criterion is evidenced by running the IDENTICAL job + input at two
parallelism levels (local[8] vs local[32]) in separate JVMs:

    efficiency = (T_N / T_4N) × (N / 4N)     — ≥ 0.8 required

Usage: python bench/scaling.py [--docs 100000] [--queries 200]
Prints one JSON line; paste the table into BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))


def run_level(cpus: int, docs: int, queries: int, attempts: int = 2,
              partitions: int = 64, mode: str = "flat",
              executors: int = 0, exec_cores: int = 4,
              shuffle: int = 0, scratch: str = "/tmp") -> dict:
    """One fresh-JVM leg; a transiently-failed JVM (host pressure) is
    retried once with the failing leg's stderr surfaced, so a crash in
    the second leg cannot silently discard the first leg's 20+ minutes."""
    last = None
    for _ in range(attempts):
        out = subprocess.run(
            [sys.executable, os.path.join(HERE, "scaling_job.py"),
             "--cpus", str(cpus), "--docs", str(docs),
             "--queries", str(queries), "--partitions", str(partitions),
             "--mode", mode, "--executors", str(executors),
             "--exec-cores", str(exec_cores), "--shuffle", str(shuffle),
             "--scratch", scratch],
            capture_output=True, text=True)
        if out.returncode == 0:
            lines = [ln for ln in out.stdout.splitlines()
                     if ln.startswith("{")]
            if lines:
                return json.loads(lines[-1])
            print(f"# leg cpus={cpus} exited 0 but printed no JSON; "
                  f"retrying\nstdout tail: {out.stdout[-1000:]}\n"
                  f"stderr tail: {out.stderr[-1000:]}", file=sys.stderr)
        last = out
        print(f"# leg cpus={cpus} failed (rc={out.returncode}); retrying\n"
              f"{out.stderr[-2000:]}", file=sys.stderr)
    raise RuntimeError(
        f"scaling leg cpus={cpus} failed after {attempts} attempts:\n"
        f"stdout tail: {(last.stdout or '')[-1000:]}\n"
        f"stderr tail: {(last.stderr or '')[-2000:]}")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=100_000)
    ap.add_argument("--queries", type=int, default=200)
    ap.add_argument("--low", type=int, default=8)
    ap.add_argument("--high", type=int, default=32)
    ap.add_argument("--partitions", type=int, default=64)
    ap.add_argument("--mode", choices=("flat", "persistent"),
                    default="flat")
    ap.add_argument("--executors-low", type=int, default=0,
                    help="N > 0: local-cluster topology — N vs "
                         "executors-high SEPARATE executor JVMs")
    ap.add_argument("--executors-high", type=int, default=0)
    ap.add_argument("--exec-cores", type=int, default=4)
    ap.add_argument("--shuffle", type=int, default=0)
    ap.add_argument("--scratch", default="/tmp",
                    help="/dev/shm = tmpfs I/O-removal experiment")
    args = ap.parse_args()

    lo = run_level(args.low, args.docs, args.queries,
                   partitions=args.partitions, mode=args.mode,
                   executors=args.executors_low,
                   exec_cores=args.exec_cores, shuffle=args.shuffle,
                   scratch=args.scratch)
    hi = run_level(args.high, args.docs, args.queries,
                   partitions=args.partitions, mode=args.mode,
                   executors=args.executors_high,
                   exec_cores=args.exec_cores, shuffle=args.shuffle,
                   scratch=args.scratch)
    ratio = args.low / args.high
    eff_build = (lo["build_sec"] / hi["build_sec"]) * ratio
    eff_query = (lo["query_sec"] / hi["query_sec"]) * ratio
    total_lo = lo["build_sec"] + lo["query_sec"]
    total_hi = hi["build_sec"] + hi["query_sec"]
    print(json.dumps({
        "protocol": f"local[{args.low}] vs local[{args.high}], identical "
                    f"input ({args.docs} docs, {args.queries} queries)",
        "low": lo, "high": hi,
        "efficiency_build": round(eff_build, 3),
        "efficiency_query": round(eff_query, 3),
        "efficiency_total": round((total_lo / total_hi) * ratio, 3),
        # external load on this shared box explains 2-3x run spread
        # (BENCH.md noise note) — a high loadavg flags a discard
        "loadavg": [round(x, 2) for x in os.getloadavg()],
    }))


if __name__ == "__main__":
    main()
