"""Exact BM25 top-k query engine (SURVEY.md §3.1 Spark mapping).

Reference counterpart: query embedding (src/embedder/dtv.jl:29-59) →
``NaiveIndex.knn_search`` dot products (src/index/naive.jl:15-32) →
``score_transform!`` (src/search/index.jl:186-202) → trim
(src/search/results.jl:34-41).

The central plan (SURVEY.md J4):

    broadcast(query term weights) ⋈ postings ON term
      → groupBy(query_id, doc_id).sum(qw · wnorm)       # cosine
      → score = 1 − tanh(α · (1 − cos))
      → window top-k per query_id (score desc, doc_id asc tiebreak —
        Julia sortperm stability, naive.jl:30)
      → hydrate: ⋈ docs ON doc_id (J2, broadcast the tiny hit side)

Queries run **batched**: many queries become one DataFrame and one job —
the distributed replacement for the reference's request-at-a-time loop
(src/server/search.jl:34-40).  Per-query work on the driver is only the
pseudo-document embedding math on the query's own terms (a dict lookup
against the broadcast-collected stats of those terms — tiny by
construction: |query terms| ≪ |vocabulary|).

OOV handling: a query with no in-vocab token embeds to nothing and
yields zero rows (is_embedded gate, dtv.jl:53-58 + index.jl:106-113).
"""

from __future__ import annotations

import math
from collections import Counter

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (DoubleType, LongType, StringType, StructField,
                               StructType)

from garamond_jl_spark.config import EngineConfig, bm25_weight, idf_weight, tf_weight
from garamond_jl_spark.functions.scoring import score_transform_expr
from garamond_jl_spark.functions.textprep import tokenize_with_config
from garamond_jl_spark.operators.build import InvertedIndex

QTERMS_SCHEMA = StructType([
    StructField("query_id", LongType(), False),
    StructField("term", StringType(), False),
    StructField("qw", DoubleType(), False),
])

# driver-OOM guard for the regex vocabulary expansion: a pattern like
# '.' matches the ENTIRE dictionary — at a 10^8-term code vocabulary
# that collect would kill a serving driver.  Explicit error, never a
# silent truncation (truncating would silently change scores).
REGEX_COLLECT_CAP = 200_000

_REGEX_META = set(r"\.^$*+?()[]{}|")


def _regex_literal(pat: str) -> tuple[str, str | None]:
    """Classify a vocabulary-expansion pattern for scan pruning.

    * ``("literal", s)`` — the whole pattern is metachar-free: an
      unanchored rlike equals a plain substring test, so the scan uses
      codegen ``contains`` and skips java.util.regex entirely.
    * ``("prefix", s)`` — pattern is ``^<literal>...``: every match
      starts with the literal, so a ``startswith`` band prunes the
      scan FIRST (StringStartsWith pushes into the parquet terms scan
      as a min/max range — the sorted-dictionary file skip), then the
      full rlike applies to the survivors.
    * ``("rlike", None)`` — no usable literal; full regex scan (the
      reference scans its whole lexicon per token too, dtv.jl:27).
    """
    if not any(c in _REGEX_META for c in pat):
        return ("literal", pat)
    if pat.startswith("^"):
        run = []
        for c in pat[1:]:
            if c in _REGEX_META:
                break
            run.append(c)
        if run:
            return ("prefix", "".join(run))
    return ("rlike", None)


def pruned_postings(index: InvertedIndex, qterms: DataFrame) -> DataFrame:
    """Partition-pruned view of ``index.postings``.

    When the persistent index was written with
    ``build_persistent(term_buckets=N)`` the postings table is
    partitioned by ``_tb = pmod(xxhash64(term), N)``; restricting the
    scan to the buckets holding the batch's query terms turns the
    exact plan's full-index scan into ∝ buckets-touched I/O (the
    partition filter prunes files at planning).  Identity when the
    index is unbucketed (or when reading an incremental union whose
    delta segments dropped the partition column).

    ``qterms`` is the driver-built LocalRelation from
    :func:`embed_queries`, so the term collect and the bucket-id
    evaluation execute locally — no cluster job."""
    nb = index.meta.get("term_buckets")
    p = index.postings
    if not nb or "_tb" not in p.columns:
        return p
    if index.resident is not None:
        # warm posture: bucket ids come from the driver-held stats —
        # no job at all (operators/resident.py).  qterms is a
        # LocalRelation, so this collect is driver-side evaluation.
        terms = sorted({r["term"] for r in qterms.select("term").collect()})
        buckets = index.resident.buckets_of(terms)
        if buckets is None or not terms:
            return p
        return p.where(F.col("_tb").isin(buckets))
    terms = [r["term"] for r in qterms.select("term").distinct().collect()]
    if not terms:
        return p
    spark = p.sparkSession
    buckets = [r["b"] for r in
               spark.createDataFrame([(t,) for t in terms], "term string")
               .select(F.pmod(F.xxhash64("term"), F.lit(nb)).alias("b"))
               .distinct().collect()]
    return p.where(F.col("_tb").isin(buckets))


# above this many distinct terms the statistics probe joins a broadcast
# term list instead of compiling an isin literal list: a multi-thousand
# element In() expression bloats analysis/optimization time (the
# per-batch driver constant the 1200-query scaling leg pays — VERDICT
# r5 item 5), while a broadcast hash semi-join is O(1) plan size
STATS_PROBE_ISIN_MAX = 256


def _df_stats(index: InvertedIndex, terms: list[str]) -> dict[str, int]:
    """Term → df for ``terms``, with an opportunistic per-index memo.

    A frozen index's statistics never change, so terms already fetched
    (and terms known to be out-of-vocabulary) answer from the driver-
    held memo and only the genuinely new terms cost a filtered read —
    repeat searches over a warm index skip the stats job entirely (the
    resident posture's df lookup, acquired lazily instead of up
    front).  Live incremental views (``meta["live_deltas"]``: appends
    move df under the reader) bypass the memo, the same honesty rule
    ``make_env_resident`` applies."""
    if index.meta.get("live_deltas"):
        return {r["term"]: r["df"] for r in
                _stats_probe(index.terms, terms)
                .select("term", "df").collect()}
    memo: dict = index.meta.setdefault("_df_memo", {})
    absent: set = index.meta.setdefault("_df_memo_absent", set())
    missing = [t for t in terms if t not in memo and t not in absent]
    if missing:
        fetched = {r["term"]: r["df"] for r in
                   _stats_probe(index.terms, missing)
                   .select("term", "df").collect()}
        memo.update(fetched)
        absent.update(t for t in missing if t not in fetched)
    return {t: memo[t] for t in terms if t in memo}


def _stats_probe(terms: DataFrame, query_terms: list[str]) -> DataFrame:
    """Filtered view of the terms table restricted to ``query_terms`` —
    isin for small lists (pushes into a parquet scan), broadcast join
    for large batches (bounded plan size, same rows)."""
    if len(query_terms) <= STATS_PROBE_ISIN_MAX:
        return terms.where(F.col("term").isin(query_terms))
    spark = terms.sparkSession
    probe = F.broadcast(spark.createDataFrame(
        [(t,) for t in query_terms], "term string"))
    return terms.join(probe, "term")


def embed_queries(spark: SparkSession, index: InvertedIndex,
                  queries: list[str], isregex: bool = False,
                  stats_out: dict | None = None) -> DataFrame:
    """Queries → (query_id, term, qw) with qw the L2-normalized
    pseudo-document weight computed from corpus stats (dtv.jl:29-41).

    Stats for the union of query terms are fetched with ONE filtered
    read of the terms table (Catalyst pushes the isin filter into the
    scan) — never a full-dictionary collect.

    ``isregex`` (F7's ``search_method=:regex``, dtv.jl:27
    ``dtv_regex``): each query token is an UNANCHORED regular
    expression matched against the whole vocabulary; every matching
    vocabulary term joins the pseudo-document with the token's count,
    then the standard weighting applies to the expanded counts.  The
    expansion is one ``rlike`` join of the terms table against the
    broadcast pattern list (the reference scans its lexicon per token
    the same way).  Documented deviation: regex queries tokenize by
    whitespace ONLY (plus the configured lowercase), because the
    standard prepare() would strip the regex metacharacters."""
    cfg = index.cfg
    if isregex:
        tokenized = [[(t.lower() if cfg.lowercase else t)
                      for t in (q or "").split() if t] for q in queries]
        pats = [(qid, pat, c)
                for qid, toks in enumerate(tokenized)
                for pat, c in sorted(Counter(toks).items())]
        if not pats:
            return spark.createDataFrame([], QTERMS_SCHEMA)
        pdf = F.broadcast(spark.createDataFrame(
            pats, "query_id INT, pat STRING, c INT"))
        # one pruned scan per DISTINCT pattern, unioned: pure literals
        # become codegen `contains` (no regex at all), ^-anchored
        # patterns band the scan with `startswith` (pushed into the
        # parquet terms scan as a range filter) before the rlike, and
        # only truly open patterns pay the full |V| regex pass.  The
        # (term→query) fan-out is then a broadcast equi-join on the
        # pattern string — never a |V|×|patterns| nested loop.
        terms_df = index.terms.select("term", "df")
        branches = []
        for pat in sorted({p for _, p, _ in pats}):
            kind, lit = _regex_literal(pat)
            if kind == "literal":
                t = terms_df.where(F.col("term").contains(lit))
            elif kind == "prefix":
                t = terms_df.where(F.col("term").startswith(lit)) \
                            .where(F.col("term").rlike(pat))
            else:
                t = terms_df.where(F.col("term").rlike(pat))
            branches.append(t.withColumn("pat", F.lit(pat)))
        uni = branches[0]
        for b in branches[1:]:
            uni = uni.unionByName(b)
        matched = (uni.join(pdf, "pat")
                   .select("query_id", "term", "df", "c")
                   .limit(REGEX_COLLECT_CAP + 1).collect())
        if len(matched) > REGEX_COLLECT_CAP:
            raise ValueError(
                f"regex query expansion exceeds {REGEX_COLLECT_CAP} "
                "(term, query) matches — the pattern set is too broad "
                "for driver-side embedding (e.g. '.' matches the whole "
                "vocabulary); narrow the patterns")
        stats = {r["term"]: r["df"] for r in matched}
        exp_counts: dict[int, dict[str, int]] = {}
        for r in matched:
            qc = exp_counts.setdefault(int(r["query_id"]), {})
            qc[r["term"]] = qc.get(r["term"], 0) + int(r["c"])
    else:
        tok = index.tokenizer or (lambda s: tokenize_with_config(s, cfg))
        tokenized = [tok(q) for q in queries]
        all_terms = sorted({t for toks in tokenized for t in toks})
        if not all_terms:
            return spark.createDataFrame([], QTERMS_SCHEMA)
        if index.resident is not None:
            # warm posture: df stats are a driver lookup — the per-
            # request stats job disappears (operators/resident.py)
            stats = index.resident.df_of(all_terms)
        else:
            stats = _df_stats(index, all_terms)
    n_docs, avgdl = float(index.meta["n_docs"]), index.meta["avgdl"]
    rows = []
    for qid, toks in enumerate(tokenized):
        if isregex:
            counts = exp_counts.get(qid, {})
        else:
            counts = {}
            for t in toks:
                if t in stats:
                    counts[t] = counts.get(t, 0) + 1
        qlen = float(sum(counts.values()))
        if qlen == 0.0:
            continue  # OOV-only ⇒ no rows ⇒ no hits
        ws = {}
        for t, c in counts.items():
            if cfg.weighting == "count":
                ws[t] = float(c)
            elif cfg.weighting == "tf":
                ws[t] = tf_weight(c, qlen)
            elif cfg.weighting == "tfidf":
                ws[t] = tf_weight(c, qlen) * idf_weight(n_docs, stats[t])
            else:
                ws[t] = bm25_weight(c, qlen, avgdl, n_docs, stats[t],
                                    kappa=cfg.kappa, beta=cfg.beta)
        nrm = math.sqrt(sum(w * w for w in ws.values()))
        for t, w in ws.items():
            rows.append((qid, t, w / nrm if nrm > 0 else 0.0))
    if stats_out is not None:
        # exact size of the score join's aggregation input, free from
        # the df stats already in hand: each (query, term) row fans out
        # to df_t posting rows.  topk_plan/score_all size their wide
        # groupBy from this so large batches never hand-tune
        # spark.sql.shuffle.partitions (the 2400-query GC-pressure
        # class, BENCH.md round 4).
        stats_out["expected_hit_rows"] = sum(
            stats.get(t, 0) for _, t, _ in rows)
        # per-query maximum (r6, ADVICE fix): the two-phase ranking
        # guard protects against ONE hot query whose single window task
        # sorts millions of rows — in a large skewed batch the MEAN
        # dilutes below the threshold while the hot query still melts a
        # task, so the gate must see the worst query, not the average
        per_q: dict[int, int] = {}
        for qid, t, _ in rows:
            per_q[qid] = per_q.get(qid, 0) + stats.get(t, 0)
        stats_out["max_query_hit_rows"] = max(per_q.values(), default=0)
    return spark.createDataFrame(rows, QTERMS_SCHEMA)


def fill_score(cfg: EngineConfig) -> float:
    """The dense-knn fill score: what a zero-overlap document scores
    under the reference's NaiveIndex full scan (cos=0 ⇒ dist=1 ⇒
    ``1 − tanh(α)``, src/index/naive.jl:15-32 + index.jl:186-202).
    Scalar so sparse plans can append fill rows without scoring the
    corpus."""
    from garamond_jl_spark.functions.scoring import score_transform
    return score_transform(1.0, cfg.score_alpha)


# NOTE on sizing the wide (query_id, doc_id) score aggregation: the
# per-task state ceiling is handled by AQE's initialPartitionNum
# (session.py) — every shuffle starts wide, coalescing shrinks small
# stages, and map-side partial aggregation stays intact.  An explicit
# repartition-by-grouping-keys "last resort" was tried in round 5 and
# REMOVED: it discards partial aggregation, so the 2400-query protocol
# shuffled the RAW ~6G-row join output (~150 GB, disk-filling) instead
# of the ~2.4G combined rows — strictly worse at every reachable
# scale (BENCH.md r5).  ``embed_queries``'s ``stats_out`` row estimate
# remains available to callers as observability.
def score_all(index: InvertedIndex, qterms: DataFrame) -> DataFrame:
    """Sparse scored hits (query_id, doc_id, score) — NO ranking window,
    NO pad.  Only documents sharing ≥1 term with the query appear; the
    caller appends :func:`fill_score` rows for zero-overlap docs if the
    reference's dense-knn fill semantics are needed.

    This is the scale path for "full result set" consumers (combined
    search+filter, multi-searcher aggregation): since cosine ≥ 0, every
    row here outranks every absent doc, so downstream top-k never needs
    corpus-wide scoring — the round-1 ``full=True`` plan's per-query
    corpus window and 2·n_docs cross-join are both gone."""
    joined = (F.broadcast(qterms)
              .join(pruned_postings(index, qterms)
                    .select("term", "doc_id", "wnorm"), "term"))
    hits = (joined
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.col("qw") * F.col("wnorm")).alias("cos")))
    score = score_transform_expr(F.lit(1.0) - F.col("cos"),
                                 index.cfg.score_alpha)
    return hits.select("query_id", "doc_id", score.alias("score"))


# phase-1 salt fan-out for the two-phase top-k window (see topk_plan):
# bounds any single ranking task at ~hits/TOPK_SALTS rows
TOPK_SALTS = 32
# engage the two-phase window only when the per-query hit estimate says
# a single ranking task would sort this many rows or more — ordinary
# batches keep the one-window plan (the blanket two-phase cost the
# 200-query headline ~0.9 s, BENCH.md r5)
TOPK_TWO_PHASE_ROWS = 500_000


def topk_plan(index: InvertedIndex, qterms: DataFrame, k: int,
              tiebreak_round: int | None = None,
              pad_to_k: bool = True,
              n_queries: int | None = None,
              agg_rows_hint: int | None = None,
              max_rows_hint: int | None = None) -> DataFrame:
    """The scoring DAG on the flat postings table → (query_id, doc_id,
    score, rank).  ``tiebreak_round`` rounds the score before ranking so
    cross-engine float noise cannot flip near-ties (used by the DuckDB
    parity harness; rank identity vs the oracle uses exact floats).

    ``pad_to_k`` replicates the reference's dense-knn fill semantics:
    ``NaiveIndex`` dots the query against EVERY document
    (src/index/naive.jl:15-32), so zero-overlap docs score
    ``1 − tanh(α·1)`` and pad the top-k (tie order: ascending doc_id,
    sortperm stability).  Since cosine ≥ 0, every matching doc outranks
    every non-matching doc, so padding needs only the globally lowest
    ``2k`` doc_ids (≤ k of which can be displaced by matches) — a tiny
    ``limit`` scan, not a full-corpus score."""
    cfg = index.cfg
    joined = (F.broadcast(qterms)
              .join(pruned_postings(index, qterms)
                    .select("term", "doc_id", "wnorm"), "term"))
    hits = (joined
            .groupBy("query_id", "doc_id")
            .agg(F.sum(F.col("qw") * F.col("wnorm")).alias("cos")))
    oov_hits = None
    if cfg.oov_policy == "large_vector":
        # E8 :large_vector (dtv.jl:53-58 + defaults.jl:26-27): an
        # all-OOV document embeds as the constant DEFAULT_OOV_VAL
        # vector over the |V|-term space; L2-normalized that is
        # 1/√|V| in every component, so against the normalized query
        # it scores cos = Σ qw / √|V| — a per-query scalar.  These
        # docs are REAL hits (score strictly above the cos=0 fill), so
        # they are appended regardless of ``pad_to_k``.  They tie among
        # themselves (doc_id asc), so the 2k lowest all-OOV ids cover
        # every slot they could take.
        n_terms = float(index.meta.get("n_terms")
                        or index.terms.count())
        oov_cos = (qterms.groupBy("query_id")
                   .agg((F.sum("qw") / F.lit(n_terms ** 0.5))
                        .alias("cos")))
        res = index.resident
        if res is not None and k <= res.pad_k:
            # warm posture: the 2k lowest all-OOV ids are driver-held
            spark = qterms.sparkSession
            oov_low = spark.createDataFrame(
                [(i,) for i in res.oov_low_ids[:2 * k]], "doc_id LONG")
        else:
            oov_low = (index.docs.where(F.col("doclen") == 0)
                       .orderBy("doc_id").limit(2 * k).select("doc_id"))
        oov_hits = oov_cos.crossJoin(oov_low) \
            .select("query_id", "doc_id", "cos")
    if pad_to_k:
        qids = qterms.select("query_id").distinct()
        res = index.resident
        if res is not None and k <= res.pad_k:
            # warm posture: pad ids (and the all-OOV exclusion) are
            # pure driver math over the resident prefix — the per-
            # request docs scan disappears.  Same rows as the lazy
            # plan: prefix-of-sorted = the 2k lowest, and filtering
            # the prefix to doclen>0 = the lazy semi-join.
            spark = qterms.sparkSession
            low_pairs = res.low_ids[:2 * k]
            if oov_hits is not None:
                low_pairs = [(d, p) for d, p in low_pairs if p]
            low = spark.createDataFrame(
                [(d,) for d, _ in low_pairs], "doc_id LONG")
            # membership probe RESTRICTED to the pad-candidate ids:
            # (qid, d) ∈ hits ⟺ doc d has ≥1 posting on one of qid's
            # terms, so this tiny filtered re-join decides the anti-
            # join without re-evaluating the full scored aggregation
            # (the lazy plan's `hits` right side re-ran the whole agg
            # per request — measured 2.1 s of a 5 s warm request at
            # 1M docs, BENCH.md r5 warm-serving table)
            probe = (F.broadcast(qterms.select("query_id", "term"))
                     .join(pruned_postings(index, qterms)
                           .select("term", "doc_id")
                           .where(F.col("doc_id").isin(
                               [d for d, _ in low_pairs])), "term")
                     .select("query_id", "doc_id").distinct())
            pad = (qids.crossJoin(low)
                   .join(probe, ["query_id", "doc_id"], "left_anti")
                   .withColumn("cos", F.lit(0.0)))
        else:
            low = index.docs.orderBy("doc_id").limit(2 * k) \
                .select("doc_id")
            pad = (qids.crossJoin(low)
                   .join(hits.select("query_id", "doc_id"),
                         ["query_id", "doc_id"], "left_anti")
                   .withColumn("cos", F.lit(0.0)))
            if oov_hits is not None:
                # the cos=0 pad must not double-cover the all-OOV docs
                pad = pad.join(index.docs.where(F.col("doclen") > 0)
                               .select("doc_id"), "doc_id", "left_semi")
        hits = hits.unionByName(pad)
    if oov_hits is not None:
        hits = hits.unionByName(oov_hits)
    score = score_transform_expr(F.lit(1.0) - F.col("cos"), cfg.score_alpha)
    hits = hits.withColumn("score", score)
    rank_on = (F.round(F.col("score"), tiebreak_round)
               if tiebreak_round is not None else F.col("score"))
    order = [rank_on.desc(), F.col("doc_id").asc()]
    if n_queries == 1 and k <= 10_000:
        # (k bound = Spark's topKSortFallbackThreshold: beyond it the
        # sort+limit stops compiling to TakeOrdered and the windowed
        # plan below is the better shape)
        # single-request serving path: orderBy+limit compiles to
        # TakeOrderedAndProject — per-partition top-k merged on the
        # driver, NO ranking exchange at all (the same selection and
        # tiebreak as the window; the k-row rank window below is a
        # single trivial task).  A request at 1M docs drops ~0.6 s of
        # window shuffling (BENCH.md r5 warm-serving table).
        top = hits.orderBy(*order).limit(k)
        w = Window.orderBy(*order)
        return (top.withColumn("rank", F.row_number().over(w))
                .select("query_id", "doc_id", "score", "rank"))
    # two-phase top-k for heavy queries: a hot query can match most of
    # the corpus, and a single per-query window sorts ALL its hits in
    # ONE task (measured 0.7 s for a 630k-hit query at 1M docs; fatal
    # at 100× that).  Phase 1 ranks within (query_id, doc_id-hash
    # salt) — every salt's top-k is a superset of its contribution to
    # the global top-k, so phase 2's window sees ≤ k·SALTS rows per
    # query.  Rank-identical by construction (same ordering keys,
    # deterministic doc_id tiebreak); pinned by test_rank_identity's
    # salt-invariance case.  Engaged from the exact per-query row
    # estimate (embed_queries stats_out): ordinary batches keep the
    # single window and its one shuffle.
    # engage on the WORST query's exact row estimate when available
    # (ADVICE r5: the mean dilutes a single hot query in a large batch
    # — 2400 ordinary queries hide one that matches most of the corpus);
    # the batch-mean fallback covers callers without per-query stats
    per_query = (max_rows_hint if max_rows_hint is not None
                 else (agg_rows_hint or 0) / max(n_queries or 1, 1))
    if TOPK_SALTS > 1 and per_query >= TOPK_TWO_PHASE_ROWS:
        w1 = Window.partitionBy("query_id", "_salt").orderBy(*order)
        hits = (hits
                .withColumn("_salt", F.pmod(F.xxhash64("doc_id"),
                                            F.lit(TOPK_SALTS)))
                .withColumn("_r1", F.row_number().over(w1))
                .where(F.col("_r1") <= k).drop("_salt", "_r1"))
    w = Window.partitionBy("query_id").orderBy(*order)
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


AUTO_MIN_EXACT_ROWS = 2_000_000   # below this the exact plan is cheap
AUTO_ADVANTAGE = 4.0              # required modeled-cost ratio for impact


def choose_plan(index: InvertedIndex, queries: list[str],
                p: int = 1024) -> str:
    """Batch-statistics plan selection for ``search(plan="auto")``.

    The exact plan's aggregation input is Σ_t df_t · q_t rows (q_t =
    queries sharing term t — hot terms inflate multiplicatively; the
    tracked round-1 risk).  The impact plan touches ≤ |terms|·p champion
    rows plus Σ_t min(df_t, p) · q_t candidate-rescore rows, at the cost
    of a few driver round-trips (certificate).  Pick impact only when
    the modeled exact cost is large in absolute terms AND dominates the
    impact cost by :data:`AUTO_ADVANTAGE` — both thresholds calibrated
    in bench/plan_auto.py (BENCH.md round 3).

    One extra filtered read of the terms table (the same statistics scan
    ``embed_queries`` performs); tokenization is driver-side and tiny.
    """
    from garamond_jl_spark.functions.textprep import tokenize_with_config
    tok = index.tokenizer or (lambda s: tokenize_with_config(s, index.cfg))
    q_count: dict[str, int] = {}
    for q in queries:
        for t in set(tok(q)):
            q_count[t] = q_count.get(t, 0) + 1
    if not q_count:
        return "exact"
    if index.resident is not None:
        stats = index.resident.df_of(sorted(q_count))
    else:
        stats = _df_stats(index, sorted(q_count))
    exact_rows = sum(stats[t] * q for t, q in q_count.items()
                     if t in stats)
    impact_rows = (len(stats) * p
                   + sum(min(stats[t], p) * q for t, q in q_count.items()
                         if t in stats))
    if exact_rows < AUTO_MIN_EXACT_ROWS:
        return "exact"
    return "impact" if exact_rows > AUTO_ADVANTAGE * impact_rows else "exact"


def search(spark: SparkSession, index: InvertedIndex, queries: list[str],
           k: int = 10, hydrate: bool = True,
           tiebreak_round: int | None = None,
           pad_to_k: bool = True, plan: str = "exact",
           stats: dict | None = None) -> DataFrame:
    """Batched top-k search; optionally hydrates doc metadata (J2).

    ``plan`` selects the physical strategy — all three are
    rank-identical (certificate / proven):
    * ``exact`` (default) — broadcast-join score of every posting of
      the query's terms; best for warm columnar postings.
    * ``impact`` — champion-list candidates + exactness certificate
      (operators/impact.py); wins on hot-term batches (7.4× at 200 q /
      1M docs, BENCH.md).
    * ``wand`` — block-max pruning over packed blocks
      (operators/wand.py); for cold compressed storage.
    * ``auto`` — :func:`choose_plan` picks exact/impact from the batch's
      term statistics (hot-shared-term batches route to impact).

    ``stats``: optional dict populated with {"plan": chosen} (and the
    impact certificate counters when that plan runs).
    """
    if plan == "auto":
        plan = choose_plan(index, queries)
    if index.cfg.oov_policy == "large_vector" and plan != "exact":
        # the impact certificate and WAND θ-pruning do not model the
        # constant OOV fill vectors — route to the exact plan, which
        # implements the E8 semantics in its pad
        plan = "exact"
    if stats is not None:
        stats["plan"] = plan
    if plan == "impact":
        from garamond_jl_spark.operators.impact import impact_topk
        hits = impact_topk(spark, index, queries, k=k,
                           tiebreak_round=tiebreak_round, pad_to_k=pad_to_k,
                           stats=stats)
    elif plan == "wand":
        from garamond_jl_spark.operators.wand import wand_topk
        hits = wand_topk(spark, index, queries, k=k,
                         tiebreak_round=tiebreak_round, pad_to_k=pad_to_k)
    elif plan == "exact":
        # batch memoization (r6): identical query strings tokenize and
        # embed identically, so the scoring DAG runs once per DISTINCT
        # query and the per-qid results fan back out through a tiny
        # broadcast map.  Real batches repeat hot queries; the score-
        # aggregation input shrinks by the duplication factor (the
        # exact plan's cost is Σ_t df_t·q_t — guide §2.3 "shuffle fewer
        # bytes").  With no duplicates rep ids equal the original ids
        # and the plan is unchanged.  An OOV representative yields no
        # rows, so its duplicates correctly yield none either.
        uniq: dict[str, int] = {}
        rep_of = [uniq.setdefault(q, len(uniq)) for q in queries]
        reps = list(uniq)
        est: dict = {}
        qterms = embed_queries(spark, index, reps, stats_out=est)
        hits = topk_plan(index, qterms, k, tiebreak_round, pad_to_k,
                         n_queries=len(reps),
                         agg_rows_hint=est.get("expected_hit_rows"),
                         max_rows_hint=est.get("max_query_hit_rows"))
        if len(reps) < len(queries):
            fan = F.broadcast(spark.createDataFrame(
                [(rep, qid) for qid, rep in enumerate(rep_of)],
                "_rep LONG, query_id LONG"))
            hits = (hits.withColumnRenamed("query_id", "_rep")
                    .join(fan, "_rep")
                    .select("query_id", "doc_id", "score", "rank"))
    else:
        raise ValueError(f"unknown plan: {plan!r}")
    if not hydrate:
        return hits
    # J2 result hydration: hits are ≤ |queries|·k rows — broadcast them
    return (index.docs.join(F.broadcast(hits), "doc_id")
            .select("query_id", "doc_id", "score", "rank",
                    *[c for c in index.docs.columns if c != "doc_id"]))
