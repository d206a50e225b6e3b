"""Query lifecycle: request → plan selection → DataFrame DAG → response
(SURVEY.md §3.1/§3.3 Spark mapping).

Reference counterparts:
* ``InternalRequest`` — /root/reference/src/server/requests.jl:4-21
* ``respond`` operation dispatch — src/server/search.jl:51-127
* plan selection (filter-only / search-only / combined, post-filter
  intersection) — src/search/main.jl:1-56
* rank on explicit ids with linear scores — src/search/rank.jl:37-58,
  src/search/results.jl:35-39
* recommend = seed row → structured query → search with seed excluded —
  src/search/recommend.jl:28-37

The transports (REST/WS/unix socket) are deliberately NOT reproduced —
this module is the engine-side respond(); any thin HTTP layer can call
it (SURVEY.md §7.6 non-goal).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from functools import reduce

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from garamond_jl_spark.functions.query_parser import parse_input
from garamond_jl_spark.operators.build import InvertedIndex
from garamond_jl_spark.operators.filters import filter_predicate, indexfilter
from garamond_jl_spark.operators.query import (embed_queries, fill_score,
                                               score_all, topk_plan)
from garamond_jl_spark.plugins import get_ranker, get_recommender


@dataclass
class InternalRequest:
    """requests.jl:4-21 port (fields used by the engine)."""
    operation: str = "search"
    query: str = ""
    max_matches: int = 1000
    search_method: str = "exact"
    max_suggestions: int = 0
    return_fields: list[str] = field(default_factory=list)
    custom_weights: dict[str, float] = field(default_factory=dict)
    sort_fields: list[str] = field(default_factory=list)
    sort_reverse: bool = False
    response_size: int = 10
    response_page: int = 1
    input_parser: str = "base_input_parser"
    ranker: str = "noop_ranker"
    recommender: str = "search_recommender"
    searchable_filters: list[str] = field(default_factory=list)
    # rank on round(score, n) with doc_id tiebreak — cross-engine
    # determinism for oracle comparisons (None = raw score)
    tiebreak_round: int | None = None


@dataclass
class SearchEnv:
    """env.jl:5-12 analog: data + index + config handles.

    ``searchers``: optional additional (searcher, score_weight) pairs —
    the reference's multi-searcher environment (searchers built over
    different embeddable fields / weighting configs share one data
    table and their results aggregate, src/search/results.jl:54-145).
    ``index`` is searcher 0 with weight ``score_weight``.  A searcher is
    either an :class:`InvertedIndex` (classic BM25) or any object with
    the ``sparse_hits(spark, query) -> DataFrame|None`` /
    ``fill_score() -> float`` interface — e.g.
    :class:`~garamond_jl_spark.operators.semantic.BOESearcher`, giving
    the reference's HETEROGENEOUS config-2 env (a classic searcher and
    a Word2Vec/BOE searcher under one ``id_aggregation``,
    test/configs/configgenerator.jl:54-116).

    ``id_key`` names the id column of the RAW loaded data (env.jl:41
    db_check_id_key); the index's docs table is always addressed as
    ``doc_id`` — ``build_index`` renames ``id_col`` on the way in, so
    every engine-side plan below uses the uniform name regardless of
    what the source column was called.
    """
    spark: SparkSession
    index: InvertedIndex
    id_key: str = "doc_id"
    score_weight: float = 1.0
    searchers: list[tuple[object, float]] = field(default_factory=list)
    aggregation: str = "mean"   # defaults.jl:29 DEFAULT strategy :mean
    # set by plans.env_config.build_search_env — the handles the
    # reference's env_operator :reindex needs (env.jl:10-12 keeps
    # config_path on the env; searcher ids come from the config's
    # per-searcher "id"): config-built envs can selectively rebuild one
    # searcher by id (env_operations.jl:35-64)
    config_path: str | None = None
    searcher_ids: list[str] = field(default_factory=list)
    # suggestion distance for OOV query terms (defaults.jl
    # HEURISTIC_TO_DISTANCE via the primary searcher's ``heuristic``
    # config key): one of functions/suggest.DISTANCES, or None for no
    # suggestions (the reference's DEFAULT_HEURISTIC=nothing).  Directly
    # built envs keep the historical levenshtein default.
    suggest_metric: str | None = "levenshtein"
    # per enabled searcher: its ``id_aggregation`` group (results.jl:
    # 54-96 merges the searchers that SHARE a group id; None = the
    # shared environment-level id, i.e. everything merges — the
    # reference's default where id_aggregation falls back to the
    # environment id)
    agg_ids: list[str | None] = field(default_factory=list)

    @property
    def schema(self) -> dict[str, str]:
        """db_create_schema analog (db.jl:1-9): name → SQL type."""
        return {f.name: f.dataType.simpleString()
                for f in self.index.docs.schema.fields}


def _linear_scores(ranked: DataFrame) -> DataFrame:
    """results.jl:35-39: linear descending scores range(1, 0) over the
    ranked id list."""
    cnt = ranked.count()
    denom = max(cnt - 1, 1)
    return ranked.select(
        "doc_id",
        (F.lit(1.0) - (F.col("rank") - 1) / F.lit(denom)).alias("score"),
        "rank")


def search(env: SearchEnv, request: InternalRequest,
           _searcher_subset: list[int] | None = None) -> DataFrame:
    """main.jl:1-56: parse input, pick one of the three plan shapes,
    execute as one DataFrame DAG → (doc_id, score, rank).

    ``_searcher_subset``: positions into [index] + searchers to merge
    (used by :func:`search_grouped` for the reference's per-
    ``id_aggregation`` result groups); None = every searcher, the
    reference's default where all searchers share the environment
    aggregation id."""
    parsed = parse_input(env.schema, request.query, request.input_parser,
                         searchable_filters=request.searchable_filters,
                         keep_punct=(request.search_method == "regex"))
    k = min(request.max_matches,
            env.index.meta.get("n_live_docs", env.index.meta["n_docs"]))
    has_search = bool(parsed.search.strip())
    has_filter = bool(parsed.filter)
    docs = env.index.docs

    if has_filter and not has_search:
        # filter-only plan: indexfilter + build_result_from_ids
        # (main.jl:20-31); sort per T3 with id tiebreak for determinism
        cols = set(docs.columns)
        preds = [filter_predicate(kk, vv) for kk, vv in parsed.filter.items()
                 if kk in cols]
        filtered = docs.where(reduce(lambda a, b: a & b, preds)) \
            if preds else docs
        sort_keys = [s for s in (request.sort_fields or ["doc_id"])
                     if s in cols]
        order = [F.col(s).desc() if request.sort_reverse else F.col(s).asc()
                 for s in sort_keys] + [F.col("doc_id").asc()]
        # distributed top-k first (TakeOrdered — no global window over
        # the full table), then rank the ≤k survivors
        cols_needed = list(dict.fromkeys(["doc_id", *sort_keys]))
        top = filtered.select(*cols_needed).orderBy(*order).limit(k)
        w = Window.orderBy(*order)
        ranked = (top.withColumn("rank", F.row_number().over(w))
                  .select("doc_id", "rank"))
        return _linear_scores(ranked)

    if not has_search:
        return env.spark.createDataFrame(
            [], "doc_id LONG, score DOUBLE, rank INT")

    all_sets = [(env.index, env.score_weight)] + list(env.searchers)
    if request.custom_weights:
        # results.jl:79: each searcher's score_weight multiplies the
        # request's custom weight for its id at aggregation time (ids
        # come from the config via env.searcher_ids; searchers of a
        # hand-built env have no ids and keep weight × 1).  The
        # reference applies custom weights only inside __aggregate —
        # the single-searcher plan below is unaffected there too.
        ids = env.searcher_ids
        all_sets = [
            (s, w * float(request.custom_weights.get(
                ids[p] if p < len(ids) else None, 1.0)))
            for p, (s, w) in enumerate(all_sets)]
    chosen = (all_sets if _searcher_subset is None
              else [all_sets[p] for p in _searcher_subset])
    primary = chosen[0][0]
    multi = (len(chosen) > 1
             or not isinstance(primary, InvertedIndex))
    if not multi and not has_filter:
        # search-only, single classic searcher: standard batched top-k
        qt = embed_queries(env.spark, primary, [parsed.search],
                           isregex=(request.search_method == "regex"))
        return topk_plan(primary, qt, k,
                         tiebreak_round=request.tiebreak_round,
                         pad_to_k=True,
                         n_queries=1).select("doc_id", "score", "rank")

    # --- sparse "full result set" paths (combined / multi-searcher) ---
    # Round-1's full=True plan scored the WHOLE corpus per query (a
    # 2·n_docs cross-join pad + a single-partition corpus window whose
    # rank was immediately dropped).  Sparse replacement: score only
    # docs sharing a term with the query (score_all), intersect the P10
    # filter BEFORE top-k (per-doc agg commutes with the semi-join), and
    # append dense-knn fill rows only from the (filtered) 2k lowest
    # doc_ids — since cosine ≥ 0, every match outranks every fill row,
    # so ≤ k fill candidates can ever be displaced.  PLANS.md §round-2
    # records the .explain() audit.
    ids = indexfilter(docs, parsed.filter, id_key="doc_id") \
        if has_filter else None

    def sparse_hits(index: InvertedIndex) -> DataFrame | None:
        """None ⇔ the query is OOV for this searcher (is_embedded gate);
        an embedded query with zero (filtered) matches returns an EMPTY
        frame — downstream it still yields fill-scored docs, exactly as
        the reference's dense scan would.

        Under ``oov_policy="large_vector"`` (E8, dtv.jl:53-58) the
        all-OOV documents are REAL hits at the constant-fill-vector
        score transform(1 − Σqw/√|V|) — appended here so both the
        single- and multi-searcher branches inherit the semantics; that
        score is ≥ the :none fill, so the pad invariants are
        unchanged."""
        qt = embed_queries(env.spark, index, [parsed.search],
                           isregex=(request.search_method == "regex"))
        rows = qt.collect()                 # |query terms| rows — tiny
        if not rows:
            return None
        h = score_all(index, qt).drop("query_id")  # single request query
        if index.cfg.oov_policy == "large_vector":
            import math
            from garamond_jl_spark.functions.scoring import score_transform
            n_terms = float(index.meta.get("n_terms")
                            or index.terms.count())
            cos_oov = sum(r["qw"] for r in rows) / math.sqrt(n_terms)
            s_oov = score_transform(1.0 - cos_oov, index.cfg.score_alpha)
            oov = (index.docs.where(F.col("doclen") == 0)
                   .select("doc_id")
                   .withColumn("score", F.lit(s_oov)))
            h = h.unionByName(oov)
        return h.join(ids, "doc_id", "left_semi") if has_filter else h

    pool = docs.select("doc_id") if ids is None else ids

    def searcher_hits(s) -> tuple[DataFrame | None, float]:
        """Uniform (sparse hits, fill) over both searcher kinds: a
        classic InvertedIndex or any sparse_hits/fill_score object
        (e.g. semantic.BOESearcher)."""
        if isinstance(s, InvertedIndex):
            return sparse_hits(s), fill_score(s.cfg)
        h = s.sparse_hits(env.spark, parsed.search)
        if h is not None and has_filter:
            h = h.join(ids, "doc_id", "left_semi")
        return h, s.fill_score()

    if multi:
        # §3.1 step 7: per-searcher result sets, weighted and merged by
        # the env aggregation strategy (A6).  A searcher whose query is
        # OOV contributes nothing (is_embedded gate) — matching the
        # round-1 behavior where its full set was empty.
        from garamond_jl_spark.operators.aggregate import (aggregate_results,
                                                           strategy_scalar)
        sets = [(*searcher_hits(ix), wgt) for ix, wgt in chosen]
        sets = [(h, wgt, s0) for h, s0, wgt in sets if h is not None]
        if not sets:
            return env.spark.createDataFrame(
                [], "doc_id LONG, score DOUBLE, rank INT")
        cands = sets[0][0].select("doc_id")
        for h, _, _ in sets[1:]:
            cands = cands.unionByName(h.select("doc_id"))
        cands = cands.distinct()
        # densify per embedded searcher over the candidate union only:
        # a doc unmatched by searcher i scores its fill s0_i, exactly
        # what the old corpus-wide pad produced for it
        dense = [(cands.join(h, "doc_id", "left")
                  .select("doc_id",
                          F.coalesce(F.col("score"), F.lit(s0))
                          .alias("score")), wgt)
                 for h, wgt, s0 in sets]
        hits = aggregate_results(dense, strategy=env.aggregation,
                                 ranked=False)
        # docs matched by NO searcher share one constant agg score
        fills = [wgt * s0 for _, wgt, s0 in sets]
        pad_score = strategy_scalar(fills, env.aggregation)
        pad_cands = cands
        # heterogeneous searchers (semantic cosines can be negative) may
        # score an embedded doc BELOW pad_score, so the usual
        # "limit 2k lowest ids, then anti-join" shortcut is unsound —
        # anti-join the candidates FIRST, then take the 2k lowest
        # non-candidate ids (≤ k pads can ever enter the top-k)
        low = (pool.join(pad_cands, "doc_id", "left_anti")
               .orderBy("doc_id").limit(2 * k))
        pad = low.withColumn("score", F.lit(float(pad_score)))
    else:
        hits = sparse_hits(primary)
        if hits is None:  # OOV query ⇒ no results (is_embedded gate)
            return env.spark.createDataFrame(
                [], "doc_id LONG, score DOUBLE, rank INT")
        pad_score = fill_score(primary.cfg)
        pad_cands = hits.select("doc_id")
        # BM25 cosine ≥ 0 ⇒ every match outranks every fill row, so the
        # cheap limit-then-anti construction is exact here
        low = pool.orderBy("doc_id").limit(2 * k)
        pad = (low.join(pad_cands, "doc_id", "left_anti")
               .withColumn("score", F.lit(float(pad_score))))

    if pad_score > 0:  # zero-score drop applies to fill rows too
        hits = hits.unionByName(pad)
    rank_on = (F.round(F.col("score"), request.tiebreak_round)
               if request.tiebreak_round is not None else F.col("score"))
    # distributed top-k (TakeOrdered) before the (≤k rows) ranking window
    hits = hits.orderBy(rank_on.desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(rank_on.desc(), F.col("doc_id").asc())
    return (hits.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "score", "rank"))




def search_grouped(env: SearchEnv, request: InternalRequest
                   ) -> dict[str, DataFrame]:
    """Per-``id_aggregation`` result groups (results.jl:48-96
    ``aggregate!``): searchers SHARING an aggregation id merge into one
    result under the env strategy; searchers with their own id keep a
    separate result — the reference returns this list of SearchResults,
    here a dict {aggregation id → (doc_id, score, rank)}.

    ``env.agg_ids`` aligns with [index] + searchers (set by
    plans.env_config from each searcher's ``id_aggregation`` key); a
    None entry means the shared environment-level id — the reference's
    default, where everything merges (so an env with no explicit
    ``id_aggregation`` returns exactly ``{"__env__": search(env, req)}``).
    Filter-only and empty requests have no per-searcher results in the
    reference either — they produce the single environment entry."""
    parsed = parse_input(env.schema, request.query, request.input_parser,
                         searchable_filters=request.searchable_filters,
                         keep_punct=(request.search_method == "regex"))
    ids = env.agg_ids or []
    ids = (list(ids) + [None] * (1 + len(env.searchers)))[
        :1 + len(env.searchers)]
    if not parsed.search.strip() or all(g is None for g in ids):
        return {"__env__": search(env, request)}
    groups: dict[str, list[int]] = {}
    for pos, gid in enumerate(ids):
        groups.setdefault(gid if gid is not None else "__env__",
                          []).append(pos)
    return {gid: search(env, request, _searcher_subset=pos)
            for gid, pos in groups.items()}


def search_many(env: SearchEnv, requests: list[InternalRequest]
                ) -> DataFrame:
    """Batched lifecycle search: N requests → ONE DataFrame DAG →
    (request_id, doc_id, score, rank) — the multi-request twin of
    :func:`search`, closing the round-3 gap where every dense searcher
    ran a per-request corpus job (an N-query mixed-env batch launched
    O(N) jobs; this path launches O(#searchers)).

    Per searcher the whole batch embeds in one createDataFrame + join
    (``embed_queries`` for classic indexes — already batch-shaped —
    and :meth:`DenseVectorSearcher.sparse_hits_batch` for dense ones,
    which replaces the per-query driver projection loops of
    embed_query); the merge/fill/pad algebra of the single path is
    re-expressed with query_id riding every key.  Requests that need
    the filter plans (P10) fall back to :func:`search` individually —
    the batched shape is the search-only hot path, matching the classic
    engine's batched ``topk_plan``.

    Batched (search-only) requests must share ``tiebreak_round`` (one
    ranking key per window); fallback requests rank individually and
    may use any round."""
    spark = env.spark
    if any(r.operation != "search" for r in requests):
        raise ValueError("search_many handles operation='search' only")

    parsed = [parse_input(env.schema, r.query, r.input_parser,
                          searchable_filters=r.searchable_filters)
              for r in requests]
    n_live = env.index.meta.get("n_live_docs", env.index.meta["n_docs"])
    batch: list[int] = []      # request indexes served by the batch plan
    fallback: list[int] = []   # filter-only / combined → single path
    for i, p in enumerate(parsed):
        # regex requests embed through the vocabulary-expansion path
        # and custom_weights reweight the per-searcher merge — both are
        # single-request plans; batching them here would silently run
        # them as plain exact searches with env weights
        if (p.search.strip() and not p.filter
                and requests[i].search_method != "regex"
                and not requests[i].custom_weights):
            batch.append(i)
        else:
            fallback.append(i)

    out_schema = "request_id INT, doc_id LONG, score DOUBLE, rank INT"
    parts: list[DataFrame] = []
    for i in fallback:
        parts.append(search(env, requests[i])
                     .select(F.lit(i).alias("request_id"),
                             "doc_id", "score", "rank"))

    if batch:
        # the ranking window is shared by every BATCHED request (one
        # ranking key per window); fallback requests rank individually
        # inside search(), so their tiebreak_round is unconstrained
        rounds = {requests[i].tiebreak_round for i in batch}
        if len(rounds) > 1:
            raise ValueError(
                "search_many requires a uniform tiebreak_round across "
                "batched (search-only) requests")
        tiebreak_round = next(iter(rounds))
        queries = [parsed[i].search for i in batch]
        ks = [(qid, min(requests[i].max_matches, n_live))
              for qid, i in enumerate(batch)]
        max_k = max(k for _, k in ks)
        if not env.searchers:
            qt = embed_queries(spark, env.index, queries)
            hits = topk_plan(env.index, qt, max_k,
                             tiebreak_round=tiebreak_round, pad_to_k=True)
        else:
            hits = _search_many_multi(env, queries, max_k, tiebreak_round)
        kdf = F.broadcast(spark.createDataFrame(ks, "query_id INT, k INT"))
        qmap = F.broadcast(spark.createDataFrame(
            [(qid, i) for qid, i in enumerate(batch)],
            "query_id INT, request_id INT"))
        parts.append(hits.join(kdf, "query_id")
                     .where(F.col("rank") <= F.col("k"))
                     .join(qmap, "query_id")
                     .select("request_id", "doc_id", "score", "rank"))

    if not parts:
        return spark.createDataFrame([], out_schema)
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def _search_many_multi(env: SearchEnv, queries: list[str], k: int,
                       tiebreak_round: int | None) -> DataFrame:
    """The multi-searcher merge of :func:`search`, batched: per-searcher
    sparse hit sets with query_id on every key, candidate-union
    densify + per-query fill, strategy aggregation, per-query pad from
    the lowest non-candidate ids, one ranking window."""
    from garamond_jl_spark.operators.aggregate import strategy_agg
    from garamond_jl_spark.operators.query import score_all
    spark = env.spark

    def classic_set(index: InvertedIndex, wgt: float):
        qt = embed_queries(spark, index, queries)
        emb = qt.select("query_id").distinct()
        h = score_all(index, qt)
        if index.cfg.oov_policy == "large_vector":
            # E8 batch form: per-query constant-fill-vector score for
            # the all-OOV docs (same math as the single path's s_oov)
            from garamond_jl_spark.functions.scoring import \
                score_transform_expr
            n_terms = float(index.meta.get("n_terms")
                            or index.terms.count())
            s_oov = (qt.groupBy("query_id")
                     .agg(score_transform_expr(
                         F.lit(1.0) - F.sum("qw") / F.lit(n_terms ** 0.5),
                         index.cfg.score_alpha).alias("score")))
            oov = s_oov.crossJoin(index.docs.where(F.col("doclen") == 0)
                                  .select("doc_id"))
            h = h.unionByName(oov.select("query_id", "doc_id", "score"))
        return h, emb, wgt, fill_score(index.cfg)

    sets = [classic_set(env.index, env.score_weight)]
    for s, wgt in env.searchers:
        if isinstance(s, InvertedIndex):
            sets.append(classic_set(s, wgt))
        else:
            h, emb = s.sparse_hits_batch(spark, queries)
            sets.append((h, emb, wgt, s.fill_score()))

    cands = sets[0][0].select("query_id", "doc_id")
    for h, _, _, _ in sets[1:]:
        cands = cands.unionByName(h.select("query_id", "doc_id"))
    cands = cands.distinct()

    long = None
    fills = None
    for h, emb, wgt, s0 in sets:
        dens = (cands.join(emb, "query_id", "left_semi")
                .join(h, ["query_id", "doc_id"], "left")
                .select("query_id", "doc_id",
                        (F.lit(wgt) * F.coalesce("score", F.lit(s0)))
                        .alias("wscore")))
        long = dens if long is None else long.unionByName(dens)
        fr = emb.select("query_id",
                        F.lit(wgt * s0).alias("wscore"))
        fills = fr if fills is None else fills.unionByName(fr)

    agg = strategy_agg(long.groupBy("query_id", "doc_id"),
                        env.aggregation).where(F.col("score") > 0)
    padsc = strategy_agg(fills.groupBy("query_id"), env.aggregation) \
        .withColumnRenamed("score", "pad_score") \
        .where(F.col("pad_score") > 0)

    # per-query pad: the k lowest NON-candidate doc ids.  Dense scores
    # can fall below the pad, so candidates must be excluded before the
    # low-id cut (same invariant as the single path); the low slice
    # grows geometrically until every query has k non-candidates in it
    # (one tiny job per doubling — candidates rarely monopolize the
    # lowest ids).
    qids = F.broadcast(spark.createDataFrame(
        [(q,) for q in range(len(queries))], "query_id INT"))
    n_docs = env.index.meta.get("n_live_docs", env.index.meta["n_docs"])
    L = 4 * k
    while True:
        low = env.index.docs.orderBy("doc_id").limit(L).select("doc_id")
        lowq = (qids.crossJoin(low)
                .join(cands, ["query_id", "doc_id"], "left_anti"))
        if L >= n_docs:
            break
        counts = {r["query_id"]: r["cnt"] for r in
                  lowq.groupBy("query_id").agg(F.count("*").alias("cnt"))
                  .collect()}
        if min((counts.get(q, 0) for q in range(len(queries))),
               default=k) >= k:
            break
        L *= 4
    wlow = Window.partitionBy("query_id").orderBy(F.col("doc_id").asc())
    pads = (lowq.withColumn("_r", F.row_number().over(wlow))
            .where(F.col("_r") <= k).drop("_r")
            .join(padsc, "query_id")
            .select("query_id", "doc_id",
                    F.col("pad_score").alias("score")))

    hits = agg.unionByName(pads)
    rank_on = (F.round(F.col("score"), tiebreak_round)
               if tiebreak_round is not None else F.col("score"))
    w = Window.partitionBy("query_id").orderBy(rank_on.desc(),
                                               F.col("doc_id").asc())
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= k)
            .select("query_id", "doc_id", "score", "rank"))


def rank_ids(env: SearchEnv, request: InternalRequest) -> DataFrame:
    """:rank operation (rank.jl:37-58): explicit id list in the query →
    ranker reorders → linear scores range(1, 0)."""
    ids = [int(t) for t in request.query.replace(",", " ").split()]
    ranker = get_ranker(request.ranker)
    ids, _ = ranker(ids, [0.0] * len(ids), request, env)
    denom = max(len(ids) - 1, 1)
    rows = [(d, 1.0 - i / denom, i + 1) for i, d in enumerate(ids)]
    out = env.spark.createDataFrame(rows, "doc_id LONG, score DOUBLE, rank INT")
    # keep only ids that exist in the table (J1 semi-join)
    return out.join(env.index.docs.select("doc_id"), "doc_id", "left_semi")


def recommend(env: SearchEnv, request: InternalRequest) -> DataFrame:
    """:recommend (recommend.jl:28-37): seed row → structured query →
    search path with the seed excluded (P9)."""
    seed_id = int(request.query.strip())
    recommender = get_recommender(request.recommender)
    gen_query = recommender(request, env)
    if not gen_query:
        return env.spark.createDataFrame(
            [], "doc_id LONG, score DOUBLE, rank INT")
    sub = InternalRequest(operation="search", query=gen_query,
                          max_matches=request.max_matches + 1,
                          input_parser="base_input_parser")
    hits = search(env, sub).where(F.col("doc_id") != F.lit(seed_id)) \
        .withColumnRenamed("rank", "_old_rank")
    w = Window.orderBy(F.col("_old_rank").asc())
    return (hits.withColumn("rank", F.row_number().over(w))
            .where(F.col("rank") <= request.max_matches).drop("_old_rank"))


def _respond_hits(env: SearchEnv, request: InternalRequest) -> DataFrame:
    """Operation dispatch (server/search.jl:51-127): the FULL ranked
    hit set, before pagination."""
    op = request.operation
    if op == "search":
        return search(env, request)
    if op == "rank":
        return rank_ids(env, request)
    if op == "recommend":
        return recommend(env, request)
    raise ValueError(f"unsupported operation: {op}")


def _paginate_hydrate(env: SearchEnv, request: InternalRequest,
                      hits: DataFrame) -> DataFrame:
    """Hydration (J2) + pagination (T4: response_size/response_page
    windowing, server/search.jl:151-152)."""
    lo = (request.response_page - 1) * request.response_size
    hi = lo + request.response_size
    hits = hits.where((F.col("rank") > lo) & (F.col("rank") <= hi))
    cols = [c for c in (request.return_fields
                        or [c for c in env.index.docs.columns
                            if c != "doc_id"])
            if c in env.index.docs.columns and c != "doc_id"]
    docs = env.index.docs.select("doc_id", *cols)
    return docs.join(F.broadcast(hits), "doc_id") \
               .select("doc_id", "score", "rank", *cols)


def respond(env: SearchEnv, request: InternalRequest) -> DataFrame:
    """Operation dispatch + hydration + pagination."""
    return _paginate_hydrate(env, request, _respond_hits(env, request))


def response_json(env: SearchEnv, request: InternalRequest) -> str:
    """F15 response building: collect the (small, paginated) respond()
    result and JSON-encode it — the serving-layer boundary
    (/root/reference/src/server/search.jl:135-170 build_response;
    transports themselves are out of engine scope)."""
    import json
    hits = _respond_hits(env, request)
    # the reference's n_total_results counts ALL matches BEFORE the
    # page window (search.jl:141) — a client paging through 100 hits
    # must see 100 on every page, not the page length.  ONE execution
    # of the ranking DAG: collect the (≤ max_matches) ranked id set,
    # derive the total and the page slice driver-side, and hydrate only
    # the page rows through a LocalRelation join — a hits.count() here
    # would re-run the whole ranking plan a second time per request.
    hit_rows = hits.collect()
    n_total = len(hit_rows)
    lo = (request.response_page - 1) * request.response_size
    hi = lo + request.response_size
    page = [r for r in hit_rows if lo < r["rank"] <= hi]
    page_df = env.spark.createDataFrame(page, hits.schema)
    rows = [r.asDict()
            for r in _paginate_hydrate(env, request, page_df).collect()]
    rows.sort(key=lambda r: r["rank"])
    suggestions: dict[str, list[str]] = {}
    if (request.max_suggestions > 0 and request.operation == "search"
            and env.suggest_metric is not None):
        # A8/F10: suggestions for query tokens missing from the vocab
        # (src/search/index.jl:116-127; disabled by default like the
        # reference heuristic=nothing, defaults.jl:18).  The distance
        # comes from the primary searcher's ``heuristic`` config key
        # (env.suggest_metric; None ⇒ no suggestions even when the
        # request asks).  jaro distances live in [0,1] — its band is
        # the reference BKTree's small-radius regime, not edit counts.
        from garamond_jl_spark.functions.query_parser import parse_input
        from garamond_jl_spark.functions.suggest import (missing_needles,
                                                         suggest_terms)
        from garamond_jl_spark.functions.textprep import prepare_and_tokenize
        parsed = parse_input(env.schema, request.query, request.input_parser)
        toks = prepare_and_tokenize(parsed.search, env.index.cfg)
        missed = missing_needles(env.index.terms, toks)
        if missed:
            max_d = 0.25 if env.suggest_metric == "jaro" else 2
            for r in suggest_terms(env.index.terms, missed,
                                   max_distance=max_d,
                                   max_suggestions=request.max_suggestions,
                                   metric=env.suggest_metric) \
                    .collect():
                suggestions.setdefault(r["needle"], []).append(r["suggestion"])
    return json.dumps({
        "operation": request.operation,
        "query": request.query,
        "n_total_results": n_total,
        "results": rows,
        "suggestions": suggestions,
    }, default=str)
