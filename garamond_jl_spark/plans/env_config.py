"""Config-file driven environment build: JSON → :class:`SearchEnv`.

Reference counterparts:
* ``build_search_env(config_path)`` — /root/reference/src/searchable/
  env.jl:29-83 (load data, check id key, build embedders, build
  searchers, assemble the environment);
* ``parse_configuration`` — src/searchable/config_parser.jl:62-360
  (JSON keys, soft defaulting with warnings for bad parameter VALUES,
  hard abort for structural problems: no searchers/embedders, duplicate
  ids, searchers referencing unknown embedders).

The same split is kept here: value-level problems (unknown ``vectors``,
bad ``aggregation`` …) warn and fall back to the reference defaults;
structural problems raise :class:`ConfigError` (the
``SearchEnvConsistencyException`` analog, env.jl:16-18).

Embedder kinds supported (mirroring config_parser.jl's classic /
semantic branch at :142-214):

* classic — ``vectors`` ∈ {count, tf, tfidf, bm25}: an inverted-index
  (``operators/build.build_index``) searcher.  ``vectors_transform``
  ∈ {none, rp, lsa} additionally wraps the index in the corresponding
  dense DTV-transform searcher (operators/semantic.RPSearcher /
  LSASearcher).
* semantic — ``vectors`` ∈ {word2vec, glove, conceptnet}:
  ``doc2vec_method=boe`` over a word-vector table.  The reference loads
  pretrained embedding FILES; here ``embeddings_path`` may point at a
  parquet table (term, i, v), and when absent the deterministic
  synthetic vectors stand in (operators/semantic.synthetic_word_vectors
  — the sandbox has no embedding files; see semantic.py module note).

The first enabled searcher becomes ``SearchEnv.index`` (it must be
classic — the primary searcher carries the docs table and schema);
every further enabled searcher lands in ``SearchEnv.searchers`` with
its ``score_weight``, giving the heterogeneous multi-searcher env of
the reference's test config 2 out of a single JSON file.
"""

from __future__ import annotations

import json
import os
import warnings

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from garamond_jl_spark.config import (DEFAULT_SCORE_ALPHA, EngineConfig,
                                      REFERENCE_BM25_BETA,
                                      REFERENCE_BM25_KAPPA)
from garamond_jl_spark.operators.build import build_index
from garamond_jl_spark.plans.lifecycle import SearchEnv
from garamond_jl_spark.plugins import get_loader, get_sampler


class ConfigError(ValueError):
    """Structural configuration problem — the reference aborts the env
    build on these (config_parser.jl:324-360 'last checks',
    env.jl:16-18)."""


CLASSIC_VECTORS = ("count", "tf", "tfidf", "bm25")
SEMANTIC_VECTORS = ("word2vec", "glove", "conceptnet")
DEFAULT_VECTORS = "bm25"                 # defaults.jl:10
DEFAULT_TRANSFORM = "none"               # defaults.jl:11
DEFAULT_DOC2VEC = "boe"                  # defaults.jl:22
DEFAULT_OOV_POLICY = "none"              # defaults.jl:26
DEFAULT_AGGREGATION = "mean"             # defaults.jl:29
AGGREGATIONS = ("mean", "min", "max", "median", "product")


def _warn(eid: str, msg: str) -> None:
    warnings.warn(f"[{eid}] {msg}", stacklevel=3)


def parse_configuration(config_path: str) -> dict:
    """Read + validate the JSON config; returns the normalized dict.
    Mirrors config_parser.jl's behavior: soft value problems are
    defaulted with a warning, structural problems raise ConfigError."""
    path = os.path.abspath(os.path.expanduser(config_path))
    if not os.path.isfile(path):
        raise ConfigError(f"config file not found: {path}")
    try:
        with open(path) as fh:
            cfg = json.load(fh)
    except (json.JSONDecodeError, OSError) as e:
        raise ConfigError(f"could not parse configuration {path}: {e}")

    out = {
        "config_path": path,
        "data_loader_name": cfg.get("data_loader_name", "parquet_loader"),
        "data_loader_arguments": cfg.get("data_loader_arguments", []),
        "data_loader_kwarguments": cfg.get("data_loader_kwarguments", {}),
        "data_sampler_name": cfg.get("data_sampler_name",
                                     "identity_sampler"),
        "id_key": cfg.get("id_key", "doc_id"),
        "aggregation": cfg.get("aggregation", DEFAULT_AGGREGATION),
    }
    if out["aggregation"] not in AGGREGATIONS:
        _warn("env", f"Defaulting aggregation={DEFAULT_AGGREGATION}.")
        out["aggregation"] = DEFAULT_AGGREGATION

    embedders = []
    for i, e in enumerate(cfg.get("embedders", [])):
        eid = str(e.get("id", f"embedder_{i + 1}"))
        vectors = str(e.get("vectors", DEFAULT_VECTORS))
        if vectors not in CLASSIC_VECTORS + SEMANTIC_VECTORS:
            _warn(eid, f"Defaulting vectors={DEFAULT_VECTORS}.")
            vectors = DEFAULT_VECTORS
        classic = vectors in CLASSIC_VECTORS
        transform = str(e.get("vectors_transform", DEFAULT_TRANSFORM))
        if classic and transform not in ("none", "rp", "lsa"):
            _warn(eid, f"Defaulting vectors_transform={DEFAULT_TRANSFORM}.")
            transform = DEFAULT_TRANSFORM
        dim = int(e.get("vectors_dimension", 0) or 0)
        if classic and transform != "none" and dim <= 0:
            _warn(eid, "Defaulting vectors_dimension=64.")
            dim = 64
        doc2vec = str(e.get("doc2vec_method", DEFAULT_DOC2VEC))
        if not classic and doc2vec != "boe":
            # sif/borep/cpmean/disc embedders exist as functions
            # (operators/semantic.py) but are not yet wired as env
            # searchers — same soft-default spirit as the reference
            _warn(eid, f"Defaulting doc2vec_method={DEFAULT_DOC2VEC}.")
            doc2vec = DEFAULT_DOC2VEC
        oov = str(e.get("oov_policy", DEFAULT_OOV_POLICY))
        if oov not in ("none", "large_vector"):
            _warn(eid, f"Defaulting oov_policy={DEFAULT_OOV_POLICY}.")
            oov = DEFAULT_OOV_POLICY
        ngram = int(e.get("ngram_complexity", 1))
        if ngram < 1:
            _warn(eid, "Defaulting ngram_complexity=1.")
            ngram = 1
        embedders.append({
            "id": eid,
            "vectors": vectors,
            "classic": classic,
            "vectors_transform": transform if classic else "none",
            "vectors_dimension": dim,
            "doc2vec_method": doc2vec,
            "oov_policy": oov,
            "ngram_complexity": ngram,
            "kappa": float(e.get("kappa", REFERENCE_BM25_KAPPA)),
            "beta": float(e.get("beta", REFERENCE_BM25_BETA)),
            "embeddable_fields": list(e.get("embeddable_fields", [])),
            "embeddings_path": e.get("embeddings_path"),
            "embeddings_seed": int(e.get("embeddings_seed", 0)),
            "lowercase": bool(e.get("lowercase", True)),
            "strip_accents": bool(e.get("strip_accents", True)),
            "strip_stopwords": bool(e.get("strip_stopwords", False)),
            "token_pattern": e.get("token_pattern", r"[a-z0-9_]+"),
        })

    searchers = []
    for i, s in enumerate(cfg.get("searchers", [])):
        sid = str(s.get("id", f"searcher_{i + 1}"))
        # search_index (config_parser.jl / configgenerator.jl): the
        # reference's :naive/:brutetree/:kdtree are exact scans → naive;
        # :ivfadc → the full IVFADC structure (coarse lists + PQ/ADC
        # ordering before the searcher's exact rerank); :hnsw → the lsh
        # bucket index (the distributed stand-in for the same sublinear
        # job, SURVEY §7.6); native names lsh/ivf accepted directly
        raw_ix = str(s.get("search_index", "naive")).lower()
        index_map = {"naive": "naive", "brutetree": "naive",
                     "kdtree": "naive", "hnsw": "lsh", "ivfadc": "ivfadc",
                     "lsh": "lsh", "ivf": "ivf"}
        if raw_ix not in index_map:
            _warn(sid, "Defaulting search_index=naive.")
            raw_ix = "naive"
        searchers.append({
            "id": sid,
            "enabled": bool(s.get("enabled", True)),
            "data_embedder": s.get("data_embedder"),
            "score_alpha": float(s.get("score_alpha", DEFAULT_SCORE_ALPHA)),
            "score_weight": float(s.get("score_weight", 1.0)),
            "search_index": index_map[raw_ix],
            "search_index_arguments": dict(
                s.get("search_index_arguments", {})),
        })

    # --- last checks (config_parser.jl:324-360): structural — abort ----
    if not searchers:
        raise ConfigError("No searcher configurations parsed!")
    if not embedders:
        raise ConfigError("No embedder configurations parsed!")
    sids = [s["id"] for s in searchers]
    if len(sids) != len(set(sids)):
        raise ConfigError("Searcher ids are not unique!")
    eids = [e["id"] for e in embedders]
    if len(eids) != len(set(eids)):
        raise ConfigError("Embedder ids are not unique!")
    unknown = {s["data_embedder"] for s in searchers} - set(eids)
    if unknown:
        raise ConfigError(f"Embedders: {sorted(unknown)} are unknown!")

    out["embedders"] = embedders
    out["searchers"] = searchers
    return out


def _embeddable_text(df: DataFrame, fields: list[str], eid: str):
    """Concatenate the embeddable fields into one text column (the
    reference's dbentry2text over embeddable_fields,
    embedder/interface.jl:170-176)."""
    cols = [f for f in fields if f in df.columns]
    if fields and not cols:
        raise ConfigError(
            f"[{eid}] none of embeddable_fields {fields} exist in the data")
    if not cols:
        # default: every string column (DEFAULT_EMBEDDABLE_FIELDS spirit)
        cols = [f.name for f in df.schema.fields
                if f.dataType.simpleString() == "string"]
        if not cols:
            raise ConfigError(f"[{eid}] no string columns to embed")
    if len(cols) == 1:
        return df, cols[0]
    return df.withColumn("_embeddable", F.concat_ws(" ", *cols)), \
        "_embeddable"


def build_search_env(spark: SparkSession, config_path: str,
                     _keep: dict[str, object] | None = None) -> SearchEnv:
    """JSON config file → fully built :class:`SearchEnv` (env.jl:29-83).

    The first enabled searcher (which must reference a CLASSIC embedder)
    becomes ``env.index``; further enabled searchers become
    ``env.searchers`` entries — classic ones as additional
    InvertedIndexes, ``rp``/``lsa``-transformed ones as dense DTV
    searchers over the primary index's postings, semantic ``boe`` ones
    as :class:`~garamond_jl_spark.operators.semantic.BOESearcher`."""
    cfg = parse_configuration(config_path)

    loader = get_loader(cfg["data_loader_name"])
    sampler = get_sampler(cfg["data_sampler_name"])
    data = sampler(loader(spark, *cfg["data_loader_arguments"],
                          **cfg["data_loader_kwarguments"]))
    id_key = cfg["id_key"]
    if id_key not in data.columns:   # db_check_id_key (env.jl:41)
        raise ConfigError(
            f"id_key {id_key!r} is not a column of the loaded data "
            f"(have: {data.columns})")

    emb_by_id = {e["id"]: e for e in cfg["embedders"]}
    enabled = [s for s in cfg["searchers"] if s["enabled"]]
    if not enabled:
        raise ConfigError("No enabled searchers!")

    def engine_config(e: dict, score_alpha: float) -> EngineConfig:
        return EngineConfig(
            kappa=e["kappa"], beta=e["beta"], score_alpha=score_alpha,
            weighting=e["vectors"], lowercase=e["lowercase"],
            strip_accents=e["strip_accents"],
            strip_stopwords=e["strip_stopwords"],
            token_pattern=e["token_pattern"],
            ngram_complexity=e["ngram_complexity"],
            oov_policy=e["oov_policy"])

    def build_classic(e: dict, score_alpha: float):
        df, text_col = _embeddable_text(data, e["embeddable_fields"],
                                        e["id"])
        return build_index(spark, df, engine_config(e, score_alpha),
                           id_col=id_key, text_col=text_col)

    def word_vector_table(e: dict, df: DataFrame, text_col: str):
        from garamond_jl_spark.operators.semantic import \
            synthetic_word_vectors
        if e["embeddings_path"]:
            if not os.path.exists(e["embeddings_path"]):
                # reference: "Missing embeddings, ignoring search
                # configuration..." — but an explicitly configured path
                # that does not exist is a structural error here
                raise ConfigError(
                    f"[{e['id']}] embeddings_path does not exist: "
                    f"{e['embeddings_path']}")
            return spark.read.parquet(e["embeddings_path"])
        dim = e["vectors_dimension"] or 16
        vocab = (df.select(F.explode(F.split(F.col(text_col), " "))
                           .alias("term")).where(F.col("term") != ""))
        return synthetic_word_vectors(vocab, dim=dim,
                                      seed=e["embeddings_seed"])

    def attach_index(searcher, s: dict):
        """search_index != naive attaches a sublinear candidate index
        to a DENSE searcher (the reference's searcher-owns-an-index,
        searcher.jl:120-125); a classic inverted index IS its own
        sublinear structure, so the knob warns and no-ops there."""
        from garamond_jl_spark.operators.build import InvertedIndex
        from garamond_jl_spark.operators.semantic import \
            DenseVectorSearcher
        kind = s["search_index"]
        if kind == "naive":
            return searcher
        if isinstance(searcher, InvertedIndex) or not isinstance(
                searcher, DenseVectorSearcher):
            _warn(s["id"], "search_index applies to dense searchers "
                           "only; ignoring.")
            return searcher
        return searcher.with_candidate_index(
            kind, **s["search_index_arguments"])

    def build_searcher(s: dict):
        from garamond_jl_spark.operators.semantic import (BOESearcher,
                                                          LSASearcher,
                                                          RPSearcher)
        e = emb_by_id[s["data_embedder"]]
        if e["classic"]:
            idx = build_classic(e, s["score_alpha"])
            if e["vectors_transform"] == "rp":
                return attach_index(
                    RPSearcher(idx, dim_out=e["vectors_dimension"],
                               seed=e["embeddings_seed"],
                               score_alpha=s["score_alpha"]), s)
            if e["vectors_transform"] == "lsa":
                return attach_index(
                    LSASearcher.from_index(
                        idx, dim_out=e["vectors_dimension"],
                        score_alpha=s["score_alpha"]), s)
            if s["search_index"] != "naive":
                _warn(s["id"], "search_index applies to dense searchers "
                               "only; ignoring.")
            return idx
        df, text_col = _embeddable_text(data, e["embeddable_fields"],
                                        e["id"])
        wv = word_vector_table(e, df, text_col)
        tokens = (df.select(F.col(id_key).alias("doc_id"),
                            F.explode(F.split(F.col(text_col), " "))
                            .alias("term"))
                  .where(F.col("term") != "")
                  .groupBy("doc_id", "term")
                  .agg(F.count("*").alias("tf")))
        return attach_index(
            BOESearcher.from_tokens(tokens, wv,
                                    score_alpha=s["score_alpha"]), s)

    def make(s: dict):
        if _keep is not None and s["id"] in _keep:
            return _keep[s["id"]]
        return build_searcher(s)

    first = make(enabled[0])
    from garamond_jl_spark.operators.build import InvertedIndex
    if not isinstance(first, InvertedIndex):
        raise ConfigError(
            "the first enabled searcher must use a classic embedder with "
            "vectors_transform=none (it provides the docs table/schema)")
    rest = [(make(s), s["score_weight"]) for s in enabled[1:]]
    return SearchEnv(spark=spark, index=first, id_key=id_key,
                     score_weight=enabled[0]["score_weight"],
                     searchers=rest, aggregation=cfg["aggregation"],
                     config_path=config_path,
                     searcher_ids=[s["id"] for s in enabled])


def reindex_searchers(env: SearchEnv, which: str = "*") -> SearchEnv:
    """The env_operator ``:reindex`` analog for config-built envs
    (env_operations.jl:35-64): re-parse the env's config file, re-load
    the data through its loader/sampler, and rebuild the SELECTED
    searcher(s) — ``which`` is a searcher id from the config, or
    ``"*"`` for all — while the non-selected searcher objects are kept
    as-is (the reference copies ``env.searchers[i]`` across untouched,
    stale against the re-loaded data by design).  Returns a NEW env;
    the caller swaps it in (the reference's channel put!)."""
    if not env.config_path:
        raise ConfigError(
            "selective reindex needs a config-built env (build_search_env "
            "records config_path); this env has none")
    if which in ("", "*"):
        keep: dict[str, object] | None = None
    else:
        if which not in env.searcher_ids:
            raise ConfigError(
                f"no searcher with id {which!r} in this env "
                f"(have: {env.searcher_ids})")
        objs = [env.index] + [s for s, _ in env.searchers]
        keep = {sid: obj for sid, obj in zip(env.searcher_ids, objs)
                if sid != which}
    return build_search_env(env.spark, env.config_path, _keep=keep)
