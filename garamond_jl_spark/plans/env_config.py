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
DOC2VEC_METHODS = ("boe", "sif", "borep", "cpmean", "disc")
DEFAULT_OOV_POLICY = "none"              # defaults.jl:26
DEFAULT_AGGREGATION = "mean"             # defaults.jl:29
AGGREGATIONS = ("mean", "min", "max", "median", "product")
DEFAULT_SIF_ALPHA = 0.01                 # defaults.jl DEFAULT_SIF_ALPHA
DEFAULT_BOREP_DIMENSION = 1024           # defaults.jl
DEFAULT_BOREP_POOLING = "sum"            # defaults.jl (:sum | :max)
DEFAULT_DISC_NGRAM = 2                   # defaults.jl
EMBEDDINGS_KINDS = ("binary", "text", "parquet")  # defaults.jl (:binary |
# :text are the reference's file kinds; parquet is this engine's native)
# config_parser.jl:137-140 warns+defaults outside the reference's
# SUPPORTED_LANGUAGES list (defaults.jl)
SUPPORTED_LANGUAGES = ("english", "german", "romanian", "french",
                       "italian", "dutch")
DEFAULT_LANGUAGE = "english"
# defaults.jl HEURISTIC_TO_DISTANCE keys → functions/suggest.py metrics
HEURISTIC_TO_METRIC = {"levenshtein": "levenshtein",
                       "dameraulevenshtein": "damerau",
                       "hamming": "hamming", "jaro": "jaro"}
# text_strip_flags: the reference forwards a StringAnalysis UInt32
# bitmask straight to prepare() (embedder/interface.jl:63,171).  The
# bit layout belongs to that library, so a raw integer is not portable;
# this engine accepts the flag NAMES as a JSON list and maps them onto
# the textprep knobs (functions/textprep.prepare_and_tokenize).  The
# "inherent" names are always-on behaviors of the tokenizer (it
# replaces punctuation/whitespace and decodes UTF-8 by construction) —
# accepted and inert.
TEXT_STRIP_INHERENT = frozenset({"strip_punctuation", "strip_whitespace",
                                 "strip_corrupt_utf8",
                                 "strip_non_letters"})
TEXT_STRIP_KNOWN = TEXT_STRIP_INHERENT | {
    "strip_case", "strip_accents", "strip_articles",
    "strip_prepositions", "strip_pronouns", "strip_stopwords",
    "strip_numbers"}
# defaults.jl DEFAULT_VECTORS_ELTYPE is Float32; this engine's scoring
# pipeline is Float64 end-to-end (every parity oracle pins doubles), so
# the DEFAULT here is Float64 — a documented deviation.  An explicit
# Float32 quantizes dense doc-embedding STORAGE to f32 precision
# (computation stays double).
VECTORS_ELTYPES = ("Float32", "Float64")
DEFAULT_VECTORS_ELTYPE = "Float64"


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
        "vectors_eltype": str(cfg.get("vectors_eltype",
                                      DEFAULT_VECTORS_ELTYPE)),
    }
    if out["aggregation"] not in AGGREGATIONS:
        _warn("env", f"Defaulting aggregation={DEFAULT_AGGREGATION}.")
        out["aggregation"] = DEFAULT_AGGREGATION
    if out["vectors_eltype"].lower() in ("float32", "float64"):
        out["vectors_eltype"] = out["vectors_eltype"].capitalize()
    if out["vectors_eltype"] not in VECTORS_ELTYPES:
        _warn("env", f"Defaulting vectors_eltype={DEFAULT_VECTORS_ELTYPE}.")
        out["vectors_eltype"] = DEFAULT_VECTORS_ELTYPE

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
        if not classic and doc2vec not in DOC2VEC_METHODS:
            # config_parser.jl:186-189
            _warn(eid, f"Defaulting doc2vec_method={DEFAULT_DOC2VEC}.")
            doc2vec = DEFAULT_DOC2VEC
        sif_alpha = float(e.get("sif_alpha", DEFAULT_SIF_ALPHA))
        borep_dim = int(e.get("borep_dimension", DEFAULT_BOREP_DIMENSION))
        if doc2vec == "borep" and borep_dim <= 0:
            # config_parser.jl:199-203
            _warn(eid, f"Defaulting borep_dimension={DEFAULT_BOREP_DIMENSION}.")
            borep_dim = DEFAULT_BOREP_DIMENSION
        borep_pool = str(e.get("borep_pooling_function",
                               DEFAULT_BOREP_POOLING))
        if doc2vec == "borep" and borep_pool not in ("sum", "max"):
            _warn(eid, f"Defaulting borep_pooling_function="
                       f"{DEFAULT_BOREP_POOLING}.")
            borep_pool = DEFAULT_BOREP_POOLING
        disc_ngram = int(e.get("disc_ngram", DEFAULT_DISC_NGRAM))
        if doc2vec == "disc" and disc_ngram <= 0:
            # config_parser.jl:208-213
            _warn(eid, f"Defaulting disc_ngram={DEFAULT_DISC_NGRAM}.")
            disc_ngram = DEFAULT_DISC_NGRAM
        language = str(e.get("language", DEFAULT_LANGUAGE)).lower()
        if language not in SUPPORTED_LANGUAGES:
            # config_parser.jl:137-140
            _warn(eid, f"Defaulting language={DEFAULT_LANGUAGE}.")
            language = DEFAULT_LANGUAGE
        stem = bool(e.get("stem_words", False))
        if stem:
            # stemmers shipped: english (Porter), german/french
            # (Snowball, functions/snowball.py).  Remaining supported
            # languages (romanian/italian/dutch) have none yet —
            # stem_words soft-defaults off for those, same posture
            # the reference takes for a missing Snowball language.
            from garamond_jl_spark.functions.snowball import stemmer_for
            if stemmer_for(language) is None:
                _warn(eid, "stem_words=true has no shipped stemmer for "
                           f"language={language} (english/german/french "
                           "available); defaulting stem_words=false.")
                stem = False
        ekind = str(e.get("embeddings_kind", "parquet"))
        if ekind not in EMBEDDINGS_KINDS:
            # config_parser.jl:181-184 (reference kinds :binary/:text
            # are file-format hints; embeddings_path here is parquet)
            _warn(eid, "Defaulting embeddings_kind=parquet.")
            ekind = "parquet"
        raw_flags = e.get("text_strip_flags")
        strip_flags = None
        if raw_flags is not None:
            if isinstance(raw_flags, list):
                names = [str(x) for x in raw_flags]
                bad = sorted(set(names) - TEXT_STRIP_KNOWN)
                if bad:
                    _warn(eid, f"unknown text_strip_flags {bad} ignored.")
                strip_flags = [n for n in names if n in TEXT_STRIP_KNOWN]
            else:
                _warn(eid, "integer text_strip_flags are a StringAnalysis "
                           "bitmask and not portable; pass flag NAMES as "
                           "a list. Defaulting text_strip_flags=None.")
        ekw = e.get("embedder_kwarguments", {})
        if not isinstance(ekw, dict):
            # config_parser.jl:221-225
            _warn(eid, "Defaulting embedder_kwarguments={}.")
            ekw = {}
        glove_vocab = e.get("glove_vocabulary")
        if (vectors == "glove" and ekind == "binary"
                and (glove_vocab is None
                     or not os.path.isfile(str(glove_vocab)))):
            # config_parser.jl:192-197: a binary GloVe embedder without
            # a vocabulary file errors inside the per-embedder try and
            # the embedder is IGNORED (dropped) with a warning
            _warn(eid, "glove_vocabulary missing for binary GloVe "
                       "embeddings; ignoring embedder.")
            continue
        if ekind != "parquet" and e.get("embeddings_path"):
            # the reference reads :binary/:text word-vector FILES;
            # this engine reads (term, i, v) parquet tables only —
            # attempting the read later would crash mid-build with an
            # opaque 'not a Parquet file' error, so drop the embedder
            # inside the per-embedder try like the reference does
            _warn(eid, f"embeddings_kind={ekind} files are not readable "
                       "in this engine (embeddings_path must be a "
                       "parquet (term,i,v) table); ignoring embedder.")
            continue
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
            "description": str(e.get("description", "")),
            "vectors": vectors,
            "classic": classic,
            "vectors_transform": transform if classic else "none",
            "vectors_dimension": dim,
            "doc2vec_method": doc2vec,
            "sif_alpha": sif_alpha,
            "borep_dimension": borep_dim,
            "borep_pooling_function": borep_pool,
            "disc_ngram": disc_ngram,
            "language": language,
            "stem_words": stem,
            "text_strip_flags": strip_flags,
            "embeddings_kind": ekind,
            "glove_vocabulary": glove_vocab,
            "embedder_kwarguments": ekw,
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
        # reference's :naive/:brutetree/:kdtree are exact scans → naive
        # (kdtree's in-memory space-partitioning tree is a single-node
        # structure; the exact scan is its honest distributed
        # counterpart); :ivfadc → the full IVFADC structure (coarse
        # lists + PQ/ADC ordering before the searcher's exact rerank);
        # :hnsw → sharded HNSW graphs (operators/ann.HNSWCandidateIndex
        # — the real hnsw.jl counterpart, replacing the round-3 LSH
        # stand-in); native names lsh/ivf accepted directly.
        # The metric follows the reference index family: naive is
        # cosine (naive.jl:15-32), brutetree/kdtree/hnsw are Euclidean
        # ("Uses Euclidean distance by default", brutetree.jl:22,
        # kdtree.jl:20, hnsw.jl:33); ivfadc keeps the engine's pinned
        # cosine rerank (its parity rows predate the metric knob).
        raw_ix = str(s.get("search_index", "naive")).lower()
        index_map = {"naive": "naive", "brutetree": "naive",
                     "kdtree": "naive", "hnsw": "hnsw", "ivfadc": "ivfadc",
                     "lsh": "lsh", "ivf": "ivf"}
        if raw_ix not in index_map:
            _warn(sid, "Defaulting search_index=naive.")
            raw_ix = "naive"
        metric = ("euclidean" if raw_ix in ("brutetree", "kdtree", "hnsw")
                  else "cosine")
        # the reference splits positional ``search_index_arguments``
        # (a list, config_parser.jl:263) from ``search_index_kwarguments``
        # (a dict, :264-268); this engine's index builders are
        # keyword-only, so a dict under either key becomes kwargs
        # (kwarguments win on collision) and a non-empty LIST of
        # positionals is warned away (soft default [])
        ix_args = s.get("search_index_arguments", {})
        ix_kwargs = s.get("search_index_kwarguments", {})
        if not isinstance(ix_kwargs, dict):
            _warn(sid, "Defaulting search_index_kwarguments={}.")
            ix_kwargs = {}
        if isinstance(ix_args, list):
            if ix_args:
                _warn(sid, "positional search_index_arguments are not "
                           "supported (builders are keyword-only); "
                           "defaulting search_index_arguments=[].")
            ix_args = {}
        elif not isinstance(ix_args, dict):
            _warn(sid, "Defaulting search_index_arguments=[].")
            ix_args = {}
        heuristic = s.get("heuristic")   # absent/None ⇒ no suggestions
        if heuristic is not None:
            heuristic = str(heuristic).lower()
            if heuristic not in HEURISTIC_TO_METRIC:
                # config_parser.jl:297-300 (DEFAULT_HEURISTIC is nothing)
                _warn(sid, "Defaulting heuristic=None.")
                heuristic = None
        indexable = s.get("indexable_fields")
        if indexable is not None and not isinstance(indexable, list):
            _warn(sid, "Defaulting indexable_fields=None.")
            indexable = None
        data_emb = s.get("data_embedder")
        if data_emb is None:
            # config_parser.jl requires it; leaving it None would also
            # crash the unknown-embedder sort below with a TypeError
            raise ConfigError(f"[{sid}] searcher has no data_embedder")
        # embedder ids are str()-coerced above — coerce the REFERENCES
        # the same way or a self-consistent config with integer ids
        # fails the unknown-embedder check
        data_emb = str(data_emb)
        searchers.append({
            "id": sid,
            "description": str(s.get("description", "")),
            "id_aggregation": str(s.get("id_aggregation", "")) or None,
            "enabled": bool(s.get("enabled", True)),
            "data_embedder": data_emb,
            # searcher.jl:163 embeds the QUERY with the input embedder;
            # defaults to the data embedder (config_parser.jl:276)
            "input_embedder": str(s.get("input_embedder") or data_emb),
            "heuristic": heuristic,
            "indexable_fields": indexable,
            "score_alpha": float(s.get("score_alpha", DEFAULT_SCORE_ALPHA)),
            "score_weight": float(s.get("score_weight", 1.0)),
            "search_index": index_map[raw_ix],
            "metric": metric,
            "search_index_arguments": {**ix_args, **ix_kwargs},
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
    # config_parser.jl:344-350 validates BOTH the data and the input
    # embedder ids of every searcher
    used = ({s["data_embedder"] for s in searchers}
            | {s["input_embedder"] for s in searchers})
    unknown = used - set(eids)
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
        kw = dict(
            kappa=e["kappa"], beta=e["beta"], score_alpha=score_alpha,
            weighting=e["vectors"], lowercase=e["lowercase"],
            strip_accents=e["strip_accents"],
            strip_stopwords=e["strip_stopwords"],
            token_pattern=e["token_pattern"],
            stem_words=e["stem_words"],
            language=e["language"],
            ngram_complexity=e["ngram_complexity"],
            oov_policy=e["oov_policy"])
        fl = e.get("text_strip_flags")
        if fl is not None:
            # explicit flag names OVERRIDE the boolean knobs — the
            # reference's flags fully determine prepare()'s behavior
            fset = set(fl)
            kw["lowercase"] = "strip_case" in fset
            kw["strip_accents"] = "strip_accents" in fset
            kw["strip_stopwords"] = bool(
                fset & {"strip_articles", "strip_prepositions",
                        "strip_pronouns", "strip_stopwords"})
            if "strip_numbers" in fset:
                kw["token_pattern"] = r"[a-z_]+"
        if not kw["lowercase"]:
            # the default token patterns assume lowercased text; when
            # case is preserved (lowercase=false, or strip_case absent
            # from text_strip_flags) uppercase letters must stay word
            # characters, not token separators
            kw["token_pattern"] = {
                r"[a-z0-9_]+": r"[A-Za-z0-9_]+",
                r"[a-z_]+": r"[A-Za-z_]+",
            }.get(kw["token_pattern"], kw["token_pattern"])
        if not kw["strip_accents"]:
            # accents preserved (strip_accents absent from
            # text_strip_flags): accented Latin letters must stay word
            # characters — a French/German corpus tokenized with the
            # ASCII default pattern would split 'continuité' at the é.
            # Letter-only ranges of Latin-1 Supplement + Extended-A/B:
            # the raw À-ɏ span also swept in × (U+00D7) and ÷ (U+00F7),
            # which are NOT letters — '3×4'-style text tokenized the
            # operators into terms (ADVICE r5).
            acc = "À-ÖØ-öø-ɏ"
            kw["token_pattern"] = {
                r"[a-z0-9_]+": rf"[a-z0-9_{acc}]+",
                r"[a-z_]+": rf"[a-z_{acc}]+",
                r"[A-Za-z0-9_]+": rf"[A-Za-z0-9_{acc}]+",
                r"[A-Za-z_]+": rf"[A-Za-z_{acc}]+",
            }.get(kw["token_pattern"], kw["token_pattern"])
        return EngineConfig(**kw)

    def build_classic(e: dict, score_alpha: float,
                      fields: list[str] | None = None):
        df, text_col = _embeddable_text(data,
                                        fields or e["embeddable_fields"],
                                        e["id"])
        return build_index(spark, df, engine_config(e, score_alpha),
                           id_col=id_key, text_col=text_col)

    wv_dim_cache: dict[str, int] = {}

    def _wv_dim(e: dict) -> int:
        """The word-vector dimensionality build_semantic/_dense_dim
        lay blocks out with.  An external embeddings_path table's TRUE
        dim is its max component index (1-based) — falling back to 16
        there would block-offset cpmean/borep/disc embeddings built
        over a e.g. 300-dim table into overlapping garbage."""
        if e["vectors_dimension"]:
            return int(e["vectors_dimension"])
        path = e["embeddings_path"]
        if path:
            if path not in wv_dim_cache:
                mx = spark.read.parquet(path).agg(F.max("i")).first()[0]
                if mx is None:
                    raise ConfigError(
                        f"embeddings_path {path!r} is empty — cannot "
                        "infer vectors_dimension; set vectors_dimension "
                        "explicitly or provide a non-empty table. Note "
                        "the table must be DENSE in i (every vector "
                        "stores all components, zeros included): dim is "
                        "inferred as max(i), so a sparse table whose top "
                        "component is never stored under-reports dim.")
                wv_dim_cache[path] = int(mx)
            return wv_dim_cache[path]
        return 16

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
        vocab = (df.select(F.explode(F.split(F.col(text_col), " "))
                           .alias("term")).where(F.col("term") != ""))
        return synthetic_word_vectors(vocab, dim=_wv_dim(e),
                                      seed=e["embeddings_seed"])

    def attach_index(searcher, s: dict):
        """search_index != naive attaches a sublinear candidate index
        to a DENSE searcher (the reference's searcher-owns-an-index,
        searcher.jl:120-125) and sets the family's metric
        (brutetree/kdtree/hnsw → Euclidean rerank); a classic inverted
        index IS its own sublinear structure, so the knob warns and
        no-ops there.  Unknown search_index_kwarguments soft-default
        away (config_parser.jl's @warn + default posture) instead of
        aborting the build."""
        import inspect

        from garamond_jl_spark.operators.ann import (HNSWCandidateIndex,
                                                     IVFADCIndex,
                                                     IVFCandidateIndex,
                                                     LSHCandidateIndex)
        from garamond_jl_spark.operators.build import InvertedIndex
        from garamond_jl_spark.operators.semantic import \
            DenseVectorSearcher
        kind = s["search_index"]
        dense = (isinstance(searcher, DenseVectorSearcher)
                 and not isinstance(searcher, InvertedIndex))
        if not dense:
            if kind != "naive":
                _warn(s["id"], "search_index applies to dense searchers "
                               "only; ignoring.")
            return searcher
        searcher.with_metric(s["metric"])
        if kind == "naive":
            return searcher
        kwargs = dict(s["search_index_arguments"])
        if kind == "hnsw":
            # the graph searches the metric the rerank scores: raw
            # Euclidean under the hnsw mapping, normalized (angular)
            # only if a caller overrode the metric to cosine
            kwargs.setdefault("normalize", s["metric"] == "cosine")
        builder = {"lsh": LSHCandidateIndex, "ivf": IVFCandidateIndex,
                   "ivfadc": IVFADCIndex, "hnsw": HNSWCandidateIndex}[kind]
        allowed = set(inspect.signature(builder.build).parameters)
        bad = sorted(set(kwargs) - allowed)
        if bad:
            _warn(s["id"], f"dropping search_index_kwarguments {bad} "
                           f"unknown to the {kind} index.")
            kwargs = {k: v for k, v in kwargs.items() if k in allowed}
        return searcher.with_candidate_index(kind, **kwargs)

    def _quantize_f32(searcher):
        """vectors_eltype=Float32: quantize dense doc-embedding STORAGE
        to f32 precision (scoring arithmetic stays double — the
        reference's T=Float32 touches scores too; the engine's parity
        oracles pin doubles, so this is the documented halfway point).

        Also PERSISTS the doc embeddings: a config-built env is a
        long-lived serving structure (the reference materializes its
        embedding matrices at build, searcher.jl:60-89), and without a
        persist every request would re-run the whole doc-embedding DAG
        (an .explain audit of one CPMean request showed ~130 exchanges,
        nearly all the per-query recomputed build half)."""
        if cfg["vectors_eltype"] == "Float32":
            searcher.doc_embeddings = searcher.doc_embeddings.withColumn(
                "dv", F.col("dv").cast("float").cast("double"))
        searcher.doc_embeddings = searcher.doc_embeddings.persist()
        return searcher

    def build_semantic(e: dict, s: dict):
        """One doc2vec_method=... dense searcher over the loaded data
        (config_parser.jl:186-214's semantic branch — boe/sif/borep/
        cpmean/disc all dispatch here)."""
        from garamond_jl_spark.operators.semantic import (BOESearcher,
                                                          BOREPSearcher,
                                                          CPMeanSearcher,
                                                          DisCSearcher,
                                                          SIFSearcher)
        fields = s.get("indexable_fields") or e["embeddable_fields"]
        df, text_col = _embeddable_text(data, fields, e["id"])
        if e["lowercase"]:
            # the reference runs prepare() before embedding
            # (embedder/interface.jl:171); at minimum the case fold
            # must apply or every capitalized token misses a lowercase
            # word-vector vocabulary.  The split itself stays
            # whitespace (dense embedders carry no token_pattern).
            df = df.withColumn(text_col, F.lower(F.col(text_col)))
        for knob, is_set in (("stem_words", e["stem_words"]),
                             ("text_strip_flags",
                              e.get("text_strip_flags") is not None)):
            if is_set:
                # explicit non-defaults a user would expect to act
                _warn(e["id"], f"{knob} is not applied to semantic "
                               "embedders (lowercase + whitespace "
                               "tokens only).")
        wv = word_vector_table(e, df, text_col)
        wv_dim = _wv_dim(e)
        method = e["doc2vec_method"]
        alpha = s["score_alpha"]
        if method == "disc":
            tokens_pos = (df.select(
                F.col(id_key).alias("doc_id"),
                F.posexplode(F.split(F.col(text_col), " "))
                .alias("pos", "term"))
                .where(F.col("term") != ""))
            return DisCSearcher.from_tokens_pos(
                tokens_pos, wv, dim=wv_dim, n=e["disc_ngram"],
                score_alpha=alpha)
        tokens = (df.select(F.col(id_key).alias("doc_id"),
                            F.explode(F.split(F.col(text_col), " "))
                            .alias("term"))
                  .where(F.col("term") != "")
                  .groupBy("doc_id", "term")
                  .agg(F.count("*").alias("tf")))
        if method == "sif":
            return SIFSearcher.from_tokens(tokens, wv,
                                           alpha=e["sif_alpha"],
                                           score_alpha=alpha)
        if method == "borep":
            return BOREPSearcher.from_tokens(
                tokens, wv, dim_in=wv_dim, dim_out=e["borep_dimension"],
                pooling=e["borep_pooling_function"],
                seed=e["embeddings_seed"], score_alpha=alpha)
        if method == "cpmean":
            return CPMeanSearcher.from_tokens(tokens, wv, dim=wv_dim,
                                              score_alpha=alpha)
        return BOESearcher.from_tokens(tokens, wv, score_alpha=alpha)

    def _dense_dim(e: dict) -> int | None:
        """Output dimensionality of an embedder's DENSE embedding, or
        None when the embedder yields no dense space (plain classic)."""
        wv_dim = _wv_dim(e)
        if e["classic"]:
            return (e["vectors_dimension"]
                    if e["vectors_transform"] in ("rp", "lsa") else None)
        return {"boe": wv_dim, "sif": wv_dim,
                "borep": e["borep_dimension"], "cpmean": 4 * wv_dim,
                "disc": e["disc_ngram"] * wv_dim}[e["doc2vec_method"]]

    def bind_input_embedder(searcher, s: dict):
        """searcher.jl:163 embeds the QUERY with ``input_embedder``
        (may differ from the data embedder).  Supported here when the
        built searcher is dense and the input embedder is SEMANTIC with
        the same output dimensionality: a query-side instance of the
        input embedder (over the same loaded data — its document side
        stays lazy and unused) takes over ``embed_query`` /
        ``embed_queries_df``.  Classic searchers embed queries with
        their own index stats by construction; a differing input
        embedder there (or a dimension mismatch) warns and falls back
        to the data embedder — the reference would score vectors from
        disjoint spaces, which is never what a config means."""
        from garamond_jl_spark.operators.semantic import \
            DenseVectorSearcher
        if s["input_embedder"] in (None, s["data_embedder"]):
            return searcher
        e_in = emb_by_id[s["input_embedder"]]
        e_data = emb_by_id[s["data_embedder"]]
        if not isinstance(searcher, DenseVectorSearcher):
            _warn(s["id"], "input_embedder != data_embedder is only "
                           "supported for dense searchers; using the "
                           "data embedder for queries.")
            return searcher
        if e_in["classic"]:
            _warn(s["id"], "classic input_embedder over a dense searcher "
                           "is not supported; using the data embedder "
                           "for queries.")
            return searcher
        if _dense_dim(e_in) != _dense_dim(e_data):
            _warn(s["id"], "input_embedder dimensionality "
                           f"({_dense_dim(e_in)}) != data embedder's "
                           f"({_dense_dim(e_data)}); using the data "
                           "embedder for queries.")
            return searcher
        qe = build_semantic(e_in, s)
        searcher.embed_query = qe.embed_query
        searcher.embed_queries_df = qe.embed_queries_df
        return searcher

    def build_searcher(s: dict):
        from garamond_jl_spark.operators.semantic import (LSASearcher,
                                                          RPSearcher)
        e = emb_by_id[s["data_embedder"]]
        if e["classic"]:
            idx = build_classic(e, s["score_alpha"],
                                fields=s.get("indexable_fields"))
            if e["vectors_transform"] == "rp":
                return attach_index(bind_input_embedder(_quantize_f32(
                    RPSearcher(idx, dim_out=e["vectors_dimension"],
                               seed=e["embeddings_seed"],
                               score_alpha=s["score_alpha"])), s), s)
            if e["vectors_transform"] == "lsa":
                return attach_index(bind_input_embedder(_quantize_f32(
                    LSASearcher.from_index(
                        idx, dim_out=e["vectors_dimension"],
                        score_alpha=s["score_alpha"])), s), s)
            if s["search_index"] != "naive":
                _warn(s["id"], "search_index applies to dense searchers "
                               "only; ignoring.")
            elif s["metric"] != "cosine":
                _warn(s["id"], "brutetree/kdtree Euclidean scoring "
                               "applies to dense searchers only; the "
                               "classic searcher keeps the pinned BM25 "
                               "ranking.")
            if s["input_embedder"] not in (None, s["data_embedder"]):
                _warn(s["id"], "input_embedder != data_embedder is only "
                               "supported for dense searchers; using the "
                               "data embedder for queries.")
            return idx
        return attach_index(
            bind_input_embedder(_quantize_f32(build_semantic(e, s)), s), s)

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
    heuristic = enabled[0]["heuristic"]
    return SearchEnv(spark=spark, index=first, id_key=id_key,
                     score_weight=enabled[0]["score_weight"],
                     searchers=rest, aggregation=cfg["aggregation"],
                     config_path=config_path,
                     searcher_ids=[s["id"] for s in enabled],
                     # reference DEFAULT_HEURISTIC is nothing (no
                     # suggestions); config-built envs follow it
                     suggest_metric=(HEURISTIC_TO_METRIC[heuristic]
                                     if heuristic else None),
                     agg_ids=[s["id_aggregation"] for s in enabled])


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
    new_env = build_search_env(env.spark, env.config_path, _keep=keep)
    # release the REPLACED searchers' persisted doc embeddings: each
    # rebuild persists a fresh embedding set, and a long-lived serving
    # env reindexing in a loop would otherwise grow Spark storage by
    # one full set per cycle until executors evict or OOM
    kept = {id(o) for o in (keep or {}).values()}   # identity: dataclass
    for obj, _w in [(env.index, None)] + list(env.searchers):  # eq unhashable
        emb = getattr(obj, "doc_embeddings", None)
        if id(obj) not in kept and emb is not None:
            try:
                emb.unpersist()
            except Exception:
                pass
    return new_env
