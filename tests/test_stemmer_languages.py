"""Multi-language stemming (functions/snowball.py + the `language`
config key).  Reference: defaults.jl:134-143 SUPPORTED_LANGUAGES and the
Snowball-via-Languages.jl stem_words flag (interface.jl:63).

Fidelity posture: no Snowball runtime ships in this sandbox, so the
golden vectors are hand-traced through the published algorithm steps
(snowballstem.org) — each an unambiguous single-path trace — plus
retrieval-level round-trips (inflected document text found by the
lemma query), which is the property the config knob exists for."""

import json

import pytest

from garamond_jl_spark.config import EngineConfig, cfg_from_dict, cfg_to_dict
from garamond_jl_spark.functions.snowball import (french_stem, german_stem,
                                                  stemmer_for)
from garamond_jl_spark.functions.stemmer import porter_stem
from garamond_jl_spark.functions.textprep import tokenize_with_config

# hand-traced through the German algorithm (prelude → R1/R2 → steps 1-3
# → postlude); e.g. katzen: R1='zen', step1(b) 'en'→katz; bücher:
# R1='her', step1(a) 'er'→büch, postlude→buch; geheimnisse: step1(b)
# 'e' then the niss→nis final-s rule; freundlichkeit: step3 'keit' in
# R2 then 'lich' in R2; bauern: prelude marks baUern, R1 adjusts to 3,
# step1(a) 'ern'→bau.
GERMAN_GOLDEN = {
    "katzen": "katz", "katze": "katz", "bücher": "buch",
    "geheimnisse": "geheimnis", "arbeiten": "arbeit",
    "schönheit": "schonheit", "häuser": "haus", "laufen": "lauf",
    "kinder": "kind", "freundlichkeit": "freundlich",
    "bedeutungen": "bedeut", "bedeutung": "bedeut", "bauern": "bau",
    "aufeinander": "aufeinand",
}

# hand-traced through the French algorithm; e.g. continuer: steps 1/2a
# pass, 2b 'er' in RV→continu; continuité: step1 'ité' in R2→continu;
# heureusement: step1 'ement' in RV then eus→eux in R1; nationaux:
# step1 'aux'→'al' in R1; rapidement: 'ement' in RV→rapid.
FRENCH_GOLDEN = {
    "continuer": "continu", "continue": "continu",
    "continuité": "continu", "majestueux": "majestu",
    "nationale": "national", "nationaux": "national",
    "chanter": "chant", "chantait": "chant", "chanté": "chant",
    "rapidement": "rapid", "heureusement": "heureux",
    "animaux": "animal", "yeux": "yeux", "finissait": "fin",
    "logiquement": "logiqu",
}


def test_german_golden():
    for w, want in GERMAN_GOLDEN.items():
        assert german_stem(w) == want, w


def test_french_golden():
    for w, want in FRENCH_GOLDEN.items():
        assert french_stem(w) == want, w


def test_inflections_conflate_within_language():
    """The retrieval property: inflected forms share a stem."""
    assert german_stem("katzen") == german_stem("katze")
    assert german_stem("bedeutungen") == german_stem("bedeutung")
    assert french_stem("continuer") == french_stem("continue") \
        == french_stem("continuité")
    assert french_stem("nationale") == french_stem("nationaux")


def test_dispatch():
    assert stemmer_for("english") is porter_stem
    assert stemmer_for("german") is german_stem
    assert stemmer_for("French") is french_stem
    assert stemmer_for("romanian") is None
    assert stemmer_for("dutch") is None


def test_tokenizer_applies_language_stemmer():
    """The ONE canonical tokenizer stems per cfg.language; with the
    default strip_accents=True the umlaut folds BEFORE stemming
    (bücher→bucher→buch — same result here, by design of the
    postlude's umlaut removal)."""
    cfg = EngineConfig(stem_words=True, language="german")
    assert tokenize_with_config("Katzen und Bücher", cfg) == \
        ["katz", "und", "buch"]
    cfg_en = EngineConfig(stem_words=True)   # language defaults english
    assert tokenize_with_config("running flies", cfg_en) == \
        ["run", "fli"]


def test_language_round_trips_through_meta():
    cfg = EngineConfig(stem_words=True, language="french")
    back = cfg_from_dict(cfg_to_dict(cfg))
    assert back.language == "french" and back.stem_words is True


def _env_config(tmp_path, docs_path, language, extra_embedder=None):
    e = {"id": "embedder_1", "vectors": "bm25",
         "embeddable_fields": ["text"], "stem_words": True,
         "language": language}
    if extra_embedder:
        e.update(extra_embedder)
    cfg = {
        "data_loader_name": "parquet_loader",
        "data_loader_arguments": [docs_path],
        "data_sampler_name": "identity_sampler",
        "id_key": "doc_id",
        "aggregation": "mean",
        "embedders": [e],
        "searchers": [
            {"id": "searcher_1", "data_embedder": "embedder_1",
             "score_alpha": 0.4, "score_weight": 1.0}],
    }
    p = tmp_path / f"env_{language}.json"
    p.write_text(json.dumps(cfg))
    return str(p)


def test_german_env_stems_queries_and_docs(spark, tmp_path):
    """env_config no longer warns stemming off for german: a doc
    containing only the inflected form is found by the lemma query."""
    from garamond_jl_spark.plans.env_config import build_search_env
    from garamond_jl_spark.plans.lifecycle import InternalRequest
    from garamond_jl_spark.plans.lifecycle import search as lsearch
    docs = spark.createDataFrame(
        [(0, "die katzen laufen schnell"),
         (1, "ein buch über bücher"),
         (2, "völlig anderes thema hier")],
        "doc_id LONG, text STRING")
    path = str(tmp_path / "de_docs.parquet")
    docs.write.parquet(path)
    env = build_search_env(spark, _env_config(tmp_path, path, "german"))
    assert env.index.cfg.stem_words is True
    assert env.index.cfg.language == "german"
    hits = lsearch(env, InternalRequest(query="katze", max_matches=1,
                                        tiebreak_round=6)).collect()
    assert [r["doc_id"] for r in hits] == [0]
    hits = lsearch(env, InternalRequest(query="buches bücherei",
                                        max_matches=1)).collect()
    # 'buches'→'buch' matches doc 1 ('buch', 'bücher'→'buch')
    assert [r["doc_id"] for r in hits] == [1]


def test_unshipped_language_warns_stemming_off(spark, tmp_path):
    from garamond_jl_spark.plans.env_config import parse_configuration
    docs = "/root/testdata/sf0.001/documents.parquet"
    parsed = parse_configuration(_env_config(tmp_path, docs, "romanian"))
    e = parsed["embedders"][0]
    assert e["language"] == "romanian" and e["stem_words"] is False
