"""Input-parser golden table — ported from the reference's own QUERIES
table (/root/reference/test/input_parsers.jl:13-19), the closest thing
to a golden corpus in the repo (SURVEY.md §5.1)."""

from garamond_jl_spark.functions.query_parser import (base_input_parser,
                                                      noop_input_parser,
                                                      parse_input, pre_parser)

# reference test schema: y float, x int, z string (input_parsers.jl:6-9)
SCHEMA = {"y": "double", "x": "bigint", "z": "string"}

QUERIES = [
    ("this is a query", {}, "this is a query"),
    ('search token x:10 y:1 z:"a"',
     {"x": 10, "y": 1.0, "z": "a"}, "search token"),
    ('x:[1,2,3] y:("a",) z:', {"x": [1, 2, 3], "y": ("a",)}, ""),
    ('x:[1.0,2,3] y:("a",) z:', {"x": [1.0, 2.0, 3.0], "y": ("a",)}, ""),
    ('z:"a b c" x:1 free form', {"z": "a b c", "x": 1}, "free form"),
    ("", {}, ""),
]


def test_base_input_parser_golden():
    for query, want_filter, want_search in QUERIES:
        got = base_input_parser(SCHEMA, query, separator=":")
        assert got.filter == want_filter, query
        assert got.search == want_search, query


def test_noop_input_parser():
    for query, _, _ in QUERIES:
        got = noop_input_parser(SCHEMA, query)
        assert got.filter == {} and got.search == query


def test_pre_parser_dispatch():
    # test/input_parsers.jl:40-43 PREPARSER_DATA
    for query, want_filter, want_search in QUERIES:
        got = parse_input(SCHEMA, "noop_input_parser>" + query, "pre_parser")
        assert got.filter == {} and got.search == query
        got = parse_input(SCHEMA, "base_input_parser>" + query, "pre_parser")
        assert got.filter == want_filter and got.search == want_search
        got = parse_input(SCHEMA, "pre_parser> base_input_parser>" + query,
                          "pre_parser")
        assert got.filter == want_filter and got.search == want_search
        got = pre_parser(SCHEMA, "pre_parser> pre_parser  >" + query)
        assert isinstance(got.filter, dict) and isinstance(got.search, str)


def test_unknown_key_dropped():
    got = base_input_parser(SCHEMA, "nope:1 x:2 hello")
    assert got.filter == {"x": 2} and got.search == "hello"


def test_searchable_filters_appended():
    got = base_input_parser(SCHEMA, 'find z:"abc"', searchable_filters=["z"])
    assert got.search == "find abc"
    # filter-only queries do NOT get values appended (text_parsers.jl:121)
    got = base_input_parser(SCHEMA, 'z:"abc"', searchable_filters=["z"])
    assert got.search == ""


def test_parse_error_ignored():
    got = base_input_parser(SCHEMA, "x:notanint rest")
    assert got.filter == {} and got.search == "rest"


def test_porter_stemmer_golden_vectors():
    """functions/stemmer.porter_stem against the example vocabulary of
    Porter (1980) — full-pipeline outputs (e.g. agreed → agre after
    step 5a drops the final e)."""
    from garamond_jl_spark.functions.stemmer import porter_stem
    gold = {
        "caresses": "caress", "ponies": "poni", "ties": "ti",
        "caress": "caress", "cats": "cat", "feed": "feed",
        "agreed": "agre", "plastered": "plaster", "bled": "bled",
        "motoring": "motor", "sing": "sing", "conflated": "conflat",
        "troubled": "troubl", "sized": "size", "hopping": "hop",
        "tanned": "tan", "falling": "fall", "hissing": "hiss",
        "fizzed": "fizz", "failing": "fail", "filing": "file",
        "happy": "happi", "sky": "sky", "relational": "relat",
        "conditional": "condit", "rational": "ration",
        "valenci": "valenc", "hesitanci": "hesit",
        "digitizer": "digit", "conformabli": "conform",
        "radicalli": "radic", "differentli": "differ", "vileli": "vile",
        "analogousli": "analog", "vietnamization": "vietnam",
        "predication": "predic", "operator": "oper",
        "feudalism": "feudal", "decisiveness": "decis",
        "hopefulness": "hope", "callousness": "callous",
        "formaliti": "formal", "sensitiviti": "sensit",
        "sensibiliti": "sensibl", "triplicate": "triplic",
        "formative": "form", "formalize": "formal",
        "electriciti": "electr", "electrical": "electr",
        "hopeful": "hope", "goodness": "good", "revival": "reviv",
        "allowance": "allow", "inference": "infer",
        "airliner": "airlin", "gyroscopic": "gyroscop",
        "adjustable": "adjust", "defensible": "defens",
        "irritant": "irrit", "replacement": "replac",
        "adjustment": "adjust", "dependent": "depend",
        "adoption": "adopt", "communism": "commun",
        "activate": "activ", "angulariti": "angular",
        "homologous": "homolog", "effective": "effect",
        "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
        "cease": "ceas", "controll": "control", "roll": "roll",
    }
    bad = {w: (porter_stem(w), want) for w, want in gold.items()
           if porter_stem(w) != want}
    assert not bad, bad


def test_stem_words_config_round_trip_and_tokenizer():
    """stem_words round-trips through cfg_to_dict/cfg_from_dict (the
    meta.json rule: every EngineConfig field the query path reads) and
    drives the canonical tokenizer symmetrically."""
    from garamond_jl_spark.config import (EngineConfig, cfg_from_dict,
                                          cfg_to_dict)
    from garamond_jl_spark.functions.textprep import prepare_and_tokenize
    cfg = EngineConfig(stem_words=True)
    assert cfg_from_dict(cfg_to_dict(cfg)).stem_words is True
    assert prepare_and_tokenize("Motoring ponies agreed", cfg) == \
        ["motor", "poni", "agre"]
    off = EngineConfig()
    assert prepare_and_tokenize("Motoring ponies", off) == \
        ["motoring", "ponies"]


def test_boolean_garbage_ignores_pair_like_reference():
    """parse(Bool, 'maybe') throws in the reference and the pair is
    ignored (text_parsers.jl:125-127) — silently coercing to False
    filtered the corpus wrong."""
    from garamond_jl_spark.functions.query_parser import base_input_parser
    schema = {"active": "boolean", "n": "bigint"}
    parsed = base_input_parser(schema, "foo active:maybe")
    assert parsed.filter == {} and parsed.search == "foo"
    assert base_input_parser(schema, "active:true").filter == \
        {"active": True}
    assert base_input_parser(schema, "active:0").filter == \
        {"active": False}


def test_metachar_separator_parses():
    from garamond_jl_spark.functions.query_parser import base_input_parser
    parsed = base_input_parser({"n": "bigint"}, "n|5 foo", separator="|")
    assert parsed.filter == {"n": 5} and parsed.search == "foo"
