"""Structured-query input parsing (reference operators F8/F9).

Behavior-port (not a code port) of the reference parsers:

* ``base_input_parser`` — /root/reference/src/input/text_parsers.jl:59-131:
  extracts ``key<sep>value`` pairs (value: bare token, ``(tuple)``,
  ``[vector]``, ``"quoted string"``), typed against the table schema;
  the residual text minus punctuated tokens is the free-text search
  query; values of ``searchable_filters`` columns are appended back into
  the search text (strings/tuples-of-strings only) unless the query is
  filter-only.
* ``pre_parser`` — text_parsers.jl:44-54: a ``parser_name>`` magic
  prefix recursively selects the parser, defaulting to the base parser.
* ``noop_input_parser`` — text_parsers.jl:135-140.

Golden behavior is pinned by the reference's own QUERIES table
(test/input_parsers.jl:13-19), ported into tests/test_query_parser.py.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Any

# punctuation that disqualifies a residual token from the search text
# (text_parsers.jl:68)
_PUNCT_RE = re.compile(r"[\"!?:,.\[\]\(\)\*\&\^\%\$]")
_MAGIC_RE = re.compile(r"^\s*\w+\s*>")


def match_expr(separator: str = ":") -> re.Pattern:
    """The MATCH_EXPR regex (text_parsers.jl:89-95), ported verbatim in
    semantics: alnum keys, values = bare | (tuple) | [vector] | "quoted"."""
    alnum = r"_a-zA-Z0-9\."
    # escape: a metacharacter separator ('|', '.') would otherwise
    # change the regex's meaning and let a match carry NO separator,
    # crashing the split in base_input_parser
    separator = re.escape(separator)
    return re.compile(
        f"[{alnum}]+{separator}"
        f"([{alnum}]+|"
        f"\\([{alnum},\"\\s]+\\)|"
        f"\\[[{alnum},\"\\s]+\\]|"
        f"\"[{alnum},\\s]+\")")


def _parse_scalar(valstr: str, coltype: str) -> Any:
    """__parse(T, valstr) analog (src/data/parse_and_eval.jl:1-17):
    coerce against the schema column type."""
    t = coltype.lower()
    if t in ("bigint", "long", "int", "integer", "smallint", "tinyint"):
        return int(valstr)
    if t in ("double", "float", "real", "decimal"):
        return float(valstr)
    if t == "boolean":
        v = valstr.lower()
        if v in ("true", "1"):
            return True
        if v in ("false", "0"):
            return False
        # reference: parse(Bool, ...) THROWS on other literals and the
        # catch ignores the pair (text_parsers.jl:125-127) — silently
        # coercing 'maybe' to False would filter the corpus wrong
        raise ValueError(f"not a boolean literal: {valstr!r}")
    return valstr


def _parse_element(s: str) -> Any:
    """Julia-eval analog for tuple/vector elements: quoted → str,
    numeric literal → int/float."""
    s = s.strip()
    if s.startswith('"') and s.endswith('"'):
        return s[1:-1]
    try:
        return int(s)
    except ValueError:
        return float(s)  # raises for garbage → match ignored (jl:125-127)


def text2type(coltype: str, valstr: str) -> Any:
    """text2type (text_parsers.jl:74-80): bracketed → container
    (vector/tuple promoted like Julia eval), quoted → string,
    else scalar coercion against the column type."""
    if valstr.startswith("(") and valstr.endswith(")"):
        items = [_parse_element(x) for x in valstr[1:-1].split(",") if x.strip()]
        return tuple(items)
    if valstr.startswith("[") and valstr.endswith("]"):
        items = [_parse_element(x) for x in valstr[1:-1].split(",") if x.strip()]
        if any(isinstance(x, float) for x in items):  # Julia promotion
            items = [float(x) for x in items]
        return list(items)
    if valstr.startswith('"') and valstr.endswith('"'):
        return valstr[1:-1]
    return _parse_scalar(valstr, coltype)


def _text2searchstring(val: Any) -> str:
    """text2searchstring (text_parsers.jl:82-84): strings pass, tuples of
    strings concatenate, everything else contributes nothing."""
    if isinstance(val, str):
        return " " + val
    if isinstance(val, tuple) and val and all(isinstance(v, str) for v in val):
        return " " + " ".join(val)
    return ""


@dataclass
class ParsedInput:
    search: str
    filter: dict[str, Any] = field(default_factory=dict)


def base_input_parser(schema: dict[str, str], query: str,
                      separator: str = ":",
                      searchable_filters: list[str] | None = None,
                      keep_punct: bool = False) -> ParsedInput:
    """schema: column name → Spark SQL type string (db_create_schema
    analog, src/data/db.jl:1-9).

    ``keep_punct``: keep punctuation-bearing residual tokens — the
    regex search method needs its metacharacters to survive parsing
    (the filter DSL is still extracted)."""
    searchable_filters = searchable_filters or []
    rx = match_expr(separator)
    residual = rx.sub("", query)
    toks = [t for t in residual.split()
            if keep_punct or not _PUNCT_RE.search(t)]
    search_query = " ".join(toks).strip()
    filter_only = not search_query

    filt: dict[str, Any] = {}
    for m in rx.finditer(query):
        keystr, valstr = m.group(0).split(separator, 1)
        key, valstr = keystr.strip(), valstr.strip()
        if key not in schema:
            continue  # unknown-key tolerance (P8)
        try:
            val = text2type(schema[key], valstr)
        except (ValueError, TypeError):
            continue  # parse error → ignore (text_parsers.jl:125-127)
        filt[key] = val
        if key in searchable_filters and not filter_only:
            search_query += _text2searchstring(val)
    return ParsedInput(search=search_query, filter=filt)


def noop_input_parser(schema: dict[str, str], query: str,
                      **_: Any) -> ParsedInput:
    return ParsedInput(search=query, filter={})


PARSERS = {
    "base_input_parser": base_input_parser,
    "noop_input_parser": noop_input_parser,
}
DEFAULT_INPUT_PARSER = "base_input_parser"


def pre_parser(schema: dict[str, str], query: str, separator: str = ":",
               searchable_filters: list[str] | None = None,
               keep_punct: bool = False) -> ParsedInput:
    """F9 parser-prefix dispatch with recursion (text_parsers.jl:44-54)."""
    m = _MAGIC_RE.match(query)
    name = DEFAULT_INPUT_PARSER
    if m:
        query = _MAGIC_RE.sub("", query).strip()
        name = m.group(0).rstrip(">").strip()
    if name == "pre_parser":
        return pre_parser(schema, query, separator, searchable_filters,
                          keep_punct)
    parser = PARSERS.get(name, PARSERS[DEFAULT_INPUT_PARSER])
    if parser is noop_input_parser:
        return parser(schema, query)
    return parser(schema, query, separator=separator,
                  searchable_filters=searchable_filters,
                  keep_punct=keep_punct)


PARSERS["pre_parser"] = pre_parser


def parse_input(schema: dict[str, str], query: str,
                input_parser: str = DEFAULT_INPUT_PARSER,
                separator: str = ":",
                searchable_filters: list[str] | None = None,
                keep_punct: bool = False) -> ParsedInput:
    """parse_input dispatch with safe fallback (text_parsers.jl:27-31,
    safe_symbol_eval analog parse_and_eval.jl:20-27)."""
    parser = PARSERS.get(input_parser, PARSERS[DEFAULT_INPUT_PARSER])
    if parser is noop_input_parser:
        return parser(schema, query)
    return parser(schema, query, separator=separator,
                  searchable_filters=searchable_filters,
                  keep_punct=keep_punct)
