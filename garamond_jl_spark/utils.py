"""Human-readable one-liners for engine objects — the analog of the
reference's display methods (/root/reference/src/utils/show.jl), which
gars logs at startup ("searchers ready") and garc's debug mode prints.

Everything here is driver-side string building over already-known
metadata: no Spark job is ever launched to describe an object (the
reference's show() reads in-memory struct fields the same way).
"""

from __future__ import annotations

from typing import Any


def _chop(s: str, n: int) -> str:
    """show.jl's chop_to_length (utils/textutils counterpart used at
    show.jl:97-101): values longer than ``n`` end in '...'."""
    return s if len(s) <= n else s[:n] + "..."


def _index_type(searcher: Any) -> str:
    """show.jl:60-75's index-type string, derived from the attached
    candidate index's class (None = the full-scan NaiveIndex
    semantics)."""
    cand = getattr(searcher, "candidate_index", None)
    if cand is None:
        return "Naive index"
    name = type(cand).__name__          # e.g. HNSWCandidateIndex
    for suffix in ("CandidateIndex", "Index"):
        if name.endswith(suffix):
            name = name[: -len(suffix)]
            break
    return f"{name} index"


def describe(obj: Any) -> str:
    """One human-readable line (or short block) per engine object:
    ``InvertedIndex``, dense searchers, ``SearchEnv``,
    ``InternalRequest`` — dispatched by shape, like the reference's
    per-type show methods."""
    from garamond_jl_spark.operators.build import InvertedIndex
    from garamond_jl_spark.plans.lifecycle import (InternalRequest,
                                                   SearchEnv)

    if isinstance(obj, InvertedIndex):
        meta = obj.meta or {}
        cfg = meta.get("cfg")
        scheme = getattr(cfg, "weighting", "?")
        n = meta.get("n_docs", "?")
        return (f"InvertedIndex ({scheme}), {n} indexed documents, "
                f"avgdl={meta.get('avgdl', '?')}")

    if isinstance(obj, InternalRequest):
        # show.jl:97-104: FIELD=value | ... with the query chopped at 50
        widths = {"query": 50}

        def _field(name: str) -> str:
            v = getattr(obj, name)
            w = widths.get(name, 10)
            # chop the VALUE (show.jl chops the field text, not its
            # quoting), then repr so strings stay visibly quoted
            return repr(_chop(v, w)) if isinstance(v, str) else _chop(repr(v), w)

        parts = (f"{name.upper()}={_field(name)}"
                 for name in obj.__dataclass_fields__)
        return "InternalRequest: " + " | ".join(parts)

    if isinstance(obj, SearchEnv):
        # show.jl:108-128's env block: one line per searcher
        lines = [f"SearchEnv with:",
                 f"  id_key = {obj.id_key}",
                 f"  aggregation = {obj.aggregation}",
                 f"  config_path = {obj.config_path}",
                 f"  searchers = ["]
        pairs = [(obj.index, obj.score_weight)] + list(obj.searchers)
        for i, (s, w) in enumerate(pairs):
            lines.append(f"    [{i}] {describe(s)}, weight={w}")
        lines.append("  ]")
        return "\n".join(lines)

    # dense searchers (BOE/SIF/RP/LSA/... — anything with the
    # sparse_hits contract): show.jl:60-83's "<type>, N embedded
    # documents" line, with the metric this engine's searchers carry
    if hasattr(obj, "sparse_hits"):
        return (f"{type(obj).__name__} ({_index_type(obj)}, "
                f"metric={getattr(obj, 'metric', 'cosine')})")

    return repr(obj)
