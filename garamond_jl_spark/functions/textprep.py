"""Text preparation + tokenization (reference operators F1/F2/F3).

Reference: Garamond delegates to StringAnalysis ``prepare``/``tokenize``
with flag-driven strips (flags at /root/reference/src/config/defaults.jl:32-37,
applied at src/embedder/interface.jl:63,171-177 and src/embedder/dtv.jl:29-33).

Engine design: ONE canonical Python function (:func:`tokenize_with_config`,
prepare + tokenize + cumulative n-grams) is used everywhere —

* inside the Arrow-vectorized corpus tokenization
  (operators/build.tokenize_to_postings's mapInArrow pass — no per-row
  Python UDF, north-rule constraint),
* driver-side for query pseudo-document embedding
  (src/embedder/dtv.jl:29-41 analog),
* in the NumPy oracle (tests/rank identity).

This guarantees tokenizer parity between build, query, and oracle by
construction instead of by testing.
"""

from __future__ import annotations

import re
import unicodedata
from functools import lru_cache

from garamond_jl_spark.config import EngineConfig

# Small article/preposition stop list mirroring the *shape* of SA's
# strip_articles/strip_prepositions flags (off by default for code).
_STOPWORDS = frozenset(
    "a an the in on at of for to with by from into over under".split()
)

@lru_cache(maxsize=8)
def _token_re(pattern: str) -> re.Pattern:
    return re.compile(pattern)


def _strip_accents(s: str) -> str:
    return "".join(
        c for c in unicodedata.normalize("NFKD", s)
        if not unicodedata.combining(c)
    )


def prepare_and_tokenize(text: str | None, cfg: EngineConfig) -> list[str]:
    """F1 prepare + F2 tokenize: the canonical tokenizer.

    Pipeline (flag-driven, mirrors defaults.jl:32-37): corrupt-UTF8 guard →
    accent fold → lowercase → regex token extraction → optional
    stopword strip.  Punctuation needs no separate strip pass: any
    character the token pattern cannot match already separates findall
    matches, and a pre-pass replacing ``\\W+`` both cost an extra regex
    scan of every document AND silently defeated custom token patterns
    that keep punctuation (``[a-z0-9_.]+`` for dotted identifiers).
    """
    if not text:
        return []
    # ASCII fast path: NFKD accent folding is a no-op on pure-ASCII text
    # but costs ~1µs/char in Python — skip it (str.isascii is a C call)
    if cfg.strip_accents and not text.isascii():
        text = _strip_accents(text)
    if cfg.lowercase:
        text = text.lower()
    toks = _token_re(cfg.token_pattern).findall(text)
    if cfg.strip_stopwords:
        toks = [t for t in toks if t not in _STOPWORDS]
    if cfg.stem_words:
        # stemming (interface.jl:63's stem_words flag) — applied
        # symmetrically at build (inside the Arrow UDF batches) and at
        # query embedding because THIS function is the one tokenizer;
        # the algorithm follows cfg.language (Porter for english,
        # Snowball german/french — functions/snowball.py); each is
        # lru-cached per token so Zipf-head repeats cost a dict hit
        from garamond_jl_spark.functions.snowball import stemmer_for
        stem = stemmer_for(getattr(cfg, "language", "english"))
        if stem is None:           # env_config warns these off; a
            from garamond_jl_spark.functions.stemmer import \
                porter_stem        # directly-built cfg falls back
            stem = porter_stem
        toks = [stem(t) for t in toks]
    return toks


def ngrams(tokens: list[str], n: int) -> list[str]:
    """F3 n-gram generation (dtv.jl:36-39); n=1 returns tokens unchanged."""
    if n <= 1:
        return tokens
    return [" ".join(tokens[i:i + n]) for i in range(len(tokens) - n + 1)]


def ngrams_upto(tokens: list[str], n: int) -> list[str]:
    """Cumulative n-gramization: every order 1..n, matching the
    TextAnalysis/StringAnalysis ``ngramize`` the reference's dtv path
    delegates to (dtv.jl:36-39 ``ngram_complexity`` — the vocabulary and
    the query pseudo-document both contain unigrams AND higher-order
    grams)."""
    if n <= 1:
        return tokens
    out = list(tokens)
    for m in range(2, n + 1):
        out.extend(ngrams(tokens, m))
    return out


def tokenize_with_config(text: str | None, cfg: EngineConfig) -> list[str]:
    """THE canonical config-driven tokenizer used by index build, query
    embedding, and the NumPy oracle alike: prepare + tokenize + the
    configured cumulative n-gramization."""
    return ngrams_upto(prepare_and_tokenize(text, cfg),
                       cfg.ngram_complexity)


