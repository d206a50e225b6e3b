"""Deterministic synthetic source-code corpus (SURVEY.md §7.1 M0).

Synthesises the north-rule input table shape (BASELINE.json
``input_hint``): ``repo STRING, path STRING, commit STRING, lang STRING,
content STRING`` plus the per-row invariant ``content_sha256``.

Generation is *per-row* deterministic: row ``i`` under seed ``s`` is a
pure function of ``(s, i)``.  That lets the same corpus be produced

* driver-side as a list of dicts (NumPy oracle input), and
* cluster-side via ``spark.range(n).mapInPandas`` (bench scale, no
  driver bottleneck, arbitrary partitioning),

with byte-identical rows, so rank-identity tests compare the two engines
on identical input.  The identifier vocabulary is sampled Zipf-ish so the
term distribution has a hot head (exercises salted aggregation and
block-max pruning) and a long tail.  No external data (sandbox rule).
"""

from __future__ import annotations

import bisect
import hashlib
import random
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StringType, StructField, StructType

CORPUS_SCHEMA = StructType([
    StructField("repo", StringType(), False),
    StructField("path", StringType(), False),
    StructField("commit", StringType(), False),
    StructField("lang", StringType(), False),
    StructField("content", StringType(), False),
    StructField("content_sha256", StringType(), False),
])

_LANGS = ["python", "java", "go", "rust"]

# identifier vocabulary: head tokens are common across files (Zipf head),
# tail tokens are rare — mirrors real code term distributions.
_HEAD = ("get set init main run data value result index count flag node "
         "list map key item self this config buffer offset size len").split()
_TAIL_STEMS = ("parse encode decode merge split filter reduce hash sort scan "
               "emit pack unpack fetch store load dump sync lock free alloc "
               "query token block score weight norm shard salt probe").split()
# tail width: stems × suffixes ≈ 1.2k shared identifiers; combined with
# one unique identifier per file (below) the dictionary scales with the
# corpus like real code, so query terms span hot head → selective tail
_TAIL_SUFFIXES = 40

_TEMPLATES = {
    "python": "def {f}({a}, {b}):\n    {v} = {a} + {b}\n    return {v} * {c}\n",
    "java": "public int {f}(int {a}, int {b}) {{ int {v} = {a} + {b}; return {v} * {c}; }}\n",
    "go": "func {f}({a} int, {b} int) int {{ {v} := {a} + {b}; return {v} * {c} }}\n",
    "rust": "fn {f}({a}: i64, {b}: i64) -> i64 {{ let {v} = {a} + {b}; {v} * {c} }}\n",
}


def _vocab() -> list[str]:
    return _HEAD + [f"{s}_{i}" for s in _TAIL_STEMS
                    for i in range(_TAIL_SUFFIXES)]


class _ZipfSampler:
    """Zipf(1) sampler over a vocab via precomputed harmonic CDF."""

    def __init__(self, vocab: list[str]):
        self.vocab = vocab
        acc, cdf = 0.0, []
        h = sum(1.0 / (i + 1) for i in range(len(vocab)))
        for i in range(len(vocab)):
            acc += (1.0 / (i + 1)) / h
            cdf.append(acc)
        self.cdf = cdf

    def pick(self, rng: random.Random) -> str:
        return self.vocab[min(bisect.bisect_left(self.cdf, rng.random()),
                              len(self.vocab) - 1)]


_SAMPLER = _ZipfSampler(_vocab())


def make_row(i: int, seed: int = 42) -> dict:
    """Row ``i`` of the corpus — pure function of (seed, i)."""
    rng = random.Random(f"{seed}:{i}")
    lang = _LANGS[i % len(_LANGS)]
    pick = _SAMPLER.pick
    parts = []
    for _ in range(1 + rng.randrange(4)):
        parts.append(_TEMPLATES[lang].format(
            f=pick(rng), a=pick(rng), b=pick(rng), v=pick(rng),
            c=rng.randrange(1, 100)))
    # one file-unique identifier (df=1 long tail, like real symbol names)
    parts.append(f"# uniq_{seed}_{i} "
                 + " ".join(pick(rng) for _ in range(rng.randrange(3, 10)))
                 + "\n")
    content = "".join(parts)
    return {
        "repo": f"org/repo{i % 17}",
        "path": f"src/mod{i % 29}/file{i}.{lang[:2]}",
        "commit": hashlib.sha1(f"{seed}:{i}".encode()).hexdigest(),
        "lang": lang,
        "content": content,
        "content_sha256": hashlib.sha256(content.encode()).hexdigest(),
    }


def generate_corpus(n_docs: int = 200, seed: int = 42) -> list[dict]:
    """Driver-side corpus (oracle input / small tests)."""
    return [make_row(i, seed) for i in range(n_docs)]


def corpus_df(spark: SparkSession, n_docs: int = 200, seed: int = 42,
              partitions: int | None = None) -> DataFrame:
    """Corpus as a DataFrame, generated ON THE EXECUTORS via mapInPandas
    over ``spark.range`` — the 'Iceberg table of source code' stand-in
    (no Iceberg jars in sandbox; IO abstraction in sources/tables.py).
    Scales to bench sizes without a driver bottleneck."""
    rng_df = spark.range(0, n_docs, 1, partitions or max(2, n_docs // 5000))

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            yield pd.DataFrame([make_row(int(i), seed) for i in b["id"]])

    return rng_df.mapInPandas(gen, CORPUS_SCHEMA)


def query_set(seed: int = 42, n: int = 24) -> list[str]:
    """Reference-style query set (SURVEY.md §5.2.3): in-vocab terms,
    multi-term queries, and OOV-only/empty queries that must return 0
    hits (src/embedder/dtv.jl:53-58 + src/search/index.jl:106-113)."""
    rng = random.Random(f"q:{seed}")
    qs: list[str] = []
    for _ in range(n - 4):
        k = rng.randrange(1, 5)
        qs.append(" ".join(_SAMPLER.pick(rng) for _ in range(k)))
    qs += ["zzz_not_in_vocab", "qqqq wwww", "", "the of und"]  # OOV / empty
    return qs
