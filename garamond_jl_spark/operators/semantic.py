"""Semantic (embedding-based) search: BOE + word-vector lookup
(reference E1 + E6 — "the other half of Garamond").

Reference counterparts:
* BOE document embedding — /root/reference/src/embedder/boe.jl:1-27:
  a document embeds as the sum of its tokens' word vectors (OOV tokens
  skipped; a document/query with no known token is not embedded — the
  same ``is_embedded`` gate as the DTV path).
* word-vector lookup table — src/embedder/wordvectors.jl:101-158 (load)
  and :167-187 (per-token lookup).  The reference loads pretrained
  word2vec/fasttext/glove files; this sandbox has no embedding files,
  so :func:`synthetic_word_vectors` generates a DETERMINISTIC table —
  each component is a pure function of (seed, term, dim) via md5, the
  same trick as the synthetic corpus (corpus.py) — which lets the whole
  BOE pipeline be built, parity-tested against DuckDB, and
  rank-verified against a NumPy oracle exactly like BM25 was.  A real
  deployment replaces that one table with vectors read from storage;
  every downstream plan is unchanged.

Spark shape: everything stays in LONG form (term|doc_id, i, v) — sums
and dot products are groupBy aggregations and equi-joins, never
per-row Python.  The word-vector join broadcasts (vocab ≪ corpus);
document embedding is one shuffle (doc_id, i); query embedding touches
only the query's own terms.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

DEFAULT_DIM = 16
_NIB = "0123456789abcdef"
# raw 24-bit value from the first 6 hex chars of md5 → v ∈ [-1, 1)
_DENOM = float(1 << 23)


def _component_expr(h: str = "h") -> str:
    """Spark SQL: first-6-nibble integer of md5 hex column ``h`` (the
    DuckDB oracle uses the identical arithmetic with strpos)."""
    parts = [f"(locate(substring({h}, {c}, 1), '{_NIB}') - 1) * {16 ** (6 - c)}"
             for c in range(1, 7)]
    return " + ".join(parts)


def component_sql(h: str = "h") -> str:
    """DuckDB flavor of :func:`_component_expr` (strpos)."""
    parts = [f"(strpos('{_NIB}', substring({h}, {c}, 1)) - 1) * {16 ** (6 - c)}"
             for c in range(1, 7)]
    return " + ".join(parts)


def word_vector_component(term: str, i: int, seed: int = 0) -> float:
    """Scalar (NumPy-oracle side) of the deterministic component."""
    h = hashlib.md5(f"{seed}:{term}:{i}".encode()).hexdigest()
    return int(h[:6], 16) / _DENOM - 1.0


def synthetic_word_vectors(vocab: DataFrame, dim: int = DEFAULT_DIM,
                           seed: int = 0) -> DataFrame:
    """vocab(term) → long-form word vectors (term, i, v), i in 1..dim,
    v = md5(seed:term:i)[0:6]/2^23 − 1 ∈ [−1, 1).  Deterministic pure
    function — rebuildable anywhere, no stored state."""
    spark = vocab.sparkSession
    dims = spark.range(1, dim + 1).select(F.col("id").cast("int").alias("i"))
    wvh = (vocab.select("term").distinct()
           .crossJoin(F.broadcast(dims))
           .withColumn("h", F.md5(F.concat_ws(":", F.lit(seed),
                                              F.col("term"), F.col("i")))))
    v = (F.expr(_component_expr()) / F.lit(_DENOM) - F.lit(1.0)).alias("v")
    return wvh.select("term", "i", v)


def boe_doc_embeddings(tokens: DataFrame, word_vectors: DataFrame) -> DataFrame:
    """tokens(doc_id, term, tf) ⋈ word vectors → long-form document
    embeddings (doc_id, i, dv) with dv = Σ_t tf·v (boe.jl:12-24 sum;
    OOV terms drop at the inner join).  One shuffle by (doc_id, i)."""
    return (tokens.join(F.broadcast(word_vectors), "term")
            .groupBy("doc_id", "i")
            .agg(F.sum(F.col("tf") * F.col("v")).alias("dv")))


def boe_embed_query(spark: SparkSession, query: str,
                    word_vectors: DataFrame) -> DataFrame:
    """Query → (i, qv) by the same sum; whitespace tokens with
    multiplicity; empty result ⇔ every token is OOV (is_embedded
    gate)."""
    toks = [t for t in (query or "").split(" ") if t]
    if not toks:
        return spark.createDataFrame([], "i INT, qv DOUBLE")
    counts: dict[str, int] = {}
    for t in toks:
        counts[t] = counts.get(t, 0) + 1
    qt = F.broadcast(spark.createDataFrame(
        list(counts.items()), "term STRING, qtf INT"))
    return (qt.join(word_vectors, "term")
            .groupBy("i").agg(F.sum(F.col("qtf") * F.col("v")).alias("qv")))


def boe_topk(spark: SparkSession, tokens: DataFrame,
             word_vectors: DataFrame, query: str, k: int = 10,
             tiebreak_round: int | None = None) -> DataFrame:
    """BOE cosine top-k: (doc_id, score, rank).  Brute-force over the
    doc-embedding table (the NaiveIndex analog, naive.jl:15-32); the
    LSH multiprobe path (plans.pipeline_queries.ann_lsh_search) is the
    sublinear variant over the same long-form embeddings."""
    dv = boe_doc_embeddings(tokens, word_vectors)
    qv = boe_embed_query(spark, query, word_vectors)
    dn = dv.groupBy("doc_id").agg(F.sqrt(F.sum(F.col("dv") ** 2)).alias("nd"))
    qn_rows = (qv.agg(F.sqrt(F.sum(F.col("qv") ** 2)).alias("nq"))
               .collect())
    nq = float(qn_rows[0]["nq"]) if qn_rows and qn_rows[0]["nq"] else 0.0
    if nq == 0.0:
        return spark.createDataFrame([], "doc_id LONG, score DOUBLE, rank INT")
    dots = (dv.join(F.broadcast(qv), "i")
            .groupBy("doc_id").agg(F.sum(F.col("dv") * F.col("qv")).alias("dot")))
    cosd = (dots.join(dn, "doc_id")
            .select("doc_id",
                    (F.col("dot") / (F.col("nd") * F.lit(nq))).alias("score")))
    rank_on = (F.round(F.col("score"), tiebreak_round)
               if tiebreak_round is not None else F.col("score"))
    top = cosd.orderBy(rank_on.desc(), F.col("doc_id").asc()).limit(k)
    w = Window.orderBy(rank_on.desc(), F.col("doc_id").asc())
    return (top.withColumn("rank", F.row_number().over(w))
            .select("doc_id", "score", "rank"))
