"""Training-data pipeline operators with DuckDB-parity oracles.

Beyond the reference's own surface (per the build brief): deduplication
(exact / MinHash+LSH / SimHash / n-gram Jaccard), similarity search over
embeddings (brute-force cosine baseline + deterministic hyperplane-LSH
bucketing as the scale path), and text analysis (language-ID heuristic,
quality scoring, token counting, fingerprinting).

Cross-engine determinism tactics:

* all hashing is md5 (identical hex output in Spark and DuckDB); MinHash
  = min over md5 strings (byte-order string min, no float math);
* SimHash uses md5 *nibble* high-bits with integer tf-weighted votes —
  pure integer math both sides;
* Jaccard = one division of exact integer counts → bit-identical;
* cosine outputs are ranked on round(·, 6) with id tiebreaks.

Everything stays in DataFrame expressions / higher-order functions —
no Python UDFs (the north-rule constraint).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from garamond_jl_spark.plans.testdata_queries import ORACLES, QUERIES, e6, q
from garamond_jl_spark.sources.tables import load_testdata

__all__ = ["QUERIES", "ORACLES"]

N_BANDS = 6
JACCARD_T = 0.8
HEX_HIGH = ("8", "9", "a", "b", "c", "d", "e", "f")

# ---- shared SQL fragments -------------------------------------------------

SHINGLES_CTE = """
sh AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(text, ' ') AS t FROM documents)
),
shd AS (SELECT DISTINCT doc_id, s FROM sh),
ssz AS (SELECT doc_id, count(*) AS n FROM shd GROUP BY 1)
"""

JACCARD_PAIRS_SQL = f"""
WITH {SHINGLES_CTE},
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM shd a JOIN shd b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       cast(round(i * 1.0 / (x.n + y.n - i) * 1e6) AS BIGINT) AS jacc_e6
FROM inter JOIN ssz x ON x.doc_id = doc_a JOIN ssz y ON y.doc_id = doc_b
WHERE i * 1.0 / (x.n + y.n - i) >= {JACCARD_T}
"""


def _shingles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct word-3-gram shingles per doc, pure SQL functions (no UDF).
    Matches the DuckDB list_transform fragment element-for-element."""
    d = load_testdata(spark, sf_dir, "documents")
    return (d.withColumn("t", F.split("text", " "))
            .withColumn("s", F.when(
                F.size("t") >= 3,
                F.expr("transform(sequence(0, size(t) - 3), "
                       "i -> concat_ws(' ', t[i], t[i+1], t[i+2]))"))
                .otherwise(F.array()))
            .select("doc_id", F.explode("s").alias("s"))
            .distinct())


def _jaccard_pairs(shd: DataFrame) -> DataFrame:
    ssz = shd.groupBy("doc_id").agg(F.count("*").alias("n"))
    a = shd.alias("a")
    b = shd.alias("b")
    inter = (a.join(b, (F.col("a.s") == F.col("b.s"))
                    & (F.col("a.doc_id") < F.col("b.doc_id")))
             .groupBy(F.col("a.doc_id").alias("doc_a"),
                      F.col("b.doc_id").alias("doc_b"))
             .agg(F.count("*").alias("i")))
    jacc = (inter
            .join(ssz.select(F.col("doc_id").alias("doc_a"),
                             F.col("n").alias("na")), "doc_a")
            .join(ssz.select(F.col("doc_id").alias("doc_b"),
                             F.col("n").alias("nb")), "doc_b")
            .withColumn("jacc", F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))))
    return jacc


# --------------------------------------------------------------------------
# Deduplication family
# --------------------------------------------------------------------------

@q("dedup_exact",
   "SELECT md5(text) AS h, min(doc_id) AS keep_doc_id, count(*) AS n "
   "FROM documents GROUP BY 1")
def dedup_exact(spark, sf_dir):
    """Exact dedup: content-hash groups, survivor = min doc_id."""
    d = load_testdata(spark, sf_dir, "documents")
    return (d.select(F.md5("text").alias("h"), "doc_id")
            .groupBy("h")
            .agg(F.min("doc_id").alias("keep_doc_id"),
                 F.count("*").alias("n")))


@q("dedup_ngram_jaccard", JACCARD_PAIRS_SQL)
def dedup_ngram_jaccard(spark, sf_dir):
    """Near-dup pairs by word-3-gram Jaccard ≥ 0.8 (exact, all pairs
    sharing ≥1 shingle).  Integer-count division → bit-identical."""
    jacc = _jaccard_pairs(_shingles(spark, sf_dir))
    return (jacc.where(F.col("jacc") >= JACCARD_T)
            .select("doc_a", "doc_b", e6(F.col("jacc")).alias("jacc_e6")))


@q("dedup_minhash_lsh", f"""
WITH {SHINGLES_CTE},
sig AS (
  SELECT doc_id, b.band,
         min(md5(cast(b.band AS VARCHAR) || ':' || s)) AS mh
  FROM shd CROSS JOIN (SELECT unnest(range({N_BANDS})) AS band) b
  GROUP BY 1, 2
),
cand AS (
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM sig a JOIN sig b
    ON a.band = b.band AND a.mh = b.mh AND a.doc_id < b.doc_id
),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) AS i
  FROM cand c JOIN shd x ON x.doc_id = c.doc_a
  JOIN shd y ON y.doc_id = c.doc_b AND y.s = x.s
  GROUP BY 1, 2
)
SELECT doc_a, doc_b,
       cast(round(i * 1.0 / (x.n + y.n - i) * 1e6) AS BIGINT) AS jacc_e6
FROM inter JOIN ssz x ON x.doc_id = doc_a JOIN ssz y ON y.doc_id = doc_b
WHERE i * 1.0 / (x.n + y.n - i) >= {JACCARD_T}
""")
def dedup_minhash_lsh(spark, sf_dir):
    """MinHash+LSH near-dup: shingle → per-band min-md5 signature →
    band-bucket join for candidates → exact Jaccard verification.
    The scale path: candidate generation is |bands|·|docs| rows, the
    quadratic verify only touches bucket-colliding pairs."""
    shd = _shingles(spark, sf_dir).persist()
    bands = F.explode(F.array(*[F.lit(i) for i in range(N_BANDS)])).alias("band")
    sig = (shd.select("doc_id", "s", bands)
           .withColumn("mh", F.md5(F.concat_ws(":", F.col("band"), F.col("s"))))
           .groupBy("doc_id", "band").agg(F.min("mh").alias("mh")))
    a, b = sig.alias("a"), sig.alias("b")
    cand = (a.join(b, (F.col("a.band") == F.col("b.band"))
                   & (F.col("a.mh") == F.col("b.mh"))
                   & (F.col("a.doc_id") < F.col("b.doc_id")))
            .select(F.col("a.doc_id").alias("doc_a"),
                    F.col("b.doc_id").alias("doc_b"))
            .distinct())
    x = shd.select(F.col("doc_id").alias("doc_a"), "s")
    y = shd.select(F.col("doc_id").alias("doc_b"), F.col("s").alias("s2"))
    inter = (cand.join(x, "doc_a").join(y, "doc_b")
             .where(F.col("s") == F.col("s2"))
             .groupBy("doc_a", "doc_b").agg(F.count("*").alias("i")))
    ssz = shd.groupBy("doc_id").agg(F.count("*").alias("n"))
    jacc = (inter
            .join(ssz.select(F.col("doc_id").alias("doc_a"),
                             F.col("n").alias("na")), "doc_a")
            .join(ssz.select(F.col("doc_id").alias("doc_b"),
                             F.col("n").alias("nb")), "doc_b")
            .withColumn("jacc", F.col("i") / (F.col("na") + F.col("nb") - F.col("i"))))
    return (jacc.where(F.col("jacc") >= JACCARD_T)
            .select("doc_a", "doc_b", e6(F.col("jacc")).alias("jacc_e6")))


def _simhash_sql() -> str:
    votes = ", ".join(
        f"sum(CASE WHEN substring(h, {j + 1}, 1) IN "
        f"('8','9','a','b','c','d','e','f') THEN tf ELSE -tf END) AS v{j}"
        for j in range(16))
    bits = " + ".join(f"(CASE WHEN v{j} >= 0 THEN {1 << j} ELSE 0 END)"
                      for j in range(16))
    return f"""
WITH tok AS (
  SELECT d.doc_id, t.term FROM documents d,
  unnest(string_split(d.text, ' ')) AS t(term) WHERE t.term <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
hashed AS (SELECT doc_id, md5(term) AS h, tf FROM tf),
votes AS (SELECT doc_id, {votes} FROM hashed GROUP BY 1)
SELECT doc_id, cast({bits} AS BIGINT) AS simhash16 FROM votes
"""


@q("dedup_simhash", _simhash_sql())
def dedup_simhash(spark, sf_dir):
    """SimHash (16-bit demo width): tf-weighted integer votes over md5
    nibble high-bits — near-dups land at small Hamming distance.  Pure
    integer math, engine-exact."""
    d = load_testdata(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
           .where(F.col("term") != ""))
    tf = tok.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    hashed = tf.select("doc_id", F.md5("term").alias("h"), "tf")
    votes = [F.sum(F.when(F.substring("h", j + 1, 1).isin(*HEX_HIGH),
                          F.col("tf")).otherwise(-F.col("tf"))).alias(f"v{j}")
             for j in range(16)]
    agg = hashed.groupBy("doc_id").agg(*votes)
    bits = None
    for j in range(16):
        term = F.when(F.col(f"v{j}") >= 0, F.lit(1 << j)).otherwise(F.lit(0))
        bits = term if bits is None else bits + term
    return agg.select("doc_id", bits.cast("long").alias("simhash16"))


# --------------------------------------------------------------------------
# Similarity search over embeddings
# --------------------------------------------------------------------------

EMB_NORM_CTE = """
u AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding)::DOUBLE AS v
  FROM embeddings
),
nrm AS (SELECT vec_id, sqrt(sum(v * v)) AS nv FROM u GROUP BY 1)
"""


@q("ann_cosine_topk", f"""
WITH {EMB_NORM_CTE},
qv AS (SELECT i, v FROM u WHERE vec_id = 0),
qn AS (SELECT sqrt(sum(v * v)) AS nq FROM qv),
dots AS (
  SELECT u.vec_id, sum(u.v * qv.v) AS dot
  FROM u JOIN qv USING (i) WHERE u.vec_id <> 0 GROUP BY 1
),
cosd AS (
  SELECT d.vec_id, d.dot / (n.nv * (SELECT nq FROM qn)) AS c
  FROM dots d JOIN nrm n USING (vec_id)
)
SELECT vec_id, cast(round(c * 1e6) AS BIGINT) AS cos_e6,
       row_number() OVER (ORDER BY round(c, 6) DESC, vec_id ASC) AS rnk
FROM cosd QUALIFY rnk <= 10
""")
def ann_cosine_topk(spark, sf_dir):
    """Brute-force cosine top-k over array<float> embeddings — the exact
    ANN baseline.  Dot products via higher-order functions (zip_with +
    aggregate), JVM-side, no UDF."""
    e = load_testdata(spark, sf_dir, "embeddings")
    e = e.withColumn("emb", F.col("embedding").cast("array<double>"))
    qv = e.where(F.col("vec_id") == 0).select(F.col("emb").alias("qe"))
    dot = F.expr("aggregate(zip_with(emb, qe, (x, y) -> x * y), "
                 "cast(0.0 as double), (acc, z) -> acc + z)")
    nrm = F.sqrt(F.expr("aggregate(transform(emb, x -> x * x), "
                        "cast(0.0 as double), (acc, z) -> acc + z)"))
    qn = F.sqrt(F.expr("aggregate(transform(qe, x -> x * x), "
                       "cast(0.0 as double), (acc, z) -> acc + z)"))
    cosd = (e.where(F.col("vec_id") != 0).crossJoin(F.broadcast(qv))
            .select("vec_id", (dot / (nrm * qn)).alias("c")))
    w = Window.orderBy(F.round(F.col("c"), 6).desc(), F.col("vec_id").asc())
    return (cosd.withColumn("rnk", F.row_number().over(w).cast("long"))
            .where(F.col("rnk") <= 10)
            .select("vec_id", e6(F.col("c")).alias("cos_e6"), "rnk"))


@q("ann_lsh_buckets", f"""
WITH {EMB_NORM_CTE},
planes AS (
  SELECT p.p, u2.i,
         CASE WHEN substring(md5(cast(p.p AS VARCHAR) || ':' ||
                             cast(u2.i AS VARCHAR)), 1, 1)
              IN ('8','9','a','b','c','d','e','f') THEN 1.0 ELSE -1.0 END AS sgn
  FROM (SELECT unnest(range(8)) AS p) p
  CROSS JOIN (SELECT DISTINCT i FROM u) u2
),
proj AS (
  SELECT u.vec_id, pl.p, sum(u.v * pl.sgn) AS dot
  FROM u JOIN planes pl USING (i) GROUP BY 1, 2
)
SELECT vec_id,
       cast(sum(CASE WHEN dot >= 0 THEN power(2, p) ELSE 0 END) AS BIGINT)
       AS bucket
FROM proj GROUP BY 1
""")
def ann_lsh_buckets(spark, sf_dir):
    """Scale-path ANN: deterministic random-hyperplane LSH — 8 ±1
    hyperplanes derived from md5(plane:dim) high-bit, bucket = sign
    pattern.  Neighbor candidates at scale = bucket-equality join
    instead of the quadratic cross join."""
    e = load_testdata(spark, sf_dir, "embeddings")
    u = (e.select("vec_id", F.posexplode(F.col("embedding").cast("array<double>"))
                  .alias("i", "v"))
         .withColumn("i", F.col("i") + 1))  # 1-based like generate_subscripts
    planes = (u.select("i").distinct()
              .crossJoin(F.broadcast(
                  u.sparkSession.range(8).select(F.col("id").alias("p"))))
              .withColumn("sgn", F.when(
                  F.substring(F.md5(F.concat_ws(":", F.col("p"), F.col("i"))), 1, 1)
                  .isin(*HEX_HIGH), F.lit(1.0)).otherwise(F.lit(-1.0))))
    proj = (u.join(planes, "i")
            .groupBy("vec_id", "p").agg(F.sum(F.col("v") * F.col("sgn")).alias("dot")))
    return (proj.groupBy("vec_id")
            .agg(F.sum(F.when(F.col("dot") >= 0,
                              F.pow(F.lit(2.0), F.col("p"))).otherwise(F.lit(0.0)))
                 .cast("long").alias("bucket")))


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

_MARKERS = [("the", "en"), ("a", "en"), ("der", "de"), ("und", "de"),
            ("le", "fr"), ("et", "fr"), ("el", "es"), ("y", "es"),
            ("de", "zh")]


@q("text_lang_id", f"""
WITH tok AS (
  SELECT d.doc_id, t.term FROM documents d,
  unnest(string_split(d.text, ' ')) AS t(term) WHERE t.term <> ''
),
markers(term, lang) AS (VALUES {", ".join(f"('{t}', '{l}')" for t, l in _MARKERS)}),
hits AS (
  SELECT tok.doc_id, m.lang, count(*) AS c
  FROM tok JOIN markers m USING (term) GROUP BY 1, 2
),
best AS (
  SELECT doc_id, lang,
         row_number() OVER (PARTITION BY doc_id
                            ORDER BY c DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, coalesce(b.lang, 'und') AS pred_lang
FROM documents d LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1) b
USING (doc_id)
""")
def text_lang_id(spark, sf_dir):
    """Language-ID heuristic: marker-token voting with deterministic
    argmax (count desc, lang asc), 'und' when no markers (reference
    confidence-floor analog, src/data/text.jl:32-41)."""
    d = load_testdata(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
           .where(F.col("term") != ""))
    markers = F.broadcast(d.sparkSession.createDataFrame(
        _MARKERS, "term STRING, lang STRING"))
    hits = tok.join(markers, "term").groupBy("doc_id", "lang") \
              .agg(F.count("*").alias("c"))
    w = Window.partitionBy("doc_id").orderBy(F.col("c").desc(),
                                             F.col("lang").asc())
    best = hits.withColumn("rn", F.row_number().over(w)).where(F.col("rn") == 1)
    return (d.select("doc_id")
            .join(best.select("doc_id", "lang"), "doc_id", "left")
            .select("doc_id", F.coalesce("lang", F.lit("und")).alias("pred_lang")))


@q("text_quality_score", """
WITH tok AS (
  SELECT d.doc_id, t.term FROM documents d,
  unnest(string_split(d.text, ' ')) AS t(term) WHERE t.term <> ''
),
st AS (
  SELECT doc_id, count(*) AS n_tok, count(DISTINCT term) AS n_uniq
  FROM tok GROUP BY 1
)
SELECT d.doc_id,
       coalesce(st.n_tok, 0) AS n_tok,
       cast(round(coalesce(st.n_uniq * 1.0 / st.n_tok, 0)
                  * least(1.0, coalesce(st.n_tok, 0) / 50.0) * 1e6) AS BIGINT)
       AS quality_e6
FROM documents d LEFT JOIN st USING (doc_id)
""")
def text_quality_score(spark, sf_dir):
    """Quality score: lexical diversity × length saturation — the
    length/ratio family of heuristics, engine-exact arithmetic."""
    d = load_testdata(spark, sf_dir, "documents")
    tok = (d.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
           .where(F.col("term") != ""))
    st = tok.groupBy("doc_id").agg(F.count("*").alias("n_tok"),
                                   F.countDistinct("term").alias("n_uniq"))
    qual = ((F.col("n_uniq") / F.col("n_tok"))
            * F.least(F.lit(1.0), F.col("n_tok") / F.lit(50.0)))
    return (d.select("doc_id").join(st, "doc_id", "left")
            .select("doc_id",
                    F.coalesce("n_tok", F.lit(0)).cast("long").alias("n_tok"),
                    F.coalesce(e6(qual), F.lit(0)).alias("quality_e6")))


@q("text_token_count_regex",
   "SELECT doc_id, cast(len(regexp_extract_all(text, '[a-z]+|[0-9]+')) "
   "AS BIGINT) AS n_tok FROM documents")
def text_token_count_regex(spark, sf_dir):
    """BPE-ish regex token counting (alpha runs + digit runs)."""
    d = load_testdata(spark, sf_dir, "documents")
    return d.select("doc_id", F.regexp_count("text", F.lit("[a-z]+|[0-9]+"))
                    .cast("long").alias("n_tok"))


@q("text_fingerprint", f"""
WITH {SHINGLES_CTE}
SELECT doc_id, min(md5(s)) AS fp FROM shd GROUP BY 1
""")
def text_fingerprint(spark, sf_dir):
    """Document fingerprint: winnowing-style min-hash over shingles
    (single global window — the rolling-hash family representative)."""
    shd = _shingles(spark, sf_dir)
    return shd.groupBy("doc_id").agg(F.min(F.md5("s")).alias("fp"))
