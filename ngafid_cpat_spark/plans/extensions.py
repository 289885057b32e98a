"""LLM-data-pipeline query catalog: dedup, similarity, text, media.

Driver-mandated extensions (SURVEY.md §2.11, BASELINE.json). Same
contract as relational.py: every oracle-paired query aliases columns
identically and rounds computed doubles on both sides. Queries with
engine-specific hashing (minhash/simhash/IVF) are registered without
an oracle — the driver records the weaker rows-only check — and get
exact-recall unit tests instead (tests/test_dedup.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions import text as T
from ..functions import vector as V
from ..operators import dedup as D
from ..operators import multimodal as M
from ..operators import similarity as S
from ..sources import load
from .relational import register

# Shared normalization SQL fragment (DuckDB needs the 'g' flag to
# replace globally; Spark's regexp_replace is global by default).
NORM_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"
SHINGLE_K = 3
JACCARD_THRESHOLD = 0.04

# Deterministic pseudo-random hyperplanes for embedding LSH (no RNG
# state to seed; shared by the Spark plan and its DuckDB oracle).
LSH_PLANES = [
    [(((i * 2654435761 + d * 40503) % 1000) - 500) / 500.0 for d in range(64)]
    for i in range(8)
]

_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(SQRT(list_dot_product({a}, {a})) * SQRT(list_dot_product({b}, {b})))"
)


def _plane_bucket_sql(vec: str) -> str:
    """Sign-bit bucket id of ``vec`` vs LSH_PLANES as a SQL expr —
    mirrors similarity.lsh_bucket_assignments bit for bit (same
    sequential dot-product order, same 2^i packing)."""
    bits = []
    for i, p in enumerate(LSH_PLANES):
        lit = "[" + ", ".join(repr(x) for x in p) + "]"
        bits.append(
            f"CASE WHEN list_dot_product({vec}, {lit}) > 0 THEN {1 << i} ELSE 0 END"
        )
    return " + ".join(bits)


# ---------------------------------------------------------------------------
# Dedup
# ---------------------------------------------------------------------------

@register(
    "dedup_exact",
    f"""
    SELECT md5({NORM_SQL}) AS fp,
           MIN(doc_id) AS keeper_id,
           COUNT(*) AS n_copies
    FROM documents GROUP BY 1
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by md5 fingerprint of normalized text — shuffle
    carries 16-byte keys, not bodies."""
    return D.exact_dedup(load(spark, sf_dir, "documents"))


_SHINGLE_SQL = f"""
    docs AS (
      SELECT doc_id, string_split({NORM_SQL}, ' ') AS toks FROM documents
    ),
    idx AS (
      SELECT doc_id, toks, unnest(range(1, len(toks) - {SHINGLE_K - 2})) AS i
      FROM docs WHERE len(toks) >= {SHINGLE_K}
    ),
    sh AS (
      SELECT DISTINCT doc_id, array_to_string(toks[i:i+{SHINGLE_K - 1}], ' ') AS s
      FROM idx
    )
"""


@register(
    "dedup_jaccard_pairs",
    f"""
    WITH {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id1, id2,
           ROUND(CAST(c AS DOUBLE) / (s1.n + s2.n - c), 4) AS jaccard
    FROM common
      JOIN sizes s1 ON common.id1 = s1.doc_id
      JOIN sizes s2 ON common.id2 = s2.doc_id
    WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= {JACCARD_THRESHOLD}
    """,
)
def dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact shingle-set Jaccard near-dup pairs via inverted-index
    join (no n^2 cross product)."""
    out = D.jaccard_pairs(
        load(spark, sf_dir, "documents"),
        k=SHINGLE_K,
        threshold=JACCARD_THRESHOLD,
    )
    return out.select("id1", "id2", F.round("jaccard", 4).alias("jaccard"))


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY 1),
    common AS (
      SELECT a.doc_id AS id1, b.doc_id AS id2, COUNT(*) AS c
      FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT id1, id2 FROM common
        JOIN sizes s1 ON common.id1 = s1.doc_id
        JOIN sizes s2 ON common.id2 = s2.doc_id
      WHERE CAST(c AS DOUBLE) / (s1.n + s2.n - c) >= {JACCARD_THRESHOLD}
    ),
    edges AS (
      SELECT id1 AS src, id2 AS dst FROM pairs
      UNION SELECT id2, id1 FROM pairs
    ),
    reach(id, root) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT e.dst, r.root FROM reach r JOIN edges e ON e.src = r.id
    )
    SELECT id AS doc_id, MIN(root) AS cluster_id
    FROM reach GROUP BY id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS (not just pairs): connected components over
    the exact-Jaccard pair graph by iterative min-label propagation —
    the dedup survivorship step that picks one representative per
    transitive duplicate group. Oracle: recursive CTE reachability.
    Isolated documents form singleton clusters."""
    docs = load(spark, sf_dir, "documents")
    pairs = D.jaccard_pairs(docs, k=SHINGLE_K, threshold=JACCARD_THRESHOLD)
    return D.connected_components(
        pairs, docs.select("doc_id"), id_col="doc_id"
    )


@register("dedup_minhash_lsh", None)  # hash-function-specific => rows-only
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash + banded LSH candidates, exact-Jaccard verified: the
    100 TB near-dedup path. Verified output equals an exact-Jaccard
    subset, so recall is unit-tested against dedup_jaccard_pairs."""
    out = D.minhash_lsh_pairs(
        load(spark, sf_dir, "documents"),
        k=SHINGLE_K,
        num_hashes=32,
        bands=16,
        verify_threshold=JACCARD_THRESHOLD,
    )
    return out.select("id1", "id2", F.round("jaccard", 4).alias("jaccard"))


@register("dedup_simhash", None)  # hash-function-specific => rows-only
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs within hamming distance 12 of the
    64-bit signature, candidates from 16-bit block collisions."""
    return D.simhash_pairs(
        load(spark, sf_dir, "documents"), max_hamming=12, k=SHINGLE_K
    )


@register(
    "embedding_neardup_pairs",
    """
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    )
    SELECT a.vec_id AS id1, b.vec_id AS id2,
           ROUND(list_dot_product(a.v, b.v) /
                 (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))), 4) AS cosine
    FROM e a JOIN e b ON a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) /
          (SQRT(list_dot_product(a.v, a.v)) * SQRT(list_dot_product(b.v, b.v))) >= 0.35
    """,
)
def embedding_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (exact, id<-restricted variant
    for oracle comparability; scale path buckets with LSH first)."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = D.embedding_neardup_pairs(emb, threshold=0.35)
    return out.select("id1", "id2", F.round("cosine", 4).alias("cosine"))


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------

def _query_vector(spark: SparkSession, sf_dir: str, vec_id: int = 0) -> list[float]:
    row = (
        load(spark, sf_dir, "embeddings")
        .filter(F.col("vec_id") == vec_id)
        .select("embedding")
        .first()
    )
    return [float(x) for x in row["embedding"]]


@register(
    "ann_cosine_topk",
    """
    WITH q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0),
         e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings WHERE vec_id <> 0)
    SELECT vec_id,
           ROUND(list_dot_product(v, qv) /
                 (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(qv, qv))), 4) AS cosine
    FROM e, q
    ORDER BY ROUND(list_dot_product(v, qv) /
                 (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(qv, qv))), 4) DESC,
             vec_id
    LIMIT 10
    """,
)
def ann_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-10 vs the vec_id=0 query vector: the
    exact ANN baseline. Dot product folds to codegen'd arithmetic;
    top-k is TakeOrdered (no global sort)."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = _query_vector(spark, sf_dir, 0)
    out = S.cosine_topk(emb, q, k=10, exclude_id=0)
    return out.select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    ).orderBy(F.round(F.col("cosine"), 4).desc(), F.col("vec_id"))


@register(
    "embedding_neardup_lsh",
    f"""
    WITH e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), b AS (
      SELECT vec_id, v, ({_plane_bucket_sql('v')}) AS bucket FROM e
    )
    SELECT a.vec_id AS id1, c.vec_id AS id2,
           ROUND({_COS_SQL.format(a='a.v', b='c.v')}, 4) AS cosine
    FROM b a JOIN b c ON a.bucket = c.bucket AND a.vec_id < c.vec_id
    WHERE {_COS_SQL.format(a='a.v', b='c.v')} >= 0.35
    """,
)
def embedding_neardup_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed near-dup pairs — the linear-shuffle
    scale path for embedding dedup. The hyperplanes are deterministic
    literals, so even this LSH variant is fully oracle-paired (the
    DuckDB SQL recomputes the same sign-bit buckets)."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    out = D.embedding_neardup_lsh(emb, LSH_PLANES, threshold=0.35)
    return out.select("id1", "id2", F.round("cosine", 4).alias("cosine"))


@register(
    "ann_topk_batch",
    """
    WITH q AS (
      SELECT vec_id AS qid, CAST(embedding AS DOUBLE[]) AS qv
      FROM embeddings WHERE vec_id < 10
    ), e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), scored AS (
      SELECT qid, vec_id,
             ROUND(list_dot_product(v, qv) /
                   (SQRT(list_dot_product(v, v)) * SQRT(list_dot_product(qv, qv))), 4) AS cosine
      FROM e, q WHERE vec_id <> qid
    )
    SELECT qid, vec_id, cosine FROM (
      SELECT qid, vec_id, cosine,
             ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cosine DESC, vec_id) AS rn
      FROM scored
    ) WHERE rn <= 5
    """,
)
def ann_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched similarity search: top-5 neighbors for EACH of the
    first 10 query vectors in one plan — broadcast the query block,
    score all pairs, windowed top-k per query. The realistic
    many-query ANN shape (one scan serves the whole query batch)."""
    emb = load(spark, sf_dir, "embeddings").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("qid"), F.col("v").alias("qv")
    )
    scored = (
        emb.join(F.broadcast(q), F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.round(
                V.dot("v", "qv") / (V.norm("v") * V.norm("qv")), 4
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.col("cosine").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("qid", "vec_id", "cosine")
    )


@register(
    "ann_ivf_topk",
    f"""
    WITH c AS (
      SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
      FROM embeddings WHERE vec_id < 8
    ), e AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
    ), q AS (
      SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id = 0
    ), assign AS (
      SELECT e.vec_id, e.v,
             arg_max(c.cid, {_COS_SQL.format(a='e.v', b='c.cv')}) AS cid
      FROM e CROSS JOIN c GROUP BY e.vec_id, e.v
    ), probes AS (
      SELECT cid FROM c, q
      ORDER BY {_COS_SQL.format(a='c.cv', b='qv')} DESC, cid LIMIT 2
    )
    SELECT vec_id, ROUND(cos, 4) AS cosine FROM (
      SELECT a.vec_id, {_COS_SQL.format(a='a.v', b='qv')} AS cos
      FROM assign a JOIN probes p ON a.cid = p.cid, q
      ORDER BY ROUND(cos, 6) DESC, vec_id LIMIT 10
    )
    ORDER BY ROUND(cos, 4) DESC, vec_id
    """,
)
def ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: vectors assigned to nearest of 8 seed centroids
    (embedding rows 0-7 — a deterministic codebook, so the whole
    approximate search is oracle-paired), probe the 2 closest to the
    query. Recall vs the exact baseline is unit-tested
    (tests/test_similarity.py)."""
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    q = _query_vector(spark, sf_dir, 0)
    seeds = (
        emb.filter(F.col("vec_id") < 8).select("vec_id", "embedding").collect()
    )
    centroids = [(int(r["vec_id"]), [float(x) for x in r["embedding"]]) for r in seeds]
    out = S.ivf_topk(emb, q, centroids, k=10, n_probe=2)
    return out.select(
        "vec_id", F.round("cosine", 4).alias("cosine")
    ).orderBy(F.round(F.col("cosine"), 4).desc(), F.col("vec_id"))


# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------

_STOP_SUM = " + ".join(
    f"CASE WHEN list_contains(toks, '{s}') THEN 1 ELSE 0 END" for s in T.STOPWORDS_EN
)


@register(
    "text_stats",
    f"""
    WITH t AS (
      SELECT doc_id, {NORM_SQL} AS norm,
             string_split({NORM_SQL}, ' ') AS toks,
             text
      FROM documents
    )
    SELECT doc_id,
           length(norm) AS n_chars_norm,
           len(toks) AS n_tokens,
           ROUND(CAST(length(norm) - (len(toks) - 1) AS DOUBLE) / len(toks), 4) AS avg_token_len,
           length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS punct_cnt,
           ROUND(CAST({_STOP_SUM} AS DOUBLE) / len(toks), 4) AS stopword_ratio
    FROM t
    """,
)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token/char statistics, all JVM-side expressions."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        F.length(T.normalize("text")).cast("long").alias("n_chars_norm"),
        T.token_count("text").cast("long").alias("n_tokens"),
        F.round(T.avg_token_len("text"), 4).alias("avg_token_len"),
        T.punct_count("text").cast("long").alias("punct_cnt"),
        F.round(T.stopword_ratio("text"), 4).alias("stopword_ratio"),
    )


@register(
    "text_quality",
    f"""
    WITH t AS (
      SELECT doc_id, text, string_split({NORM_SQL}, ' ') AS toks FROM documents
    ), parts AS (
      SELECT doc_id,
             LEAST(CAST(length(text) AS DOUBLE) / 500.0, 1.0) AS length_score,
             1.0 - LEAST(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g')) AS DOUBLE)
                         / GREATEST(CAST(length(text) AS DOUBLE), 1.0) * 4.0, 1.0) AS punct_score,
             LEAST(CAST({_STOP_SUM} AS DOUBLE) / len(toks) * 10.0, 1.0) AS stop_score
      FROM t
    )
    SELECT doc_id, ROUND((length_score + punct_score + stop_score) / 3.0, 4) AS quality
    FROM parts
    """,
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic quality score in [0,1] (length / punctuation /
    stopword-presence mix) — identical arithmetic both sides."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.round(T.quality_score("text"), 4).alias("quality")
    )


_LANG_SCORE_SQL = ", ".join(
    "CAST("
    + " + ".join(
        f"CASE WHEN list_contains(toks, '{m}') THEN 1 ELSE 0 END" for m in markers
    )
    + f" AS INTEGER) AS score_{lang}"
    for lang, markers in sorted(T.LANG_MARKERS.items())
)


@register(
    "lang_id_docs",
    f"""
    WITH t AS (
      SELECT doc_id, string_split({NORM_SQL}, ' ') AS toks FROM documents
    ), scored AS (
      SELECT doc_id, {_LANG_SCORE_SQL} FROM t
    ), unp AS (
      SELECT doc_id, lang, score FROM scored
      UNPIVOT (score FOR lang IN (score_de AS 'de', score_en AS 'en', score_es AS 'es',
                                  score_fr AS 'fr', score_zh AS 'zh'))
    ), best AS (
      SELECT doc_id, lang, score,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
      FROM unp
    )
    SELECT doc_id,
           CASE WHEN score > 0 THEN lang ELSE 'und' END AS lang_pred
    FROM best WHERE rn = 1
    """,
)
def lang_id_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Expression-only language ID by stopword-marker voting (argmax,
    ties to the lexicographically last code, 'und' when scoreless).
    The richer char-trigram model lives in functions/text.py."""
    docs = load(spark, sf_dir, "documents")
    return docs.select("doc_id", T.lang_id("text").alias("lang_pred"))


@register(
    "token_count_bpe",
    f"""
    SELECT doc_id,
           len(regexp_extract_all(lower(text), '{T.TOKEN_REGEX}')) AS n_bpe_tokens
    FROM documents
    """,
)
def token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sub-word-ish token counting with a BPE-ish regex, JVM-side."""
    docs = load(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", T.token_count_bpe("text").cast("long").alias("n_bpe_tokens")
    )


# ---------------------------------------------------------------------------
# Multimodal (binary) columns
# ---------------------------------------------------------------------------

# ---------------------------------------------------------------------------
# Flight-domain flagship (rows-only: the full approach pipeline)
# ---------------------------------------------------------------------------

@register("approach_pipeline_demo", None)  # windowed pipeline => rows-only
def approach_pipeline_demo(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full approach/landing analysis
    (FlightAnalysis.py:46-330 re-expressed in plans/approach.py), run
    distributed over telemetry synthesized from the events table:
    user_id -> flight, per-user row_number -> tick, value -> altitude
    profile. Exercises nearest-airport argmin, takeoff detection,
    episode islands, final-band predicates, runway theta-join and
    landing classification end-to-end at SF scale."""
    from pyspark.sql import Window as W

    from . import approach as AP

    ev = load(spark, sf_dir, "events")
    rn = F.row_number().over(W.partitionBy("user_id").orderBy("ts", "event_id"))
    telemetry = ev.select(
        F.col("user_id").alias("flight"),
        rn.alias("time"),
        (F.lit(800.0) + F.col("value") * 10).alias("msl_altitude"),
        (F.col("value") / 2).alias("indicated_airspeed"),
        (-F.col("value")).alias("vertical_airspeed"),
        F.lit(90.0).alias("heading"),
        (F.lit(40.0) + F.col("value") / 5000).alias("latitude"),
        (F.lit(-85.0) + F.col("value") / 5000).alias("longitude"),
    )
    airports = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "latitude": 40.0, "longitude": -85.0,
             "elevation_ft": 800.0},
            {"airport_code": "KBBB", "latitude": 40.02, "longitude": -84.98,
             "elevation_ft": 820.0},
        ]
    )
    runways = spark.createDataFrame(
        [
            {"airport_code": "KAAA", "runway_code": "09",
             "magnetic_rwy_hdg": 90.0, "true_rwy_hdg": 90.0,
             "center_lat": 40.0, "center_long": -85.0},
            {"airport_code": "KBBB", "runway_code": "08",
             "magnetic_rwy_hdg": 85.0, "true_rwy_hdg": 85.0,
             "center_lat": 40.02, "center_long": -84.98},
        ]
    )
    return AP.analyze(telemetry, airports, runways)


@register(
    "multimodal_meta",
    """
    SELECT doc_id AS media_id,
           'text' AS media_type,
           octet_length(encode(text)) AS n_bytes,
           sha256(text) AS sha256
    FROM documents
    """,
)
def multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column plumbing: text payloads as binary + typed meta,
    hashed and measured through the mapInPandas feature extractor
    (decode stubbed — see operators/multimodal.py)."""
    media = M.assemble_media(
        load(spark, sf_dir, "documents"),
        id_col="doc_id",
        payload_expr="text",
        media_type="text",
        source_col="source",
    )
    feats = M.extract_features(media, fake=True)
    return feats.select(
        "media_id",
        "media_type",
        F.col("n_bytes").cast("long").alias("n_bytes"),
        "sha256",
    )


@register(
    "vocab_topk",
    f"""
    WITH toks AS (
      SELECT unnest(string_split({NORM_SQL}, ' ')) AS token FROM documents
    )
    SELECT token, COUNT(*) AS n
    FROM toks GROUP BY token
    ORDER BY n DESC, token LIMIT 20
    """,
)
def vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-k: explode (generator/UDTF surface) +
    global count + TakeOrdered top-20. At scale the count partial-
    aggregates map-side, so the shuffle carries one row per distinct
    token per partition, and the top-k never sorts the full vocab."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(T.tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
        .limit(20)
    )


@register(
    "quantile_events",
    """
    SELECT event_type,
           ROUND(median(value), 4) AS median_value,
           ROUND(quantile_cont(value, 0.9), 4) AS p90_value,
           ROUND(quantile_cont(value, 0.99), 4) AS p99_value,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def quantile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact quantile aggregates (median / p90 / p99, continuous
    interpolation — Spark percentile == DuckDB quantile_cont). The
    exact form is the correctness baseline; approx_quantile_events is
    the sketch-based scale path."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.round(F.median("value"), 4).alias("median_value"),
        F.round(F.percentile("value", 0.9), 4).alias("p90_value"),
        F.round(F.percentile("value", 0.99), 4).alias("p99_value"),
        F.count(F.lit(1)).alias("n"),
    )


@register("approx_quantile_events", None)  # sketch-based => rows-only
def approx_quantile_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greenwald-Khanna approximate percentiles — the 100 TB path
    where exact quantiles would sort every group."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.percentile_approx("value", 0.5, 1000).alias("median_approx"),
        F.percentile_approx("value", 0.9, 1000).alias("p90_approx"),
    )


@register(
    "skew_salted_event_type_agg",
    """
    SELECT event_type,
           COUNT(*) AS n,
           ROUND(SUM(value), 2) AS sum_value,
           ROUND(MAX(value), 2) AS max_value
    FROM events GROUP BY event_type
    """,
)
def skew_salted_event_type_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation on a LOW-cardinality hot key
    (event_type — 5 values over the whole fact): the salt spreads
    each hot key over 16 reducers for the partial phase, the final
    phase combines 16 rows per key. Results are identical to the
    plain GROUP BY (the oracle), so the skew path is fully
    correctness-gated."""
    from ..operators import skew as SK

    ev = load(spark, sf_dir, "events")
    out = SK.salted_agg(
        ev,
        key_cols=["event_type"],
        salt_from=["event_id"],
        partial_aggs=[
            (F.count(F.lit(1)), "pn"),
            (F.sum("value"), "psum"),
            (F.max("value"), "pmax"),
        ],
        final_aggs=[
            (F.sum("pn").cast("long"), "n"),
            (F.round(F.sum("psum"), 2), "sum_value"),
            (F.round(F.max("pmax"), 2), "max_value"),
        ],
        n_salts=16,
    )
    return out.select("event_type", "n", "sum_value", "max_value")


# ---------------------------------------------------------------------------
# Corpus-preparation pipeline (operators/corpus.py)
# ---------------------------------------------------------------------------

from ..operators import corpus as C  # noqa: E402
from ..operators.corpus import SAMPLE_HASH_SQL  # noqa: E402

SAMPLE_RATES = {"src0": 500, "src1": 250, "src2": 125}
_RATE_SQL = (
    "CASE source WHEN 'src0' THEN 500 WHEN 'src1' THEN 250 "
    "WHEN 'src2' THEN 125 ELSE 50 END"
)


@register(
    "stratified_sample_docs",
    f"""
    SELECT doc_id, source, n_chars
    FROM documents
    WHERE {SAMPLE_HASH_SQL('doc_id')} < {_RATE_SQL}
    """,
)
def stratified_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-mixing sampler: per-source keep rates applied through a
    deterministic multiplicative hash of doc_id — map-side only, no
    RNG state, identical subset on every engine and every rerun (the
    property a resumable 100 TB pipeline actually needs)."""
    docs = load(spark, sf_dir, "documents")
    out = C.stratified_sample(docs, SAMPLE_RATES, default_permille=50)
    return out.select("doc_id", "source", "n_chars")


@register(
    "pack_sequences_docs",
    f"""
    WITH t AS (
      SELECT doc_id, source,
             len(string_split({NORM_SQL}, ' ')) AS n_tok
      FROM documents
    ), c AS (
      SELECT doc_id, source, n_tok,
             SUM(n_tok) OVER (PARTITION BY source ORDER BY doc_id
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tape_end
      FROM t WHERE n_tok > 0
    )
    SELECT doc_id, source, n_tok,
           tape_end - n_tok AS start_off,
           (tape_end - n_tok) // 256 AS chunk_first,
           (tape_end - 1) // 256 AS chunk_last
    FROM c
    """,
)
def pack_sequences_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing for pretraining: per-source token tape,
    256-token chunks; emits each doc's tape offset and chunk span.
    One window shuffle; exact integer division for chunk ids (tape
    offsets pass 2^53 long before 100 TB does)."""
    docs = load(spark, sf_dir, "documents")
    return C.pack_sequences(docs, budget=256)


@register(
    "contamination_check_docs",
    f"""
    WITH {_SHINGLE_SQL},
    eval_sh AS (SELECT DISTINCT s FROM sh WHERE doc_id % 23 = 0),
    train AS (SELECT doc_id, s FROM sh WHERE doc_id % 23 <> 0),
    sizes AS (SELECT doc_id, COUNT(*) AS n_shingles FROM train GROUP BY 1),
    hits AS (
      SELECT t.doc_id, COUNT(*) AS n_overlap
      FROM train t JOIN eval_sh e ON t.s = e.s GROUP BY 1
    )
    SELECT s.doc_id, s.n_shingles,
           COALESCE(h.n_overlap, 0) AS n_overlap,
           ROUND(CAST(COALESCE(h.n_overlap, 0) AS DOUBLE) / s.n_shingles, 4)
             AS contamination
    FROM sizes s LEFT JOIN hits h ON s.doc_id = h.doc_id
    WHERE COALESCE(h.n_overlap, 0) > 0
    """,
)
def contamination_check_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination check: every 23rd document plays the
    held-out eval set; per train doc, the count and fraction of its
    distinct 3-shingles that appear anywhere in the eval set —
    broadcast inverted-index join, no pairwise comparison."""
    docs = load(spark, sf_dir, "documents")
    out = C.contamination(
        docs.filter(F.pmod("doc_id", F.lit(23)) != 0),
        docs.filter(F.pmod("doc_id", F.lit(23)) == 0),
        k=SHINGLE_K,
    )
    return out.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        F.round("contamination", 4).alias("contamination"),
    )
