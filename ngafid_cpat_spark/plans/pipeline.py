"""Behavioral-analytics + corpus-curation query catalog.

Second wave of driver-mandated pipeline breadth (SURVEY.md §2.11):
per-document TF-IDF ranking, within-document repetition signals,
quality-aware dedup survivorship, event funnels, weekly cohort
retention, and percentile length-band filtering — the day-to-day
shapes of an LLM training-data pipeline and of product analytics
over the events fact.

Same contract as relational.py / extensions.py: identical column
aliases both sides; every score that crosses engines is either exact
integer arithmetic (TF-IDF permille idf, discrete quantile bounds,
week offsets) or a rounded quotient of small integers whose distance
from a decimal tie is >= 1/(2*den) (repetition ratios).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import behavior as B
from ..operators import corpus as C
from ..sources import load
from .extensions import NORM_SQL
from .relational import register

# DuckDB-side normalized, empty-filtered token list (Spark twin:
# functions/text.tokens — split of the normalized text).
_TOKS_SQL = f"list_filter(string_split({NORM_SQL}, ' '), x -> x <> '')"


# ---------------------------------------------------------------------------
# TF-IDF characteristic terms (explode + two-level agg + broadcast + top-k)
# ---------------------------------------------------------------------------

@register(
    "tfidf_topk_terms",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), tok AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), nd AS (
      SELECT COUNT(DISTINCT doc_id) AS n_docs FROM tok
    ), scored AS (
      SELECT doc_id, term, tf, df,
             CAST(tf * ((n_docs * 1000) // df - 1000) AS BIGINT) AS score_milli
      FROM tf JOIN dfreq USING (term), nd
    )
    SELECT doc_id, term, tf, df, score_milli, rn FROM (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY doc_id ORDER BY score_milli DESC, term) AS rn
      FROM scored
    ) WHERE rn <= 3
    """,
)
def tfidf_topk_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 characteristic terms per document by TF-IDF with an
    integer-permille idf (engine-portable, rank-isomorphic to ln).
    The document-frequency table is vocabulary-sized and broadcast;
    see operators/corpus.tfidf_topk for the scale notes."""
    out = C.tfidf_topk(load(spark, sf_dir, "documents"), k=3)
    return out.withColumn("rn", F.col("rn").cast("long"))


# ---------------------------------------------------------------------------
# Within-document repetition (Gopher-style quality filters)
# ---------------------------------------------------------------------------

@register(
    "repetition_docs",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), tok AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ), per AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2
    ), uni AS (
      SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS n_tokens,
             COUNT(*) AS n_distinct, MAX(tf) AS max_tf
      FROM per GROUP BY 1
    ), idx AS (
      SELECT doc_id, toks, unnest(range(1, len(toks))) AS i
      FROM t WHERE len(toks) >= 2
    ), bigr AS (
      SELECT doc_id, toks[i] || ' ' || toks[i + 1] AS bigram FROM idx
    ), perb AS (
      SELECT doc_id, bigram, COUNT(*) AS bf FROM bigr GROUP BY 1, 2
    ), bi AS (
      SELECT doc_id, CAST(SUM(bf) AS BIGINT) AS n_bigrams,
             COUNT(*) AS n_distinct_bigrams
      FROM perb GROUP BY 1
    )
    SELECT uni.doc_id, n_tokens, n_distinct,
           ROUND(1.0 - n_distinct / n_tokens, 4) AS dup_token_ratio,
           ROUND(max_tf / n_tokens, 4) AS top_token_ratio,
           COALESCE(n_bigrams, 0) AS n_bigrams,
           CASE WHEN n_bigrams IS NULL THEN NULL
                ELSE ROUND(1.0 - n_distinct_bigrams / n_bigrams, 4)
           END AS dup_bigram_ratio
    FROM uni LEFT JOIN bi ON uni.doc_id = bi.doc_id
    """,
)
def repetition_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicate-token / top-token-dominance / duplicate-bigram
    fractions per document — the standard repetition quality gate
    before pretraining. One explode feeds both the unigram and the
    lead()-based bigram paths (no second tokenize)."""
    return C.repetition_stats(load(spark, sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Dedup survivorship: keep the best copy
# ---------------------------------------------------------------------------

@register(
    "dedup_keep_best",
    f"""
    WITH f AS (
      SELECT doc_id, n_chars, md5({NORM_SQL}) AS fp,
             ROW_NUMBER() OVER (PARTITION BY md5({NORM_SQL})
                                ORDER BY n_chars DESC, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY md5({NORM_SQL})) AS n_copies
      FROM documents
    )
    SELECT fp, doc_id AS keeper_id, n_chars AS keeper_quality, n_copies
    FROM f WHERE rn = 1
    """,
)
def dedup_keep_best(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-duplicate groups keep their highest-quality member
    (longest text, ties to lowest id) — dedup that chooses the best
    copy rather than an arbitrary one. Shuffles 16-byte fingerprints,
    never text bodies."""
    return C.keep_best_per_duplicate_group(
        load(spark, sf_dir, "documents"), quality_col="n_chars"
    )


# ---------------------------------------------------------------------------
# Event funnel (sequential conversion)
# ---------------------------------------------------------------------------

@register(
    "funnel_events",
    """
    WITH u1 AS (
      SELECT user_id, MIN(CASE WHEN event_type = 'view' THEN ts END) AS v
      FROM events GROUP BY 1
    ), u2 AS (
      SELECT e.user_id, MIN(e.ts) AS c
      FROM events e JOIN u1 ON e.user_id = u1.user_id
      WHERE e.event_type = 'click' AND u1.v IS NOT NULL AND e.ts > u1.v
      GROUP BY 1
    ), u3 AS (
      SELECT e.user_id, MIN(e.ts) AS p
      FROM events e JOIN u2 ON e.user_id = u2.user_id
      WHERE e.event_type = 'purchase' AND e.ts > u2.c
      GROUP BY 1
    )
    SELECT COUNT(*) AS n_users,
           COUNT(v) AS n_view,
           (SELECT COUNT(*) FROM u2) AS n_view_click,
           (SELECT COUNT(*) FROM u3) AS n_full_funnel
    FROM u1
    """,
)
def funnel_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered view -> click -> purchase funnel: each stage's
    timestamp must strictly follow the previous stage's. Chained
    unbounded windows over ONE user_id partitioning (single shuffle;
    the sequential dependency chains through columns, not joins),
    then a global conversion rollup. See operators/behavior.py."""
    ev = load(spark, sf_dir, "events")
    out = B.funnel_counts(ev, ["view", "click", "purchase"])
    return out.select(
        "n_users",
        F.col("n_view"),
        F.col("n_click").alias("n_view_click"),
        F.col("n_purchase").alias("n_full_funnel"),
    )


# ---------------------------------------------------------------------------
# Weekly cohort retention
# ---------------------------------------------------------------------------

@register(
    "retention_cohorts",
    """
    WITH w AS (
      SELECT user_id, date_trunc('week', ts) AS wk FROM events
    ), c AS (
      SELECT user_id, wk, MIN(wk) OVER (PARTITION BY user_id) AS cohort
      FROM w
    ), d AS (
      SELECT DISTINCT user_id, CAST(cohort AS DATE) AS cohort_week,
             date_diff('day', CAST(cohort AS DATE), CAST(wk AS DATE)) // 7
               AS week_offset
      FROM c
    )
    SELECT cohort_week, week_offset, COUNT(*) AS n_users
    FROM d GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classic cohort retention: users grouped by first-active week
    (Monday-truncated on both engines), counted in each later week
    they reappear. Week offsets are exact integer day-arithmetic.
    One shuffle on user_id, one on the (cohort, offset) rollup."""
    return B.retention(load(spark, sf_dir, "events"))


# ---------------------------------------------------------------------------
# Statistical moments (engine-exact stddev / covariance / correlation)
# ---------------------------------------------------------------------------
#
# Built-in corr()/stddev() accumulate doubles in partition order, so
# their low bits differ run to run and engine to engine. The exact
# twin: single-pass INTEGER moment sums (value in cents, k raw), then
# one closed-form double expression evaluated on identical BIGINT
# inputs — IEEE ops on identical operands are bit-identical, so even
# the truncation is portable (floor, not round: no decimal-shortest-
# representation ambiguity). Also the right shape at 100 TB: integer
# partial aggregates, one shuffle, no second pass for the mean.

# Guards make degenerate groups NULL on BOTH engines identically:
# n=1 groups hit 0/0 (Spark non-ANSI NULL vs DuckDB IEEE NaN — a
# cross-engine hash mismatch), and zero variance makes corr 0/0.
# Pair-moment sums (p-prefixed) cover only rows where BOTH variables
# are present, with their own pair count — mixing an all-rows n with
# null-skipping sums is not the covariance of any population.
_MOM_FINAL = {
    "stddev_value": (
        "CASE WHEN nxd > 1.0 THEN"
        " FLOOR(SQRT((nxd * sxxd - sxd * sxd) / (nxd * (nxd - 1.0)))"
        " / 100.0 * 10000) / 10000 END"
    ),
    "covar_value_k": (
        "CASE WHEN npd > 1.0 THEN"
        " FLOOR((npd * spxyd - spxd * spyd) / (npd * (npd - 1.0))"
        " / 100.0 * 10000) / 10000 END"
    ),
    "corr_value_k": (
        "CASE WHEN npd > 1.0"
        " AND (npd * spxxd - spxd * spxd) > 0"
        " AND (npd * spyyd - spyd * spyd) > 0 THEN"
        " FLOOR((npd * spxyd - spxd * spyd)"
        " / SQRT((npd * spxxd - spxd * spxd) * (npd * spyyd - spyd * spyd))"
        " * 10000) / 10000 END"
    ),
}

_MOM_SUMS_SQL = """
      SELECT event_type,
             COUNT(*) AS n,
             COUNT(vc) AS nx,
             SUM(vc) AS sx, SUM(vc * vc) AS sxx,
             COUNT(CASE WHEN vc IS NOT NULL AND k IS NOT NULL THEN 1 END) AS np,
             SUM(CASE WHEN k IS NOT NULL THEN vc END) AS spx,
             SUM(CASE WHEN k IS NOT NULL THEN vc * vc END) AS spxx,
             SUM(CASE WHEN vc IS NOT NULL THEN k END) AS spy,
             SUM(CASE WHEN vc IS NOT NULL THEN k * k END) AS spyy,
             SUM(vc * k) AS spxy
      FROM (
        SELECT event_type,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS vc,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events
      ) GROUP BY event_type
"""


@register(
    "stats_moments_events",
    f"""
    WITH sums AS ({_MOM_SUMS_SQL}),
    d AS (
      SELECT event_type, n,
             CAST(nx AS DOUBLE) AS nxd,
             CAST(sx AS DOUBLE) AS sxd, CAST(sxx AS DOUBLE) AS sxxd,
             CAST(np AS DOUBLE) AS npd,
             CAST(spx AS DOUBLE) AS spxd, CAST(spxx AS DOUBLE) AS spxxd,
             CAST(spy AS DOUBLE) AS spyd, CAST(spyy AS DOUBLE) AS spyyd,
             CAST(spxy AS DOUBLE) AS spxyd
      FROM sums
    )
    SELECT event_type, n,
           {_MOM_FINAL['stddev_value']} AS stddev_value,
           {_MOM_FINAL['covar_value_k']} AS covar_value_k,
           {_MOM_FINAL['corr_value_k']} AS corr_value_k
    FROM d
    """,
)
def stats_moments_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample stddev of value plus covariance/correlation between
    value and the JSON prop k, per event type — from exact integer
    moment sums (see module notes above)."""
    ev = load(spark, sf_dir, "events")
    vc = F.round(F.col("value") * 100, 0).cast("long")
    k = F.get_json_object("props", "$.k").cast("long")
    both = F.col("vc").isNotNull() & F.col("k").isNotNull()
    sums = (
        ev.select("event_type", vc.alias("vc"), k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count("vc").alias("nx"),
            F.sum("vc").alias("sx"),
            F.sum(F.col("vc") * F.col("vc")).alias("sxx"),
            F.count(F.when(both, 1)).alias("np"),
            F.sum(F.when(F.col("k").isNotNull(), F.col("vc"))).alias("spx"),
            F.sum(F.when(F.col("k").isNotNull(), F.col("vc") * F.col("vc"))).alias("spxx"),
            F.sum(F.when(F.col("vc").isNotNull(), F.col("k"))).alias("spy"),
            F.sum(F.when(F.col("vc").isNotNull(), F.col("k") * F.col("k"))).alias("spyy"),
            F.sum(F.col("vc") * F.col("k")).alias("spxy"),
        )
    )
    d = sums.select(
        "event_type",
        "n",
        F.col("nx").cast("double").alias("nxd"),
        F.col("sx").cast("double").alias("sxd"),
        F.col("sxx").cast("double").alias("sxxd"),
        F.col("np").cast("double").alias("npd"),
        F.col("spx").cast("double").alias("spxd"),
        F.col("spxx").cast("double").alias("spxxd"),
        F.col("spy").cast("double").alias("spyd"),
        F.col("spyy").cast("double").alias("spyyd"),
        F.col("spxy").cast("double").alias("spxyd"),
    )
    return d.select(
        "event_type",
        "n",
        F.expr(_MOM_FINAL["stddev_value"]).alias("stddev_value"),
        F.expr(_MOM_FINAL["covar_value_k"]).alias("covar_value_k"),
        F.expr(_MOM_FINAL["corr_value_k"]).alias("corr_value_k"),
    )


# ---------------------------------------------------------------------------
# Percentile length band (discrete-quantile filter, all-integer)
# ---------------------------------------------------------------------------

@register(
    "length_band_docs",
    """
    WITH h AS (
      SELECT n_chars, COUNT(*) AS c FROM documents GROUP BY 1
    ), cum AS (
      SELECT n_chars, SUM(c) OVER (ORDER BY n_chars) AS cum FROM h
    ), t AS (
      SELECT SUM(c) AS n FROM h
    ), b AS (
      SELECT MIN(CASE WHEN 20 * cum >= n THEN n_chars END) AS lo,
             MIN(CASE WHEN 20 * cum >= 19 * n THEN n_chars END) AS hi
      FROM cum, t
    )
    SELECT doc_id, n_chars FROM documents, b
    WHERE n_chars BETWEEN lo AND hi
    """,
)
def length_band_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep documents inside the [p05, p95] length band using
    DISCRETE quantiles derived from an all-integer cumulative
    histogram — no interpolated doubles, so the band edges are
    bit-identical on every engine (quantile_cont interpolation is
    not: (1-f)*a + f*b vs a + (b-a)*f differ by 1 ulp exactly where
    a tie matters). The histogram is distinct-length-sized, so the
    global cumsum window is over a tiny frame and the bounds
    broadcast back onto the full scan."""
    docs = load(spark, sf_dir, "documents")
    hist = docs.groupBy("n_chars").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.orderBy("n_chars").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cum", F.sum("c").over(wcum))
    tot = hist.agg(F.sum("c").alias("n"))
    bounds = cum.crossJoin(F.broadcast(tot)).agg(
        F.min(
            F.when(20 * F.col("cum") >= F.col("n"), F.col("n_chars"))
        ).alias("lo"),
        F.min(
            F.when(20 * F.col("cum") >= 19 * F.col("n"), F.col("n_chars"))
        ).alias("hi"),
    )
    return (
        docs.crossJoin(F.broadcast(bounds))
        .filter(F.col("n_chars").between(F.col("lo"), F.col("hi")))
        .select("doc_id", "n_chars")
    )
