"""Retrieval-tier query catalog (r12): BM25 ranked retrieval and
lexical+vector reciprocal-rank fusion — the standard companion pair
to the ANN surface for contamination / quality / retrieval workflows
over an LLM training corpus (the r11 verdict's ask #3) — plus the
suffix-array/LCP longest-duplicate-span dedup tier (ask #7).

Same contract as the rest of plans/: identical column aliases on
both sides, and every score that crosses engines is exact integer
arithmetic (permille idf, micro reciprocal ranks, token-count LCPs)
so the driver's value-hash gate holds bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..operators import corpus as C
from ..operators import similarity as S
from ..sources import load
from .extensions import NORM_SQL, _COS_Q_SQL, _query_vector
from .relational import register

# DuckDB-side normalized, empty-filtered token list (Spark twin:
# functions/text.tokens — split of the normalized text).
_TOKS_SQL = f"list_filter(string_split({NORM_SQL}, ' '), x -> x <> '')"

# The fixed retrieval query: five mid-frequency corpus terms. A
# literal, like the LSH planes / CMS salts — determinism doctrine.
BM25_QUERY_TERMS = ["spark", "window", "join", "data", "vector"]
RRF_K = 60  # the standard reciprocal-rank-fusion constant
RRF_DEPTH = 20  # per-system candidate depth feeding the fusion

_TERMS_SQL = ", ".join(f"'{t}'" for t in BM25_QUERY_TERMS)

# Shared BM25 oracle CTE chain ending in a `bm25` relation of
# (doc_id, score_milli, rn) for the top `depth` docs — the exact
# integer replay of operators/corpus.bm25_topk's derivation.
def _bm25_cte(depth: int) -> str:
    return f"""
    t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), tok AS (
      SELECT doc_id, unnest(toks) AS term FROM t
    ), dl AS (
      SELECT doc_id, COUNT(*) AS dl FROM tok GROUP BY 1
    ), scal AS (
      SELECT COUNT(*) AS n_docs,
             (1000 * SUM(dl)) // COUNT(*) AS a
      FROM dl
    ), tf AS (
      SELECT doc_id, term, COUNT(*) AS tf FROM tok
      WHERE term IN ({_TERMS_SQL}) GROUP BY 1, 2
    ), dfreq AS (
      SELECT term, COUNT(*) AS df FROM tf GROUP BY 1
    ), contrib AS (
      SELECT tf.doc_id,
             ((1000 * (2 * n_docs - 2 * df + 1)) // (2 * df + 1))
               * 22 * tf * a
               // (10 * tf * a + 3 * a + 9000 * dl.dl) AS c
      FROM tf JOIN dfreq USING (term) JOIN dl USING (doc_id), scal
    ), perdoc AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS score_milli
      FROM contrib GROUP BY 1
    ), bm25 AS (
      SELECT doc_id, score_milli,
             CAST(ROW_NUMBER() OVER (
               ORDER BY score_milli DESC, doc_id) AS INT) AS rn
      FROM perdoc
      ORDER BY score_milli DESC, doc_id LIMIT {depth}
    )"""


@register(
    "bm25_topk_docs",
    f"""
    WITH {_bm25_cte(10)}
    SELECT doc_id, score_milli, rn FROM bm25 ORDER BY rn
    """,
)
def bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Okapi BM25 top-10 for a fixed five-term query
    (operators/corpus.bm25_topk; Robertson et al., TREC-3): permille
    Robertson idf, k1 = 1.2 / b = 0.75 saturation as one exact
    integer floor-division per posting. The tf shuffle carries only
    the query's postings (filter BEFORE the groupBy); df and the
    corpus scalars ride broadcasts; top-k is TakeOrdered."""
    docs = load(spark, sf_dir, "documents")
    return C.bm25_topk(docs, BM25_QUERY_TERMS, k=10)


@register(
    "hybrid_rrf_topk_docs",
    f"""
    WITH {_bm25_cte(RRF_DEPTH)},
    q AS (SELECT CAST(embedding AS DOUBLE[]) AS qv FROM embeddings
          WHERE vec_id = 0),
    e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
          WHERE vec_id <> 0 AND list_dot_product(embedding, embedding) > 0),
    vs AS (SELECT vec_id,
                  ROUND({_COS_Q_SQL.format(a='v', b='qv')}, 6) + 0.0 AS c6
           FROM e, q),
    vtop AS (
      SELECT vec_id AS doc_id,
             CAST(ROW_NUMBER() OVER (ORDER BY c6 DESC, vec_id) AS INT)
               AS vrn
      FROM vs ORDER BY c6 DESC, vec_id LIMIT {RRF_DEPTH}
    ),
    fused AS (
      SELECT COALESCE(b.doc_id, v.doc_id) AS doc_id,
             COALESCE(b.rn, 0) AS lex_rank,
             COALESCE(v.vrn, 0) AS vec_rank,
             COALESCE(1000000 // ({RRF_K} + b.rn), 0)
               + COALESCE(1000000 // ({RRF_K} + v.vrn), 0) AS rrf_micro
      FROM bm25 b FULL OUTER JOIN vtop v ON b.doc_id = v.doc_id
    )
    SELECT doc_id, lex_rank, vec_rank, CAST(rrf_micro AS BIGINT) AS rrf_micro,
           CAST(ROW_NUMBER() OVER (ORDER BY rrf_micro DESC, doc_id) AS INT)
             AS rn
    FROM fused
    ORDER BY rrf_micro DESC, doc_id LIMIT 10
    """,
)
def hybrid_rrf_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion (Cormack, Clarke &
    Buettcher 2009): the BM25 lexical top-20 and the exact-cosine
    vector top-20 (the ann_cosine_topk ranking vs the vec_id = 0
    query, embeddings row i <-> documents row i) are fused by
    rrf_micro = sum over systems of 1e6 DIV (60 + rank) — the
    reciprocal rank in exact integer micros, so the fused ordering
    is engine-portable. A rank of 0 in the output means "absent
    from that system's top-20" (contributes nothing). Both
    candidate lists are depth-bounded TakeOrdereds, the fusion is a
    20-row full outer join, and the final top-10 is a window over
    at most 40 rows — nothing corpus-sized past the two scans."""
    docs = load(spark, sf_dir, "documents")
    lex = C.bm25_topk(docs, BM25_QUERY_TERMS, k=RRF_DEPTH).select(
        F.col("doc_id"), F.col("rn").alias("lex_rank")
    )
    emb = load(spark, sf_dir, "embeddings").withColumn(
        "embedding", F.col("embedding").cast("array<double>")
    )
    qv = _query_vector(spark, sf_dir, 0)
    vtop = S.cosine_topk(emb, qv, k=RRF_DEPTH, exclude_id=0)
    wv = Window.orderBy(F.col("cosine").desc(), F.col("vec_id"))
    vec = vtop.withColumn("vec_rank", F.row_number().over(wv)).select(
        F.col("vec_id").alias("doc_id"), "vec_rank"
    )
    fused = (
        lex.join(vec, "doc_id", "full_outer")
        .select(
            "doc_id",
            F.coalesce("lex_rank", F.lit(0)).alias("lex_rank"),
            F.coalesce("vec_rank", F.lit(0)).alias("vec_rank"),
            (
                F.coalesce(
                    F.expr(f"div(1000000, {RRF_K} + lex_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"div(1000000, {RRF_K} + vec_rank)"), F.lit(0)
                )
            ).cast("long").alias("rrf_micro"),
        )
    )
    top = fused.orderBy(F.col("rrf_micro").desc(), F.col("doc_id")).limit(10)
    w = Window.orderBy(F.col("rrf_micro").desc(), F.col("doc_id"))
    return top.withColumn("rn", F.row_number().over(w)).select(
        "doc_id", "lex_rank", "vec_rank", "rrf_micro", "rn"
    )


# ---------------------------------------------------------------------------
# Suffix-array / LCP longest-duplicate-span dedup
# ---------------------------------------------------------------------------

_SUF_W = 30   # span cap (tokens): bounds blow-up to O(W x corpus)
_SUF_MIN = 4  # report docs whose longest cross-doc span >= 4 tokens


@register(
    "suffix_lcp_dup_spans_docs",
    f"""
    WITH t AS (
      SELECT doc_id, {_TOKS_SQL} AS toks FROM documents
    ), tt AS (
      SELECT doc_id, toks FROM t WHERE len(toks) > 0
    ), suf AS (
      SELECT doc_id, i AS pos,
             list_slice(toks, i, i + {_SUF_W} - 1) AS s
      FROM (SELECT doc_id, toks,
                   unnest(range(1, len(toks) + 1)) AS i
            FROM tt)
    ), ord AS (
      SELECT doc_id, pos, s,
             ROW_NUMBER() OVER (
               ORDER BY array_to_string(s, ' '), doc_id, pos) AS rid
      FROM suf
    ), adj AS (
      SELECT doc_id, pos, s, rid,
             lag(s) OVER (ORDER BY rid) AS ps
      FROM ord
    ), aa AS (
      SELECT doc_id, pos, s, rid,
             CASE WHEN ps IS NULL THEN -1
                  WHEN mism = 0 THEN least(len(s), len(ps))
                  ELSE mism - 1 END AS a
      FROM (SELECT *,
                   list_position(list_transform(list_zip(s, ps),
                       p -> p[1] IS NOT DISTINCT FROM p[2]), false)
                     AS mism
            FROM adj)
    ), bb AS (
      SELECT *, COALESCE(lead(a) OVER (ORDER BY rid), -1) AS b FROM aa
    ), isl AS (
      SELECT *,
             rid - ROW_NUMBER() OVER (
               PARTITION BY doc_id ORDER BY rid) AS g
      FROM bb
    ), best AS (
      SELECT doc_id, s,
             GREATEST(
               MIN(a) OVER (PARTITION BY doc_id, g ORDER BY rid
                            ROWS UNBOUNDED PRECEDING),
               MIN(b) OVER (PARTITION BY doc_id, g ORDER BY rid DESC
                            ROWS UNBOUNDED PRECEDING)
             ) AS best
      FROM isl
    ), mx AS (
      SELECT doc_id, s, best,
             MAX(best) OVER (PARTITION BY doc_id) AS dup
      FROM best
    )
    SELECT doc_id, CAST(dup AS INT) AS dup_len,
           MIN(array_to_string(list_slice(s, 1, CAST(dup AS INT)), ' '))
             AS span
    FROM mx WHERE best = dup AND dup >= {_SUF_MIN}
    GROUP BY doc_id, dup ORDER BY doc_id
    """,
)
def suffix_lcp_dup_spans_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Longest cross-document duplicated token span per document via
    the distributed suffix-sort + neighbor-LCP construction
    (operators/dedup.suffix_lcp_longest_dup; Lee et al. 2022) —
    the longest-match upgrade of the fixed-8-token span dedup. The
    DuckDB twin replays the identical algorithm with single-node
    window functions over the global suffix order, checking the
    distributed mechanics (range-partitioned global ranks, rid
    equi-joins, island-bounded running mins) against a trusted
    windowed-SQL formulation; tests/test_dedup.py holds a brute-
    force all-pairs oracle on small corpora."""
    from ..operators.dedup import suffix_lcp_longest_dup

    docs = load(spark, sf_dir, "documents")
    return suffix_lcp_longest_dup(
        docs, max_span=_SUF_W, min_len=_SUF_MIN
    )


# ---------------------------------------------------------------------------
# Streaming BM25 index ingestion
# ---------------------------------------------------------------------------

@register(
    "streaming_bm25_topk_docs",
    f"""
    WITH {_bm25_cte(10)}
    SELECT doc_id, score_milli, rn FROM bm25 ORDER BY rn
    """,
)
def streaming_bm25_topk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """bm25_topk_docs' index maintained over a STREAMING corpus
    (streaming/foreach_batch.stream_bm25): two mtime-ordered doc
    batches (even doc_ids, then odd) each append their query-term
    postings and doc lengths to a generation-keyed store — disjoint
    document batches make both statistics union-mergeable, so the
    drained store is row-identical to the one-pass build and this
    twin shares the batch query's strict oracle VERBATIM (scoring
    via operators/corpus.bm25_from_stats, the exact arithmetic the
    batch path runs). Third member of the CMS/HLL mergeable-
    ingestion family. Reseed clears the whole store + checkpoint
    (the r12 ADVICE protocol)."""
    import hashlib
    import os
    import shutil

    from ..operators.corpus import bm25_from_stats
    from ..streaming.foreach_batch import stream_bm25
    from .extensions import _scratch_dir, _write_ordered_stream_fixture

    src = os.path.realpath(f"{sf_dir}/documents.parquet")
    try:
        st = os.stat(src)
    except OSError:
        st = None
    tag = hashlib.md5(
        f"bm25-stream-v1:{src}:{getattr(st, 'st_mtime_ns', 0)}:"
        f"{getattr(st, 'st_size', 0)}".encode()
    ).hexdigest()[:12]
    base = _scratch_dir()
    stream_dir = os.path.join(base, f"spark_graft_bm25_arrivals_{tag}")
    store_root = os.path.join(base, f"spark_graft_bm25_store_{tag}")
    ckpt = os.path.join(base, f"spark_graft_bm25_ckpt_{tag}")

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    seed = os.path.join(store_root, "gen-0")
    if not os.path.exists(os.path.join(seed, "postings", "_SUCCESS")):
        shutil.rmtree(ckpt, ignore_errors=True)
        shutil.rmtree(store_root, ignore_errors=True)
        spark.createDataFrame(
            [], "doc_id bigint, term string, tf bigint"
        ).write.mode("overwrite").parquet(os.path.join(seed, "postings"))
        spark.createDataFrame(
            [], "doc_id bigint, dl bigint"
        ).write.mode("overwrite").parquet(os.path.join(seed, "doclen"))
    _write_ordered_stream_fixture(stream_dir, (
        ("docs_00.parquet", docs.filter(F.col("doc_id") % 2 == 0),
         1_000_000_000),
        ("docs_01.parquet", docs.filter(F.col("doc_id") % 2 == 1),
         1_000_000_100),
    ))
    schema = spark.read.parquet(
        os.path.join(stream_dir, "docs_00.parquet")
    ).schema
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(stream_dir)
    )
    stream_bm25(
        stream, store_root, ckpt,
        query_terms=BM25_QUERY_TERMS,
        query_name="streaming_bm25_topk_docs",
    )
    from ..operators.similarity import _fs_glob

    latest = max(
        int(name.split("-", 1)[1])
        for name in _fs_glob(store_root, "gen-*", spark)
        if name.split("-", 1)[1].isdigit()
    )
    tf = spark.read.parquet(f"{store_root}/gen-{latest}/postings")
    dl = spark.read.parquet(f"{store_root}/gen-{latest}/doclen")
    return bm25_from_stats(tf, dl, k=10)
