"""Bloom semi-join prefilter tests: the structural guarantees
(zero false negatives, bounded false positives, identical join
results with/without the prefilter) plus the contamination scale
path that uses it."""

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import bloom as B
from ngafid_cpat_spark.operators import corpus as C


@pytest.fixture(scope="module")
def keys(spark):
    return spark.range(0, 500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    ).cache()


def test_no_false_negatives(spark, keys):
    # every true member must survive the prefilter — bloom filters
    # may over-admit, never under-admit
    words, m, k = B.bloom_build(keys, "k")
    kept = keys.filter(B.bloom_contains(F.col("k"), words, m, k)).count()
    assert kept == 500


def test_false_positive_rate_bounded(spark, keys):
    words, m, k = B.bloom_build(keys, "k")
    absent = spark.range(10_000, 20_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k")
    )
    fp = absent.filter(B.bloom_contains(F.col("k"), words, m, k)).count()
    # m = 16 bits/key, k = 5 probes → theoretical fpp ~0.1%; assert a
    # loose 2% so the test never flakes on hash alignment
    assert fp / 10_000 < 0.02


def test_prefiltered_join_identical(spark, keys):
    facts = spark.range(0, 5_000).select(
        F.concat(F.lit("key-"), (F.col("id") % 1_000)).alias("k"),
        F.col("id").alias("v"),
    )
    exact = facts.join(keys, "k").groupBy("k").agg(F.sum("v").alias("s"))
    pre = B.bloom_prefilter(facts, "k", keys, "k")
    filtered = pre.join(keys, "k").groupBy("k").agg(F.sum("v").alias("s"))
    assert sorted(map(tuple, exact.collect())) == sorted(
        map(tuple, filtered.collect())
    )


def test_bit_array_sizing(keys):
    # 500 keys → next pow2 ≥ 8000 bits = 8192; never below MIN_BITS
    words, m, k = B.bloom_build(keys, "k")
    assert m == 8192 and len(words) == m // 64
    tiny_words, tiny_m, _ = B.bloom_build(keys.limit(3), "k")
    assert tiny_m == B.MIN_BITS


@pytest.fixture(scope="module")
def docs(spark):
    rows = []
    for i in range(80):
        base = f"alpha beta gamma delta epsilon zeta {i} eta theta"
        rows.append({"doc_id": i, "text": base})
    return spark.createDataFrame(rows).cache()


def test_contamination_bloom_matches_plain(docs):
    train = docs.filter(F.col("doc_id") % 7 != 0)
    ev = docs.filter(F.col("doc_id") % 7 == 0)
    plain = C.contamination(train, ev, k=3).collect()
    bloomed = C.contamination_bloom(train, ev, k=3).collect()
    key = lambda r: r["doc_id"]
    assert sorted(map(tuple, plain), key=lambda t: t[0]) == sorted(
        map(tuple, bloomed), key=lambda t: t[0]
    )
    assert len(plain) > 0  # the fixture must actually overlap


def test_prefilter_rejects_mismatched_key_types(spark, keys):
    # int facts probed against string keys would silently false-negative
    facts = spark.range(5).select(F.col("id").alias("k"))
    with pytest.raises(TypeError, match="type-sensitive"):
        B.bloom_prefilter(facts, "k", keys, "k")


def test_explicit_m_bits_rounds_up_to_word_multiple(spark, keys):
    # an explicit m_bits that isn't a multiple of 64 used to truncate
    # the word array, so keys probing the final partial word crashed
    # the build (IndexError) — now it rounds up and stays correct
    words, m, k = B.bloom_build(keys, "k", m_bits=1000)
    assert m == 1024 and len(words) == 16
    kept = keys.filter(B.bloom_contains(F.col("k"), words, m, k)).count()
    assert kept == 500


def test_bloom_contains_rejects_partial_word_m_bits(spark):
    with pytest.raises(ValueError, match="multiple of 64"):
        B.bloom_contains(F.col("k"), [0] * 16, 1000, 5)
