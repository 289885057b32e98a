"""Text function tests: tokenization, stats, quality, lang-id,
shingles, fingerprints, rolling hashes."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.functions import text as T


def one(spark, s):
    return spark.createDataFrame([{"text": s}])


def test_normalize_and_tokens(spark):
    df = one(spark, "  The  QUICK   brown\tfox ")
    row = df.select(
        T.normalize("text").alias("n"),
        T.token_count("text").alias("c"),
    ).first()
    assert row["n"] == "the quick brown fox"
    assert row["c"] == 4


def test_token_count_bpe(spark):
    df = one(spark, "Hello, world! x2")
    # tokens: hello , world ! x2  -> 5
    assert df.select(T.token_count_bpe("text").alias("c")).first()["c"] == 5


def test_avg_token_len(spark):
    df = one(spark, "ab cdef")  # lens 2, 4 -> 3.0
    assert df.select(T.avg_token_len("text").alias("a")).first()["a"] == pytest.approx(3.0)


def test_stopword_ratio_and_quality_bounds(spark):
    df = one(spark, "the cat and the hat is a cat")
    row = df.select(
        T.stopword_ratio("text").alias("r"),
        T.quality_score("text").alias("q"),
    ).first()
    # distinct stopwords present: the, and, is, a -> 4 of 8 tokens
    assert row["r"] == pytest.approx(0.5)
    assert 0.0 <= row["q"] <= 1.0


def test_lang_id_markers(spark):
    rows = [
        {"text": "the cat and the dog is here"},   # en
        {"text": "der hund und die katze ist da"}, # de
        {"text": "qqq zzz xxx"},                   # no markers -> und
    ]
    df = spark.createDataFrame(rows)
    got = [r["l"] for r in df.select(T.lang_id("text").alias("l")).collect()]
    assert got == ["en", "de", "und"]


def test_shingles(spark):
    df = one(spark, "a b c d")
    got = df.select(T.shingles("text", 3).alias("s")).first()["s"]
    assert got == ["a b c", "b c d"]
    # short text -> empty shingle set
    df2 = one(spark, "a b")
    assert df2.select(T.shingles("text", 3).alias("s")).first()["s"] == []


def test_fingerprint_md5_matches_hashlib(spark):
    df = one(spark, "  Hello   World ")
    got = df.select(T.fingerprint_md5("text").alias("f")).first()["f"]
    assert got == hashlib.md5(b"hello world").hexdigest()


def test_winnow_fingerprint(spark):
    s = "the quick brown fox jumps over the lazy dog"
    f1 = one(spark, s).select(T.winnow("text").alias("w")).first()["w"]
    assert f1 and all(isinstance(h, int) for h in f1)
    # insertion early in the doc leaves most downstream fingerprints
    f2 = one(spark, "x " + s).select(T.winnow("text").alias("w")).first()["w"]
    assert len(set(f1) & set(f2)) >= len(f1) // 2


def test_langid_trigram(spark):
    rows = [
        {"text": "the information station is there for the gathering"},
        {"text": "ich dachte der schlüssel und die schöne geschichte"},
        {"text": "zz qq xx"},
    ]
    df = spark.createDataFrame(rows)
    got = [r["l"] for r in df.select(T.langid_trigram("text").alias("l")).collect()]
    assert got[0] == "en"
    assert got[1] == "de"
    assert got[2] == "und"


def test_rolling_hashes_window_count_and_determinism(spark):
    s = "abcdefghij"
    df = one(spark, s)
    h1 = df.select(T.rolling_hashes("text", window=4).alias("h")).first()["h"]
    assert len(h1) == len(s) - 4 + 1
    h2 = df.select(T.rolling_hashes("text", window=4).alias("h")).first()["h"]
    assert h1 == h2
    # shifted text shares interior window hashes
    df2 = one(spark, "xabcdefghij")
    h3 = df2.select(T.rolling_hashes("text", window=4).alias("h")).first()["h"]
    assert set(h1) <= set(h3)


def test_unigram_logprob_ordering(spark):
    """Common-token docs must outscore rare-token soup; scores are
    negative log10 probabilities so all <= 0."""
    from ngafid_cpat_spark.plans.extensions import unigram_logprob_docs
    import tempfile, os

    d = tempfile.mkdtemp()
    docs = spark.createDataFrame(
        [
            {"doc_id": 1, "text": "the the the the the", "lang": "en",
             "source": "s", "n_chars": 19},
            {"doc_id": 2, "text": "zyzzyva qwerty xylyl grault plugh", "lang": "en",
             "source": "s", "n_chars": 33},
        ]
    )
    docs.write.parquet(os.path.join(d, "documents.parquet"))
    out = {r["doc_id"]: r for r in unigram_logprob_docs(spark, d).collect()}
    assert out[1]["n_tokens"] == 5 and out[2]["n_tokens"] == 5
    assert out[1]["avg_logprob"] > out[2]["avg_logprob"]
    assert all(r["avg_logprob"] <= 0 for r in out.values())


def test_bigram_logprob_semantics(spark, tmp_path):
    """Hand-checkable corpus: P(b|a)=1 contexts score 0; a 50/50
    context scores log10(0.5)."""
    import math

    from ngafid_cpat_spark.plans import QUERIES

    rows = [
        {"doc_id": 1, "text": "a b a b", "lang": "en", "source": "s",
         "n_chars": 7},
        {"doc_id": 2, "text": "a c", "lang": "en", "source": "s",
         "n_chars": 3},
    ]
    # corpus bigrams: doc1 -> (a,b) (b,a) (a,b); doc2 -> (a,c)
    # model: context a has {b: 2, c: 1} -> P(b|a)=2/3, P(c|a)=1/3;
    # context b has {a: 1} -> P(a|b)=1
    path = str(tmp_path)
    spark.createDataFrame(rows).write.mode("overwrite").parquet(
        f"{path}/documents.parquet"
    )
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_logprob"])
        for r in QUERIES["bigram_logprob_docs"](spark, path).collect()
    }
    q = lambda x: round(x * 1e6) / 1e6  # the query's micro-quantization
    d1 = (2 * q(math.log10(2 / 3)) + q(math.log10(1.0))) / 3
    d2 = q(math.log10(1 / 3))
    assert got[1][0] == 3 and got[1][1] == pytest.approx(d1, abs=1e-6)
    assert got[2][0] == 1 and got[2][1] == pytest.approx(d2, abs=1e-6)


def test_gopher_rules_each_rule_fails_independently(spark):
    from ngafid_cpat_spark.operators.corpus import gopher_quality_flags

    docs = spark.createDataFrame(
        [
            # passes every rule: 5 words in [3,8], mean len in [3,6],
            # has 2 stopword occurrences, all alpha, no symbols
            (1, "the cat sat on the mat"),
            (2, "hi"),                                  # too short
            (3, "the a " + " ".join(["supercalifragilistic"] * 4)),  # mean len too big
            (4, "cat sat mat bat rat"),                 # no stopwords
            (5, "the cat ... ... ... sat"),             # symbol-heavy
        ],
        ["doc_id", "text"],
    )
    out = {
        r["doc_id"]: r
        for r in gopher_quality_flags(
            docs, min_words=3, max_words=8,
            min_mean_len=2, max_mean_len=6,
        ).collect()
    }
    assert out[1]["passed"] == 1
    assert out[2]["r_count"] == 0 and out[2]["passed"] == 0
    assert out[3]["r_wordlen"] == 0 and out[3]["passed"] == 0
    assert out[4]["r_stop"] == 0 and out[4]["passed"] == 0
    assert out[5]["r_symbol"] == 0 and out[5]["passed"] == 0
    # symbol tokens are also non-alphabetic: doc 5 fails r_alpha too
    assert out[5]["r_alpha"] == 0


def test_zorder_key_matches_python_reference(spark):
    from ngafid_cpat_spark.functions.layout import zorder_key, zorder_py

    df = spark.range(200).select(
        (F.col("id") % 17).alias("x"), (F.col("id") % 13).alias("y")
    )
    rows = df.select(
        "x", "y", zorder_key("x", "y", bits=5).alias("z")
    ).collect()
    for r in rows:
        assert r["z"] == zorder_py(r["x"], r["y"], bits=5)


def test_zorder_buckets_are_bounded_rectangles(spark):
    from ngafid_cpat_spark.functions.layout import zorder_key

    # the pruning property: grouping by the key's top bits bounds the
    # bucket's extent in BOTH dimensions (here top 4 bits of each of
    # two 10-bit dims => spans <= 2^6 = 64 cells per dim)
    df = spark.range(20000).select(
        (F.pmod(F.xxhash64("id"), F.lit(1024))).alias("x"),
        (F.pmod(F.xxhash64("id", F.lit(1)), F.lit(1024))).alias("y"),
    )
    b = (
        df.select(zorder_key("x", "y", 10).alias("z"), "x", "y")
        .groupBy(F.expr("z >> 12").alias("b"))
        .agg(
            (F.max("x") - F.min("x")).alias("dx"),
            (F.max("y") - F.min("y")).alias("dy"),
        )
        .agg(F.max("dx").alias("mx"), F.max("dy").alias("my"))
        .first()
    )
    assert b["mx"] <= 63 and b["my"] <= 63


def test_zorder_bits_validation():
    import pytest as _pytest

    from ngafid_cpat_spark.functions.layout import zorder_key_sql

    with _pytest.raises(ValueError):
        zorder_key_sql("x", "y", bits=0)
    with _pytest.raises(ValueError):
        zorder_key_sql("x", "y", bits=32)


def test_hilbert_key_matches_python_reference_and_bijects(spark):
    from ngafid_cpat_spark.functions.layout import hilbert_cols, hilbert_py

    # full 32x32 grid: exact per-cell agreement with the python
    # xy2d reference AND bijectivity onto [0, 1024)
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    got = {
        (r["x"], r["y"]): r["hkey"]
        for r in hilbert_cols(grid, "x", "y", bits=5).collect()
    }
    assert got == {
        (x, y): hilbert_py(x, y, 5) for x in range(32) for y in range(32)
    }
    assert sorted(got.values()) == list(range(1024))


def test_hilbert_consecutive_keys_are_adjacent_cells(spark):
    """The property Z-order lacks: consecutive Hilbert keys are
    Manhattan-distance-1 neighbors, so sorted range scans touch one
    contiguous region."""
    from ngafid_cpat_spark.functions.layout import hilbert_py

    inv = {
        hilbert_py(x, y, 4): (x, y)
        for x in range(16)
        for y in range(16)
    }
    for d in range(255):
        (a, b), (c, e) = inv[d], inv[d + 1]
        assert abs(a - c) + abs(b - e) == 1


def test_hilbert_buckets_are_bounded_squares(spark):
    """Top-2k key bits name a level-k subsquare: with bits=10 and an
    >>12 bucket, every bucket spans <= 64 cells per dimension (the
    zorder rectangle contract, on the Hilbert key)."""
    from ngafid_cpat_spark.plans import QUERIES

    rows = QUERIES["hilbert_layout_events"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    for r in rows:
        assert r["max_user_cell"] - r["min_user_cell"] <= 63
        assert r["max_hour_cell"] - r["min_hour_cell"] <= 63


def test_hilbert_cte_sql_rejects_star_keep():
    """r12 ADVICE fix: keep='*' would re-emit the __hx/__hy/__hd
    state columns through SELECT * and break every level after the
    first with duplicate names — the helper must refuse it."""
    import pytest

    from ngafid_cpat_spark.functions.layout import hilbert_cte_sql

    with pytest.raises(ValueError, match="explicit columns"):
        hilbert_cte_sql("ev", "x", "y", keep="*", bits=4)
    with pytest.raises(ValueError, match="explicit columns"):
        hilbert_cte_sql("ev", "x", "y", keep="a, *", bits=4)
    # explicit columns still work and end in the hilb CTE
    sql = hilbert_cte_sql("ev", "x", "y", keep="x, y", bits=4)
    assert sql.rstrip().endswith("hkey FROM h4)")
