"""Corpus-pipeline operator tests (operators/corpus.py): the
training-data preparation layer beyond dedup/similarity — stratified
sampling, sequence packing, contamination checks."""

from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import corpus as C


def _docs(spark, rows):
    return spark.createDataFrame(rows)


def test_stratified_sample_deterministic_subset(spark):
    rows = [
        {"doc_id": i, "source": f"src{i % 3}", "text": "x"} for i in range(300)
    ]
    df = _docs(spark, rows)
    rates = {"src0": 1000, "src1": 500, "src2": 0}
    a = {r["doc_id"] for r in C.stratified_sample(df, rates).collect()}
    b = {r["doc_id"] for r in C.stratified_sample(df, rates).collect()}
    assert a == b  # rerun-identical, no RNG state
    # rate 1000 keeps everything, rate 0 keeps nothing
    assert all(i in a for i in range(300) if i % 3 == 0)
    assert all(i not in a for i in range(300) if i % 3 == 2)
    # rate 500 keeps a nontrivial strict subset
    kept1 = [i for i in a if i % 3 == 1]
    assert 0 < len(kept1) < 100


def test_stratified_sample_default_rate(spark):
    df = _docs(
        spark, [{"doc_id": i, "source": "other", "text": "x"} for i in range(200)]
    )
    none = C.stratified_sample(df, {"src0": 500}, default_permille=0)
    assert none.count() == 0
    every = C.stratified_sample(df, {"src0": 0}, default_permille=1000)
    assert every.count() == 200


def test_pack_sequences_tape_layout(spark):
    # 5 docs of 100 tokens each in one group, budget 256:
    # offsets 0,100,200,300,400; chunk spans by exact division
    rows = [
        {"doc_id": i, "source": "a", "text": " ".join(["w"] * 100)}
        for i in range(5)
    ]
    out = {
        r["doc_id"]: r
        for r in C.pack_sequences(_docs(spark, rows), budget=256).collect()
    }
    assert [out[i]["start_off"] for i in range(5)] == [0, 100, 200, 300, 400]
    for i in range(5):
        start, end = 100 * i, 100 * (i + 1)
        assert out[i]["n_tok"] == 100
        assert out[i]["chunk_first"] == start // 256
        assert out[i]["chunk_last"] == (end - 1) // 256
    # doc 2 (tokens 200-299) straddles the 256 boundary
    assert (out[2]["chunk_first"], out[2]["chunk_last"]) == (0, 1)


def test_pack_sequences_groups_independent(spark):
    rows = [
        {"doc_id": i, "source": "a", "text": "t1 t2 t3"} for i in range(3)
    ] + [{"doc_id": 10 + i, "source": "b", "text": "t1 t2"} for i in range(2)]
    out = C.pack_sequences(_docs(spark, rows), budget=4)
    by_group = {
        g: sorted((r["doc_id"], r["start_off"]) for r in grp)
        for g, grp in [
            (g, [r for r in out.collect() if r["source"] == g])
            for g in ("a", "b")
        ]
    }
    # each group's tape starts at 0 independently
    assert by_group["a"] == [(0, 0), (1, 3), (2, 6)]
    assert by_group["b"] == [(10, 0), (11, 2)]


def test_contamination_counts_shared_shingles(spark):
    # eval doc: shingles {a b c, b c d}; train doc 1 shares exactly
    # "a b c"; train doc 2 shares nothing
    eval_df = _docs(spark, [{"doc_id": 100, "text": "a b c d"}])
    train_df = _docs(
        spark,
        [
            {"doc_id": 1, "text": "a b c x y"},  # shingles: abc bcx cxy
            {"doc_id": 2, "text": "p q r s"},
        ],
    )
    out = {r["doc_id"]: r for r in C.contamination(train_df, eval_df).collect()}
    assert set(out) == {1}  # doc 2 has zero overlap -> filtered
    assert out[1]["n_shingles"] == 3
    assert out[1]["n_overlap"] == 1
    assert abs(out[1]["contamination"] - 1 / 3) < 1e-12


# ---------------------------------------------------------------------------
# Second-wave corpus/behavioral operators
# ---------------------------------------------------------------------------


def test_tfidf_topk_ranks_rare_terms_highest(spark):
    rows = [
        {"doc_id": 1, "text": "common common rare"},
        {"doc_id": 2, "text": "common stuff here"},
        {"doc_id": 3, "text": "common words only"},
    ]
    out = C.tfidf_topk(_docs(spark, rows), k=1).collect()
    by_doc = {r["doc_id"]: r for r in out}
    # 'common' appears in all 3 docs -> idf_milli = 3000//3 - 1000 = 0
    # (ln's zero-at-df=N property), so it can NEVER outrank a real
    # term; doc 1's top term must be 'rare' (df=1, idf = 2000)
    assert by_doc[1]["term"] == "rare"
    assert by_doc[1]["score_milli"] == 2000
    assert by_doc[1]["df"] == 1


def test_tfidf_tie_breaks_lexicographic(spark):
    rows = [{"doc_id": 1, "text": "zeta alpha"}, {"doc_id": 2, "text": "x y"}]
    out = C.tfidf_topk(_docs(spark, rows), k=2).collect()
    d1 = sorted([r for r in out if r["doc_id"] == 1], key=lambda r: r["rn"])
    # equal scores -> rn order is term-ascending
    assert [r["term"] for r in d1] == ["alpha", "zeta"]


def test_repetition_stats_exact_ratios(spark):
    rows = [
        {"doc_id": 1, "text": "a a a b"},      # 4 tokens, 2 distinct
        {"doc_id": 2, "text": "u v w x"},      # no repetition
        {"doc_id": 3, "text": "solo"},         # single token: no bigrams
    ]
    out = {r["doc_id"]: r for r in C.repetition_stats(_docs(spark, rows)).collect()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_distinct"] == 2
    assert out[1]["dup_token_ratio"] == 0.5
    assert out[1]["top_token_ratio"] == 0.75
    # bigrams of doc 1: "a a","a a","a b" -> 3 total, 2 distinct
    assert out[1]["n_bigrams"] == 3
    assert abs(out[1]["dup_bigram_ratio"] - round(1 - 2 / 3, 4)) < 1e-9
    assert out[2]["dup_token_ratio"] == 0.0
    assert out[2]["dup_bigram_ratio"] == 0.0
    assert out[3]["n_bigrams"] == 0 and out[3]["dup_bigram_ratio"] is None


def test_keep_best_prefers_quality_then_lowest_id(spark):
    rows = [
        {"doc_id": 10, "text": "Same  Text", "q": 5},
        {"doc_id": 11, "text": "same text", "q": 9},   # best copy
        {"doc_id": 12, "text": "same text", "q": 9},   # tie -> lower id wins
        {"doc_id": 13, "text": "unique", "q": 1},
    ]
    out = C.keep_best_per_duplicate_group(
        _docs(spark, rows), quality_col="q"
    ).collect()
    groups = {r["keeper_id"]: r for r in out}
    assert len(out) == 2
    assert 11 in groups and groups[11]["n_copies"] == 3
    assert groups[11]["keeper_quality"] == 9
    assert 13 in groups and groups[13]["n_copies"] == 1


def test_corpus_mix_factor_zero_drops(spark):
    """factor 0 must DROP the stratum, not duplicate it (Spark's
    sequence(1, 0) counts DOWN without the guard)."""
    docs = _docs(spark, [
        {"doc_id": 1, "text": "keep me"},
        {"doc_id": 2, "text": "drop me"},
    ])
    docs = docs.withColumn(
        "source", F.when(F.col("doc_id") == 1, "good").otherwise("junk")
    )
    out = C.corpus_mix(docs, {"good": 2, "junk": 0}).collect()
    ids = sorted(r["doc_id"] for r in out)
    assert ids == [1, 1]  # good doubled, junk gone


def test_shard_id_independent_of_sample_bucket(spark):
    """Sampling then sharding must still populate (nearly) all shards:
    shard_id uses its own mixing constants, not sample_hash's."""
    docs = spark.range(0, 20000).select(
        F.col("id").alias("doc_id"),
        F.lit("t").alias("text"),
        F.lit("s").alias("source"),
    )
    kept = docs.filter(C.sample_hash("doc_id") < 8)  # 8 permille
    shards = {
        r["shard_id"]
        for r in C.shard_assign(kept, n_shards=16).select("shard_id").distinct().collect()
    }
    assert len(shards) >= 14  # was exactly 2 with the correlated mix


def test_chunk_documents_coverage_and_overlap(spark):
    from ngafid_cpat_spark.operators import corpus as C

    rows = [
        {"doc_id": 1, "text": " ".join(f"t{i}" for i in range(10))},   # short
        {"doc_id": 2, "text": " ".join(f"t{i}" for i in range(64))},   # exact
        {"doc_id": 3, "text": " ".join(f"t{i}" for i in range(112))},  # 2 full
        {"doc_id": 4, "text": " ".join(f"t{i}" for i in range(113))},  # +tail
    ]
    df = spark.createDataFrame(rows)
    out = C.chunk_documents(df, chunk_tokens=64, overlap=16)
    got = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(r)
    assert len(got[1]) == 1 and got[1][0]["chunk_len"] == 10
    assert len(got[2]) == 1 and got[2][0]["chunk_len"] == 64
    assert len(got[3]) == 2
    assert len(got[4]) == 3
    for doc_id, n in ((1, 10), (2, 64), (3, 112), (4, 113)):
        chunks = sorted(got[doc_id], key=lambda r: r["chunk_id"])
        covered = set()
        for i, r in enumerate(chunks):
            assert r["start_tok"] == i * 48
            toks = r["chunk_text"].split(" ")
            assert len(toks) == r["chunk_len"]
            # chunk text is the right slice of the doc
            assert toks == [f"t{j}" for j in range(r["start_tok"], r["start_tok"] + r["chunk_len"])]
            covered |= set(range(r["start_tok"], r["start_tok"] + r["chunk_len"]))
        assert covered == set(range(n)), doc_id


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest as _pytest

    from ngafid_cpat_spark.operators import corpus as C

    df = spark.createDataFrame([{"doc_id": 1, "text": "a b"}])
    with _pytest.raises(ValueError):
        C.chunk_documents(df, chunk_tokens=16, overlap=16)


def test_sample_k_per_group_exact_and_deterministic(spark):
    from ngafid_cpat_spark.operators import corpus as C

    rows = [
        {"doc_id": i, "source": f"s{i % 3}"} for i in range(300)
    ]
    df = spark.createDataFrame(rows)
    a = C.sample_k_per_group(df, k=10, group_col="source")
    b = C.sample_k_per_group(df, k=10, group_col="source")
    got_a = sorted((r["source"], r["doc_id"]) for r in a.collect())
    got_b = sorted((r["source"], r["doc_id"]) for r in b.collect())
    assert got_a == got_b  # rerun-identical, no RNG state
    from collections import Counter

    counts = Counter(s for s, _ in got_a)
    assert counts == {"s0": 10, "s1": 10, "s2": 10}
    # k larger than a group returns the whole group, not an error
    small = spark.createDataFrame(rows[:4])
    assert C.sample_k_per_group(small, k=10, group_col="source").count() == 4


def test_temperature_mix_downweights_dominant_group(spark):
    # 400 'big' vs 25 'small': alpha=0.5 budgets are
    # T=425, iq_big=20, iq_small=5 -> k_big=340, k_small=85 (capped
    # at the 25 available) — the dominant group loses share, the
    # small group keeps everything
    from ngafid_cpat_spark.operators.corpus import temperature_mix

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(25)
    ]
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    out = temperature_mix(df)
    got = {
        r["source"]: r["n"]
        for r in out.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {"big": 340, "small": 25}
    # deterministic: identical subset on rerun
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in temperature_mix(df).collect())
    assert a == b


def test_bpe_train_merges_known_corpus(spark):
    from ngafid_cpat_spark.operators.corpus import bpe_train_merges

    df = spark.createDataFrame(
        [("the quick fox the quick dog",), ("the quick fox jumps",),
         ("a a a a",)],
        ["text"],
    )
    got = bpe_train_merges(df, 3)
    # round 0: (a,a) has 3 adjacent occurrences (overlaps counted,
    # standard pair statistics); round 1: (the,quick) x3 after the
    # a-merge; round 2: the fused symbol pairs with fox
    assert got == [
        (0, "a", "a", 3),
        (1, "the", "quick", 3),
        (2, "the\x1fquick", "fox", 2),
    ]


def test_bpe_merge_rewrite_is_leftmost_greedy_no_rescan(spark):
    """'a a a a' after merging (a,a) must become exactly one fused
    pair + two singles under replace()'s leftmost-no-rescan
    semantics — the behavior the DuckDB oracle reproduces; a rescan
    implementation would produce two fused pairs and break the
    cross-engine pairing."""
    from ngafid_cpat_spark.operators.corpus import bpe_train_merges

    df = spark.createDataFrame([("a a a a",)], ["text"])
    got = bpe_train_merges(df, 2)
    assert got[0] == (0, "a", "a", 3)
    # round 1 pairs come from [a&a, a, a]: (a&a, a) and (a, a) — the
    # single remaining (a, a) pair proves only ONE fuse happened
    assert got[1][1:] in {("a\x1fa", "a", 1), ("a", "a", 1)}


def test_bpe_apply_tokenizes_with_trained_merges(spark):
    from ngafid_cpat_spark.operators.corpus import bpe_apply, bpe_train_merges

    df = spark.createDataFrame(
        [(1, "the quick fox the quick dog"), (2, "the quick fox jumps")],
        ["doc_id", "text"],
    )
    merges = bpe_train_merges(df, 2)
    out = {
        r["doc_id"]: r["symbols"]
        for r in bpe_apply(df, merges).collect()
    }
    assert out[1] == ["the\x1fquick\x1ffox", "the\x1fquick", "dog"]
    assert out[2] == ["the\x1fquick\x1ffox", "jumps"]


def test_bpe_train_short_docs_emit_no_pairs(spark):
    """Docs that normalize to fewer than 2 tokens must contribute
    zero pairs (the oracle's range(1, len) behavior), not crash:
    the old transform(sequence(0, size-2)) form threw
    INVALID_ARRAY_INDEX under ANSI mode for size=1."""
    from ngafid_cpat_spark.operators.corpus import bpe_apply, bpe_train_merges

    df = spark.createDataFrame(
        [("a b a b",), ("x",), ("",), ("  ",)], ["text"]
    )
    got = bpe_train_merges(df, 1)
    # the short docs add nothing; (a, b) counts only from the 4-token doc
    assert got == [(0, "a", "b", 2)]
    toks = {tuple(r["symbols"]) for r in bpe_apply(df, got).collect()}
    # leftmost-no-rescan: the first ' a b ' consumes the separating
    # space, so 'a b a b' fuses once (same in the DuckDB oracle)
    assert ("a\x1fb", "a", "b") in toks and ("x",) in toks


def test_exact_isqrt_matches_math_isqrt_at_float_boundaries(spark):
    """exact_isqrt must be true integer sqrt even where
    floor(sqrt(n)) as a double can land one off — perfect squares
    and their neighbors near 2^52/2^53, plus small values."""
    import math

    from ngafid_cpat_spark.operators.corpus import exact_isqrt

    ns = [0, 1, 2, 3, 4, 8, 9, 15, 16, 10**12]
    for k in (2**26, 2**26 + 1, 67108865, 94906265, 94906266):
        ns += [k * k - 1, k * k, k * k + 1]
    ns += [2**52 - 1, 2**52, 2**52 + 1, 2**53 - 1, 2**53, 2**53 + 1]
    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {
        r["n"]: r["iq"]
        for r in df.select("n", exact_isqrt(F.col("n")).alias("iq")).collect()
    }
    assert got == {n: math.isqrt(n) for n in ns}


def test_train_linear_classifier_learns_separable_data(spark):
    """On linearly separable features the GD trainer must beat the
    majority baseline and reach perfect training accuracy; weights
    move in the gradient direction (positive feature weight for the
    positive class's large feature)."""
    from ngafid_cpat_spark.operators import corpus as C

    rows = []
    for i in range(40):
        y = 1.0 if i % 2 == 0 else 0.0
        x = 0.9 if y == 1.0 else 0.1
        rows.append((i, x, x, x, y))
    feats = spark.createDataFrame(
        rows, "id long, x1 double, x2 double, x3 double, y double"
    )
    model = C.train_linear_classifier(feats, n_iter=8)
    assert model["n"] == 40
    assert model["train_correct"] == 40  # separable -> perfect
    b, w1, w2, w3 = model["weights_micro"]
    assert w1 > 0 and w2 > 0 and w3 > 0  # big features => positive


def test_classifier_features_exact_rationals(spark):
    """Features are exact rationals of integer counts: token cap,
    chars-minus-spaces mean length, distinct ratio."""
    from ngafid_cpat_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [(1, "aa bb aa"), (2, "x")], "doc_id long, text string"
    )
    got = {r["id"]: (r["x1"], r["x2"], r["x3"])
           for r in C.classifier_features(docs).collect()}
    # doc 1: 3 tokens, norm len 8, 2 spaces -> mean tok len 2;
    # distinct 2/3
    assert got[1] == (3 / 512, (8 - 2) / 3 / 10, 2 / 3)
    assert got[2] == (1 / 512, 1 / 10, 1.0)


def test_dedup_keep_best_scored_agrees_with_trained_weights(spark):
    """dedup_keep_best_scored's keeper is the argmax of the SAME
    hard-sigmoid score train_linear_classifier's weights define
    (ties to the lowest doc id), recomputed here independently in
    Python from the collected features — the model-in-the-loop
    survivorship really uses the trained model, not a proxy rank."""
    sf_dir = "/root/testdata/sf0.001"
    from ngafid_cpat_spark.plans.extensions import dedup_keep_best_scored
    from ngafid_cpat_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    feats = C.classifier_features(docs).join(
        docs.select(
            F.col("doc_id").alias("id"),
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        ),
        "id",
    ).localCheckpoint(eager=False)
    w = C.train_linear_classifier(feats, n_iter=4)["weights_micro"]

    # independent python-side scores from the SAME weights
    def score(x1, x2, x3):
        z = w[0] / 1e6 + w[1] / 1e6 * x1 + w[2] / 1e6 * x2 + w[3] / 1e6 * x3
        return min(max(0.25 * z + 0.5, 0.0), 1.0)

    pyscore = {
        r["id"]: score(r["x1"], r["x2"], r["x3"]) for r in feats.collect()
    }

    result = dedup_keep_best_scored(spark, sf_dir)
    keepers = result.collect()
    assert keepers, "no clusters"
    # cluster membership from the same components the query uses
    from ngafid_cpat_spark.operators import dedup as D
    from ngafid_cpat_spark.plans.extensions import (
        JACCARD_THRESHOLD,
        SHINGLE_K,
    )

    pairs = D.jaccard_pairs(docs, k=SHINGLE_K, threshold=JACCARD_THRESHOLD)
    comp = D.connected_components(pairs, docs.select("doc_id"), id_col="doc_id")
    members: dict = {}
    for r in comp.collect():
        members.setdefault(r["cluster_id"], []).append(r["doc_id"])

    assert len(keepers) == len(members)
    for k in keepers:
        mem = members[k["cluster_id"]]
        assert k["cluster_size"] == len(mem)
        # argmax by (score desc, id asc) over the python-side scores
        want = min(mem, key=lambda i: (-pyscore[i], i))
        assert k["keeper_id"] == want, (k, [(i, pyscore[i]) for i in mem])
        assert abs(k["keeper_score"] - pyscore[want]) < 1e-6


def test_quality_weighted_sample_matches_python_replay(spark):
    """quality_weighted_sample keeps exactly the rows whose permille
    hash bucket falls under ROUND(score*1000) — replayed in python
    from the same trained weights; retention is non-trivial (neither
    empty nor everything)."""
    sf_dir = "/root/testdata/sf0.001"
    from ngafid_cpat_spark.operators.corpus import (
        _SAMPLE_MULT,
        _SAMPLE_OFFSET,
        _SAMPLE_PRIME,
    )
    from ngafid_cpat_spark.operators.similarity import round_half_away
    from ngafid_cpat_spark.plans.extensions import (
        quality_weighted_sample_docs,
    )
    from ngafid_cpat_spark.sources import load

    docs = load(spark, sf_dir, "documents")
    feats = C.classifier_features(docs).join(
        docs.select(
            F.col("doc_id").alias("id"),
            F.when(F.col("lang") == "en", 1.0).otherwise(0.0).alias("y"),
        ),
        "id",
    ).localCheckpoint(eager=False)
    w = C.train_linear_classifier(feats, n_iter=4)["weights_micro"]

    def score(r):
        z = (
            w[0] / 1e6 + w[1] / 1e6 * r["x1"] + w[2] / 1e6 * r["x2"]
            + w[3] / 1e6 * r["x3"]
        )
        return min(max(0.25 * z + 0.5, 0.0), 1.0)

    def bucket(i):
        return ((i % _SAMPLE_PRIME) * _SAMPLE_MULT + _SAMPLE_OFFSET) % 1000

    want = {
        r["id"]
        for r in feats.collect()
        if bucket(r["id"]) < round_half_away(score(r) * 1000.0)
    }
    got = {
        r["doc_id"] for r in quality_weighted_sample_docs(spark, sf_dir).collect()
    }
    assert got == want
    n_all = feats.count()
    assert 0 < len(got) < n_all


def test_dsir_importance_select_deterministic_and_coin_consistent(spark):
    """Every kept row satisfies the coin rule (permille hash <
    keep_permille), keep_permille is the min-max scaling of w_avg,
    and re-running yields the identical subset."""
    docs = spark.createDataFrame(
        [
            (1, "spark shuffle join broadcast shuffle spark", "en"),
            (2, "spark join agg window sort", "en"),
            (3, "valse tango salsa polka valse", "fr"),
            (4, "tango polka salsa tango salsa", "fr"),
            (5, "spark shuffle broadcast join window", "en"),
            (6, "valse spark tango join polka", "de"),
            (7, "window sort agg shuffle broadcast spark join", "en"),
            (8, "salsa valse polka tango valse salsa", "es"),
        ],
        ["doc_id", "text", "lang"],
    )
    out = C.dsir_importance_select(
        docs, target=F.col("lang") == "en", n_buckets=64
    )
    rows = {r["doc_id"]: r for r in out.collect()}
    rows2 = {r["doc_id"]: r for r in out.collect()}
    assert {k: (v["w_avg"], v["keep_permille"]) for k, v in rows.items()} == {
        k: (v["w_avg"], v["keep_permille"]) for k, v in rows2.items()
    }
    hashes = {
        r["doc_id"]: r["h"]
        for r in docs.select(
            "doc_id", C.sample_hash("doc_id").alias("h")
        ).collect()
    }
    assert rows  # the scaling guarantees the max-weight doc clears ~999
    for did, r in rows.items():
        assert 0 <= r["keep_permille"] <= 1000
        assert hashes[did] < r["keep_permille"]


def test_dsir_target_like_docs_score_higher(spark):
    """Docs sharing the target domain's n-grams must get a strictly
    higher importance weight than docs with disjoint vocabulary —
    the DSIR ranking contract on a separable corpus."""
    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta", "en"),
            (2, "alpha beta beta gamma alpha", "en"),
            (3, "zork quux blorb zork quux", "fr"),
            (4, "quux blorb blorb zork", "fr"),
            (5, "alpha beta gamma beta", "en"),
            (6, "gamma alpha beta alpha", "de"),  # target-like pool doc
            (7, "blorb zork quux blorb", "es"),   # target-unlike pool doc
        ],
        ["doc_id", "text", "lang"],
    )
    feats = C.dsir_gram_buckets(
        docs.select("doc_id", "text", (F.col("lang") == "en").alias("_t")),
        extra_cols=("_t",),
        n_buckets=256,
    )
    w = (
        feats.groupBy("b")
        .agg(
            F.count(F.lit(1)).alias("r"),
            F.sum(F.when(F.col("_t"), 1).otherwise(0)).alias("t"),
        )
        .select("b", F.expr("((t + 1) * 1000000) DIV (r + 256)").alias("w"))
    )
    scores = {
        r["doc_id"]: r["w_avg"]
        for r in feats.join(F.broadcast(w), "b")
        .groupBy("doc_id")
        .agg(F.expr("sum(w) DIV count(1)").alias("w_avg"))
        .collect()
    }
    assert scores[6] > scores[7]
    assert min(scores[i] for i in (1, 2, 5, 6)) > max(
        scores[i] for i in (3, 4, 7)
    )


def test_dsir_gram_buckets_unigrams_plus_bigrams_with_multiplicity(spark):
    docs = spark.createDataFrame(
        [(1, "a b a"), (2, "solo")], ["doc_id", "text"]
    )
    n = (
        C.dsir_gram_buckets(docs)
        .groupBy("doc_id")
        .count()
        .collect()
    )
    counts = {r["doc_id"]: r["count"] for r in n}
    # doc 1: 3 unigrams + 2 bigrams ("a b", "b a"); doc 2: 1 unigram
    assert counts == {1: 5, 2: 1}


def test_calibration_bins_partition_the_corpus(spark):
    """calibration_lr_docs' bins partition the corpus: counts sum to
    the doc count, positives sum to the en count, and every bin's
    mean predicted score lies inside the bin's permille bounds."""
    from ngafid_cpat_spark.plans import QUERIES

    sf = "/root/testdata/sf0.001"
    rows = QUERIES["calibration_lr_docs"](spark, sf).collect()
    from ngafid_cpat_spark.sources import load

    docs = load(spark, sf, "documents")
    n = docs.count()
    n_en = docs.filter(F.col("lang") == "en").count()
    assert sum(r["n_docs"] for r in rows) == n
    assert sum(r["n_positive"] for r in rows) == n_en
    for r in rows:
        assert r["bin"] / 1000.0 <= r["mean_p"] < (r["bin"] + 1) / 1000.0


def test_bm25_topk_matches_float_reference(spark):
    """Integer-permille BM25 must rank identically to a float Okapi
    reference (k1=1.2, b=0.75, Robertson idf) on a corpus with
    distinct scores — the permille quantization is rank-preserving
    whenever score gaps exceed the 1e-3 grid."""
    from ngafid_cpat_spark.operators.corpus import bm25_topk

    docs = [
        (1, "spark join join join filter"),
        (2, "spark spark window data data data"),
        (3, "filter scan sort merge batch agg"),
        (4, "join data spark window window join data spark"),
        (5, "window"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    terms = ["spark", "join", "data"]
    got = [
        (r["doc_id"], r["rn"])
        for r in bm25_topk(df, terms, k=5).collect()
    ]
    # float reference
    import math

    toks = {d: t.split() for d, t in docs}
    n = len(docs)
    avgdl = sum(len(v) for v in toks.values()) / n
    dfreq = {
        t: sum(1 for v in toks.values() if t in v) for t in terms
    }
    scores = {}
    for d, v in toks.items():
        s = 0.0
        for t in terms:
            tf = v.count(t)
            if not tf:
                continue
            idf = (n - dfreq[t] + 0.5) / (dfreq[t] + 0.5)
            s += idf * tf * 2.2 / (
                tf + 1.2 * (0.25 + 0.75 * len(v) / avgdl)
            )
        scores[d] = s
    # docs with no query term have no postings and are absent
    want = sorted(
        (d for d in scores if scores[d] > 0),
        key=lambda d: (-scores[d], d),
    )
    assert [d for d, _ in got] == want
    assert [rn for _, rn in got] == list(range(1, len(want) + 1))


def test_rrf_fusion_hand_check(spark):
    """hybrid_rrf_topk_docs' fusion arithmetic on the real sf0.001
    tables: every output row's rrf_micro must equal
    1e6//(60+lex_rank) + 1e6//(60+vec_rank) with 0-ranks
    contributing nothing, and the ordering must follow
    (rrf_micro DESC, doc_id)."""
    from ngafid_cpat_spark.plans import QUERIES

    rows = QUERIES["hybrid_rrf_topk_docs"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert len(rows) == 10
    prev = None
    for r in rows:
        want = (1_000_000 // (60 + r["lex_rank"]) if r["lex_rank"] else 0) + (
            1_000_000 // (60 + r["vec_rank"]) if r["vec_rank"] else 0
        )
        assert r["rrf_micro"] == want
        key = (-r["rrf_micro"], r["doc_id"])
        assert prev is None or prev < key
        prev = key


def test_bm25_from_stats_decimal_lift_survives_int64_overflow(spark):
    """r12 ADVICE fix: the per-term contribution numerator
    idf_milli*22*tf*avgdl_milli must be exact PAST int64 — feed
    stats whose numerator is ~3.7e22 and compare score_milli
    against a pure-python big-int replay of the same floor
    divisions."""
    from ngafid_cpat_spark.operators.corpus import bm25_from_stats

    # 3 docs of a billion tokens each; one query term in doc 1 only
    dl = spark.createDataFrame(
        [(1, 10**9), (2, 10**9), (3, 10**9)], ["doc_id", "dl"]
    )
    tf = spark.createDataFrame(
        [(1, "spark", 10**6)], ["doc_id", "term", "tf"]
    )
    got = {
        r["doc_id"]: r["score_milli"]
        for r in bm25_from_stats(tf, dl, k=3).collect()
    }
    n, total = 3, 3 * 10**9
    a = (1000 * total) // n
    idf = (1000 * (2 * n - 2 * 1 + 1)) // (2 * 1 + 1)
    t = 10**6
    want = (idf * 22 * t * a) // (10 * t * a + 3 * a + 9000 * 10**9)
    assert idf * 22 * t * a > 2**63  # the scenario int64 cannot hold
    assert got == {1: want}


def test_pmi_collocations_matches_fraction_reference(spark):
    """pmi_micro must equal floor(1e6*N*c(xy)/(c(x.)*c(.y))) with
    margins from the FULL bigram model, and the top-k order must
    agree with exact-rational PMI ranking (fractions.Fraction)."""
    import collections
    from fractions import Fraction

    from ngafid_cpat_spark.operators.corpus import pmi_collocations

    docs = [
        (1, "new york new york city hall"),
        (2, "new york is a big city"),
        (3, "city hall and new york hall"),
        (4, "big data big data big data"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = pmi_collocations(df, k=10, min_count=2).collect()

    bc = collections.Counter()
    for _, t in docs:
        ws = t.split()
        for a, b in zip(ws, ws[1:]):
            bc[(a, b)] += 1
    cx = collections.Counter()
    cy = collections.Counter()
    for (a, b), c in bc.items():
        cx[a] += c
        cy[b] += c
    n = sum(bc.values())
    cand = {p: c for p, c in bc.items() if c >= 2}
    want = sorted(
        (
            (
                -((1_000_000 * n * c) // (cx[a] * cy[b])),
                a,
                b,
                c,
            )
            for (a, b), c in cand.items()
        ),
    )[:10]
    assert [(r["prev"], r["cur"], r["n_pairs"], r["pmi_micro"]) for r in got] == [
        (a, b, c, -neg) for neg, a, b, c in want
    ]
    assert [r["rn"] for r in got] == list(range(1, len(want) + 1))
    # micro-floor ranking agrees with exact-rational PMI here
    exact = sorted(
        cand,
        key=lambda p: (
            -Fraction(n * cand[p], cx[p[0]] * cy[p[1]]),
            p,
        ),
    )
    assert [(r["prev"], r["cur"]) for r in got] == exact[:10]


def test_weighted_sample_wor_key_ladder_matches_hashlib(spark):
    """es_key must equal a hashlib.md5 replay of the max-of-w coin
    ladder, and the top-k must be the k largest (key, id) pairs."""
    import hashlib

    from ngafid_cpat_spark.operators.corpus import weighted_sample_wor

    rows = [(i, 1 + i % 5) for i in range(1, 41)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    got = weighted_sample_wor(df, k=10, id_col="doc_id").collect()

    def key(i, w):
        return max(
            int(
                hashlib.md5(f"es:{j}:{i}".encode()).hexdigest()[:15], 16
            )
            for j in range(1, w + 1)
        )

    want = sorted(
        ((key(i, w), i, w) for i, w in rows),
        key=lambda t: (-t[0], t[1]),
    )[:10]
    assert [(r["es_key"], r["doc_id"], r["w"]) for r in got] == want
    assert [r["rn"] for r in got] == list(range(1, 11))


def test_weighted_sample_wor_inclusion_orders_by_weight(spark):
    """E-S property: across many salts, heavier rows appear in the
    sample more often — weight-8 rows must dominate weight-1 rows
    (deterministic test: md5 is fixed, salts enumerate draws)."""
    import collections

    from ngafid_cpat_spark.operators.corpus import weighted_sample_wor

    rows = [(i, 8 if i % 2 == 0 else 1) for i in range(1, 41)]
    df = spark.createDataFrame(rows, ["doc_id", "w"])
    hits = collections.Counter()
    for s in range(30):
        for r in weighted_sample_wor(
            df, k=10, salt=f"es{s}"
        ).collect():
            hits[r["w"]] += 1
    # 20 heavy (w=8) vs 20 light (w=1) rows compete for 10 slots x 30
    # draws = 300 inclusions; E[heavy share] ~ 8/9 — require a wide
    # margin, not the exact expectation
    assert hits[8] > 3 * hits[1]
    assert hits[8] + hits[1] == 300


def test_weighted_sample_wor_rejects_out_of_range_weights(spark):
    import pytest

    from ngafid_cpat_spark.operators.corpus import weighted_sample_wor

    df = spark.createDataFrame([(1, 0)], ["doc_id", "w"])
    with pytest.raises(Exception, match="weight out of"):
        weighted_sample_wor(df, k=1).collect()
    df2 = spark.createDataFrame([(1, 65)], ["doc_id", "w"])
    with pytest.raises(Exception, match="weight out of"):
        weighted_sample_wor(df2, k=1).collect()


def test_es_key_sql_rejects_injectable_salt():
    """r13 ADVICE closure: salt is interpolated into a SQL string
    literal on both engines — quote-bearing salts must fail fast."""
    import pytest

    from ngafid_cpat_spark.operators.corpus import es_key_sql

    for bad in ("a'b", 'x"y', "s;drop", "sp ace", ""):
        with pytest.raises(ValueError):
            es_key_sql("doc_id", "w", bad, duck=False)
    assert "ok-salt_1.2" in es_key_sql("doc_id", "w", "ok-salt_1.2", True)


def test_kneser_ney_fraction_replay_and_identity(spark):
    """kneser_ney_score (r14): exact-Fraction replay of the whole KN
    pipeline on a small corpus — every per-bigram probability is the
    stated integer rational, the micro quantization matches, and the
    KN identity sum_cur P_KN(cur|prev) = 1 holds exactly per context
    (the interpolation weight is exactly the discounted mass)."""
    from collections import Counter
    from fractions import Fraction

    from ngafid_cpat_spark.operators.corpus import kneser_ney_score

    rows = [
        (1, "san francisco is big and san francisco is old"),
        (2, "san jose is near san francisco"),
        (3, "the big city is old"),
        (4, "one"),  # single token: no bigrams, absent from output
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_bigrams"], r["avg_prob"], r["min_p_micro"])
        for r in kneser_ney_score(df).collect()
    }
    assert 4 not in got

    def toks(t):
        return t.lower().split()

    bigrams = {
        d: list(zip(toks(t), toks(t)[1:])) for d, t in rows if len(toks(t)) > 1
    }
    bc = Counter(b for bs in bigrams.values() for b in bs)
    c_prev = Counter()
    n1p = Counter()
    n1c = Counter()
    for (p_, c_), n in bc.items():
        c_prev[p_] += n
        n1p[p_] += 1
        n1c[c_] += 1
    B = len(bc)
    D = Fraction(3, 4)

    def p_kn(p_, c_):
        return (Fraction(bc[(p_, c_)]) - D) / c_prev[p_] + (
            D * n1p[p_] / c_prev[p_]
        ) * Fraction(n1c[c_], B)

    # KN identity: full-vocab continuation sum is exactly 1
    for p_ in c_prev:
        disc = sum(
            (Fraction(n) - D) / c_prev[p_]
            for (pp, _), n in bc.items()
            if pp == p_
        )
        lam = D * n1p[p_] / c_prev[p_]
        assert disc + lam * sum(
            Fraction(n, B) for n in n1c.values()
        ) == 1

    for d, bs in bigrams.items():
        micros = []
        for p_, c_ in bs:
            pr = p_kn(p_, c_)
            num, den = pr.numerator, pr.denominator
            micros.append((2_000_000 * num + den) // (2 * den))
            # the operator's num/den form is the same rational
            num2 = (4 * bc[(p_, c_)] - 3) * B + 3 * n1p[p_] * n1c[c_]
            den2 = 4 * c_prev[p_] * B
            assert Fraction(num2, den2) == pr
        want = (len(bs), sum(micros) / len(bs) / 1e6, min(micros))
        assert got[d] == want, (d, got[d], want)


def test_cdc_chunks_reconstruction_and_shift_robustness(spark):
    """Basic CDC (Muthitacharoen et al. 2001): (1) chunks tile the
    normalized text exactly (concatenation reconstructs it, starts
    and lengths are contiguous); (2) the content-defined property:
    prepending text to a long document leaves the chunking of the
    unchanged tail IDENTICAL (same chunk fingerprints), which
    fixed-stride chunking cannot do; (3) python replay parity of the
    boundary rule."""
    import hashlib

    from ngafid_cpat_spark.operators.corpus import cdc_chunks

    k, d = 8, 64
    base = " ".join(
        f"word{i} common phrase segment here" for i in range(40)
    )
    texts = {1: base, 2: "PREFIX INSERTED AT FRONT " + base}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    rows = cdc_chunks(df, k=k, divisor=d).collect()
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r["id"], []).append(
            (r["chunk_idx"], r["start"], r["chunk_len"], r["chunk_fp"])
        )

    def replay(txt):
        norm = " ".join(txt.lower().split())
        cuts = sorted(
            {
                p + k
                for p in range(len(norm) - k + 1)
                if int(
                    hashlib.md5(
                        norm[p:p + k].encode()
                    ).hexdigest()[:12],
                    16,
                ) % d == 0 and p + k <= len(norm)
            }
            | {len(norm)}
        )
        out, prev = [], 0
        for i, c in enumerate(cuts):
            seg = norm[prev:c]
            out.append(
                (
                    i + 1,
                    prev + 1,
                    c - prev,
                    int(
                        hashlib.md5(seg.encode()).hexdigest()[:12], 16
                    ),
                )
            )
            prev = c
        return out

    for doc_id, txt in texts.items():
        got = sorted(by_doc[doc_id])
        want = replay(txt)
        assert got == want, doc_id
        # contiguity: starts/lengths tile [1, n] exactly
        pos = 1
        for _, start, ln, _ in got:
            assert start == pos
            pos += ln
        assert pos - 1 == len(" ".join(txt.lower().split()))
    # shift robustness: the suffix chunks of doc 2 realign with
    # doc 1's chunk fingerprints (all but the first few differ only
    # near the splice point)
    fp1 = [fp for *_, fp in sorted(by_doc[1])]
    fp2 = [fp for *_, fp in sorted(by_doc[2])]
    shared = set(fp1) & set(fp2)
    assert len(shared) >= max(1, len(fp1) - 2)
