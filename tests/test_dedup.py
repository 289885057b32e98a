"""Dedup operator tests: exact, shingle-jaccard, minhash-LSH recall,
simhash, embedding near-dup."""

import pytest
from pyspark.sql import functions as F

from ngafid_cpat_spark.operators import dedup as D

BASE = "the quick brown fox jumps over the lazy dog near the old barn"
NEAR = "the quick brown fox jumps over the lazy cat near the old barn"
OTHER = "completely different words live in this sentence about spark engines"


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        {"doc_id": 1, "text": BASE},
        {"doc_id": 2, "text": BASE},                  # exact dup of 1
        {"doc_id": 3, "text": "  The  QUICK brown fox jumps over the lazy dog near the old barn "},  # dup after normalize
        {"doc_id": 4, "text": NEAR},                  # near-dup of 1
        {"doc_id": 5, "text": OTHER},
        {"doc_id": 6, "text": "tiny"},
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup(spark, docs):
    out = D.exact_dedup(docs)
    rows = {r["keeper_id"]: r["n_copies"] for r in out.collect()}
    assert rows[1] == 3          # 1, 2, 3 collapse after normalization
    assert rows[4] == 1
    assert out.count() == 4      # 4 distinct normalized texts


def test_exact_dedup_idempotent(spark, docs):
    once = D.exact_dedup(docs)
    again = D.exact_dedup(
        docs.join(once.select(F.col("keeper_id").alias("doc_id")), "doc_id", "left_semi")
    )
    assert again.count() == once.count()


def test_jaccard_pairs_finds_neardup(spark, docs):
    out = D.jaccard_pairs(docs, k=3, threshold=0.3).collect()
    pairs = {(r["id1"], r["id2"]): r["jaccard"] for r in out}
    assert (1, 2) in pairs and pairs[(1, 2)] == pytest.approx(1.0)
    assert (1, 3) in pairs and pairs[(1, 3)] == pytest.approx(1.0)
    assert (1, 4) in pairs and 0.3 <= pairs[(1, 4)] < 1.0
    assert not any(5 in p for p in pairs)  # OTHER shares no shingle run


def test_jaccard_df_cut_drops_hot_shingles(spark):
    """A stop-phrase shingle shared by EVERY doc must not square the
    join: with max_doc_freq it is dropped from the index, so docs
    related only through it produce no pair, while genuinely similar
    docs still match through their other shingles."""
    stop = "click here to subscribe"
    docs = spark.createDataFrame(
        [
            {"doc_id": 1, "text": f"alpha beta gamma delta epsilon {stop}"},
            {"doc_id": 2, "text": f"alpha beta gamma delta zeta {stop}"},
            {"doc_id": 3, "text": f"one two three four five {stop}"},
            {"doc_id": 4, "text": f"six seven eight nine ten {stop}"},
        ]
    )
    capped = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in D.jaccard_pairs(docs, k=3, threshold=0.0, max_doc_freq=3).collect()
    }
    # 1-2 share real content shingles -> still found
    assert (1, 2) in capped
    # 3-4 (and 1-3 etc.) overlap ONLY via the stop phrase -> gone
    assert (3, 4) not in capped and (1, 3) not in capped
    uncapped = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in D.jaccard_pairs(docs, k=3, threshold=0.0, max_doc_freq=None).collect()
    }
    assert (3, 4) in uncapped  # without the cap the stop phrase links them
    # capped jaccard is a lower bound of the uncapped exact value
    for p, j in capped.items():
        assert j <= uncapped[p] + 1e-12


@pytest.mark.parametrize("family", ["xxhash64", "md5km"])
def test_minhash_lsh_recall(spark, docs, family):
    exact = {
        (r["id1"], r["id2"])
        for r in D.jaccard_pairs(docs, k=3, threshold=0.3).collect()
    }
    lsh = {
        (r["id1"], r["id2"])
        for r in D.minhash_lsh_pairs(
            docs,
            k=3,
            num_hashes=32,
            bands=16,
            verify_threshold=0.3,
            hash_family=family,
        ).collect()
    }
    # banded LSH with b=16, r=2 catches j>=0.3 pairs with prob ~1-(1-j^2)^16
    # >= 0.78; the high-jaccard pairs (>=0.8) are near-certain
    high = {(1, 2), (1, 3)}
    assert high <= lsh
    assert lsh <= exact  # verification step guarantees precision


def test_minhash_md5km_matches_python_reimplementation(spark, docs):
    """The md5km family is the cross-engine contract (the DuckDB
    driver oracle recomputes it): assert the verified pair set AND
    jaccard values match an independent pure-Python reimplementation
    of signature -> banding -> exact verify."""
    import hashlib
    import re

    rows = {r["doc_id"]: r["text"] for r in docs.collect()}

    def shingles(text, k=3):
        toks = re.sub(r"\s+", " ", text.lower()).strip().split(" ")
        return {" ".join(toks[i : i + k]) for i in range(len(toks) - k + 1)}

    def sig(sh_set, n=32):
        abs_ = []
        for s in sh_set:
            h = hashlib.md5(s.encode()).hexdigest()
            abs_.append((int(h[:14], 16), int(h[14:27], 16)))
        return [min(a + i * b for a, b in abs_) for i in range(n)]

    sets = {d: shingles(t) for d, t in rows.items() if shingles(t)}
    sigs = {d: sig(s) for d, s in sets.items()}
    want = {}
    ids = sorted(sigs)
    for x in ids:
        for y in ids:
            if x >= y:
                continue
            shared_band = any(
                sigs[x][b * 2 : b * 2 + 2] == sigs[y][b * 2 : b * 2 + 2]
                for b in range(16)
            )
            if not shared_band:
                continue
            inter = len(sets[x] & sets[y])
            j = inter / (len(sets[x]) + len(sets[y]) - inter)
            if j >= 0.3:
                want[(x, y)] = round(j, 6)
    got = {
        (r["id1"], r["id2"]): round(r["jaccard"], 6)
        for r in D.minhash_lsh_pairs(
            docs,
            k=3,
            num_hashes=32,
            bands=16,
            verify_threshold=0.3,
            hash_family="md5km",
        ).collect()
    }
    assert got == want and want


@pytest.mark.parametrize("family", ["xxhash64", "md5"])
def test_simhash_pairs(spark, docs, family):
    out = D.simhash_pairs(
        docs, max_hamming=16, k=3, hash_family=family
    ).collect()
    pairs = {(r["id1"], r["id2"]): r["hamming"] for r in out}
    # exact dups collide in every block at hamming 0
    assert pairs.get((1, 2)) == 0
    assert pairs.get((1, 3)) == 0
    # precision: every reported pair is within the budget; unrelated
    # docs (5, 6) never pair with the BASE cluster
    assert all(h <= 16 for h in pairs.values())
    assert not any(5 in p or 6 in p for p in pairs)
    # NOTE: (1,4) [one word changed] has no *guaranteed* 16-bit block
    # collision — block LSH only guarantees recall at hamming < 4;
    # minhash-LSH is the high-recall path for word-level edits


def test_embedding_neardup(spark):
    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.0, 0.0]},
        {"vec_id": 2, "embedding": [0.999, 0.01, 0.0]},
        {"vec_id": 3, "embedding": [0.0, 1.0, 0.0]},
    ]
    emb = spark.createDataFrame(rows)
    out = D.embedding_neardup_pairs(emb, threshold=0.95)
    got = [(r["id1"], r["id2"]) for r in out.collect()]
    assert got == [(1, 2)]


def test_embedding_neardup_lsh_finds_close_pairs(spark):
    # near-identical vectors collide in every hyperplane bucket as
    # long as neither sits exactly ON a plane (sign bits are computed
    # on the raw vectors; a zero dot product deterministically gets
    # bit 0, so boundary vectors can split from their near-twins)
    rows = [
        {"vec_id": 1, "embedding": [1.0, 0.2, -0.3, 0.4]},
        {"vec_id": 2, "embedding": [1.001, 0.2, -0.3, 0.4]},   # ~identical
        {"vec_id": 3, "embedding": [-1.0, 0.4, 0.1, -0.9]},
        {"vec_id": 4, "embedding": [0.1, -0.8, 0.7, 0.0]},
    ]
    emb = spark.createDataFrame(rows)
    planes = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
              [0.0, 0.0, 1.0, 0.0], [0.5, -0.5, 0.5, -0.5]]
    got = {(r["id1"], r["id2"]): r["cosine"]
           for r in D.embedding_neardup_lsh(emb, planes, threshold=0.99).collect()}
    assert (1, 2) in got and got[(1, 2)] > 0.999
    # precision: nothing dissimilar sneaks past the cosine verify
    assert all(c >= 0.99 for c in got.values())


def test_connected_components(spark):
    # components: {1,2,3} via chain, {5,6}, isolated {4}
    pairs = spark.createDataFrame(
        [{"id1": 1, "id2": 2}, {"id1": 2, "id2": 3}, {"id1": 5, "id2": 6}]
    )
    ids = spark.createDataFrame([{"id": i} for i in range(1, 7)])
    out = {
        r["id"]: r["cluster_id"]
        for r in D.connected_components(pairs, ids, id_col="id").collect()
    }
    assert out == {1: 1, 2: 1, 3: 1, 4: 4, 5: 5, 6: 5}


def test_connected_components_long_chain(spark):
    # a 10-node path needs several propagation rounds to converge
    pairs = spark.createDataFrame(
        [{"id1": i, "id2": i + 1} for i in range(1, 10)]
    )
    ids = spark.createDataFrame([{"id": i} for i in range(1, 11)])
    out = D.connected_components(pairs, ids, id_col="id").collect()
    assert all(r["cluster_id"] == 1 for r in out)
    assert len(out) == 10


def test_connected_components_distributed_path_matches_fast_path(spark):
    # force the iterative loop (small_graph_edges=0) and assert it
    # returns exactly what the driver union-find fast path returns —
    # two paths, one semantics
    pairs = spark.createDataFrame(
        [{"id1": i, "id2": i + 1} for i in range(1, 10)]
        + [{"id1": 20, "id2": 21}, {"id1": 21, "id2": 22}]
    )
    ids = spark.createDataFrame([{"id": i} for i in range(1, 25)])
    loop = {
        r["id"]: r["cluster_id"]
        for r in D.connected_components(
            pairs, ids, id_col="id", small_graph_edges=0
        ).collect()
    }
    fast = {
        r["id"]: r["cluster_id"]
        for r in D.connected_components(pairs, ids, id_col="id").collect()
    }
    assert loop == fast
    assert loop[9] == 1 and loop[22] == 20 and loop[23] == 23


def test_substring_dup_spans(spark, tmp_path):
    # two docs share one verbatim 8-token span inside different text;
    # a third doc has no 8-token overlap with either
    span = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        {"doc_id": 1, "text": "intro words here " + span + " tail one",
         "source": "s", "lang": "en", "n_chars": 1},
        {"doc_id": 2, "text": "other opening " + span + " closing words two",
         "source": "s", "lang": "en", "n_chars": 1},
        {"doc_id": 3, "text": "no overlap with anything else at all in this document text",
         "source": "s", "lang": "en", "n_chars": 1},
    ]
    p = str(tmp_path / "documents.parquet")
    spark.createDataFrame(rows).write.parquet(p)
    from ngafid_cpat_spark.plans.extensions import substring_dup_spans

    out = substring_dup_spans(spark, str(tmp_path)).collect()
    grams = {r["gram"]: (r["n_docs"], r["min_doc"], r["max_doc"]) for r in out}
    assert span in grams and grams[span] == (2, 1, 2)
    # every reported gram is shared by docs 1 and 2 only (the span and
    # its window shifts never reach 2 docs beyond the shared run)
    assert all(v == (2, 1, 2) for v in grams.values())
    # the shared run is exactly 8 tokens -> exactly one shared gram
    assert len(grams) == 1


def test_edit1_pairs_exact_vs_bruteforce(spark):
    """Deletion-neighborhood join finds EXACTLY the brute-force
    distance<=1 pair set: no missed pair (completeness of the
    variant blocking) and no false pair (the levenshtein verify)."""
    names = [
        "alpha", "alphb", "alpha1", "alphaa", "beta", "betta",
        "gamma", "gamm", "delta", "completely-different",
    ]
    rows = [{"id": i, "name": n} for i, n in enumerate(names)]
    df = spark.createDataFrame(rows)
    got = {
        (r["id1"], r["id2"], r["dist"])
        for r in D.edit1_pairs(df, id_col="id", text_col="name").collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(
                    dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb)
                )
        return dp[len(b)]

    want = {
        (i, j, lev(names[i], names[j]))
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want and want  # the fixture must contain matches


def test_edit1_pairs_hot_variant_cap(spark):
    """A hot name (thousands of identical rows) used to make the
    variant self-join quadratic in that name's frequency. The
    max_variant_freq cut drops hot variants from both join sides:
    hot-name pairs vanish (the O(freq^2) output no cap can avoid),
    while pairs among cold names are untouched."""
    rows = [{"id": i, "name": "hotname"} for i in range(200)]
    rows += [
        {"id": 1000, "name": "coldname"},
        {"id": 1001, "name": "coldnames"},
        {"id": 1002, "name": "unrelated"},
    ]
    df = spark.createDataFrame(rows)
    capped = {
        (r["id1"], r["id2"])
        for r in D.edit1_pairs(
            df, id_col="id", text_col="name", max_variant_freq=50
        ).collect()
    }
    # every hotname variant has freq 200 > 50 -> all 200*199/2 hot
    # pairs cut; the cold pair survives (its variants have freq <= 2)
    assert capped == {(1000, 1001)}
    uncapped = D.edit1_pairs(
        df, id_col="id", text_col="name", max_variant_freq=None
    ).count()
    assert uncapped == 200 * 199 // 2 + 1


@pytest.mark.parametrize("family", ["xxhash64", "md5km"])
def test_incremental_minhash_dedup_drops_near_dups_of_history(
    spark, docs, family
):
    """New batch vs a corpus history: exact and NEAR dups of history
    are dropped, novel docs and sub-shingle-length docs are kept, and
    within-batch near-dups are deliberately retained (cluster
    survivorship is a separate operator)."""
    history = docs.filter(F.col("doc_id").isin(1, 5))  # BASE + OTHER
    new = docs.filter(F.col("doc_id").isin(2, 3, 4, 6)).unionByName(
        spark.createDataFrame(
            [{"doc_id": 7, "text": "a completely different document "
                                   "about distributed query engines"}]
        )
    )
    kept = {
        r["doc_id"]
        for r in D.incremental_minhash_dedup(
            new, history=history, verify_threshold=0.3, hash_family=family
        ).collect()
    }
    # 2 (exact dup of 1), 3 (dup after normalize), 4 (near-dup) all
    # match history; 6 is too short to shingle; 7 is novel
    assert kept == {6, 7}


def test_incremental_minhash_dedup_history_sig_path_identical(spark, docs):
    """Passing the PERSISTED signature table (the at-scale calling
    convention) returns exactly what deriving it from raw history
    text returns — and no history at all raises."""
    history = docs.filter(F.col("doc_id").isin(1, 5))
    new = docs.filter(F.col("doc_id").isin(2, 4, 6))
    hist_sig = D.minhash_sig_table(history)
    via_sig = {
        r["doc_id"]
        for r in D.incremental_minhash_dedup(
            new, history_sig=hist_sig, verify_threshold=0.3
        ).collect()
    }
    via_text = {
        r["doc_id"]
        for r in D.incremental_minhash_dedup(
            new, history=history, verify_threshold=0.3
        ).collect()
    }
    assert via_sig == via_text == {6}
    with pytest.raises(ValueError):
        D.incremental_minhash_dedup(new)


def test_embedding_incremental_neardup(spark):
    """New vectors near a history vector (cosine >= threshold) drop;
    novel directions and zero vectors are kept; within-batch
    near-dups are retained by design."""
    hist = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0, 0.0])],
        "vec_id long, embedding array<double>",
    )
    new = spark.createDataFrame(
        [
            (1, [0.99, 0.05, 0.0, 0.0]),   # near hist 100 -> drop
            (2, [2.0, 0.0, 0.0, 0.0]),     # scaled copy of 100 -> drop
            (3, [0.0, 0.0, 1.0, 0.0]),     # novel -> keep
            (4, [0.0, 0.0, 0.98, 0.1]),    # near 3 (within batch) -> keep
            (5, [0.0, 0.0, 0.0, 0.0]),     # zero vector -> keep
        ],
        "vec_id long, embedding array<double>",
    )
    planes = [
        [1.0, -0.3, 0.2, 0.7], [-0.5, 1.0, 0.4, -0.2],
        [0.3, 0.6, -1.0, 0.1], [0.2, -0.8, 0.5, 1.0],
    ]
    kept = {
        r["vec_id"]
        for r in D.embedding_incremental_neardup(
            new, hist, planes, threshold=0.9
        ).collect()
    }
    assert kept == {3, 4, 5}
    # broadcast_new=False (backfill mode) is result-identical
    kept2 = {
        r["vec_id"]
        for r in D.embedding_incremental_neardup(
            new, hist, planes, threshold=0.9, broadcast_new=False
        ).collect()
    }
    assert kept2 == kept


def test_lsh_bands_auto_matches_explicit(spark):
    """bands='auto' resolves via the S-curve pivot rule and must
    produce the identical verified pair set as the explicit band
    count it lands on — sizing only, never semantics. Pivot rule
    sanity: more bands for looser thresholds, monotonically."""
    from ngafid_cpat_spark.operators.dedup import (
        lsh_bands_for_threshold,
        minhash_lsh_pairs,
    )

    assert lsh_bands_for_threshold(32, 0.2) == 16
    pivots = [lsh_bands_for_threshold(32, t) for t in (0.05, 0.3, 0.6, 0.9)]
    assert pivots == sorted(pivots, reverse=True)

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy dogs"),
        (3, "a completely different sentence about spark engines"),
        (4, "a completely different sentence about spark engine"),
        (5, "nothing like the others at all whatsoever"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    auto = minhash_lsh_pairs(docs, bands="auto", verify_threshold=0.2)
    explicit = minhash_lsh_pairs(docs, bands=16, verify_threshold=0.2)
    a = {(r.id1, r.id2) for r in auto.collect()}
    e = {(r.id1, r.id2) for r in explicit.collect()}
    assert a == e and len(a) >= 1


# ---------------------------------------------------------------------------
# prefix-filtered all-pairs jaccard (allpairs_jaccard_prefix)
# ---------------------------------------------------------------------------

def _brute_jaccard(spark, rows, k, t):
    """Brute-force python shingle-set jaccard reference."""
    import itertools

    sets = {}
    for did, text in rows:
        toks = text.lower().split()
        sets[did] = {
            " ".join(toks[i:i + k]) for i in range(len(toks) - k + 1)
        }
    out = {}
    for a, b in itertools.combinations(sorted(sets), 2):
        i = len(sets[a] & sets[b])
        u = len(sets[a] | sets[b])
        if u and i / u >= t:
            out[(a, b)] = round(i / u, 6)
    return out


def test_allpairs_prefix_equals_brute_force(spark):
    from ngafid_cpat_spark.operators.dedup import allpairs_jaccard_prefix

    rows = [
        (1, "the quick brown fox jumps over the lazy dog"),
        (2, "the quick brown fox jumps over the lazy cat"),   # near-dup of 1
        (3, "the quick brown fox jumps over the lazy dog"),   # exact dup of 1
        (4, "pack my box with five dozen liquor jugs today"),
        (5, "pack my box with five dozen liquor jugs"),       # near-dup of 4
        (6, "entirely different words compose this one sentence here"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in allpairs_jaccard_prefix(
            docs, k=3, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == _brute_jaccard(spark, rows, 3, 0.5)
    assert (1, 3) in got and got[(1, 3)] == 1.0


def test_allpairs_prefix_exact_threshold_boundary(spark):
    from ngafid_cpat_spark.operators.dedup import allpairs_jaccard_prefix

    # doc pairs engineered to land exactly AT and just BELOW t=1/2:
    # shingle sets of sizes 6 and 6 sharing 4 -> j = 4/8 = 0.5 (kept);
    # sharing 3 -> j = 3/9 = 0.333 (dropped). 8 tokens => 6 3-shingles.
    a = "w1 w2 w3 w4 w5 w6 w7 w8"
    at = "w1 w2 w3 w4 w5 w6 x7 x8"     # shares shingles 1-4 of 6
    below = "w1 w2 w3 w4 w5 y6 y7 y8"  # shares shingles 1-3 of 6
    docs = spark.createDataFrame(
        [(1, a), (2, at), (3, below)], ["doc_id", "text"]
    )
    got = {
        (r["id1"], r["id2"]): r["jaccard"]
        for r in allpairs_jaccard_prefix(
            docs, k=3, threshold_num=1, threshold_den=2
        ).collect()
    }
    assert got == _brute_jaccard(
        spark, [(1, a), (2, at), (3, below)], 3, 0.5
    )
    assert (1, 2) in got and abs(got[(1, 2)] - 0.5) < 1e-9
    assert (1, 3) not in got


def test_allpairs_prefix_index_is_pruned(spark):
    from ngafid_cpat_spark.operators.dedup import (
        _shingle_sets,
        allpairs_jaccard_prefix,
    )
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(i, " ".join(f"t{i}_{j}" for j in range(20))) for i in range(10)],
        ["doc_id", "text"],
    )
    sh = _shingle_sets(docs, "doc_id", "text", 3)
    full = sh.count()
    # replicate the operator's prefix rule and check it indexes
    # roughly half the shingles at t = 1/2
    sizes = sh.groupBy("id").agg(F.count(F.lit(1)).alias("n"))
    dfreq = sh.groupBy("sh").agg(F.count(F.lit(1)).alias("dfr"))
    w = Window.partitionBy("id").orderBy("dfr", "sh")
    pref = (
        sh.join(dfreq, "sh").join(sizes, "id")
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= F.col("n") - F.expr("(n * 1 + 1) DIV 2") + 1)
        .count()
    )
    assert pref < full * 0.6
    # disjoint docs -> no pairs at all
    assert allpairs_jaccard_prefix(docs, k=3).count() == 0


def test_snm_pairs_window_contract(spark):
    """SNM finds near keys that sort adjacently and, BY CONTRACT,
    misses near pairs separated by > window-1 in sort order."""
    from ngafid_cpat_spark.operators.dedup import snm_pairs

    rows = [
        (1, "alpha"), (2, "alphb"),            # adjacent, lev 1 -> found
        (3, "beta"), (4, "betb"),              # adjacent after 'beta*'? see below
        (5, "betc"), (6, "betd"), (7, "bete"),
        (8, "zeta"),
    ]
    # sort order: alpha alphb beta betb betc betd bete zeta
    got = {
        (r["id1"], r["id2"]): r["dist"]
        for r in snm_pairs(
            spark.createDataFrame(rows, ["id", "name"]),
            window=3, max_dist=1,
        ).collect()
    }
    assert (1, 2) in got and got[(1, 2)] == 1
    assert (3, 4) in got
    # betb(4) and bete(7) are lev 1 but 3 apart in sort order:
    # outside window=3 -> contractually absent
    assert (4, 7) not in got
    # window=5 widens the neighborhood and finds it
    got5 = {
        (r["id1"], r["id2"]): r["dist"]
        for r in snm_pairs(
            spark.createDataFrame(rows, ["id", "name"]),
            window=5, max_dist=1,
        ).collect()
    }
    assert (4, 7) in got5


def test_snm_pairs_no_single_partition_window(spark):
    """The numbering must come from the range-partitioned
    global_row_number, never an empty-PARTITION-BY window."""
    from ngafid_cpat_spark.operators.dedup import snm_pairs

    df = spark.createDataFrame(
        [(i, f"name{i}") for i in range(100)], ["id", "name"]
    )
    plan = snm_pairs(df)._jdf.queryExecution().executedPlan().toString()
    assert "SinglePartition" not in plan


def test_suffix_lcp_longest_dup_vs_brute_force(spark):
    """suffix_lcp_longest_dup against a quadratic all-suffix-pairs
    brute force (a genuinely different algorithm from both the
    distributed plan and its windowed-SQL oracle)."""
    from ngafid_cpat_spark.operators.dedup import suffix_lcp_longest_dup

    docs = [
        (1, "the quick brown fox jumps over the lazy dog today"),
        (2, "a quick brown fox jumps over a fence"),
        (3, "completely unrelated words here nothing shared at all"),
        (4, "the lazy dog today is the quick brown fox"),
        (5, "over the lazy dog today it went"),
        (6, "xx yy zz"),
    ]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    got = {
        r["doc_id"]: (r["dup_len"], r["span"])
        for r in suffix_lcp_longest_dup(
            df, max_span=30, min_len=2
        ).collect()
    }
    # brute force: longest common prefix over ALL cross-doc suffix
    # pairs, smallest span string among the maximal ones
    toks = {d: t.split() for d, t in docs}
    want = {}
    for d, td in toks.items():
        best, spans = 0, set()
        for i in range(len(td)):
            for e, te in toks.items():
                if e == d:
                    continue
                for j in range(len(te)):
                    l = 0
                    while (
                        i + l < len(td)
                        and j + l < len(te)
                        and td[i + l] == te[j + l]
                    ):
                        l += 1
                    if l > best:
                        best, spans = l, {" ".join(td[i : i + l])}
                    elif l == best and l:
                        spans.add(" ".join(td[i : i + l]))
        if best >= 2:
            want[d] = (best, min(spans))
    assert got == want


def test_suffix_lcp_same_doc_runs_do_not_leak(spark):
    """A span repeated many times INSIDE one doc but never in
    another must not count: same-doc suffix runs in the global
    order may not satisfy each other."""
    from ngafid_cpat_spark.operators.dedup import suffix_lcp_longest_dup

    df = spark.createDataFrame(
        [
            (1, "alpha beta gamma alpha beta gamma alpha beta gamma"),
            (2, "delta epsilon zeta eta theta"),
        ],
        ["doc_id", "text"],
    )
    out = suffix_lcp_longest_dup(df, max_span=10, min_len=2).collect()
    assert out == []


def test_fs_linkage_weights_are_exact_subset_sums(spark):
    """Every Fellegi-Sunter pair score must be one of the 2^4 exact
    subset sums of the integer deciban weights (each field
    contributes its agreement XOR disagreement weight — nothing
    else), the decision must follow the threshold, and ids must be
    ordered."""
    import itertools

    from ngafid_cpat_spark.plans import QUERIES
    from ngafid_cpat_spark.plans.extensions import _FS_FIELDS, _FS_MATCH_T

    rows = QUERIES["fs_linkage_scores_customers"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    fields = list(_FS_FIELDS)
    sums = {}
    for agree in itertools.product([0, 1], repeat=len(fields)):
        w = sum(
            _FS_FIELDS[f][0] if a else _FS_FIELDS[f][1]
            for f, a in zip(fields, agree)
        )
        sums.setdefault(w, set()).add(sum(agree))
    for r in rows:
        assert r["w_deciban"] in sums
        assert r["n_agree"] in sums[r["w_deciban"]]
        assert r["id1"] < r["id2"]
        assert r["decision"] == (
            "match" if r["w_deciban"] >= _FS_MATCH_T else "possible"
        )
        assert r["w_deciban"] >= 0


def test_winnow_fingerprints_guarantee_and_density(spark):
    """True winnowing (Schleimer et al. 2003): (1) python replay
    parity — per-window rightmost-min over 48-bit md5 k-gram hashes;
    (2) the paper's guarantee: two docs sharing a substring of
    length >= k + w - 1 share >= 1 fingerprint hash."""
    import hashlib

    from ngafid_cpat_spark.operators.dedup import winnow_fingerprints

    k, w = 8, 4
    shared = "the quick brown fox jumps over the lazy dog"
    texts = {
        1: "AAAA " + shared + " BBBB",
        2: "xyzzy plugh " + shared + " quux",
        3: "completely unrelated content lives here now",
    }
    df = spark.createDataFrame(
        [(i, t) for i, t in texts.items()], ["doc_id", "text"]
    )
    got = {
        (r["id"], r["fp"], r["pos"])
        for r in winnow_fingerprints(df, k=k, w=w).collect()
    }

    def replay(txt):
        norm = " ".join(txt.lower().split())
        hs = [
            int(
                hashlib.md5(norm[i:i + k].encode()).hexdigest()[:12], 16
            )
            for i in range(len(norm) - k + 1)
        ]
        out = set()
        for s in range(len(hs) - w + 1):
            win = hs[s:s + w]
            m = min(win)
            # rightmost occurrence of the min
            p = s + max(j for j, h in enumerate(win) if h == m)
            out.add((m, p + 1))
        return out

    want = {
        (i, h, p) for i, t in texts.items() for h, p in replay(t)
    }
    assert got == want
    fp1 = {h for i, h, _ in got if i == 1}
    fp2 = {h for i, h, _ in got if i == 2}
    fp3 = {h for i, h, _ in got if i == 3}
    assert fp1 & fp2          # shared >= k+w-1 substring -> overlap
    assert not (fp1 & fp3) and not (fp2 & fp3)
    # density bound: selected per doc <= windows, >= windows/(w)
    for i, t in texts.items():
        n_sel = len({(h, p) for j, h, p in got if j == i})
        n_win = len(" ".join(t.lower().split())) - k + 1 - w + 1
        assert 1 <= n_sel <= n_win
