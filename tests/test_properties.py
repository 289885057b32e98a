"""Property-based tests (SURVEY.md §5.4): algebraic invariants of the
geodesy expressions, island segmentation, and dedup, checked by
hypothesis over randomized inputs. Each example evaluates a whole
BATCH of generated rows in one Spark job so example counts stay low
while row coverage stays high.
"""

from hypothesis import given, settings, strategies as st
from pyspark.sql import functions as F

from ngafid_cpat_spark.functions import geo
from ngafid_cpat_spark.operators import dedup as D
from ngafid_cpat_spark.operators import windows as OW

SETTINGS = dict(max_examples=8, deadline=None)

lat = st.floats(min_value=-89.0, max_value=89.0, allow_nan=False, width=32)
lon = st.floats(min_value=-179.0, max_value=179.0, allow_nan=False, width=32)
hdg = st.floats(min_value=0.0, max_value=360.0, allow_nan=False, width=32)


@given(st.lists(st.tuples(hdg, hdg), min_size=1, max_size=60))
@settings(**SETTINGS)
def test_heading_difference_range_and_symmetry(spark, pairs):
    df = spark.createDataFrame(
        [{"i": i, "h1": float(a), "h2": float(b)} for i, (a, b) in enumerate(pairs)]
    )
    rows = df.select(
        geo.heading_difference("h1", "h2").alias("d12"),
        geo.heading_difference("h2", "h1").alias("d21"),
    ).collect()
    for r in rows:
        assert 0.0 <= r["d12"] <= 180.0
        assert abs(r["d12"] - r["d21"]) < 1e-9


@given(st.lists(st.tuples(lat, lon, lat, lon), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_distance_identity_symmetry_nonneg(spark, quads):
    df = spark.createDataFrame(
        [
            {"la1": float(a), "lo1": float(b), "la2": float(c), "lo2": float(d)}
            for a, b, c, d in quads
        ]
    )
    rows = df.select(
        geo.distance("la1", "lo1", "la1", "lo1", geo.EARTH_RADIUS_M).alias("self_d"),
        geo.distance("la1", "lo1", "la2", "lo2", geo.EARTH_RADIUS_M).alias("ab"),
        geo.distance("la2", "lo2", "la1", "lo1", geo.EARTH_RADIUS_M).alias("ba"),
    ).collect()
    for r in rows:
        assert abs(r["self_d"]) < 1e-6
        assert r["ab"] >= 0.0
        assert abs(r["ab"] - r["ba"]) < 1e-6


@given(st.lists(st.tuples(lat, lon, lat, lon, hdg), min_size=1, max_size=40))
@settings(**SETTINGS)
def test_cross_track_sign_flips_on_bearing_reversal(spark, rows_in):
    df = spark.createDataFrame(
        [
            {"pa": float(pa), "po": float(po), "sa": float(sa), "so": float(so),
             "brg": float(b), "rbrg": (float(b) + 180.0) % 360.0}
            for pa, po, sa, so, b in rows_in
        ]
    )
    rows = df.select(
        geo.cross_track_distance(
            "pa", "po", "sa", "so", "brg", geo.EARTH_RADIUS_M
        ).alias("fwd"),
        geo.cross_track_distance(
            "pa", "po", "sa", "so", "rbrg", geo.EARTH_RADIUS_M
        ).alias("rev"),
    ).collect()
    # bearing+180 is the same great circle traversed the other way:
    # left/right mirror, magnitude unchanged
    for r in rows:
        if abs(r["fwd"]) > 1e-3:
            assert abs(abs(r["fwd"]) - abs(r["rev"])) < max(1e-6 * abs(r["fwd"]), 1e-3)
            assert (r["fwd"] > 0) != (r["rev"] > 0)


@given(st.lists(st.booleans(), min_size=1, max_size=80))
@settings(**SETTINGS)
def test_islands_match_edge_count_and_contiguity(spark, flags):
    df = spark.createDataFrame(
        [{"g": 1, "t": i, "flag_src": bool(f)} for i, f in enumerate(flags)]
    )
    out = (
        OW.islands(df, "g", ["t"], flag=F.col("flag_src"), island_col="isl")
        .orderBy("t")
        .collect()
    )
    # only flagged rows survive; islands numbered 1..K in time order,
    # one island per 0->1 edge, each island contiguous in t
    edges = sum(
        1 for i, f in enumerate(flags) if f and (i == 0 or not flags[i - 1])
    )
    assert len(out) == sum(flags)
    if out:
        assert max(r["isl"] for r in out) == edges
        by_island: dict = {}
        for r in out:
            by_island.setdefault(r["isl"], []).append(r["t"])
        for ts in by_island.values():
            assert ts == list(range(min(ts), max(ts) + 1))


@given(st.lists(st.sampled_from(["aa bb cc", "dd ee ff", "gg hh"]), min_size=1, max_size=30))
@settings(**SETTINGS)
def test_exact_dedup_partitions_rows(spark, texts):
    df = spark.createDataFrame(
        [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    )
    out = D.exact_dedup(df).collect()
    # groups partition the rows: copies sum to row count, one keeper
    # per distinct text, keepers are real doc ids
    assert sum(r["n_copies"] for r in out) == len(texts)
    assert len(out) == len(set(texts))
    assert all(0 <= r["keeper_id"] < len(texts) for r in out)


# ---------------------------------------------------------------------------
# Cross-engine-exact decimal arithmetic (plans/relational.py helpers)
# ---------------------------------------------------------------------------

cents2 = st.integers(min_value=-10_000_00, max_value=10_000_00)


@given(st.lists(cents2, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_stable_avg_matches_decimal_half_up(spark, cents):
    """stable_avg == Decimal ROUND_HALF_UP of (exact cents sum / n) at
    4 digits — including exact .xxxx5 ties, where float AVG+ROUND is
    engine-dependent."""
    from decimal import ROUND_HALF_UP, Decimal

    from ngafid_cpat_spark.plans.relational import stable_avg

    df = spark.createDataFrame(
        [{"g": 1, "v": c / 100.0} for c in cents]
    )
    got = df.groupBy("g").agg(stable_avg("v").alias("a")).first()["a"]
    want = float(
        (Decimal(sum(cents)) / (100 * len(cents))).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert got == want, (cents, got, want)


@given(st.lists(cents2, min_size=1, max_size=50))
@settings(**SETTINGS)
def test_cents_sum_is_exact(spark, cents):
    """cents_sum recovers the exact 2-decimal sum regardless of
    summation order (float SUM drifts by ulps; BIGINT cents cannot)."""
    from ngafid_cpat_spark.plans.relational import cents_sum

    df = spark.createDataFrame([{"g": 1, "v": c / 100.0} for c in cents])
    got = df.groupBy("g").agg(cents_sum("v").alias("s")).first()["s"]
    assert got == sum(cents) / 100.0, (cents, got)


@given(
    st.integers(min_value=-(10**18), max_value=10**18),
    st.integers(min_value=1, max_value=10**6),
)
@settings(**SETTINGS)
def test_ratio_round_half_away_from_zero(spark, num, den):
    """_ratio_round(num, den, 4) == round-half-away-from-zero of
    num/den at scale 10^4, computed with pure integers — including
    |num| past 2^53, where a floor-of-double-quotient misrounds."""
    from decimal import ROUND_HALF_UP, Decimal

    from ngafid_cpat_spark.plans.relational import _ratio_round

    df = spark.createDataFrame([{"num": num, "den": den}])
    got = df.select(
        _ratio_round(F.col("num"), F.col("den"), 4).alias("r")
    ).first()["r"]
    want = float(
        (Decimal(num) / Decimal(den) / Decimal(10_000)).quantize(
            Decimal("0.0001"), rounding=ROUND_HALF_UP
        )
    )
    assert got == want, (num, den, got, want)


name_st = st.text(alphabet="abc", min_size=0, max_size=5)


@given(st.lists(name_st, min_size=1, max_size=12, unique=True))
@settings(**SETTINGS)
def test_edit1_pairs_complete_and_sound(spark, names):
    """Deletion-neighborhood blocking with the aligned-deletion
    pruning finds EXACTLY the brute-force dist<=1 pair set on
    arbitrary short strings (including empty strings and strings
    whose whole deletion neighborhood collapses)."""
    rows = [{"id": i, "name": n} for i, n in enumerate(names)]
    df = spark.createDataFrame(rows, "id long, name string")
    got = {
        (r["id1"], r["id2"])
        for r in D.edit1_pairs(
            df, id_col="id", text_col="name", max_variant_freq=None
        ).collect()
    }

    def lev(a, b):
        dp = list(range(len(b) + 1))
        for i, ca in enumerate(a, 1):
            prev, dp[0] = dp[0], i
            for j, cb in enumerate(b, 1):
                prev, dp[j] = dp[j], min(dp[j] + 1, dp[j - 1] + 1, prev + (ca != cb))
        return dp[len(b)]

    want = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    assert got == want


vec_st = st.lists(
    st.floats(min_value=-2.0, max_value=2.0, allow_nan=False, width=32),
    min_size=4, max_size=4,
)


@given(st.lists(vec_st, min_size=1, max_size=12))
@settings(**SETTINGS)
def test_int8_quantize_bounds_and_error(spark, vecs):
    """Quantization invariants over arbitrary vectors: codes within
    [-127, 127], and per-component reconstruction error <= scale/2
    (the half-step bound of round-to-nearest)."""
    from ngafid_cpat_spark.functions import vector as V

    rows = [{"vec_id": i, "embedding": v} for i, v in enumerate(vecs)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    df = df.withColumn("embedding", F.col("embedding").cast("array<double>"))
    scale, q = V.int8_quantize("embedding")
    out = df.select("embedding", scale.alias("s"), q.alias("q")).collect()
    for r in out:
        assert all(-127 <= x <= 127 for x in r["q"])
        if r["s"] == 0:
            assert all(x == 0 for x in r["q"])
            continue
        for orig, code in zip(r["embedding"], r["q"]):
            assert abs(orig - code * r["s"]) <= r["s"] / 2 + 1e-12


@given(
    st.lists(
        st.tuples(st.integers(0, 30), st.integers(0, 30)),
        min_size=0, max_size=40,
    )
)
@settings(**SETTINGS)
def test_triangle_counts_match_bruteforce(spark, raw_pairs):
    """Degree-ordered compact-forward counting equals brute-force
    triangle enumeration on arbitrary small graphs — including
    multi-edges/self-loops in the raw input (normalized away) and
    hub-heavy shapes."""
    from itertools import combinations

    from ngafid_cpat_spark.operators import graphs as G

    edges = sorted({(min(u, v), max(u, v)) for u, v in raw_pairs if u != v})
    nodes = sorted({n for e in edges for n in e})
    eset = set(edges)
    want = {}
    for a, b, c in combinations(nodes, 3):
        if (a, b) in eset and (a, c) in eset and (b, c) in eset:
            for n in (a, b, c):
                want[n] = want.get(n, 0) + 1
    if not edges:
        return
    df = spark.createDataFrame(edges, ["u", "v"])
    got = {
        r["node"]: r["n_triangles"]
        for r in G.triangle_counts(df).collect()
    }
    assert got == want


@given(
    st.dictionaries(
        st.sampled_from(["a", "b", "c", "d"]),
        st.integers(1, 200),
        min_size=1, max_size=4,
    )
)
@settings(**SETTINGS)
def test_temperature_mix_budget_invariants(spark, sizes):
    """alpha=0.5 budget algebra: per-group take k_s =
    floor(T * isqrt(n_s) / sum isqrt) capped by group size; the
    output never exceeds the corpus, groups never exceed their
    budget, and a strictly larger group never gets a smaller
    budget."""
    import math

    from ngafid_cpat_spark.operators.corpus import temperature_mix

    rows = []
    base = 0
    for g, n in sorted(sizes.items()):
        rows += [(base + i, g) for i in range(n)]
        base += 10_000
    df = spark.createDataFrame(rows, ["doc_id", "source"])
    got = {
        r["source"]: r["n"]
        for r in temperature_mix(df)
        .groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    T = sum(sizes.values())
    sw = sum(math.isqrt(n) for n in sizes.values())
    for g, n in sizes.items():
        k = (T * math.isqrt(n)) // sw
        assert got.get(g, 0) == min(k, n)
    assert sum(got.values()) <= T


@given(st.lists(st.sampled_from(list("abc")), min_size=2, max_size=40))
@settings(**SETTINGS)
def test_bpe_single_round_matches_python_reference(spark, symbols):
    """One BPE round's argmax pair equals a direct Python pair count
    with the same (count desc, left, right) tie-break."""
    from collections import Counter

    from ngafid_cpat_spark.operators.corpus import bpe_train_merges

    text = " ".join(symbols)
    df = spark.createDataFrame([(text,)], ["text"])
    got = bpe_train_merges(df, 1)
    pairs = Counter(zip(symbols, symbols[1:]))
    best = sorted(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    assert got[0][1:] == (best[0][0], best[0][1], best[1])


@given(st.lists(st.integers(0, 2**60), min_size=1, max_size=200))
@settings(**SETTINGS)
def test_exact_isqrt_property(spark, ns):
    """exact_isqrt == math.isqrt for arbitrary BIGINT counts — the
    invariant iq*iq <= n < (iq+1)^2 holds everywhere, including far
    past 2^53 where floor(sqrt(n)) as a double drifts."""
    import math

    from ngafid_cpat_spark.operators.corpus import exact_isqrt

    df = spark.createDataFrame([(n,) for n in ns], "n long")
    got = {
        r["n"]: r["iq"]
        for r in df.select("n", exact_isqrt(F.col("n")).alias("iq")).collect()
    }
    for n in ns:
        assert got[n] == math.isqrt(n), n


_finite = st.floats(
    min_value=-1e12, max_value=1e12, allow_nan=False, allow_infinity=False
)


@given(st.lists(_finite, min_size=1, max_size=200))
@settings(**SETTINGS)
def test_round_half_away_matches_engine_round(xs):
    """round_half_away(x) == ROUND(x, 0) on the EXACT binary value of
    the double — the contract every driver-side quantizer mirrors.
    Checked against DuckDB's ROUND (verified identical to Spark's
    F.round on doubles) and against Decimal ROUND_HALF_UP on the
    exact value. Python's round() banker's-rounds halves, and
    floor(abs(x)+0.5) double-rounds UP one ulp below a half-integer —
    both would fail the hazard values injected below."""
    from decimal import ROUND_HALF_UP, Decimal

    from ngafid_cpat_spark.operators.similarity import (
        np_round_half_away,
        round_half_away,
    )

    # hazard injections: ADVICE r09's 3/128 micros case (exactly
    # 23437.5), a plain half, the largest double below 0.5 (the
    # floor(abs+0.5) double-round trap), and their negations
    xs = list(xs) + [
        3 / 128 * 1e6, 23436.5, -23436.5,
        0.49999999999999994, -0.49999999999999994, 2.5, -2.5, 0.0,
    ]
    got = [round_half_away(x) for x in xs]
    import numpy as np

    vec = np_round_half_away(np.array(xs, dtype=np.float64))
    import duckdb

    duck = [
        int(r[0])
        for r in duckdb.execute(
            "SELECT ROUND(x, 0) FROM (SELECT unnest(?::DOUBLE[]) AS x)",
            [xs],
        ).fetchall()
    ]
    for x, g, v, d in zip(xs, got, vec, duck):
        want = int(
            Decimal(x).quantize(Decimal("1"), rounding=ROUND_HALF_UP)
        )
        assert g == want == d == int(v), (x, g, v, d, want)


@given(
    st.lists(
        st.tuples(st.integers(0, 25), st.integers(0, 25)),
        min_size=1, max_size=30,
    ),
    st.lists(st.integers(0, 25), min_size=1, max_size=5),
    st.integers(1, 4),
)
@settings(**SETTINGS)
def test_bfs_hops_match_bruteforce(spark, raw_pairs, raw_seeds, rounds):
    """Fixed-round min-fold BFS equals a python BFS capped at the
    same hop count on arbitrary small graphs and seed sets
    (including seeds absent from the graph)."""
    import collections

    from ngafid_cpat_spark.operators import graphs as G

    edges = sorted({(min(u, v), max(u, v)) for u, v in raw_pairs if u != v})
    if not edges:
        return
    adj = collections.defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    seeds = sorted(set(raw_seeds))
    want = {s: 0 for s in seeds if s in adj}
    q = collections.deque((s, 0) for s in sorted(want))
    while q:
        n, d = q.popleft()
        if d == rounds:
            continue
        for m in sorted(adj[n]):
            if m not in want:
                want[m] = d + 1
                q.append((m, d + 1))
    got = {
        r["node"]: r["hop"]
        for r in G.bfs_hops(
            spark.createDataFrame(edges, ["u", "v"]),
            spark.createDataFrame([(s,) for s in seeds], ["node"]),
            n_rounds=rounds,
        ).collect()
    }
    assert got == want


@given(
    st.lists(
        st.tuples(st.integers(0, 15), st.integers(0, 15)),
        min_size=1, max_size=25,
    ),
    st.integers(1, 3),
)
@settings(**SETTINGS)
def test_label_propagation_matches_python_replay(spark, raw_pairs, rounds):
    """Synchronous min-tie-break LPA equals its python replay on
    arbitrary small graphs — the determinism contract (any
    partitioning, any visit order) reduced to executable form."""
    import collections

    from ngafid_cpat_spark.operators import graphs as G

    edges = sorted({(min(u, v), max(u, v)) for u, v in raw_pairs if u != v})
    if not edges:
        return
    adj = collections.defaultdict(list)
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    lab = {n: n for n in adj}
    for _ in range(rounds):
        lab = {
            n: min(
                collections.Counter(lab[m] for m in adj[n]).items(),
                key=lambda kv: (-kv[1], kv[0]),
            )[0]
            for n in adj
        }
    got = {
        r["node"]: r["label"]
        for r in G.label_propagation(
            spark.createDataFrame(edges, ["u", "v"]), n_rounds=rounds
        ).collect()
    }
    assert got == lab


@given(st.integers(1, 7))
@settings(max_examples=7, deadline=None)
def test_hilbert_py_bijects_and_walks_adjacent(bits):
    """hilbert_py is a bijection [0,2^b)^2 -> [0,4^b) whose
    consecutive outputs are Manhattan-distance-1 neighbors, at every
    grid size (the Spark chain is pinned bit-for-bit against this
    reference in test_textops)."""
    from ngafid_cpat_spark.functions.layout import hilbert_py

    n = 1 << bits
    inv = {}
    for x in range(n):
        for y in range(n):
            d = hilbert_py(x, y, bits)
            assert d not in inv
            inv[d] = (x, y)
    assert sorted(inv) == list(range(n * n))
    for d in range(n * n - 1):
        (a, b), (c, e) = inv[d], inv[d + 1]
        assert abs(a - c) + abs(b - e) == 1
