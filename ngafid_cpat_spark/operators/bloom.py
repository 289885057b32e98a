"""Bloom-filter semi-join pre-filtering.

The reference's contamination / work-queue checks are small-side
joins (reference FlightAnalysis.py:67-83 keeps its dims in driver
maps). On Spark the small side is a broadcast hash join — but at
100 TB the "small" side (a benchmark's shingle set, a blocklist, a
work queue) can outgrow the broadcast threshold, and the join
degrades to a sort-merge that shuffles the FULL fact side. This
module implements the standard fix: compress the key set into a
bloom filter (a few bits per key), ship the bits as a plan literal,
and drop non-matching fact rows map-side BEFORE the shuffle. The
exact join still runs afterwards — the bloom only removes rows that
provably cannot match (no false negatives), so results are
bit-identical to the unfiltered join while the shuffle shrinks by
(1 - selectivity - fpp).

This is the manual, composable twin of Spark's runtime bloom
pushdown (spark.sql.optimizer.runtime.bloomFilter.enabled), usable
where the optimizer's version doesn't reach: semi-join pipelines
whose build side is an intermediate result, multi-stage operators
that reuse one filter across several scans, or filters persisted
between jobs.

Everything is JVM-side: probe positions are `xxhash64(key, seed)`
expressions, the bit test is element_at + shiftrightunsigned inside
whole-stage codegen. No Python touches a row.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Cap the filter at 2^20 bits (16 Ki longs, 128 KiB as a task
# literal). Beyond ~65k keys the fpp degrades gracefully (the exact
# verify join keeps correctness); callers with truly huge key sets
# should shard the filter or fall back to a shuffle join.
MAX_BITS = 1 << 20
MIN_BITS = 1 << 10


def _probe_positions(col: Column, m_bits: int, k: int) -> list[Column]:
    # k independent probes from k seeded xxhash64 draws; xxhash64 has
    # no seed parameter in the function API, so the seed is mixed in
    # as an extra hashed column (same trick Spark's own BloomFilter
    # aggregate uses internally with (hash, seed_i) recombination)
    return [
        F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)
    ]


def bloom_build(
    keys: DataFrame, key_col: str, m_bits: int | None = None, k: int = 5
) -> tuple[list[int], int, int]:
    """Aggregate ``keys[key_col]`` into a bloom bit array.

    Distributed build: each key explodes to its k probe positions,
    positions group by 64-bit word index, `bit_or` packs the word —
    one narrow shuffle of (word_idx, bits) pairs, then a bounded
    collect of at most m_bits/64 longs (the only driver transfer,
    same bounded-collect precedent as the IVF codebook).

    Returns (words, m_bits, k); words is a dense list of
    m_bits/64 longs.
    """
    if m_bits is None:
        n = keys.select(key_col).distinct().count()
        m_bits = MIN_BITS
        while m_bits < 16 * max(n, 1) and m_bits < MAX_BITS:
            m_bits *= 2
    else:
        # a non-multiple-of-64 m_bits would truncate n_words, so a key
        # hashing into the final partial word indexes past the array —
        # round up and keep bloom_contains' view of m_bits consistent
        # via the returned value
        m_bits = ((m_bits + 63) // 64) * 64
    n_words = m_bits // 64
    pos = F.explode(
        F.array(*_probe_positions(F.col(key_col), m_bits, k))
    ).alias("pos")
    packed = (
        keys.select(pos)
        .select(
            # the function-API shift helpers require a literal shift
            # amount; the SQL forms take a column
            F.expr("CAST(pos DIV 64 AS INT)").alias("w"),
            F.expr(
                "shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))"
            ).alias("b"),
        )
        .groupBy("w")
        .agg(F.bit_or("b").alias("bits"))
        .collect()
    )
    words = [0] * n_words
    for row in packed:
        words[row["w"]] = row["bits"]
    return words, m_bits, k


def bloom_contains(
    col: Column, words: list[int] | Column, m_bits: int, k: int
) -> Column:
    """Membership-test expression: True if every probe bit is set.
    False ⇒ the key is definitely absent; True ⇒ probably present
    (verify with the exact join). Pure codegen — an element_at into
    the bit array plus bit_get per probe.

    ``words`` may be a Column (an array<bigint> attached to every
    row, e.g. from a broadcast single-row frame — what
    bloom_prefilter does) or a Python list. CAUTION with the list
    form beyond ~1k words: F.lit(list) expands to a CreateArray of
    one Literal node per element, and Janino compiling a
    10k-node expression tree costs SECONDS per plan — measured 13 s
    vs 4 s for the same query when the bit array rode in as data."""
    if m_bits % 64 != 0:
        # a probe into the truncated final word would make element_at
        # return NULL and silently drop TRUE matches — the false
        # negatives this module promises never happen (bloom_build
        # rounds up, so this only trips hand-assembled parameters)
        raise ValueError(f"m_bits must be a multiple of 64, got {m_bits}")
    lit_words = words if isinstance(words, Column) else F.lit(words)
    tests = []
    for p in _probe_positions(col, m_bits, k):
        word = F.element_at(lit_words, F.floor(p / 64).cast("int") + 1)
        # bit_get takes a column position (shiftrightunsigned doesn't)
        tests.append(F.bit_get(word, (p % 64).cast("int")) == 1)
    return reduce(lambda a, b: a & b, tests)


def bloom_prefilter(
    facts: DataFrame,
    fact_col: str,
    keys: DataFrame,
    key_col: str,
    m_bits: int | None = None,
    k: int = 5,
) -> DataFrame:
    """Drop fact rows whose ``fact_col`` is provably absent from
    ``keys[key_col]``. Survivors are a superset of true matches
    (bounded false-positive rate, zero false negatives), so any
    exact join downstream returns exactly what it would have without
    the prefilter — on (1-selectivity-fpp) fewer shuffled rows."""
    # xxhash64 hashes by TYPE as well as value: an int fact column
    # probed against a filter built from bigint keys would silently
    # drop every true match (false negatives — the one thing a bloom
    # filter must never do). Refuse mismatched dtypes instead.
    ft = dict(facts.dtypes)[fact_col]
    kt = dict(keys.dtypes)[key_col]
    if ft != kt:
        raise TypeError(
            f"bloom_prefilter: fact column {fact_col!r} is {ft} but key "
            f"column {key_col!r} is {kt}; xxhash64 probes are "
            "type-sensitive — cast both sides to one type first"
        )
    words, m, kk = bloom_build(keys, key_col, m_bits, k)
    # ship the bit array as DATA (broadcast single-row frame), not as
    # a literal expression: F.lit(16k longs) is a 16k-node CreateArray
    # that Janino compiles for seconds per plan shape
    wdf = F.broadcast(
        facts.sparkSession.createDataFrame(
            [(words,)], "__bloom_words array<bigint>"
        )
    )
    return (
        facts.crossJoin(wdf)
        .filter(
            bloom_contains(F.col(fact_col), F.col("__bloom_words"), m, kk)
        )
        .drop("__bloom_words")
    )
