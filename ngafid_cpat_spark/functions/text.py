"""Text-analysis column expressions (LLM-data-pipeline extensions).

The reference has no text surface (its strings are airport codes);
these are the driver-mandated extensions (SURVEY.md §2.11) expressed
JVM-side wherever possible: tokenization, token/char stats, quality
scoring, language-ID scoring, shingling and fingerprinting all stay
column expressions — the only Python-side path is the optional char
n-gram language model in ``langid_trigram`` (vectorized pandas UDF,
used by tests; the catalog query uses the expression-only scorer).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny multilingual stopword marker lists for expression-only
# language scoring. Deliberately small and deterministic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "is", "in"),
    "es": ("el", "la", "de", "que", "los", "es"),
    "de": ("der", "die", "und", "das", "ist", "nicht"),
    "fr": ("le", "la", "les", "des", "est", "une"),
    "zh": ("的", "了", "是", "我", "不", "在"),
}

STOPWORDS_EN = ("the", "a", "an", "and", "or", "of", "to", "in", "is", "it")

# BPE-ish token pattern: runs of word chars OR single non-space symbols.
TOKEN_REGEX = "[a-z0-9]+|[^a-z0-9\\s]"


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def normalize(text) -> Column:
    """Canonical form: lowercase, collapse whitespace, trim."""
    return F.trim(F.regexp_replace(F.lower(_col(text)), "\\s+", " "))


def tokens(text) -> Column:
    """Whitespace tokenization of the normalized text -> array<string>."""
    return F.split(normalize(text), " ")


def token_count(text) -> Column:
    return F.size(tokens(text))


def token_count_bpe(text) -> Column:
    """Sub-word-ish token count: word runs + individual symbols,
    counted with a regex entirely JVM-side."""
    return F.regexp_count(F.lower(_col(text)), F.lit(TOKEN_REGEX))


def avg_token_len(text) -> Column:
    t = tokens(text)
    return F.aggregate(
        t, F.lit(0.0), lambda acc, x: acc + F.length(x)
    ) / F.size(t).cast("double")


def punct_count(text) -> Column:
    t = _col(text)
    return F.length(t) - F.length(F.regexp_replace(t, "[^\\w\\s]", ""))


def stopword_ratio(text, stopwords: tuple[str, ...] = STOPWORDS_EN) -> Column:
    t = tokens(text)
    hits = F.size(F.array_intersect(t, F.array(*[F.lit(s) for s in stopwords])))
    # ratio of *distinct* stopwords present over token count — cheap,
    # deterministic, and SQL-expressible for the oracle
    return hits.cast("double") / F.size(t).cast("double")


def quality_score(text) -> Column:
    """Deterministic doc-quality heuristic in [0, 1]: rewards moderate
    length, low punctuation density, presence of stopwords. The exact
    arithmetic is mirrored in the DuckDB oracle SQL."""
    n = F.length(_col(text)).cast("double")
    length_score = F.least(n / F.lit(500.0), F.lit(1.0))
    punct_ratio = punct_count(text).cast("double") / F.greatest(n, F.lit(1.0))
    punct_score = F.lit(1.0) - F.least(punct_ratio * F.lit(4.0), F.lit(1.0))
    stop_score = F.least(stopword_ratio(text) * F.lit(10.0), F.lit(1.0))
    return (length_score + punct_score + stop_score) / F.lit(3.0)


def lang_scores(text) -> dict[str, Column]:
    """Per-language marker-hit counts over distinct tokens."""
    t = tokens(text)
    return {
        lang: F.size(F.array_intersect(t, F.array(*[F.lit(m) for m in markers])))
        for lang, markers in LANG_MARKERS.items()
    }


def lang_id(text, default: str = "und") -> Column:
    """Expression-only language ID: argmax of marker hits, ties broken
    by language-code order, 'und' when nothing matches."""
    scores = lang_scores(text)
    # build argmax with a fold over (score, lang) structs
    pairs = F.array(
        *[F.struct(score.alias("s"), F.lit(lang).alias("l")) for lang, score in sorted(scores.items())]
    )
    best = F.array_max(F.filter(pairs, lambda p: p["s"] > 0))
    return F.when(best.isNull(), F.lit(default)).otherwise(best["l"])


def shingles(text, k: int = 3) -> Column:
    """k-word shingles as array<string>; the unit of near-dup hashing
    (SURVEY.md §2.11). Built from lead-style slicing of the token
    array — JVM-side, no explode needed until the caller wants one."""
    t = tokens(text)
    n = F.size(t)
    idx = F.sequence(F.lit(0), n - F.lit(k))
    return F.when(n < k, F.array().cast("array<string>")).otherwise(
        F.transform(idx, lambda i: F.array_join(F.slice(t, i + 1, k), " "))
    )


def fingerprint_md5(text) -> Column:
    """Canonical-text fingerprint: md5 of the normalized text. Used for
    exact dedup at scale (hash-groupBy instead of comparing bodies)."""
    return F.md5(normalize(text))


def winnow(text, window: int = 8, select: int = 4) -> Column:
    """Winnowing fingerprint: from the rolling-hash sequence, keep the
    minimum hash of each ``select``-wide band -> array<long>. The
    classic local document fingerprint (robust to insertions) built
    entirely from expressions: transform over band starts + array_min
    over slices."""
    hashes = rolling_hashes(text, window)
    n = F.size(hashes)
    # band starts step by `select`; the final full-window start is
    # appended so the tail hashes always contribute (without it the
    # last (n-1) % select hashes were invisible to the fingerprint
    # and tail-only edits went undetected)
    last_start = F.greatest(n - F.lit(select) + 1, F.lit(1))
    starts = F.array_distinct(
        F.concat(
            F.sequence(F.lit(1), last_start, F.lit(select)),
            F.array(last_start),
        )
    )
    return F.when(n <= 0, F.array().cast("array<long>")).otherwise(
        F.array_distinct(
            F.transform(starts, lambda i: F.array_min(F.slice(hashes, i, select)))
        )
    )


# Tiny per-language char-trigram profiles for the pandas-UDF language
# model (top trigrams of each language's common words; deterministic,
# embedded — no model files).
TRIGRAM_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "ing", "ion", "tio", "ent", "ati", "for", "her", "ter"),
    "es": ("que", "con", "ión", "nte", "ado", "est", "par", "los", "ien", "cio"),
    "de": ("der", "ein", "sch", "ich", "nde", "die", "und", "den", "cht", "gen"),
    "fr": ("les", "ent", "ion", "des", "que", "ait", "lle", "our", "ans", "men"),
}


def langid_trigram(text_col) -> Column:
    """Vectorized (Arrow-batched) char-trigram language ID: score each
    language by profile-trigram hits per trigram of the normalized
    text, argmax with 'und' fallback. The pandas-UDF counterpart of
    the expression-only lang_id (used where real char-level modeling
    beats the stopword-marker heuristic)."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    profiles = {k: set(v) for k, v in TRIGRAM_PROFILES.items()}

    # no inner type hints: the module's `from __future__ import
    # annotations` stringifies them and pandas_udf can't resolve the
    # local 'pd.Series' name; hint-less defaults to scalar series UDF
    @pandas_udf(StringType())
    def _udf(texts):
        import re

        out = []
        for t in texts:
            norm = re.sub(r"\s+", " ", (t or "").lower()).strip()
            tris = [norm[i : i + 3] for i in range(max(len(norm) - 2, 0))]
            if not tris:
                out.append("und")
                continue
            scores = {
                lang: sum(1 for tri in tris if tri in prof)
                for lang, prof in profiles.items()
            }
            best = max(sorted(scores), key=lambda k: scores[k])
            out.append(best if scores[best] > 0 else "und")
        return pd.Series(out)

    return _udf(_col(text_col))


def rolling_hashes(text, window: int = 8, base: int = 257, mod: int = (1 << 61) - 1) -> Column:
    """Rabin-Karp rolling hashes of the normalized char sequence ->
    array<long>. Document fingerprinting / winnowing building block.
    Expression-only via transform over substring windows."""
    norm = normalize(text)
    n = F.length(norm)
    idx = F.sequence(F.lit(1), n - F.lit(window) + 1)
    # hash each window substring with a polynomial fold over its chars.
    # Texts shorter than the window yield an EMPTY array: without the
    # guard, sequence(1, n-window+1<=0) counts DOWN and emits bogus
    # truncated-window hashes (all short docs would collide)
    return F.when(n < window, F.array().cast("array<long>")).otherwise(
        F.transform(
            idx,
            lambda i: F.aggregate(
                F.split(F.substr(norm, i, F.lit(window)), ""),
                F.lit(0).cast("long"),
                lambda acc, ch: F.pmod(acc * F.lit(base) + F.ascii(ch), F.lit(mod)),
            ),
        )
    )


# Scrub patterns kept inside the (RE2 ∩ java.util.regex) common
# dialect — no backrefs, no lookaround — so the DuckDB oracle's
# regexp_replace(..., 'g') computes the identical result.
SCRUB_DIGITS = "[0-9]+"
SCRUB_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"


def scrub(text, pattern: str = SCRUB_DIGITS, replacement: str = "#") -> Column:
    """PII-style masking: collapse every match of ``pattern`` to
    ``replacement``. Spark's regexp_replace is global by default
    (matches DuckDB's 'g' flag). Pure codegen expression."""
    return F.regexp_replace(_col(text), pattern, replacement)


def scrub_count(text, pattern: str = SCRUB_DIGITS) -> Column:
    """How many pattern matches were masked — cheap audit metric:
    count = size(split by pattern) - 1, which equals the number of
    non-overlapping matches for patterns that can't match empty."""
    return F.size(F.split(_col(text), pattern)) - 1
