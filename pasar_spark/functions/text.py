"""Text analysis for large-scale training-data pipelines.

All hot-path functions are pure Catalyst expressions (split / size /
filter / transform / xxhash64) — JVM-side, whole-stage-codegen'd, no
Python. These generalize the reference's per-row text handling
(normalize/lookup chains, temp_drugmed_view.sql:10-77) into the
document-pipeline operators a 100 TB corpus needs: token counting,
quality scoring, language ID, fingerprinting, shingling.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the heuristic must stay a broadcastable
# constant folded into codegen, not a dictionary join.
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "it", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "von"],
    "es": ["el", "la", "de", "que", "y", "los", "una", "por", "con", "para"],
    "fr": ["le", "la", "les", "de", "et", "un", "une", "est", "pour", "que"],
}


def tokens(col: Column) -> Column:
    """Whitespace tokenization (the BPE-ish regex split)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def char_count(col: Column) -> Column:
    return F.length(col).cast("long")


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t).cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return total / F.size(toks).cast("double")


def stopword_ratio_tokens(toks: Column, lang: str = "en") -> Column:
    """Stopword hit ratio over a PRE-MATERIALIZED token-array column.
    Callers computing several ratios (language ID scores all languages)
    must tokenize once into a column first — Catalyst does not eliminate
    the repeated split() subtrees across lanes."""
    hits = F.size(
        F.filter(F.transform(toks, F.lower), lambda t: t.isin(*STOPWORDS[lang]))
    )
    return hits.cast("double") / F.greatest(F.size(toks), F.lit(1)).cast("double")


def stopword_ratio(col: Column, lang: str = "en") -> Column:
    return stopword_ratio_tokens(tokens(col), lang)


def quality_score(col: Column) -> Column:
    """Composite [0,1] quality heuristic: length score (saturating at 100
    tokens) blended with an English stopword ratio — the document-pipeline
    analogue of the reference's validity filters (SURVEY.md P2/P7)."""
    length_score = F.least(token_count(col).cast("double") / F.lit(100.0), F.lit(1.0))
    return F.round(F.lit(0.5) * length_score + F.lit(0.5) * stopword_ratio(col), 4)


def lang_scores(col: Column) -> Column:
    """map<lang, stopword-hit-ratio> for the supported languages."""
    return F.map_from_arrays(
        F.array(*[F.lit(lang) for lang in STOPWORDS]),
        F.array(*[stopword_ratio(col, lang) for lang in STOPWORDS]),
    )


def lang_id_tokens(toks: Column) -> Column:
    """Pick the language with the highest stopword hit ratio over a
    pre-materialized token array; 'und' when nothing matches (e.g. zh
    with latin-script stopword lists)."""
    best = None
    best_score = None
    for lang in STOPWORDS:
        s = stopword_ratio_tokens(toks, lang)
        if best is None:
            best, best_score = F.lit(lang), s
        else:
            cond = s > best_score
            best = F.when(cond, F.lit(lang)).otherwise(best)
            best_score = F.when(cond, s).otherwise(best_score)
    return F.when(best_score > 0, best).otherwise(F.lit("und"))


def lang_id(col: Column) -> Column:
    return lang_id_tokens(tokens(col))


def fingerprint(col: Column) -> Column:
    """Deterministic 128-bit document fingerprint over the normalized
    text (exact-dup detection key). md5 is chosen over xxhash64 here so
    external systems (and the DuckDB oracle) can reproduce it."""
    return F.md5(F.trim(F.regexp_replace(col, r"\s+", " ")))


def shingles(col: Column, n: int = 5) -> Column:
    """Array of word n-gram shingle strings (for MinHash / Jaccard)."""
    toks = tokens(col)
    idx = F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0)))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n))
    )


def minhash_from_shingles(sh: Column, n_hashes: int = 32) -> Column:
    """MinHash signature from a PRE-MATERIALIZED shingle-array column:
    array of n_hashes min-over-shingles xxhash64 values, each with a
    distinct seed-salt. Pure Catalyst — no UDF, fully codegen'd. Pass a
    real column, not the shingles() expression: the n lanes would each
    re-evaluate the shingling subtree (no CSE across lanes)."""

    def _hash_fn(seed: int):
        # single-param lambda via factory: a default-arg lambda would have
        # arity 2 and Spark's transform() would bind the ARRAY INDEX to the
        # second param, silently collapsing all n hash functions into one
        return lambda s: F.xxhash64(s, F.lit(seed))

    mins = [F.array_min(F.transform(sh, _hash_fn(i))) for i in range(n_hashes)]
    return F.array(*mins)


def minhash_signature(col: Column, n_hashes: int = 32, shingle_n: int = 5) -> Column:
    return minhash_from_shingles(shingles(col, shingle_n), n_hashes)


def simhash(col: Column, bits: int = 64) -> Column:
    """64-bit SimHash over whitespace tokens: per bit, sum of +/-1 votes
    from each token's xxhash64; bit set if the vote is positive.
    Implemented with higher-order functions — one pass over tokens per
    bit group via aggregate; no Python."""
    toks = tokens(col)
    hashes = F.transform(toks, lambda t: F.xxhash64(t))
    bit_cols = []
    for b in range(bits):
        # bit test via mask (shiftright doesn't accept lambda variables);
        # bit 63 is the sign bit of the signed 64-bit hash
        if b < 63:
            mask = 1 << b
            bit_set = lambda h, m=mask: h.bitwiseAND(F.lit(m)) != 0
        else:
            bit_set = lambda h: h < 0
        def _merge(test):
            # exactly-2-arg lambda: Spark's lambda builder counts every
            # parameter (defaults included) when inferring arity
            return lambda acc, h: acc + F.when(test(h), F.lit(1)).otherwise(F.lit(-1))

        vote = F.aggregate(hashes, F.lit(0), _merge(bit_set))
        if b < 63:
            bit_cols.append(
                F.when(vote > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        else:
            bit_cols.append(
                F.when(vote > 0, F.lit(-(2**63)).cast("long")).otherwise(
                    F.lit(0).cast("long")
                )
            )
    out = bit_cols[0]
    for c in bit_cols[1:]:
        out = out + c
    return out


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))
