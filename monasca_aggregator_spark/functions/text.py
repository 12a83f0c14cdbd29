"""Text-analysis column expressions (all pure Catalyst, no Python UDFs).

These are building blocks for the LLM-data-pipeline operators: shingling,
MinHash signatures, SimHash, language-ID heuristics, quality scoring,
token counting, rolling-hash fingerprints. Everything is a column
expression so it vectorizes inside whole-stage codegen and scales
linearly with input — no Arrow round-trips in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic "BPE-ish" pre-tokenizer: letter runs, single digits,
# single punctuation marks.
BPE_REGEX = r"[a-zA-Z]+|[0-9]|[^a-zA-Z0-9\s]"

STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "for", "on", "with", "as", "this", "that", "at", "by", "from",
)

# Marker words per language for the n-gram language-ID heuristic.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of"),
    "de": ("der", "und", "die"),
    "fr": ("le", "la", "et"),
    "es": ("el", "los", "que"),
}


def tokens(text: Column) -> Column:
    """Whitespace tokens of the lower-cased, trimmed text."""
    return F.split(F.lower(F.trim(text)), r"\s+")


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles; empty array when < n tokens."""
    toks = tokens(text)
    shingled = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(toks) - F.lit(n)),
            lambda i: F.concat_ws(" ", F.slice(toks, i + F.lit(1), n)),
        )
    )
    return F.when(F.size(toks) >= n, shingled).otherwise(
        F.array().cast("array<string>")
    )


def minhash_signature(shingles: Column, num_hashes: int = 32) -> Column:
    """MinHash signature: per seed, the min xxhash64 over the shingle set.

    array<bigint> of length ``num_hashes``; empty shingle set → nulls
    (callers filter those out).
    """
    # NB: seed binding must be a closure, not a lambda default arg — a
    # 2-arg lambda makes PySpark bind (element, index) lambda variables,
    # silently shadowing the default.
    def _hashed(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[
            F.array_min(F.transform(shingles, _hashed(i)))
            for i in range(num_hashes)
        ]
    )


def minhash_bands(signature: Column, bands: int, rows_per_band: int) -> Column:
    """LSH banding: hash each contiguous ``rows_per_band`` slice of the
    signature → array<struct<band:int, bucket:bigint>>."""
    return F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.concat_ws(
                        ",",
                        *[
                            F.element_at(signature, b * rows_per_band + r + 1).cast(
                                "string"
                            )
                            for r in range(rows_per_band)
                        ],
                    )
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )


def simhash64(shingles: Column) -> Column:
    """64-bit SimHash over the shingle set.

    bit b of the result = 1 iff sum over shingles of sign(bit b of
    xxhash64(shingle)) is positive. Single pass: hash each shingle once,
    fold into a 64-lane vote accumulator with ``aggregate`` + ``zip_with``
    (one array walk total — a per-bit ``aggregate`` would walk the array
    64×), then pack the sign bits into one bigint.
    """
    hashed = F.transform(shingles, lambda s: F.xxhash64(s))
    zeros = F.array(*[F.lit(0).cast("bigint")] * 64)
    # literal single-bit masks (bit 63 is the sign bit in signed int64);
    # shiftleft/shiftright take Python-int shift amounts only, so bit
    # tests use masks, which also lets the bit index be a lambda input
    masks = F.array(
        *[
            F.lit(1 << b if b < 63 else -(1 << 63)).cast("bigint")
            for b in range(64)
        ]
    )

    def _fold(acc: Column, h: Column) -> Column:
        bits = F.transform(
            masks,
            lambda m: F.when(h.bitwiseAND(m) != 0, 1).otherwise(-1).cast(
                "bigint"
            ),
        )
        return F.zip_with(acc, bits, lambda a, v: a + v)

    votes = F.aggregate(hashed, zeros, _fold)
    # Pack sign bits: votes appears ONCE as a zip_with input (referencing
    # it per-bit via element_at would re-evaluate the whole fold per bit
    # in the interpreted higher-order-function path — no CSE there).
    lanes = F.zip_with(
        votes,
        masks,
        lambda v, m: F.when(v > 0, m).otherwise(F.lit(0).cast("bigint")),
    )
    return F.aggregate(
        lanes, F.lit(0).cast("bigint"), lambda acc, x: acc.bitwiseOR(x)
    )


def hamming64(a: Column, b: Column) -> Column:
    """Hamming distance between two 64-bit hashes (popcount of xor)."""
    return F.bit_count(a.bitwiseXOR(b))


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word occurrence counts per language (token-boundary regex)."""
    lowered = F.lower(text)
    return {
        lang: sum(
            (F.regexp_count(lowered, F.lit(rf"\b{w}\b")) for w in words),
            F.lit(0),
        )
        for lang, words in LANG_MARKERS.items()
    }


def lang_id(text: Column) -> Column:
    """Pick the first language (fixed order en,de,fr,es) holding the max
    marker score; 'und' when all scores are zero."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((best > 0) & (scores[lang] == best), F.lit(lang)).otherwise(
            expr
        )
    return expr


def rolling_fingerprint(text: Column, mod: int = 2147483647) -> Column:
    """Order-sensitive polynomial rolling hash over whitespace tokens.

    acc = (acc*31 + token_hash) mod m, with token_hash itself a rolling
    hash of the token's code points — fully deterministic and small
    enough to never overflow a bigint (m < 2^31, so acc*31 + x < 2^36).
    """
    tok_fp = lambda t: F.aggregate(  # noqa: E731
        F.split(t, ""),
        F.lit(7).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % F.lit(mod),
    )
    return F.aggregate(
        tokens(text),
        F.lit(0).cast("bigint"),
        lambda acc, t: (acc * 31 + tok_fp(t)) % F.lit(mod),
    )
