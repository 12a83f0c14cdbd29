"""Deduplication operators for large-scale document corpora.

Four strategies, trading exactness for scale:

- ``exact_dedup``: hash-groupBy on normalized text. One shuffle keyed by
  the normalized text (or its xxhash64 at very large scale).
- ``ngram_jaccard_pairs``: EXACT all-pairs Jaccard ≥ τ via self-join on
  exploded shingles. Correct but quadratic in per-shingle document
  frequency — the small-scale ground truth the approximate methods are
  judged against.
- ``minhash_lsh_pairs``: MinHash signatures + LSH banding → candidate
  pairs → exact verification. The 100 TB path: cost is O(docs × bands)
  shuffle + verification only on collisions.
- ``simhash_pairs``: 64-bit SimHash, pigeonhole banding on 16-bit
  chunks (Hamming ≤ 3 ⇒ ≥ 1 equal chunk), verified by popcount(xor).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round
from monasca_aggregator_spark.functions.text import word_shingles


def normalize_text(text: F.Column) -> F.Column:
    """Lowercase, strip non-alphanumerics, collapse whitespace."""
    return F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(text), r"[^a-z0-9\s]", ""), r"\s+", " "
        )
    )


def exact_dedup(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """One row per normalized-text group: (keeper_id, group_size).

    keeper = min id. At petabyte scale, group on xxhash64(norm_text)
    instead of the full string to shrink shuffle width.
    """
    return (
        docs.select(
            F.col(id_col), normalize_text(F.col(text_col)).alias("norm_text")
        )
        .groupBy("norm_text")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("keeper_id", "group_size")
    )


def _shingled(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    return docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    ).filter(F.size("shingles") > 0)


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    Exact: any qualifying pair shares ≥ 1 shingle, so the shingle
    self-join loses nothing. Hot shingles create join skew at scale —
    that is what minhash_lsh_pairs is for; this operator is the oracle.
    """
    sh = _shingled(docs, id_col, text_col, n)
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    exploded = sh.select("doc_id", F.explode("shingles").alias("sh"))
    a, b = exploded.alias("a"), exploded.alias("b")
    shared = (
        a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .agg(F.count(F.lit(1)).alias("shared"))
    )
    sa = sizes.select(F.col("doc_id").alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col("doc_id").alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            stable_round(
                F.col("shared") / (F.col("n_a") + F.col("n_b") - F.col("shared")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def minhash_lsh_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """LSH candidates (any shared band bucket) verified by exact Jaccard.

    With 32 hashes in 8 bands of 4 rows, collision probability at
    jaccard s is 1-(1-s^4)^8 (≈0.96 at s=0.6) — recall is high but not
    1, hence a rows-only driver entry; exactness is covered by the
    verification step (no false positives).
    """
    rows_per_band = num_hashes // bands
    # The shingled relation feeds the signature AND both sides of the
    # verification join; cache it so shingling (regex splits) runs once.
    # At cluster scale this would be a persisted/checkpointed stage.
    sh = _shingled(docs, id_col, text_col, n).cache()
    # Signature via explode-once + num_hashes min-aggregates: each
    # (shingle, seed) hashed exactly once inside whole-stage codegen,
    # one shuffle keyed by doc_id. (The array-expression form
    # functions.text.minhash_signature re-walks the shingle array per
    # seed — fine for a handful of seeds, ~30x slower at 32.)
    ex = sh.select("doc_id", F.explode("shingles").alias("s"))
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(F.xxhash64("s", F.lit(i))).alias(f"m{i}")
            for i in range(num_hashes)
        ]
    )
    band_structs = [
        F.struct(
            F.lit(b).alias("band"),
            F.xxhash64(
                F.concat_ws(
                    ",",
                    *[
                        F.col(f"m{b * rows_per_band + r}").cast("string")
                        for r in range(rows_per_band)
                    ],
                )
            ).alias("bucket"),
        )
        for b in range(bands)
    ]
    buckets = sig.select(
        "doc_id", F.explode(F.array(*band_structs)).alias("b")
    ).select("doc_id", "b.band", "b.bucket")
    a, b = buckets.alias("a"), buckets.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .distinct()
    )
    # exact verification on the candidate set only
    sh_a = sh.select(F.col("doc_id").alias("id_a"), F.col("shingles").alias("sh_a"))
    sh_b = sh.select(F.col("doc_id").alias("id_b"), F.col("shingles").alias("sh_b"))
    return (
        candidates.join(sh_a, "id_a")
        .join(sh_b, "id_b")
        .withColumn(
            "jaccard",
            stable_round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )


def simhash_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance ≤ max_hamming (≤ 3).

    SimHash is computed scalably: explode shingles, hash once, then 64
    per-bit majority votes as a single groupBy — one shuffle keyed by
    doc id. Candidate generation uses the pigeonhole principle on 4
    16-bit chunks, then popcount(xor) verifies exactly.
    """
    assert max_hamming <= 3, "4-chunk banding only covers hamming <= 3"
    sh = _shingled(docs, id_col, text_col, n)
    hashed = sh.select(
        "doc_id", F.explode("shingles").alias("s")
    ).withColumn("h", F.xxhash64("s"))
    votes = hashed.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.shiftright("h", b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{b}")
            for b in range(64)
        ]
    )
    simhash = F.lit(0).cast("bigint")
    for b in range(64):
        bit = F.when(F.col(f"v{b}") > 0, F.lit(1)).otherwise(F.lit(0)).cast("bigint")
        simhash = simhash.bitwiseOR(F.shiftleft(bit, b))
    sigs = votes.select("doc_id", simhash.alias("simhash"))

    chunks = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright("simhash", c * 16)
                        .bitwiseAND(F.lit(0xFFFF))
                        .alias("val"),
                    )
                    for c in range(4)
                ]
            )
        ).alias("c"),
    ).select("doc_id", "simhash", "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"),
            F.col("b.doc_id").alias("id_b"),
            F.bit_count(
                F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
