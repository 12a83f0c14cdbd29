"""Driver-facing dedup queries + oracles (documents table).

dedup_exact / dedup_ngram_jaccard are exact algorithms with full SQL
oracles. dedup_minhash / dedup_simhash are approximate-candidate
algorithms (LSH recall < 1 by construction) → rows-only entries; their
false-positive-freedom is still exact because both verify candidates.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round
from monasca_aggregator_spark.functions.text import word_shingles
from monasca_aggregator_spark.operators import dedup as D
from monasca_aggregator_spark.sources.tables import load_table

THRESHOLD = 0.5


def q_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.exact_dedup(load_table(spark, sf_dir, "documents", fan_out=True))


ORACLE_EXACT = r"""
SELECT min(doc_id) AS keeper_id, count(*) AS group_size
FROM (
  SELECT doc_id,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS norm_text
  FROM documents
) t
GROUP BY norm_text
""".strip()


def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True), threshold=THRESHOLD
    )


# Shared CTE chain: documents → bigram shingles → qualifying pairs
# (used by the pair oracle AND, with RECURSIVE closure on top, the
# cluster oracle).
_NGRAM_CTES = rf"""toks AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS t FROM documents
), sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t)-1),
                                      i -> array_to_string(t[i:i+2], ' '))) AS shingles
  FROM toks WHERE len(t) >= 3
), ex AS (
  SELECT doc_id, unnest(shingles) AS s FROM sh
), sizes AS (
  SELECT doc_id, len(shingles) AS n FROM sh
), shared AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared
  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT id_a, id_b,
         floor((shared / (na.n + nb.n - shared)) * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE AS jaccard
  FROM shared
  JOIN sizes na ON na.doc_id = id_a
  JOIN sizes nb ON nb.doc_id = id_b
  WHERE floor((shared / (na.n + nb.n - shared)) * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE >= {THRESHOLD}
)"""

ORACLE_NGRAM = f"""
WITH {_NGRAM_CTES}
SELECT id_a, id_b, jaccard FROM pairs
""".strip()


_MH_EST_H = 16  # signature length for the oracle-backed estimator
_MH_EST_P = 2147483647  # Mersenne prime 2^31-1 (permutation modulus)
_EST_CAP = 500  # calibration-sample doc bound for the estimator gates
_EST_MULT = 2654435761


def _calibration_docs(docs: DataFrame, sf_dir: str) -> DataFrame:
    """Deterministic hash-sample bounding the two estimator GATES at
    bench SF (r6 verdict #5): the estimators measure error statistics
    (E[matches/H] = J; hamming ≈ θ/π), and a few hundred docs' worth
    of pairs carries the same statistics as every pair in the corpus —
    the `decontaminate_embedding` stand-in pattern.  every =
    max(1, n_docs // _EST_CAP), selection by multiplicative hash of
    doc_id (SQL-reproducible, rerun-stable).  n_docs comes from the
    parquet FOOTER (a microsecond metadata read, no Spark job — a
    count-via-broadcast-crossJoin variant kept the plan lazy but
    blocked codegen/pushdown and measured 7.1 s vs 1.3 s for the
    downstream shingle explosion at sf0.1), so `every` is a LITERAL
    and the filter rides the scan.  At the oracle SF (≤ 2×_EST_CAP
    docs) every = 1 keeps the whole corpus, so the sampled relation —
    mirrored by the docs_s CTE in the estimator oracles — is
    identical to the unsampled one."""
    import os

    import pyarrow.parquet as pq

    path = os.path.join(sf_dir, "documents.parquet")
    try:
        n = pq.ParquetFile(path).metadata.num_rows
    except Exception:  # directory datasets / exotic layouts
        n = docs.count()
    every = max(1, n // _EST_CAP)
    if every == 1:
        return docs
    pri = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_MH_EST_P)) * F.lit(_EST_MULT),
        F.lit(_MH_EST_P),
    )  # two-step mod: id*MULT overflows BIGINT past ~2^32 ids
    return docs.filter(F.pmod(pri, F.lit(every)) == 0)


# Oracle twin of _calibration_docs: identical hash, identical every.
_EST_DOCS_CTE = f"""docs_s AS (
  SELECT d.* FROM documents d,
       (SELECT greatest(count(*) // {_EST_CAP}, 1) AS every
        FROM documents) n
  WHERE ((d.doc_id % {_MH_EST_P}) * {_EST_MULT}) % {_MH_EST_P}
          % n.every = 0
)"""


def _mh_a(j: int) -> int:
    """Multiplier for affine permutation j: any nonzero a mod the
    PRIME p is a bijection of Z_p (oddness only matters mod 2^k).
    Knuth constant stepped by 2j, reduced mod p — a_j < 2^31, so
    x·a_j < 2^62 stays exact BIGINT."""
    return (2654435761 + 2 * j) % _MH_EST_P


def q_dedup_minhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED MinHash: for every exact near-dup pair (the
    trigram-Jaccard generator at the production threshold), the
    16-permutation MinHash signature AGREEMENT fraction beside the
    exact Jaccard it estimates — E[matches/H] = J is the identity the
    whole MinHash/LSH stack rests on, and this pins the signature
    arithmetic itself against SQL (the production `dedup_minhash` uses
    xxhash64 permutations, which no oracle engine reproduces — this
    twin swaps in md5-derived 32-bit permutations, exactly the
    `dedup_semantic_cells` / `ann_ivf_cells` oracle-twin pattern).

    Permutations are the textbook universal-hash construction: ONE
    md5 per shingle gives the 32-bit base value x, and h_j(x) =
    (a_j·x + b_j) mod p (p = 2³¹−1, nonzero multipliers) — the same
    affine-permutation scheme production MinHash uses, at 1/16th the
    hash cost of an md5 per permutation (the md5-per-perm version
    measured 9.0 s at sf0.1; this is the identical estimator with the
    identical SQL-reproducibility). The signature is 16 column-wise
    MIN aggregates riding the same (doc, shingle) explosion the pair
    generator already shuffles — no extra pass over the corpus. Pairs
    join two signature rows; the match count is a codegen sum of 16
    equality flags. The whole gate is bounded BY CONSTRUCTION: the
    exact pair generator refuses corpora beyond its max_docs guard
    (operators/dedup._guard_all_pairs), so at 100 TB this runs on the
    guard-bounded calibration sample — signature cost is bounded by
    the same cap, and no pruning machinery is needed (a
    checkpoint+semi-join variant measured SLOWER at test SF than this
    single lazy plan). On top of the guard, the gate runs on the
    deterministic `_calibration_docs` hash-sample (keep-all at the
    oracle SF, ~_EST_CAP docs at bench SF) — the estimator's error
    statistics don't need every pair. Output: (id_a, id_b, jaccard,
    matches, jaccard_est, abs_err), err bounded in tests
    (σ = √(J(1−J)/16) ≈ 0.12)."""
    docs = _calibration_docs(
        load_table(spark, sf_dir, "documents", fan_out=True), sf_dir
    )
    # r12 (guide §2.4): build the signature side from the IDENTICAL
    # _shingled lineage the pair generator lazily caches — the
    # CacheManager matches canonicalized plans, so one shingle pass
    # serves both sig and pairs (the old shape re-shingled the sample
    # for the signature branch; explode_outer + the null filter drops
    # empty docs exactly like the old size(sh) > 0 filter).
    sh = D._shingled(docs, "doc_id", "text", 3)
    base = F.pmod(
        F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long"),
        F.lit(_MH_EST_P),
    )
    ex = D._exploded(sh).select("doc_id", base.alias("x"))
    # r11 optimization (guide §2.4): sig is consumed twice (a/b sides)
    # and pairs' generator re-shingles the sample internally — both
    # relations are bounded by the calibration-sample/guard contract
    # (≤ sample docs rows / verified pairs), so materialize each ONCE
    # instead of re-running the shingle explosion per consumer.
    sig = ex.groupBy("doc_id").agg(
        *[
            F.min(
                F.pmod(
                    F.col("x") * F.lit(_mh_a(j)) + F.lit(j),
                    F.lit(_MH_EST_P),
                )
            ).alias(f"mh{j}")
            for j in range(1, _MH_EST_H + 1)
        ]
    ).cache()
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{j}").alias(f"a{j}") for j in range(1, _MH_EST_H + 1)],
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{j}").alias(f"b{j}") for j in range(1, _MH_EST_H + 1)],
    )
    matches = (F.col("a1") == F.col("b1")).cast("long")
    for j in range(2, _MH_EST_H + 1):
        matches = matches + (
            F.col(f"a{j}") == F.col(f"b{j}")
        ).cast("long")
    est = stable_round(
        matches.cast("double") / F.lit(float(_MH_EST_H)), 4
    )
    return (
        pairs.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            matches.alias("matches"),
            est.alias("jaccard_est"),
            stable_round(F.abs(est - F.col("jaccard")), 4).alias(
                "abs_err"
            ),
        )
    )


_MH_A_SQL = ", ".join(str(_mh_a(j)) for j in range(1, _MH_EST_H + 1))

# The estimator oracles ride the SAMPLED corpus (docs_s ≡
# _calibration_docs): same shingle/pair CTE chain, sourced from the
# hash-sample so Spark and DuckDB see the identical doc set at any SF.
_EST_NGRAM_CTES = (
    _EST_DOCS_CTE
    + ", "
    + _NGRAM_CTES.replace("FROM documents", "FROM docs_s")
)

ORACLE_MINHASH_ESTIMATE = f"""
WITH {_EST_NGRAM_CTES},
bases AS (
  SELECT doc_id,
         list_transform(shingles, s ->
           CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)
             % {_MH_EST_P}) AS xs
  FROM sh
),
sigs AS (
  SELECT doc_id,
         list_transform(range(1, {_MH_EST_H + 1}), j ->
           list_min(list_transform(xs, x ->
             (x * ([{_MH_A_SQL}])[j] + j) % {_MH_EST_P}))) AS sig
  FROM bases
),
m AS (
  SELECT p.id_a, p.id_b, p.jaccard,
         len(list_filter(range(1, {_MH_EST_H + 1}),
                         j -> sa.sig[j] = sb.sig[j])) AS matches
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, jaccard, CAST(matches AS BIGINT) AS matches,
       floor(matches / {float(_MH_EST_H)} * 10000.0::DOUBLE
             + 0.5::DOUBLE) / 10000.0::DOUBLE AS jaccard_est,
       floor(abs(floor(matches / {float(_MH_EST_H)}
                       * 10000.0::DOUBLE + 0.5::DOUBLE)
                 / 10000.0::DOUBLE - jaccard)
             * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE
         AS abs_err
FROM m
""".strip()


_SH_EST_BITS = 32  # simhash width for the oracle-backed estimator


def q_dedup_simhash_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED SimHash: the 32-bit signature HAMMING distance
    beside the exact Jaccard on every exact near-dup pair — the
    random-hyperplane sibling of `dedup_minhash_estimate` (Charikar
    2002: P(bit differs) = θ/π, so near-identical shingle sets land at
    hamming ≈ 0 and unrelated ones near 16/32). Pins the signature
    arithmetic itself against SQL; the production `dedup_simhash`
    (xxhash64 bits) stays rows-only.

    Signature: each shingle's md5-derived 32-bit value votes ±1 per
    bit position; bit b of the doc's simhash is 1 iff the vote sum is
    ≥ 0. The 32 vote sums are column aggregates riding the same
    (doc, shingle) explosion as the MinHash twin — order-free exact
    integers, so both engines produce identical signatures, and the
    output carries NO trigonometry (acos/cos differ by ulps across
    engines): (id_a, id_b, jaccard, hamming, ham_frac). The inverse
    hamming↔similarity relation is pinned in tests. Bounded BY
    CONSTRUCTION via the pair generator's max_docs guard, and bounded
    at bench SF by the `_calibration_docs` hash-sample, like the
    MinHash twin."""
    docs = _calibration_docs(
        load_table(spark, sf_dir, "documents", fan_out=True), sf_dir
    )
    # r12: same shared-shingle-lineage shape as the MinHash twin —
    # one shingle pass serves both the signature and the generator.
    sh = D._shingled(docs, "doc_id", "text", 3)
    x = F.conv(F.substring(F.md5(F.col("s")), 1, 8), 16, 10).cast("long")
    ex = D._exploded(sh).select("doc_id", x.alias("x"))
    bit_votes = [
        F.sum(
            F.when(
                F.shiftright(F.col("x"), b).bitwiseAND(F.lit(1)) == 1,
                F.lit(1),
            ).otherwise(F.lit(-1))
        ).alias(f"v{b}")
        for b in range(_SH_EST_BITS)
    ]
    # r11 optimization: same bounded-relation materialization as the
    # MinHash twin — sig feeds both join sides, pairs re-shingles.
    sig = ex.groupBy("doc_id").agg(*bit_votes).select(
        "doc_id",
        *[
            (F.col(f"v{b}") >= 0).cast("int").alias(f"b{b}")
            for b in range(_SH_EST_BITS)
        ],
    ).cache()
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
    a = sig.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"b{b}").alias(f"a{b}") for b in range(_SH_EST_BITS)],
    )
    b_side = sig.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"b{b}").alias(f"c{b}") for b in range(_SH_EST_BITS)],
    )
    hamming = (F.col("a0") != F.col("c0")).cast("long")
    for b in range(1, _SH_EST_BITS):
        hamming = hamming + (
            F.col(f"a{b}") != F.col(f"c{b}")
        ).cast("long")
    return (
        pairs.join(a, "id_a")
        .join(b_side, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            hamming.alias("hamming"),
            stable_round(
                hamming.cast("double") / F.lit(float(_SH_EST_BITS)), 4
            ).alias("ham_frac"),
        )
    )


ORACLE_SIMHASH_ESTIMATE = f"""
WITH {_EST_NGRAM_CTES},
xs AS (
  SELECT doc_id,
         list_transform(shingles, s ->
           CAST('0x' || substr(md5(s), 1, 8) AS BIGINT)) AS xs
  FROM sh
),
sigs AS (
  SELECT doc_id,
         list_transform(range(0, {_SH_EST_BITS}), b ->
           CASE WHEN list_sum(list_transform(xs, x ->
                  CASE WHEN (x >> b) & 1 = 1 THEN 1 ELSE -1 END)) >= 0
                THEN 1 ELSE 0 END) AS sig
  FROM xs
),
m AS (
  SELECT p.id_a, p.id_b, p.jaccard,
         len(list_filter(range(1, {_SH_EST_BITS + 1}),
                         i -> sa.sig[i] <> sb.sig[i])) AS hamming
  FROM pairs p
  JOIN sigs sa ON sa.doc_id = p.id_a
  JOIN sigs sb ON sb.doc_id = p.id_b
)
SELECT id_a, id_b, jaccard, CAST(hamming AS BIGINT) AS hamming,
       floor(hamming / {float(_SH_EST_BITS)} * 10000.0::DOUBLE
             + 0.5::DOUBLE) / 10000.0::DOUBLE AS ham_frac
FROM m
""".strip()


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-ingestion dedup: even doc_ids are the indexed
    corpus, odd doc_ids the incoming batch; report per-source incoming
    vs kept (not-already-indexed) counts. Bloom-pruned exact
    anti-join — shuffle scales with the duplicate rate, not the batch
    (operators/dedup.py incremental_new_docs)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    new = D.incremental_new_docs(batch, corpus)
    incoming = batch.groupBy("source").agg(
        F.count(F.lit(1)).alias("incoming")
    )
    kept = new.groupBy("source").agg(F.count(F.lit(1)).alias("kept"))
    return (
        incoming.join(kept, "source", "left")
        .select(
            "source",
            "incoming",
            F.coalesce("kept", F.lit(0)).alias("kept"),
        )
    )


ORACLE_INCREMENTAL = r"""
WITH n AS (
  SELECT doc_id, source,
         trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS nt
  FROM documents
), corpus AS (
  SELECT DISTINCT nt FROM n WHERE doc_id % 2 = 0
), batch AS (
  SELECT * FROM n WHERE doc_id % 2 = 1
)
SELECT b.source,
       CAST(count(*) AS BIGINT) AS incoming,
       CAST(count(*) FILTER (WHERE c.nt IS NULL) AS BIGINT) AS kept
FROM batch b LEFT JOIN corpus c ON b.nt = c.nt
GROUP BY b.source
""".strip()


def q_dedup_incremental_near(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """rows-only: NEAR-dup incremental ingestion — LSH candidates
    between the odd-id batch and the even-id indexed corpus only
    (operators/dedup.py incremental_minhash_pairs; never corpus², never
    batch², verified exactly). LSH recall < 1 by construction → no SQL
    oracle; cross-side-only and verified-exactness semantics pinned in
    tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    batch = docs.filter(F.col("doc_id") % 2 == 1)
    return D.incremental_minhash_pairs(batch, corpus, threshold=THRESHOLD)


def q_dedup_jaccard_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtering (All-Pairs) exact Jaccard join — identical
    output to dedup_ngram_jaccard, but candidates come from rarest-
    shingle prefixes instead of the full (skew-prone) shingle
    self-join. Shares ORACLE_NGRAM because the semantics are exact."""
    return D.jaccard_prefix_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True),
        threshold=THRESHOLD,
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters from the exact n-gram pair graph: iterative
    min-label propagation (operators.dedup.connected_components); the
    oracle computes the same components with a recursive-CTE transitive
    closure."""
    pairs = D.ngram_jaccard_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True),
        threshold=THRESHOLD,
    )
    return D.connected_components(pairs)


ORACLE_CLUSTERS = f"""
WITH RECURSIVE {_NGRAM_CTES}, und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
)
SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
FROM reach GROUP BY src
""".strip()


def q_dedup_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End of the dedup pipeline: pairs → clusters → keep only each
    cluster's canonical member (min doc_id = the component label) and
    report the surviving corpus per source. The removed set is bounded
    by the duplicate count, so it anti-joins broadcast-side against
    the full corpus — the corpus itself is never shuffled."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
    comp = D.connected_components(pairs)
    removed = comp.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    return (
        docs.join(F.broadcast(removed), "doc_id", "left_anti")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


ORACLE_CANONICAL = f"""
WITH RECURSIVE {_NGRAM_CTES}, und AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(src, dst) AS (
  SELECT a, b FROM und
  UNION
  SELECT r.src, u.b FROM reach r JOIN und u ON r.dst = u.a
), labels AS (
  SELECT src AS doc_id, least(src, min(dst)) AS cluster_id
  FROM reach GROUP BY src
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE doc_id NOT IN (SELECT doc_id FROM labels WHERE doc_id <> cluster_id)
GROUP BY source
""".strip()


EMB_THRESHOLD = 0.35


def q_dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    from monasca_aggregator_spark.operators.similarity import (
        embedding_cosine_pairs,
    )

    return embedding_cosine_pairs(
        load_table(spark, sf_dir, "embeddings", fan_out=True),
        threshold=EMB_THRESHOLD,
    )


ORACLE_EMBEDDING = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       floor(list_cosine_similarity(a.e, b.e) * 1000000.0::DOUBLE + 0.5::DOUBLE)
         / 1000000.0::DOUBLE AS sim
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE floor(list_cosine_similarity(a.e, b.e) * 1000000.0::DOUBLE + 0.5::DOUBLE)
        / 1000000.0::DOUBLE >= {EMB_THRESHOLD}
""".strip()


ED_MAX = 20
ED_PREFIX = 16


def q_dedup_editdistance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance near-dup pairs: prefix-16 blocking (equi-join) +
    exact length pruning + banded-threshold Levenshtein verify. The
    oracle applies the SAME blocking (blocked candidate generation is
    the operator's defined semantics — the recall dial of the family);
    tests/test_dedup.py separately pins blocked ≡ exhaustive recall on
    this corpus."""
    return D.edit_distance_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True),
        max_distance=ED_MAX,
        prefix_len=ED_PREFIX,
    )


ORACLE_EDITDISTANCE = f"""
WITH d AS (
  SELECT doc_id, text, length(text) AS n, substr(text, 1, {ED_PREFIX}) AS blk
  FROM documents
), c AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         levenshtein(a.text, b.text) AS edit_distance
  FROM d a JOIN d b
    ON a.blk = b.blk AND a.doc_id < b.doc_id AND abs(a.n - b.n) <= {ED_MAX}
)
SELECT id_a, id_b, edit_distance FROM c WHERE edit_distance <= {ED_MAX}
""".strip()


def q_dedup_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.minhash_lsh_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True), threshold=THRESHOLD
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    return D.simhash_pairs(load_table(spark, sf_dir, "documents", fan_out=True))


def q_image_ahash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: perceptual near-dup image pairs over REAL PPM
    payloads synthesized deterministically from document text
    (operators/multimodal.py), plus a REAL-resized twin of every 10th
    image (id + 10^7) — bytes → pixels → nearest-neighbor resample →
    aHash → banded Hamming join, the image counterpart of
    dedup_simhash. aHash is resize-robust, so each twin pairs with its
    original (the dup structure an exact byte hash cannot see).
    Hash-specific output, so no SQL oracle; invariants pinned in
    tests/test_multimodal.py."""
    from monasca_aggregator_spark.operators.multimodal import (
        documents_as_ppm_media,
        image_near_dup_pairs,
        resize_images,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    media = documents_as_ppm_media(docs)
    # pre-filtered twin encode — see the r11 note in q_image_dhash_dedup
    twins = resize_images(
        documents_as_ppm_media(docs.filter(F.col("doc_id") % 10 == 0)),
        width=24,
        height=24,
        resample=True,
    ).withColumn("media_id", F.col("media_id") + F.lit(10_000_000))
    return image_near_dup_pairs(media.unionByName(twins), max_hamming=2)


def q_image_phash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: DCT perceptual-hash (pHash, Zauner 2010) near-dup
    image pairs — the photometric-shift counterpart of
    image_ahash_dedup, closing the r7-verdict gap (aHash is
    brightness-mean-only and misses gamma/contrast-shifted twins).
    SMOOTH doc-derived PPM payloads
    (operators/multimodal.documents_as_smooth_ppm_media — dense
    low-frequency content, pHash's regime) plus a GAMMA-2.0-shifted
    twin of every 10th image (id + 10^7, operators/multimodal.
    adjust_images): real decode → 32×32 area resample → 32-point
    orthonormal DCT-II (the jpeg.py transform generalized) → 8×8
    low-frequency median hash → 8×8-bit-band pigeonhole Hamming join
    (≤6 budget). Measured on this corpus: aHash ≤3 misses 43/60 gamma
    twins; pHash ≤6 catches 60/60 with unrelated pairs ≥20 apart.
    Hash-specific output, so no SQL oracle; the aHash-fails/pHash-
    holds contrast is pinned in tests/test_multimodal.py."""
    from monasca_aggregator_spark.operators.multimodal import (
        adjust_images,
        documents_as_smooth_ppm_media,
        image_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    media = documents_as_smooth_ppm_media(docs)
    # pre-filtered twin encode — see the r11 note in q_image_dhash_dedup
    twins = adjust_images(
        documents_as_smooth_ppm_media(
            docs.filter(F.col("doc_id") % 10 == 0)
        ),
        gamma=2.0,
    ).withColumn("media_id", F.col("media_id") + F.lit(10_000_000))
    return image_near_dup_pairs(
        media.unionByName(twins), max_hamming=6, method="phash"
    )


def q_image_dhash_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: DIFFERENCE-hash (dHash, Krawetz 2013) near-dup
    image pairs — the third perceptual hash completing the trio
    (aHash: local edits; pHash: large-scale structure; dHash: local
    pairwise ORDERINGS, so monotone photometric maps barely move it
    and no DCT is needed). Same gamma-twin corpus as
    image_phash_dedup; measured twin Hamming ≤5 here (per-channel
    gamma + channel-mixed gray is not exactly order-preserving)
    vs aHash's ≤8-with-tail, at one comparison per bit.
    Hash-specific output, so no SQL oracle; invariants pinned in
    tests/test_multimodal.py."""
    from monasca_aggregator_spark.operators.multimodal import (
        adjust_images,
        documents_as_smooth_ppm_media,
        image_near_dup_pairs,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    media = documents_as_smooth_ppm_media(docs)
    # r11 (guide §4.1): filter BEFORE the opaque mapInPandas encoder —
    # media_id ≡ doc_id, so pre-filtering the docs is identical to
    # filtering the encoded relation, but the twins branch now encodes
    # only its 10% subset instead of re-encoding the whole corpus
    # above a filter that cannot push below the Python stage.
    twins = adjust_images(
        documents_as_smooth_ppm_media(
            docs.filter(F.col("doc_id") % 10 == 0)
        ),
        gamma=2.0,
    ).withColumn("media_id", F.col("media_id") + F.lit(10_000_000))
    return image_near_dup_pairs(
        media.unionByName(twins), max_hamming=5, method="dhash"
    )


SPAN_N = 8


def q_dedup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    from monasca_aggregator_spark.operators.textops import span_dup_coverage

    return span_dup_coverage(
        load_table(spark, sf_dir, "documents", fan_out=True), n=SPAN_N
    )


ORACLE_SPANS = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, array_to_string(toks[i:i+{SPAN_N - 1}], ' ') AS span
  FROM t, unnest(range(1, len(toks) - {SPAN_N - 2})) AS u(i)
  WHERE len(toks) >= {SPAN_N}
), stats AS (
  SELECT span, count(DISTINCT doc_id) AS n_docs FROM s GROUP BY 1
)
SELECT doc_id,
       count(*) AS n_spans,
       CAST(sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_dup_spans,
       floor((sum(CASE WHEN n_docs > 1 THEN 1 ELSE 0 END)::DOUBLE
              / count(*)) * 10000.0::DOUBLE + 0.5::DOUBLE) / 10000.0::DOUBLE
         AS dup_frac
FROM s JOIN stats USING (span)
GROUP BY 1
""".strip()


def q_dedup_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-dedup rewrite (operators/textops.span_dedup_rewrite):
    tokens covered by an 8-token span first seen in an earlier doc are
    removed; the earliest doc keeps its text. Output fingerprints the
    surviving tokens so the oracle can verify the rewrite exactly."""
    from monasca_aggregator_spark.operators.textops import (
        span_dedup_rewrite,
    )

    return span_dedup_rewrite(
        load_table(spark, sf_dir, "documents", fan_out=True), n=SPAN_N
    )


ORACLE_SPAN_REWRITE = rf"""
WITH t AS (
  SELECT doc_id, string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(toks[i:i+{SPAN_N - 1}], ' ') AS span
  FROM t, unnest(range(1, len(toks) - {SPAN_N - 2})) AS u(i)
  WHERE len(toks) >= {SPAN_N}
), f AS (
  SELECT span, min(doc_id) AS first_doc FROM s GROUP BY 1
), d AS (
  SELECT s.doc_id, list(s.pos) AS starts
  FROM s JOIN f USING (span) WHERE f.first_doc < s.doc_id GROUP BY 1
), k AS (
  SELECT t.doc_id, t.toks, coalesce(d.starts, []) AS starts,
         list_filter(t.toks, (tok, i) ->
           len(list_filter(coalesce(d.starts, []),
                           s -> s <= i - 1 AND i - 1 <= s + {SPAN_N - 1}))
             = 0) AS kept
  FROM t LEFT JOIN d USING (doc_id)
)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(toks) - len(kept) AS BIGINT) AS n_removed,
       -- array_to_string([]) is NULL in DuckDB (Spark array_join
       -- gives '') — coalesce so fully-rewritten docs hash alike
       md5(coalesce(array_to_string(kept, ' '), '')) AS kept_md5
FROM k
""".strip()


_LINE_W = 10  # tokens per synthesized pseudo-line
_LINE_HEADER = "subscribe to the "
_LINE_HEADER_TAIL = " newsletter for updates"
_LINE_FOOTER = "this site uses cookies to improve your experience"


def q_dedup_line_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LINE-level boilerplate removal (operators/textops.
    line_dedup_rewrite) — the fineweb/CCNet step between HTML
    extraction and near-dedup: whole lines repeating across documents
    (nav/footer/cookie-banner text) are stripped everywhere except
    their first corpus occurrence. The test corpus is single-line, so
    the query synthesizes the line structure deterministically in
    BOTH engines: body re-segmented into {_LINE_W}-token lines, plus
    an injected per-source header line (duplicated across every doc
    of a source) and a global footer line — the operator must remove
    header+footer from all but each group's first doc, and the
    per-doc kept_md5 pins the exact surviving text.

    Scale: the line-DF exchange carries 8-byte xxhash64 keys only;
    removed positions collapse to one int-array per doc; the rewrite
    is a JVM-side higher-order filter (span_dedup_rewrite's shape,
    one level up — lines instead of token spans)."""
    from monasca_aggregator_spark.operators.textops import (
        line_dedup_rewrite,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = F.split(F.lower(F.trim(F.col("text"))), r"\s+")
    n_chunks = F.ceil(F.size(toks) / F.lit(float(_LINE_W))).cast("int")
    body = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(
            F.slice(toks, i * _LINE_W + 1, _LINE_W), " "
        ),
    )
    header = F.concat(
        F.lit(_LINE_HEADER), F.col("source"), F.lit(_LINE_HEADER_TAIL)
    )
    text_nl = F.array_join(
        F.concat(
            F.array(header), body, F.array(F.lit(_LINE_FOOTER))
        ),
        "\n",
    )
    return line_dedup_rewrite(
        docs.select("doc_id", text_nl.alias("text")), min_df=2
    )


ORACLE_LINE_REWRITE = rf"""
WITH tk AS (
  SELECT doc_id, source,
         string_split_regex(lower(trim(text)), '\s+') AS toks
  FROM documents
), chunks AS (
  SELECT doc_id, i,
         array_to_string(toks[(i*{_LINE_W})+1:(i*{_LINE_W})+{_LINE_W}],
                         ' ') AS line
  FROM tk, unnest(range(0, CAST(ceil(len(toks) / {_LINE_W}.0)
                                AS BIGINT))) u(i)
), body AS (
  SELECT doc_id, string_agg(line, chr(10) ORDER BY i) AS b
  FROM chunks GROUP BY 1
), t AS (
  SELECT tk.doc_id,
         '{_LINE_HEADER}' || tk.source || '{_LINE_HEADER_TAIL}'
           || chr(10) || body.b || chr(10) || '{_LINE_FOOTER}' AS text
  FROM tk JOIN body USING (doc_id)
), l AS (
  SELECT doc_id, u.p - 1 AS pos, lines[u.p] AS line
  FROM (SELECT doc_id, string_split(text, chr(10)) AS lines FROM t),
       unnest(range(1, len(lines) + 1)) u(p)
), st AS (
  SELECT trim(line) AS norm, count(DISTINCT doc_id) AS df,
         min(doc_id) AS first_doc
  FROM l WHERE trim(line) <> '' GROUP BY 1
), k AS (
  SELECT l.doc_id, l.pos, l.line,
         CASE WHEN st.df >= 2 AND st.first_doc < l.doc_id
              THEN 1 ELSE 0 END AS rm
  FROM l LEFT JOIN st ON trim(l.line) = st.norm
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_lines,
       CAST(sum(rm) AS BIGINT) AS n_removed,
       md5(coalesce(string_agg(line, chr(10) ORDER BY pos)
                      FILTER (WHERE rm = 0), '')) AS kept_md5
FROM k GROUP BY 1
""".strip()


CONTAINMENT_THRESHOLD = 0.8


def q_dedup_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-copy pairs: smaller shingle set ≥ 80% contained in the
    larger (C = |A∩B|/min(|A|,|B|)) — the complement of Jaccard for
    lifted-paragraph / stitched-document detection. Same exact shingle
    self-join as dedup_ngram_jaccard; only the score changes."""
    return D.shingle_containment_pairs(
        load_table(spark, sf_dir, "documents", fan_out=True),
        n=3,
        threshold=CONTAINMENT_THRESHOLD,
    )


ORACLE_CONTAINMENT = f"""
WITH {_NGRAM_CTES.split(', pairs AS')[0]}
SELECT id_a, id_b,
       floor((shared / least(na.n, nb.n)) * 10000.0::DOUBLE
             + 0.5::DOUBLE) / 10000.0::DOUBLE AS containment
FROM shared
JOIN sizes na ON na.doc_id = id_a
JOIN sizes nb ON nb.doc_id = id_b
WHERE floor((shared / least(na.n, nb.n)) * 10000.0::DOUBLE
            + 0.5::DOUBLE) / 10000.0::DOUBLE >= {CONTAINMENT_THRESHOLD}
""".strip()


def q_dedup_semantic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: SemDeDup-shaped semantic near-dedup
    (operators/similarity.semantic_dedup_pairs) — spherical-k-means
    cells, then pairwise cosine only WITHIN each cell (Σ|cell|² work,
    not n²). Approximate by design: pairs the clustering splits across
    cells are unreachable, so no SQL oracle; test_similarity.py pins
    semantic pairs ≡ brute-force pairs restricted to same-cell, and
    ⊆ the full brute-force pair set, at the same threshold."""
    from monasca_aggregator_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    return semantic_dedup_pairs(
        load_table(spark, sf_dir, "embeddings", fan_out=True),
        threshold=EMB_THRESHOLD,
    )


_PR_EXACT_ITER = 5


def q_graph_pagerank_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED PageRank: the e12 exact-integer power iteration
    (operators/graph.pagerank_pairs) over the exact trigram-Jaccard
    pair graph, pinned against a DuckDB RECURSIVE-CTE replay of the
    IDENTICAL integer recurrence — the first iterative graph operator
    with a full rows+schema+hash oracle (pagerank/kcore on the ANN
    candidate graph stay rows-only because LSH/IVF recall < 1 is not
    SQL-reproducible; the RECURRENCE itself now is). Every rank is a
    BIGINT trajectory of floor divisions — join order, partitioning,
    and engine cannot change a single bit, which is exactly what makes
    a recursive SQL oracle possible where float PageRank would drift.

    Scale: the Spark side is one keyed join + one partial-aggregated
    groupBy per iteration on the cached edge relation (the
    pagerank_pairs contract); the oracle's recursive CTE is the same
    dataflow in SQL."""
    from monasca_aggregator_spark.operators.graph import pagerank_pairs

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pairs = D.ngram_jaccard_pairs(docs, threshold=THRESHOLD)
    return pagerank_pairs(pairs, n_iter=_PR_EXACT_ITER).select(
        "id", "rank_e12"
    )


ORACLE_PAGERANK_EXACT = f"""
WITH RECURSIVE {_NGRAM_CTES},
edges AS (
  SELECT id_a AS src, id_b AS dst FROM pairs
  UNION ALL
  SELECT id_b AS src, id_a AS dst FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
meta AS (SELECT count(*) AS n FROM deg),
pr(iter, id, r) AS (
  SELECT 0, src, CAST(1000000000000 // n AS BIGINT)
  FROM deg CROSS JOIN meta
  UNION ALL
  SELECT pr.iter + 1, e.dst,
         CAST((15 * 1000000000000 // (100 * m.n))
              + (85 * sum(pr.r // d.deg)) // 100 AS BIGINT)
  FROM pr
  JOIN edges e ON e.src = pr.id
  JOIN deg d ON d.src = e.src
  CROSS JOIN meta m
  WHERE pr.iter < {_PR_EXACT_ITER}
  GROUP BY e.dst, pr.iter, m.n
)
SELECT id, r AS rank_e12 FROM pr WHERE iter = {_PR_EXACT_ITER}
""".strip()


def q_dedup_embedding_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding UNIQUENESS audit per label: distinct e6-fixed vectors
    vs rows — the content-hash dedup check of embedding space, run
    BEFORE any ANN indexing (identical vectors are re-encoded crawls
    or pipeline replays; they waste index space and bias centroid
    training, and no near-dup threshold is needed to catch them — the
    embedding sibling of `dedup_exact`'s normalized-text key, reported
    per label so a replayed class can't hide in the corpus total).

    The identity key is the concatenated e6 integer quantization of
    every component (floor(x·1e6 + 0.5) — the corpus-wide cosine
    rounding convention, so "identical" means identical at the
    precision every other operator already uses). Two aggregates: one
    groupBy on the derived key (the exchange carries one row per
    distinct vector — the exact_dedup plan shape at any scale), then
    the |labels|-row rollup. Output: (label, n_vecs, n_distinct,
    n_dup_rows, max_group)."""
    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    key = F.concat_ws(
        ",",
        F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x: F.floor(x * 1000000 + F.lit(0.5)).cast("long"),
        ),
    )
    groups = (
        emb.select("label", key.alias("k"))
        .groupBy("label", "k")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return groups.groupBy("label").agg(
        F.sum("n").alias("n_vecs"),
        F.count(F.lit(1)).alias("n_distinct"),
        (F.sum("n") - F.count(F.lit(1))).alias("n_dup_rows"),
        F.max("n").alias("max_group"),
    )


ORACLE_EMBEDDING_EXACT = """
WITH k AS (
  SELECT vec_id, label,
         array_to_string(list_transform(embedding::DOUBLE[],
           x -> CAST(floor(x * 1000000 + 0.5) AS BIGINT)), ',') AS k
  FROM embeddings
),
g AS (
  SELECT label, k, count(*) AS n FROM k GROUP BY 1, 2
)
SELECT label, CAST(sum(n) AS BIGINT) AS n_vecs,
       count(*) AS n_distinct,
       CAST(sum(n) - count(*) AS BIGINT) AS n_dup_rows,
       CAST(max(n) AS BIGINT) AS max_group
FROM g GROUP BY label
""".strip()


def q_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: PageRank over the embedding near-dup pair graph
    (operators/graph.py) — which documents sit at the CENTER of
    duplication clusters (high rank = many/central near-dup
    relations; the canonical-survivor picker keeps one doc per
    component, this ranks how load-bearing each doc is). Iterative
    power method, e12 exact-integer trajectory (bit-equal to the
    local reference and partitioning-invariant in test_graph.py) —
    not SQL-expressible as one statement."""
    from monasca_aggregator_spark.operators.graph import pagerank_pairs
    from monasca_aggregator_spark.operators.similarity import (
        embedding_cosine_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pairs = embedding_cosine_pairs(emb, threshold=EMB_THRESHOLD)
    return pagerank_pairs(pairs, n_iter=8).select("id", "rank_e12")


def q_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: 2-core of the embedding near-dup graph
    (operators/graph.py kcore_pairs) — dense duplicate clusters keep
    their members, degree-1 appendages peel off. Iterative peeling
    to fixpoint (exact set semantics, pinned vs brute force in
    test_graph.py) — not SQL-expressible as one statement."""
    from monasca_aggregator_spark.operators.graph import kcore_pairs
    from monasca_aggregator_spark.operators.similarity import (
        embedding_cosine_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pairs = embedding_cosine_pairs(emb, threshold=EMB_THRESHOLD)
    return kcore_pairs(pairs, k=2)


def q_corpus_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source CONTENT-OVERLAP matrix: exact Jaccard between each
    source pair's distinct token-trigram shingle sets — 'how much of
    src3 is src7 re-crawled' is the corpus-composition question that
    decides which sources to dedup against each other first (the
    source-level rollup of the per-doc near-dup family).

    Shape that survives scale: the corpus collapses to a DISTINCT
    (source, shingle-hash) relation first (8-byte xxhash64 keys, never
    raw strings on the exchange), sizes are one groupBy over it, and
    intersections come from the shingle-keyed self-join — fan-out per
    shingle is bounded by #sources (each shingle contributes ≤
    #sources²/2 pairs), output is #sources²/2 rows. Only source pairs
    sharing ≥ 1 shingle appear (inner-join semantics, both engines).
    Jaccard 6-dp half-up on exact integer counts."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    d = (
        docs.select(
            "source",
            F.explode_outer(word_shingles(F.col("text"), 3)).alias("s"),
        )
        .filter(F.col("s").isNotNull())
        .select("source", F.xxhash64("s").alias("sh"))
        .distinct()
    ).cache()  # r11: one shingle pass feeds sizes + both join sides
    sizes = d.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a, b = d.alias("a"), d.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_shared"))
    )
    sa = sizes.select(F.col("source").alias("source_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("source_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "source_a")
        .join(F.broadcast(sb), "source_b")
        .select(
            "source_a",
            "source_b",
            "n_a",
            "n_b",
            "n_shared",
            stable_round(
                F.col("n_shared")
                / (F.col("n_a") + F.col("n_b") - F.col("n_shared")),
                6,
            ).alias("jaccard"),
        )
    )


ORACLE_SOURCE_OVERLAP = r"""
WITH toks AS (
  SELECT source, string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
), sh AS (
  SELECT source,
         unnest(list_distinct(list_transform(range(1, len(t)-1),
                                             i -> array_to_string(t[i:i+2], ' ')))) AS s
  FROM toks WHERE len(t) >= 3
), d AS (
  SELECT DISTINCT source, s FROM sh
), sizes AS (
  SELECT source, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1
), inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS n_shared
  FROM d a JOIN d b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT source_a, source_b, na.n AS n_a, nb.n AS n_b, n_shared,
       floor((n_shared / (na.n + nb.n - n_shared)) * 1000000.0::DOUBLE
             + 0.5::DOUBLE) / 1000000.0::DOUBLE AS jaccard
FROM inter
JOIN sizes na ON na.source = source_a
JOIN sizes nb ON nb.source = source_b
""".strip()


_CAL_FLOOR = 0.20  # ground-truth jaccard floor for the calibration table
_CAL_STEP = 0.05


def q_dedup_lsh_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding CALIBRATION: measured band-collision recall per
    exact-Jaccard bucket vs the closed-form S-curve 1−(1−s^r)^b for
    the configured (32 hashes, 8 bands × 4 rows) — the table that
    answers "are the banding parameters delivering the recall the
    formula promises on MY corpus?" before trusting `dedup_minhash`
    at scale. Ground truth is the exact shingle-join pairs ≥ 0.2;
    candidates are the SAME minhash operator run with threshold 0
    (verification keeps every band collision), so the measured column
    calibrates the operator as shipped. Rows-only: minhash draws ride
    xxhash64 (not SQL-reproducible); the theory column and recall
    monotonicity are pinned in tests/test_dedup.py."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    exact = D.ngram_jaccard_pairs(docs, threshold=_CAL_FLOOR)
    cand = (
        D.minhash_lsh_pairs(docs, threshold=0.0)
        .select("id_a", "id_b", F.lit(1).alias("hit"))
    )
    joined = exact.join(cand, ["id_a", "id_b"], "left")
    bucket = (
        F.floor(F.col("jaccard") / F.lit(_CAL_STEP)) * F.lit(_CAL_STEP)
    ).cast("double")
    g = joined.groupBy(bucket.alias("bucket")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_collided"),
    )
    # theory at the bucket midpoint for r=4 rows/band, b=8 bands
    mid = F.col("bucket") + F.lit(_CAL_STEP / 2)
    theory = F.lit(1.0) - F.pow(F.lit(1.0) - F.pow(mid, F.lit(4.0)), F.lit(8.0))
    return g.select(
        "bucket",
        "n_pairs",
        "n_collided",
        stable_round(
            F.col("n_collided").cast("double")
            / F.col("n_pairs").cast("double"),
            4,
        ).alias("measured_recall"),
        stable_round(theory, 4).alias("theoretical_recall"),
    )


_SWEEP_BASE = 0.30
_SWEEP_STEP_E6 = 50_000  # 0.05 buckets in e6 fixed point


def q_dedup_threshold_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup THRESHOLD CALIBRATION sweep: histogram of exact
    embedding-cosine pair similarities above a base threshold, with
    the cumulative pair count at-or-above each 0.05 bucket — the
    'how many pairs would each threshold kill' curve read before
    committing a corpus-wide dedup threshold (run once per corpus,
    next to dedup_embedding). Pairs come from the exact block-matmul
    generator at the base threshold; bucketing is exact integer math
    on the 6-dp e6 sims (floor to 50 000-e6 steps — no float-boundary
    ambiguity), and the descending cumulative runs on the ≤ ~15-row
    bucket relation (a single-partition window over a bounded
    aggregate, not over data)."""
    from monasca_aggregator_spark.operators.similarity import (
        embedding_cosine_pairs,
    )
    from pyspark.sql import Window

    pairs = embedding_cosine_pairs(
        load_table(spark, sf_dir, "embeddings", fan_out=True),
        threshold=_SWEEP_BASE,
    )
    e6 = F.floor(F.col("sim") * 1_000_000 + F.lit(0.5)).cast("long")
    g = (
        pairs.select(
            ((e6 / F.lit(_SWEEP_STEP_E6)).cast("long") * F.lit(_SWEEP_STEP_E6))
            .alias("bucket_e6")
        )
        .groupBy("bucket_e6")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    cum = Window.orderBy(F.col("bucket_e6").desc())
    return g.select(
        (F.col("bucket_e6") / F.lit(1_000_000.0)).alias("bucket"),
        "n_pairs",
        F.sum("n_pairs").over(cum).alias("n_pairs_ge"),
    )


ORACLE_THRESHOLD_SWEEP = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), p AS (
  SELECT CAST(floor(list_cosine_similarity(a.e, b.e) * 1000000.0::DOUBLE
              + 0.5::DOUBLE) AS BIGINT) AS sim_e6
  FROM v a JOIN v b ON a.vec_id < b.vec_id
  WHERE floor(list_cosine_similarity(a.e, b.e) * 1000000.0::DOUBLE
              + 0.5::DOUBLE) / 1000000.0::DOUBLE >= {_SWEEP_BASE}
), g AS (
  SELECT (sim_e6 // {_SWEEP_STEP_E6}) * {_SWEEP_STEP_E6} AS bucket_e6,
         CAST(count(*) AS BIGINT) AS n_pairs
  FROM p GROUP BY 1
)
SELECT bucket_e6 / 1000000.0::DOUBLE AS bucket, n_pairs,
       CAST(sum(n_pairs) OVER (ORDER BY bucket_e6 DESC) AS BIGINT)
         AS n_pairs_ge
FROM g
""".strip()


def q_graph_kcore_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: 2-core over the BUCKETED candidate pair graph
    (operators/similarity.ann_candidate_pairs — IVF same-cell pairs,
    Σ|cell|² work) instead of the exact O(n²) block-matmul. This is
    the 100 TB default for graph analytics on the near-dup graph; the
    exact-pairs `graph_kcore` stays as the small-scale ground truth.
    k-core is monotone under edge addition, so this core's member set
    is ⊆ the exact graph's core — pinned in tests/test_graph.py."""
    from monasca_aggregator_spark.operators.graph import kcore_pairs
    from monasca_aggregator_spark.operators.similarity import (
        ann_candidate_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pairs = ann_candidate_pairs(emb, threshold=EMB_THRESHOLD, n_cells=8)
    return kcore_pairs(pairs, k=2)


def q_graph_pagerank_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: PageRank over the bucketed candidate pair graph —
    the scale-path twin of `graph_pagerank` (same integer power
    method, input from ann_candidate_pairs instead of the exact
    O(n²) generator)."""
    from monasca_aggregator_spark.operators.graph import pagerank_pairs
    from monasca_aggregator_spark.operators.similarity import (
        ann_candidate_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pairs = ann_candidate_pairs(emb, threshold=EMB_THRESHOLD, n_cells=8)
    return pagerank_pairs(pairs, n_iter=8).select("id", "rank_e12")


_SC_MULT = 2654435761  # Knuth multiplicative hash — SQL-reproducible
_SC_MOD = 2147483647
_SC_CELLS = 8


def q_dedup_semantic_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORACLE-BACKED SemDeDup variant: same within-cell pruning as
    `dedup_semantic`, but the cells come from DETERMINISTIC hash-
    sampled centroids (multiplicative-hash priority, SQL-reproducible
    — the IVF default-init path) instead of k-means, and assignment
    rounds cosines to 6 dp before the argmax so DuckDB picks
    bit-identical cells. This puts the entire cluster→restrict→prune
    pipeline under the driver's exact hash gate; the k-means-trained
    variant stays rows-only with its pytest equivalence."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.functions.vectors import as_double
    from monasca_aggregator_spark.operators.similarity import (
        semantic_dedup_pairs,
    )

    emb = load_table(spark, sf_dir, "embeddings", fan_out=True)
    pri = F.pmod(
        F.pmod(F.col("vec_id"), F.lit(_SC_MOD)) * F.lit(_SC_MULT),
        F.lit(_SC_MOD),
    )  # two-step mod: id*MULT overflows BIGINT past ~2^32 ids
    picked = (
        emb.select(
            "vec_id", as_double(F.col("embedding")).alias("cent_vec"),
            pri.alias("pri"),
        )
        .orderBy("pri", "vec_id")
        .limit(_SC_CELLS)
        .collect()
    )
    cents = emb.sparkSession.createDataFrame(
        [(i, list(r.cent_vec)) for i, r in enumerate(picked)],
        "cent_id int, cent_vec array<double>",
    )
    return semantic_dedup_pairs(
        emb,
        threshold=EMB_THRESHOLD,
        centroids=cents,
        round_assign=True,
    )


ORACLE_SEMANTIC_CELLS = f"""
WITH v AS (
  SELECT vec_id, embedding::DOUBLE[] AS e FROM embeddings
), cents AS (
  SELECT row_number() OVER (ORDER BY pri, vec_id) - 1 AS cent_id, e
  FROM (
    SELECT vec_id, e, (vec_id % {_SC_MOD}) * {_SC_MULT} % {_SC_MOD} AS pri FROM v
  ) ORDER BY pri, vec_id LIMIT {_SC_CELLS}
), scored AS (
  SELECT v.vec_id, c.cent_id,
         floor(list_cosine_similarity(v.e, c.e) * 1000000.0::DOUBLE
               + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
  FROM v CROSS JOIN cents c
), assigned AS (
  SELECT vec_id, CAST(cell AS INT) AS cell FROM (
    SELECT vec_id, cent_id AS cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cent_id ASC) AS rk
    FROM scored
  ) WHERE rk = 1
)
SELECT a.cell, x.vec_id AS id_a, y.vec_id AS id_b,
       floor(list_cosine_similarity(x.e, y.e) * 1000000.0::DOUBLE
             + 0.5::DOUBLE) / 1000000.0::DOUBLE AS sim
FROM assigned a
JOIN assigned b ON a.cell = b.cell AND a.vec_id < b.vec_id
JOIN v x ON x.vec_id = a.vec_id
JOIN v y ON y.vec_id = b.vec_id
WHERE floor(list_cosine_similarity(x.e, y.e) * 1000000.0::DOUBLE
            + 0.5::DOUBLE) / 1000000.0::DOUBLE >= {EMB_THRESHOLD}
""".strip()


def q_dedup_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplication-rate report per source: docs, distinct normalized
    texts, duplicate rows, and the dup fraction — the governance
    number a corpus owner tracks per crawl/feed (a source whose dup
    rate jumps is re-crawling itself).  One groupBy on the xxhash64
    content key (8-byte exchange, the `exact_dedup` discipline) then
    a per-source rollup of group counts; exact-integer fraction.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    from monasca_aggregator_spark.operators.dedup import normalize_text

    groups = (
        docs.select(
            "source",
            F.xxhash64(normalize_text(F.col("text"))).alias("h"),
        )
        .groupBy("source", "h")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return groups.groupBy("source").agg(
        F.sum("n").cast("long").alias("n_docs"),
        F.count(F.lit(1)).cast("long").alias("n_unique"),
        (F.sum("n") - F.count(F.lit(1))).cast("long").alias("n_dupes"),
        (
            (F.sum("n") - F.count(F.lit(1))).cast("double")
            / F.sum("n").cast("double")
        ).alias("dup_frac"),
    )


# the oracle groups on the normalized TEXT itself (hash-free ground
# truth): identical results unless xxhash64 collides on this corpus
ORACLE_DEDUP_RATE = r"""
WITH g AS (
  SELECT source,
         trim(regexp_replace(regexp_replace(lower(text),
                                            '[^a-z0-9\s]', '', 'g'),
                             '\s+', ' ', 'g')) AS t,
         count(*) AS n
  FROM documents GROUP BY 1, 2
)
SELECT source,
       CAST(sum(n) AS BIGINT) AS n_docs,
       CAST(count(*) AS BIGINT) AS n_unique,
       CAST(sum(n) - count(*) AS BIGINT) AS n_dupes,
       CAST(sum(n) - count(*) AS DOUBLE) / CAST(sum(n) AS DOUBLE)
         AS dup_frac
FROM g GROUP BY 1
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "dedup_rate_by_source": q_dedup_rate_by_source,
    "corpus_source_overlap": q_corpus_source_overlap,
    "dedup_threshold_sweep": q_dedup_threshold_sweep,
    "dedup_lsh_calibration": q_dedup_lsh_calibration,  # rows-only
    "dedup_semantic": q_dedup_semantic,  # rows-only (cell-restricted ≈)
    "dedup_semantic_cells": q_dedup_semantic_cells,
    "graph_pagerank": q_graph_pagerank,  # rows-only (iterative power method)
    "graph_kcore": q_graph_kcore,  # rows-only (iterative peeling)
    "graph_kcore_ann": q_graph_kcore_ann,  # rows-only (bucketed candidates)
    "graph_pagerank_ann": q_graph_pagerank_ann,  # rows-only (bucketed)
    "dedup_containment": q_dedup_containment,
    "dedup_exact": q_dedup_exact,
    "dedup_spans": q_dedup_spans,
    "dedup_span_rewrite": q_dedup_span_rewrite,
    "dedup_line_rewrite": q_dedup_line_rewrite,
    "image_ahash_dedup": q_image_ahash_dedup,  # rows-only (hash-sketch)
    "image_phash_dedup": q_image_phash_dedup,
    "image_dhash_dedup": q_image_dhash_dedup,  # rows-only (hash-sketch)
    "dedup_editdistance": q_dedup_editdistance,
    "dedup_ngram_jaccard": q_dedup_ngram,
    "dedup_minhash_estimate": q_dedup_minhash_estimate,
    "dedup_simhash_estimate": q_dedup_simhash_estimate,
    "graph_pagerank_exact": q_graph_pagerank_exact,
    "dedup_embedding_exact": q_dedup_embedding_exact,
    "dedup_jaccard_prefix": q_dedup_jaccard_prefix,
    "dedup_incremental": q_dedup_incremental,
    "dedup_incremental_near": q_dedup_incremental_near,  # rows-only (LSH recall < 1)
    "dedup_minhash": q_dedup_minhash,  # rows-only (LSH recall < 1)
    "dedup_simhash": q_dedup_simhash,  # rows-only (hash-sketch specific)
    "dedup_embedding": q_dedup_embedding,
    "dedup_clusters": q_dedup_clusters,
    "dedup_canonical": q_dedup_canonical,
}

ORACLES: dict[str, str] = {
    "dedup_rate_by_source": ORACLE_DEDUP_RATE,
    "corpus_source_overlap": ORACLE_SOURCE_OVERLAP,
    "dedup_threshold_sweep": ORACLE_THRESHOLD_SWEEP,
    "dedup_semantic_cells": ORACLE_SEMANTIC_CELLS,
    "dedup_containment": ORACLE_CONTAINMENT,
    "dedup_exact": ORACLE_EXACT,
    "dedup_spans": ORACLE_SPANS,
    "dedup_span_rewrite": ORACLE_SPAN_REWRITE,
    "dedup_line_rewrite": ORACLE_LINE_REWRITE,
    "dedup_editdistance": ORACLE_EDITDISTANCE,
    "dedup_ngram_jaccard": ORACLE_NGRAM,
    "dedup_minhash_estimate": ORACLE_MINHASH_ESTIMATE,
    "dedup_simhash_estimate": ORACLE_SIMHASH_ESTIMATE,
    "graph_pagerank_exact": ORACLE_PAGERANK_EXACT,
    "dedup_embedding_exact": ORACLE_EMBEDDING_EXACT,
    "dedup_jaccard_prefix": ORACLE_NGRAM,
    "dedup_incremental": ORACLE_INCREMENTAL,
    "dedup_embedding": ORACLE_EMBEDDING,
    "dedup_clusters": ORACLE_CLUSTERS,
    "dedup_canonical": ORACLE_CANONICAL,
}
