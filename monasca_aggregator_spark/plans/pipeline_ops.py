"""Driver-facing dataset-assembly queries (operators/sampling.py) over
the documents table: per-source quota by quality, deterministic
train/val/test split, and concat-and-chunk packing. All oracle-checked
— the split query uses a plain mod bucket precisely so DuckDB can
reproduce it (hash functions don't match across engines; the operator
takes the bucket expression, so production code passes xxhash64)."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from monasca_aggregator_spark.operators.rank import global_rank
from monasca_aggregator_spark.operators.sampling import (
    dsir_importance,
    pack_concat_chunk,
    profile_columns,
    quota_per_group,
    split_assign,
    stratified_sample,
    temperature_mix,
)
from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.functions.text import tokens, word_shingles
from monasca_aggregator_spark.operators.textops import quality_scores
from monasca_aggregator_spark.operators.urlfilter import canonical_url
from monasca_aggregator_spark.plans.textops import ORACLE_QUALITY
from monasca_aggregator_spark.sources.tables import load_table

QUOTA_N = 5
PACK_BUDGET = 4000  # chars per packed chunk


def q_sample_quota_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mix quota: the QUOTA_N highest-quality docs per source
    (quality from operators.textops, ties broken by doc_id)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = quality_scores(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    return quota_per_group(
        scored,
        "source",
        [F.col("quality").desc(), F.col("doc_id").asc()],
        QUOTA_N,
    ).select("source", "rk", "doc_id", "quality")


ORACLE_QUOTA = f"""
WITH q AS ({ORACLE_QUALITY})
SELECT source, rk, doc_id, quality FROM (
  SELECT d.source, q.doc_id, q.quality,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY q.quality DESC, q.doc_id ASC) AS rk
  FROM q JOIN documents d USING (doc_id)
) WHERE rk <= {QUOTA_N}
""".strip()


def q_split_train_val(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 split summary: docs and chars per split.
    Membership is a pure function of doc_id — rerun-stable, no
    sampling state, unlike randomSplit."""
    docs = load_table(spark, sf_dir, "documents")
    assigned = split_assign(
        docs,
        F.pmod(F.col("doc_id"), F.lit(100)),
        [("train", 80), ("val", 90), ("test", 100)],
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLE_SPLIT = """
SELECT CASE WHEN doc_id % 100 < 80 THEN 'train'
            WHEN doc_id % 100 < 90 THEN 'val'
            ELSE 'test' END AS split,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
""".strip()


def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-and-chunk packing summary: per (source, chunk) document
    count and char payload at PACK_BUDGET chars per chunk."""
    docs = load_table(spark, sf_dir, "documents")
    packed = pack_concat_chunk(docs, "source", "doc_id", "n_chars", PACK_BUDGET)
    return packed.groupBy("source", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("chunk_chars"),
    )


ORACLE_PACK = f"""
WITH o AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS start_off
  FROM documents
)
SELECT source, CAST(floor(start_off / {PACK_BUDGET}) AS BIGINT) AS chunk_id,
       count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chunk_chars
FROM o GROUP BY 1, 2
""".strip()


PACK_STRIDE = 2000  # budget 4000 / stride 2000 → 2× overlapped windows


def q_pack_chunks_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window packing summary: per (source, chunk) membership
    at PACK_BUDGET-char windows starting every PACK_STRIDE chars —
    overlapping training windows (each char lands in ~budget/stride
    chunks). Closed-form integer chunk ranges exploded JVM-side; no
    range join."""
    from monasca_aggregator_spark.operators.sampling import (
        pack_sliding_chunks,
    )

    docs = load_table(spark, sf_dir, "documents")
    packed = pack_sliding_chunks(
        docs, "source", "doc_id", "n_chars", PACK_BUDGET, PACK_STRIDE
    )
    return packed.groupBy("source", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("member_chars"),
    )


ORACLE_PACK_OVERLAP = f"""
WITH o AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS s
  FROM documents
), x AS (
  SELECT source, doc_id, n_chars, s,
         -- floor division spelled out: DuckDB's // truncates toward 0
         -- on negatives, Spark's floor() does not
         unnest(range(CAST(greatest(0,
                        floor((s - {PACK_BUDGET})::DOUBLE / {PACK_STRIDE})
                        + 1) AS BIGINT),
                      CAST(ceil((s + n_chars)::DOUBLE / {PACK_STRIDE})
                           AS BIGINT)))
           AS chunk_id
  FROM o
)
SELECT source, chunk_id, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS member_chars
FROM x
WHERE chunk_id * {PACK_STRIDE} < s + n_chars
  AND chunk_id * {PACK_STRIDE} + {PACK_BUDGET} > s
GROUP BY 1, 2
""".strip()


# language-rebalancing mix: drop most English, keep low-resource langs
STRATA = {"en": 0.25, "de": 1.0, "fr": 0.75, "es": 0.5, "zh": 1.0}


def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified language rebalance summary: surviving docs/chars per
    language under per-stratum keep fractions. The keep decision is a
    row-local arithmetic predicate (deterministic bucket), so the
    filter pushes to the scan — zero extra shuffle beyond the summary
    groupBy."""
    docs = load_table(spark, sf_dir, "documents")
    kept = stratified_sample(
        docs,
        "lang",
        STRATA,
        F.pmod(F.col("doc_id") * F.lit(37) + F.lit(11), F.lit(100)),
    )
    return kept.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


_STRATA_SQL = " ".join(
    f"WHEN lang = '{k}' THEN {int(round(v * 100))}" for k, v in STRATA.items()
)

ORACLE_STRATIFIED = f"""
SELECT lang, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM documents
WHERE (doc_id * 37 + 11) % 100 <
      CASE {_STRATA_SQL} ELSE 0 END
GROUP BY lang
""".strip()


_PROFILE_COLS = ("doc_id", "text", "lang", "source", "n_chars")


def q_profile_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass profiling gate over the documents drop: per-column
    row/null/exact-distinct counts in one aggregation."""
    docs = load_table(spark, sf_dir, "documents")
    return profile_columns(docs, _PROFILE_COLS)


ORACLE_PROFILE = "\nUNION ALL\n".join(
    f"SELECT '{c}' AS column, count(*) AS n_rows,"
    f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)"
    f" AS n_null,"
    f" count(DISTINCT {c}) AS n_distinct FROM documents"
    for c in _PROFILE_COLS
)


_MIX_MOD = 1_000_000
_MIX_BUCKET_SQL = f"(doc_id * 9973 + 12345) % {_MIX_MOD}"


def q_sample_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=0.5 temperature mix targeting half the corpus: rare sources
    keep (up to) everything, dominant sources are downsampled toward
    sqrt-proportional shares. Summary per source so the result is a
    small stable aggregate. The corpus sees scan + broadcast join +
    row-local filter; only the tiny per-source count aggregate
    shuffles."""
    docs = load_table(spark, sf_dir, "documents")
    target = 0.5 * docs.count()
    kept = temperature_mix(
        docs,
        "source",
        F.pmod(
            F.col("doc_id") * F.lit(9973) + F.lit(12345), F.lit(_MIX_MOD)
        ),
        target_rows=target,
        temperature=0.5,
        bucket_mod=_MIX_MOD,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
    )


ORACLE_TEMPERATURE = f"""
WITH c AS (
  SELECT source, count(*) AS n FROM documents GROUP BY 1
), w AS (
  SELECT source, n, sqrt(n::DOUBLE) AS wgt FROM c
), r AS (
  SELECT source,
         CAST(floor(least(1.0,
             ((0.5 * (SELECT count(*) FROM documents)) * wgt
              / (SELECT sum(wgt) FROM w)) / n)
           * {float(_MIX_MOD)} + 0.5) AS BIGINT) AS thresh
  FROM w
)
SELECT d.source, count(*) AS n_docs,
       CAST(sum(d.n_chars) AS BIGINT) AS total_chars
FROM documents d JOIN r USING (source)
WHERE {_MIX_BUCKET_SQL} < r.thresh
GROUP BY 1
""".strip()


SAMPLE_K = 100
_PRIORITY_MULT = 2654435761  # Knuth multiplicative-hash constant
_PRIORITY_MOD = 2147483647


def q_sample_consistent_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent (min-wise) exact-k sample: every row gets a
    deterministic pseudo-random priority and the k smallest win — the
    sample is identical across reruns, partitionings, and cluster
    sizes, and adding new docs only ever displaces, never reshuffles,
    the survivors (the property that makes eval sets stable as the
    corpus grows). orderBy().limit(k) compiles to
    TakeOrderedAndProject: a k-row heap per partition merged on the
    driver — there is NO global sort and no single-partition shuffle.
    Priority is a multiplicative hash kept SQL-reproducible (same
    rationale as split_train_val); production would use xxhash64."""
    docs = load_table(spark, sf_dir, "documents")
    pri = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_PRIORITY_MOD)) * F.lit(_PRIORITY_MULT),
        F.lit(_PRIORITY_MOD),
    )  # two-step mod: id*MULT overflows BIGINT past ~2^32 ids
    return (
        docs.select("doc_id", "source", "lang", pri.alias("priority"))
        .orderBy("priority", "doc_id")
        .limit(SAMPLE_K)
    )


ORACLE_CONSISTENT_K = f"""
SELECT doc_id, source, lang,
       (doc_id % {_PRIORITY_MOD}) * {_PRIORITY_MULT} % {_PRIORITY_MOD} AS priority
FROM documents
ORDER BY priority, doc_id
LIMIT {SAMPLE_K}
""".strip()


GROUP_SAMPLE_K = 20


def q_sample_consistent_k_group(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Per-SOURCE consistent exact-k sample — the stratified sibling of
    ``sample_consistent_k``: every source contributes its k
    smallest-priority docs, so per-source eval panels stay stable as
    the corpus grows (new docs only displace, never reshuffle,
    survivors WITHIN their own source; other sources are untouched —
    the per-group analogue of min-wise consistency).

    Plan shape: one shuffle on source, a PARTITIONED row_number (every
    group ranks in parallel — no single-task window), filter rank ≤ k.
    Spark's rank-filter pushdown (WindowGroupLimit) pre-limits each
    partition to k rows per group before the final rank, so skewed
    sources cost their k survivors, not their row count. Priority is
    the same two-step multiplicative hash as sample_consistent_k
    (SQL-reproducible; production would use xxhash64)."""
    docs = load_table(spark, sf_dir, "documents")
    pri = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_PRIORITY_MOD)) * F.lit(_PRIORITY_MULT),
        F.lit(_PRIORITY_MOD),
    )
    w = Window.partitionBy("source").orderBy("priority", "doc_id")
    return (
        docs.select("doc_id", "source", "lang", pri.alias("priority"))
        .withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= GROUP_SAMPLE_K)
    )


ORACLE_CONSISTENT_K_GROUP = f"""
WITH p AS (
  SELECT doc_id, source, lang,
         (doc_id % {_PRIORITY_MOD}) * {_PRIORITY_MULT}
           % {_PRIORITY_MOD} AS priority
  FROM documents
),
r AS (
  SELECT *, row_number() OVER (PARTITION BY source
             ORDER BY priority, doc_id) AS sample_rank
  FROM p
)
SELECT doc_id, source, lang, priority,
       CAST(sample_rank AS INTEGER) AS sample_rank
FROM r WHERE sample_rank <= {GROUP_SAMPLE_K}
""".strip()


def q_corpus_ngram_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-LEAKAGE / coverage audit: for each held-out split (val,
    test), what fraction of its distinct token trigrams also occurs in
    the train split — high coverage on natural text is expected
    (shared common phrases), but a coverage spike after a split-policy
    change, or coverage ≈ 1.0 with long shingles, is the smoking gun
    for leaked near-duplicates across the split boundary (the
    split-level counterpart of ``text_decontaminate``'s per-doc
    benchmark containment).

    Plan shape: one corpus scan explodes per-doc DISTINCT trigrams
    tagged with the deterministic split (same doc_id%100 policy as
    ``split_train_val``), collapses to distinct (split, shingle) pairs
    (one shuffle on the shingle — the same key the dedup family
    shuffles on), then a self semi-join per eval split against the
    train shingle set. Counts are per-split aggregates; nothing wider
    than (split, shingle) ever shuffles."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    split = (
        F.when(F.pmod(F.col("doc_id"), F.lit(100)) < 80, F.lit("train"))
        .when(F.pmod(F.col("doc_id"), F.lit(100)) < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    # r11 MEASURED DEAD END (closing batch): folding the 3 consumers
    # of `sh` into ONE groupBy(s) with per-split max-of-indicator
    # membership flags (no distinct, no semi-join) looked like a
    # 3-scans→1 win on the initial plan, but measured 10-30% SLOWER
    # canary-normalized (best 1.13 vs 1.46 s interleaved at sf0.1):
    # the three distinct-subtree branches are canonically identical,
    # so AQE stage reuse already executes the explode+distinct ONCE
    # at runtime, and the fold only added three CASE evaluations per
    # exploded row on the hot path (the contamination_scores lesson:
    # the initial-plan scan census overcounts AQE-reused branches).
    sh = docs.select(
        split.alias("split"),
        F.explode(word_shingles(F.col("text"), 3)).alias("s"),
    ).distinct()
    train = sh.filter(F.col("split") == "train").select("s")
    ev = sh.filter(F.col("split") != "train")
    tot = ev.groupBy("split").agg(F.count(F.lit(1)).alias("n_shingles"))
    cov = (
        ev.join(train, "s", "left_semi")
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_covered"))
    )
    return (
        tot.join(cov, "split", "left")
        .select(
            "split",
            "n_shingles",
            F.coalesce(F.col("n_covered"), F.lit(0)).alias("n_covered"),
            stable_round(
                F.coalesce(F.col("n_covered"), F.lit(0)).cast("double")
                / F.col("n_shingles").cast("double"),
                6,
            ).alias("coverage"),
        )
    )


ORACLE_NGRAM_COVERAGE = rf"""
WITH toks AS (
  SELECT doc_id,
         CASE WHEN doc_id % 100 < 80 THEN 'train'
              WHEN doc_id % 100 < 90 THEN 'val'
              ELSE 'test' END AS split,
         string_split_regex(lower(trim(text)), '\s+') AS t
  FROM documents
),
sh AS (
  SELECT DISTINCT split, unnest(
           list_distinct(list_transform(range(1, len(t) - 1),
                                        i -> array_to_string(t[i:i+2], ' ')))
         ) AS s
  FROM toks WHERE len(t) >= 3
),
train AS (SELECT s FROM sh WHERE split = 'train'),
ev AS (SELECT * FROM sh WHERE split <> 'train'),
tot AS (SELECT split, count(*) AS n_shingles FROM ev GROUP BY 1),
cov AS (
  SELECT split, count(*) AS n_covered
  FROM ev SEMI JOIN train USING (s) GROUP BY 1
)
SELECT tot.split, tot.n_shingles,
       coalesce(cov.n_covered, 0) AS n_covered,
       {sql_stable_round(
           "coalesce(cov.n_covered, 0)::DOUBLE"
           " / tot.n_shingles::DOUBLE", 6)} AS coverage
FROM tot LEFT JOIN cov USING (split)
""".strip()


_LB_WIDTH = 16  # tokens per length bucket
_LB_CAP = 4096  # everything longer pools in the top bucket


def q_pack_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence-length bucketing — the batch-shape planning step of a
    training pipeline: bucket documents by token count (16-token-wide
    buckets, capped), and per bucket report doc count, token mass, max
    length, and the padding waste dynamic batching would pay
    (n_docs·max_tokens − total_tokens). All-integer arithmetic; one
    partial-agg shuffle over ≤ cap/width+1 groups."""
    docs = load_table(spark, sf_dir, "documents")
    tokens = F.size(F.split(F.col("text"), " "))
    staged = docs.select(
        F.least(
            F.lit(_LB_CAP // _LB_WIDTH),
            F.floor((tokens - 1) / F.lit(_LB_WIDTH)),
        ).alias("bucket_id"),
        tokens.alias("n_tokens"),
    )
    return (
        staged.groupBy("bucket_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("total_tokens"),
            F.max("n_tokens").cast("long").alias("max_tokens"),
        )
        .withColumn(
            "pad_waste",
            (F.col("n_docs") * F.col("max_tokens") - F.col("total_tokens")),
        )
    )


ORACLE_LENGTH_BUCKETS = f"""
WITH t AS (
  SELECT CAST(least({_LB_CAP // _LB_WIDTH},
                    floor((len(string_split(text, ' ')) - 1) / {_LB_WIDTH}))
              AS BIGINT) AS bucket_id,
         len(string_split(text, ' ')) AS n_tokens
  FROM documents
)
SELECT bucket_id, count(*) AS n_docs,
       CAST(sum(n_tokens) AS BIGINT) AS total_tokens,
       CAST(max(n_tokens) AS BIGINT) AS max_tokens,
       CAST(count(*) * max(n_tokens) - sum(n_tokens) AS BIGINT) AS pad_waste
FROM t
GROUP BY 1
""".strip()


_WK_K = 100
_WK_MULT = 2654435761  # Knuth multiplicative constant (shared w/ consistent_k)
_WK_MOD = 1_000_003


def q_sample_weighted_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted exact-k sample via deterministic exponential clocks
    (the distributed form of weighted sampling without replacement,
    Efraimidis-Spirakis): each doc draws a reproducible uniform from a
    multiplicative hash and gets key = −ln(u)/weight; the k smallest
    keys win, so inclusion probability tracks weight (n_chars here —
    "sample proportional to content mass"). orderBy().limit(k) compiles
    to TakeOrderedAndProject — per-partition k-row heaps, no global
    sort — and the draw is row-local, so reruns/repartitioning/growth
    leave survivors stable exactly like sample_consistent_k. Key is
    rounded to 9 decimals pre-rank for cross-engine ordering parity."""
    docs = load_table(spark, sf_dir, "documents")
    u = (
        F.pmod(
            F.pmod(F.col("doc_id"), F.lit(_WK_MOD)) * F.lit(_WK_MULT),
            F.lit(_WK_MOD),
        )
        + F.lit(1)
    ).cast("double") / F.lit(float(_WK_MOD + 1))
    key = stable_round(-F.log(u) / F.col("n_chars"), 9)
    return (
        docs.select("doc_id", "source", "n_chars", key.alias("clock"))
        .orderBy(F.col("clock").asc(), F.col("doc_id").asc())
        .limit(_WK_K)
    )


ORACLE_WEIGHTED_K = f"""
SELECT doc_id, source, n_chars,
       floor((-ln(((doc_id % {_WK_MOD}) * {_WK_MULT} % {_WK_MOD} + 1)
                  / {float(_WK_MOD + 1)}) / n_chars)
             * 1000000000.0::DOUBLE + 0.5::DOUBLE) / 1000000000.0::DOUBLE
         AS clock
FROM documents
ORDER BY clock ASC, doc_id ASC
LIMIT {_WK_K}
""".strip()


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot CDC summary: the current documents drop vs a simulated
    previous one (every 20th doc is new since then; every 7th doc's
    text was edited — both derivations are deterministic SQL so the
    oracle reproduces the 'old' snapshot bit-for-bit). One full-outer
    join on (id, md5-fingerprint) — md5 hex matches across engines —
    then a 4-row status rollup."""
    from monasca_aggregator_spark.operators.snapshot import snapshot_diff

    docs = load_table(spark, sf_dir, "documents")
    new = docs.select("doc_id", F.md5(F.col("text")).alias("fingerprint"))
    old = (
        docs.filter(F.pmod(F.col("doc_id"), F.lit(20)) != 0)
        .select(
            "doc_id",
            F.md5(
                F.when(
                    F.pmod(F.col("doc_id"), F.lit(7)) == 0,
                    F.upper(F.col("text")),
                ).otherwise(F.col("text"))
            ).alias("fingerprint"),
        )
        # docs retired since the old drop: ids shifted out of the new
        # snapshot's id space → exercise the 'removed' arm
        .unionByName(
            docs.filter(F.pmod(F.col("doc_id"), F.lit(13)) == 0).select(
                (F.col("doc_id") + F.lit(10_000_000)).alias("doc_id"),
                F.md5(F.col("text")).alias("fingerprint"),
            )
        )
    )
    return (
        snapshot_diff(old, new, id_col="doc_id", fingerprint_col="fingerprint")
        .groupBy("status")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


ORACLE_CORPUS_DIFF = """
WITH new AS (
  SELECT doc_id, md5(text) AS fp FROM documents
), old AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 7 = 0 THEN upper(text) ELSE text END) AS fp
  FROM documents WHERE doc_id % 20 <> 0
  UNION ALL
  SELECT doc_id + 10000000 AS doc_id, md5(text) AS fp
  FROM documents WHERE doc_id % 13 = 0
), d AS (
  SELECT coalesce(new.doc_id, old.doc_id) AS doc_id,
         CASE WHEN old.fp IS NULL THEN 'added'
              WHEN new.fp IS NULL THEN 'removed'
              WHEN old.fp <> new.fp THEN 'changed'
              ELSE 'unchanged' END AS status
  FROM old FULL OUTER JOIN new ON old.doc_id = new.doc_id
)
SELECT status, count(*) AS n_docs FROM d GROUP BY 1
""".strip()


_WF_BUDGET_FRAC = 0.5  # allocate half the corpus across sources


def q_sample_budget_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Water-filling budget allocation across sources: B = 50% of the
    corpus, weight = sqrt(n) (T=0.5 flattening). Unlike
    sample_temperature's independent min(1, rate) keep-rates — which
    under-spend the budget whenever a rare source saturates — the
    water level t redistributes capped sources' slack exactly, so
    Σ alloc ≈ B to rounding. The solve runs on the per-source count
    aggregate (|sources| rows); the corpus sees only the groupBy."""
    from monasca_aggregator_spark.operators.sampling import (
        waterfill_allocation,
    )

    docs = load_table(spark, sf_dir, "documents")
    budget = _WF_BUDGET_FRAC * docs.count()
    counts = docs.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    counts = counts.withColumn("wgt", F.sqrt(F.col("n").cast("double")))
    return waterfill_allocation(
        counts, budget=budget, key_cols=("source",)
    )


ORACLE_BUDGET_MIX = f"""
WITH c AS (
  SELECT source, count(*) AS n FROM documents GROUP BY 1
), b AS (
  SELECT {_WF_BUDGET_FRAC} * (SELECT count(*) FROM documents) AS budget
), o AS (
  SELECT source, n::DOUBLE AS n, sqrt(n::DOUBLE) AS w,
         n::DOUBLE / sqrt(n::DOUBLE) AS r,
         coalesce(sum(n::DOUBLE) OVER (ORDER BY n::DOUBLE / sqrt(n::DOUBLE), source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pn,
         coalesce(sum(sqrt(n::DOUBLE)) OVER (ORDER BY n::DOUBLE / sqrt(n::DOUBLE), source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS pw,
         sum(sqrt(n::DOUBLE)) OVER () AS tw,
         row_number() OVER (ORDER BY n::DOUBLE / sqrt(n::DOUBLE), source) AS i
  FROM c
), t AS (
  SELECT o.*, ((SELECT budget FROM b) - pn) / (tw - pw) AS ti FROM o
), lvl AS (
  SELECT min_by(ti, i) AS t FROM t WHERE ti < r
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       CAST(CASE WHEN (SELECT t FROM lvl) IS NULL
                   OR r <= (SELECT t FROM lvl) THEN n
            ELSE least(n, floor((SELECT t FROM lvl) * w + 0.5)) END
            AS BIGINT) AS alloc_docs,
       ((SELECT t FROM lvl) IS NULL OR r <= (SELECT t FROM lvl)) AS capped
FROM t
""".strip()


_TOP_P = 0.5  # keep the best docs until half each source's char mass


def q_sample_top_p_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source top-p (nucleus) filtering by MASS: walk each source's
    docs best-quality-first and keep them until the kept char mass
    reaches p of the source total — "keep the best half of every
    source by volume". Complements quota (top-n by COUNT) and
    water-filling (global budget): here the budget is per-source and
    denominated in chars, so verbose-but-mediocre docs can't crowd out
    short good ones. A doc is admitted iff the mass BEFORE it is under
    budget (the first crossing doc is included, nucleus-style). One
    window per source ordered by (quality desc, doc_id); summary
    output. Char masses are integers; the only float is the p·total
    threshold, identical in both engines."""
    from monasca_aggregator_spark.operators.sampling import top_p_by_mass

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = quality_scores(docs).join(
        docs.select("doc_id", "source", "n_chars"), "doc_id"
    )
    kept = top_p_by_mass(
        scored,
        "source",
        [F.col("quality").desc(), F.col("doc_id").asc()],
        "n_chars",
        _TOP_P,
    )
    return kept.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("long").alias("kept_chars"),
    )


ORACLE_TOP_P = f"""
WITH q AS ({ORACLE_QUALITY}),
j AS (
  SELECT q.doc_id, q.quality, d.source, d.n_chars FROM q
  JOIN documents d USING (doc_id)
), m AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (PARTITION BY source
                  ORDER BY quality DESC, doc_id ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS before_mass,
         sum(n_chars) OVER (PARTITION BY source) AS total_mass
  FROM j
)
SELECT source, count(*) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS kept_chars
FROM m
WHERE before_mass < {_TOP_P} * total_mass
GROUP BY 1
""".strip()


def q_order_curriculum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum training order: quality-descending, round-robin
    interleaved across sources (position 1..S are every source's best
    doc, then every source's 2nd best, …) so no training stretch is
    dominated by one source — the ordering step between mixing and
    packing in a training-data pipeline.

    Scale shape: the per-source rank is an ordinary partitioned window
    (parallel across sources); the GLOBAL position comes from
    operators/rank.global_rank — range-bucketed local rank + broadcast
    prefix offsets — not `row_number() OVER (ORDER BY …)`, which would
    funnel the corpus through one task. Bucket key = the per-source
    rank itself (monotone leading sort key, ≤ max-docs-per-source
    buckets, uniformly sized by construction)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = quality_scores(docs).join(
        docs.select("doc_id", "source"), "doc_id"
    )
    w = Window.partitionBy("source").orderBy(
        F.col("quality").desc(), F.col("doc_id").asc()
    )
    rked = scored.select("doc_id", "source", "quality").withColumn(
        "rk", F.row_number().over(w)
    # r11 (guide §2.4): global_rank reads its input twice (rank
    # branch + bucket histogram) — cache the per-doc ranked relation
    # so the quality scan + source join run once, not per branch.
    ).cache()
    out = global_rank(
        rked,
        F.col("rk"),
        [F.col("rk").asc(), F.col("quality").desc(), F.col("doc_id").asc()],
        rank_col="position",
    )
    return out.select("position", "doc_id", "source", "rk", "quality")


ORACLE_CURRICULUM = f"""
WITH q AS ({ORACLE_QUALITY}), j AS (
  SELECT q.doc_id, d.source, q.quality,
         row_number() OVER (PARTITION BY d.source
                            ORDER BY q.quality DESC, q.doc_id ASC) AS rk
  FROM q JOIN documents d USING (doc_id)
)
SELECT row_number() OVER (ORDER BY rk ASC, quality DESC, doc_id ASC)
         AS position,
       doc_id, source, rk, quality
FROM j
""".strip()


_EPOCH_CAP_E6 = 4_000_000  # repeat a low-resource group ≤ 4 epochs


def q_sample_epoch_repeat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-epoch repeat upsampling of low-resource languages:
    group g trains for sqrt(max_n / n_g) epochs (capped at 4) — the
    standard smoothed rebalance that repeats scarce data instead of
    discarding abundant data. Fractional final epochs take a
    deterministic row-local subset (same mod-bucket as the
    stratified/temperature samplers), so reruns pick identical rows.

    Scale shape: per-group epoch rates come from a tiny groupBy
    aggregate (|langs| rows, broadcast back); each corpus row then
    explodes into its integer copy count JVM-side — scan + broadcast
    join + explode, no corpus-keyed shuffle except the final summary.
    Cross-engine determinism: epochs_e6 is floor(sqrt-of-exact-double
    ratio × 1e6) — sqrt and division are IEEE correctly-rounded, so
    both engines compute the identical bit pattern; everything after
    is integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    # r11 (guide §2.4): the |langs|-row count table feeds the max
    # AND the rate projection — uncached, the corpus scan re-executed
    # per consumer (3 FileScans → 2: rollup once, explode probe once).
    counts = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n")
    ).cache()
    max_n = counts.agg(F.max("n").alias("mx"))
    rates = (
        counts.crossJoin(F.broadcast(max_n))
        .select(
            "lang",
            F.least(
                F.lit(_EPOCH_CAP_E6).cast("long"),
                F.floor(
                    F.sqrt(
                        F.col("mx").cast("double") / F.col("n").cast("double")
                    )
                    * F.lit(1000000.0)
                ),
            ).alias("epochs_e6"),
        )
        .withColumn("n_full", F.expr("epochs_e6 div 1000000"))
        .withColumn("frac_e6", F.col("epochs_e6") % F.lit(1000000))
    )
    bucket = F.pmod(
        F.col("doc_id") * F.lit(9973) + F.lit(12345), F.lit(_MIX_MOD)
    )
    exploded = (
        docs.join(F.broadcast(rates), "lang")
        .withColumn(
            "n_copies",
            F.col("n_full")
            + F.when(bucket < F.col("frac_e6"), F.lit(1)).otherwise(F.lit(0)),
        )
        .withColumn(
            "epoch", F.explode(F.sequence(F.lit(0), F.col("n_copies") - 1))
        )
    )
    return exploded.groupBy("lang").agg(
        F.countDistinct("doc_id").alias("n_docs"),
        F.count(F.lit(1)).alias("n_virtual"),
        F.max("epochs_e6").alias("epochs_e6"),
        F.sum("n_chars").alias("virtual_chars"),
    )


ORACLE_EPOCH_REPEAT = f"""
WITH c AS (
  SELECT lang, count(*) AS n FROM documents GROUP BY 1
), m AS (
  SELECT max(n) AS mx FROM c
), r AS (
  SELECT lang,
         least({_EPOCH_CAP_E6},
               CAST(floor(sqrt(CAST(mx AS DOUBLE) / CAST(n AS DOUBLE))
                          * 1000000.0::DOUBLE) AS BIGINT)) AS epochs_e6
  FROM c, m
), x AS (
  SELECT d.doc_id, d.lang, d.n_chars, r.epochs_e6,
         (r.epochs_e6 // 1000000)
         + CASE WHEN {_MIX_BUCKET_SQL} < r.epochs_e6 % 1000000
                THEN 1 ELSE 0 END AS n_copies
  FROM documents d JOIN r USING (lang)
), e AS (
  SELECT doc_id, lang, n_chars, epochs_e6,
         unnest(range(0, n_copies)) AS epoch
  FROM x
)
SELECT lang, count(DISTINCT doc_id) AS n_docs, count(*) AS n_virtual,
       max(epochs_e6) AS epochs_e6,
       CAST(sum(n_chars) AS BIGINT) AS virtual_chars
FROM e GROUP BY 1
""".strip()


_SHUF_SALT = 7919  # reshuffle epoch = change the salt


def q_order_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global TRAINING SHUFFLE: every doc gets a
    pseudo-random priority (multiplicative hash of doc_id ⊕ salt —
    SQL-reproducible like sample_consistent_k; production swaps in
    xxhash64) and its global position in that order. Rerun-stable,
    resumable mid-epoch (position is a pure function of the corpus),
    and a new epoch is just a new salt — the standard way to shuffle
    a corpus you cannot materialize twice. The global position uses
    operators/rank.global_rank (bucketed prefix offsets), so there is
    NO single-task global sort; the bucket key coarsens the priority
    itself (monotone, ~uniform by construction)."""
    docs = load_table(spark, sf_dir, "documents")
    pri = F.pmod(
        F.pmod(F.col("doc_id") + F.lit(_SHUF_SALT), F.lit(_PRIORITY_MOD))
        * F.lit(_PRIORITY_MULT),
        F.lit(_PRIORITY_MOD),
    )
    staged = docs.select("doc_id", "source", pri.alias("priority"))
    out = global_rank(
        staged,
        F.expr(f"priority div {_PRIORITY_MOD // 64 + 1}"),
        [F.col("priority").asc(), F.col("doc_id").asc()],
        rank_col="position",
    )
    return out.select("position", "doc_id", "source", "priority")


ORACLE_SHUFFLE = f"""
SELECT row_number() OVER (ORDER BY priority, doc_id) AS position,
       doc_id, source, priority
FROM (
  SELECT doc_id, source,
         ((doc_id + {_SHUF_SALT}) % {_PRIORITY_MOD})
           * {_PRIORITY_MULT} % {_PRIORITY_MOD}
           AS priority
  FROM documents
)
""".strip()


_FFD_BUDGET = 2000


def q_pack_bins_ffd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: whole-document BIN PACKING via first-fit-decreasing
    (operators/sampling.pack_first_fit_decreasing) — no document
    splits across bins (nothing truncated), padding bounded by FFD's
    11/9·OPT+1 guarantee. Sequential per-group fold → applyInPandas →
    not SQL-expressible; invariants pinned in test_sampling.py.
    Output: per-source bin count, fill rate, and padding waste —
    the numbers a training-batch planner reads."""
    from monasca_aggregator_spark.operators.sampling import (
        pack_first_fit_decreasing,
    )

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    packed = pack_first_fit_decreasing(
        docs, "source", "doc_id", "n_chars", _FFD_BUDGET
    )
    per_bin = packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("fill"),
    )
    return per_bin.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_bins"),
        F.sum("n_docs").alias("n_docs"),
        F.sum("fill").alias("total_chars"),
        stable_round(
            F.sum("fill").cast("double")
            / (F.count(F.lit(1)) * F.lit(float(_FFD_BUDGET))),
            4,
        ).alias("fill_rate"),
        (F.count(F.lit(1)) * F.lit(_FFD_BUDGET) - F.sum("fill")).alias(
            "padding_waste"
        ),
    )


def q_pipeline_curate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rows-only: the composed end-to-end curation pipeline
    (curation.curate_corpus — exact dedup → MinHash near-dedup →
    benchmark decontamination → top-p quality → DSIR target filter →
    stratified rebalance → split → pack) over the documents drop,
    returning the per-stage lineage manifest. Not SQL-expressible as
    one statement (MinHash + iterative components inside);
    stage-count/monotonicity invariants are pinned in
    test_curation.py. The benchmark slice is the deterministic
    doc_id % 20 == 0 stand-in text_decontaminate uses."""
    from monasca_aggregator_spark.curation import curate_corpus

    docs = load_table(spark, sf_dir, "documents")
    _, manifest = curate_corpus(
        spark,
        docs.filter(F.col("doc_id") % 20 != 0),
        None,
        benchmark=docs.filter(F.col("doc_id") % 20 == 0),
        dsir_target=F.col("lang") == "en",
        dsir_keep_frac=0.9,
        strata={"en": 0.5},
        top_p=0.8,
    )
    return manifest


def q_skyline_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto-frontier document selection: maximize lexical diversity
    (distinct tokens) while minimizing token cost — the two-phase
    distributed skyline (operators/skyline.py). A doc survives iff no
    other doc is at-least-as-diverse AND at-most-as-long with one
    strict. All-integer dims keep the oracle hash exact."""
    from monasca_aggregator_spark.functions.text import tokens
    from monasca_aggregator_spark.operators.skyline import skyline

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = tokens(F.col("text"))
    # r11 (guide §2.4): the two-phase skyline consumes its input
    # multiple times (local frontier + cross-filter) — cache the thin
    # 3-integer-column projection so the corpus tokenize runs once,
    # not per phase (3 FileScans → 1).
    stats = docs.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(toks)).cast("long").alias("n_distinct"),
    ).cache()
    return skyline(stats, [("n_distinct", "max"), ("n_tokens", "min")])


ORACLE_SKYLINE = r"""
WITH s AS (
  SELECT doc_id,
         len(string_split_regex(lower(trim(text)), '\s+')) AS n_tokens,
         len(list_distinct(string_split_regex(lower(trim(text)), '\s+'))) AS n_distinct
  FROM documents
)
SELECT a.doc_id, a.n_tokens, a.n_distinct
FROM s a
WHERE NOT EXISTS (
  SELECT 1 FROM s b
  WHERE b.n_distinct >= a.n_distinct AND b.n_tokens <= a.n_tokens
    AND (b.n_distinct > a.n_distinct OR b.n_tokens < a.n_tokens)
)
""".strip()


def q_curation_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade attribution: every doc is assigned the FIRST
    quality gate it fails (or 'kept'), and the report counts docs and
    char mass per reason — the rejection-accounting readout a curation
    run ships so 'we dropped 40% of src7' is explainable. One scan,
    one small groupBy; every gate is integer arithmetic (cross-
    multiplied ratios) so the oracle hash is exact."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    from monasca_aggregator_spark.functions.text import STOPWORDS, tokens

    toks = tokens(F.col("text"))
    n_tok = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    n_punct = F.length(
        F.regexp_replace(F.col("text"), r"[a-zA-Z0-9\s]", "")
    )
    reason = (
        F.when(n_tok < 10, F.lit("too_short"))
        .when(n_punct * 5 > F.col("n_chars"), F.lit("high_punct"))
        .when(n_stop * 20 < n_tok, F.lit("low_stopword"))
        .otherwise(F.lit("kept"))
    )
    return (
        docs.select(reason.alias("reason"), F.col("n_chars"))
        .groupBy("reason")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


ORACLE_CURATION_FUNNEL = r"""
WITH t AS (
  SELECT n_chars,
         string_split_regex(lower(trim(text)), '\s+') AS toks,
         length(regexp_replace(text, '[a-zA-Z0-9\s]', '', 'g')) AS n_punct
  FROM documents
), r AS (
  SELECT n_chars,
         CASE
           WHEN len(toks) < 10 THEN 'too_short'
           WHEN n_punct * 5 > n_chars THEN 'high_punct'
           WHEN len(list_filter(toks, x -> list_contains(
                ['the','a','an','and','or','of','to','in','is','it',
                 'for','on','with','as','this','that','at','by','from'], x))) * 20
                < len(toks) THEN 'low_stopword'
           ELSE 'kept'
         END AS reason
  FROM t
)
SELECT reason, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM r GROUP BY reason
""".strip()


CHUNK_BUDGET = 40  # tokens per retrieval chunk


def q_chunk_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sentence-aligned retrieval chunking (the RAG ingestion shape):
    docs split into sentence-ish units (period boundaries), each unit
    assigned to chunk ⌊cumulative-tokens-before / budget⌋ — so chunks
    respect unit boundaries, fill to ~budget tokens, and the
    assignment is a pure prefix-sum window per doc (posexplode +
    cumulative sum), NOT a sequential fold: one doc-keyed window pass,
    no UDF, and the whole corpus chunks in a single shuffle. Output is
    the per-chunk manifest (doc, chunk, units, tokens)."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    units = docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col("text"), r"\."),
                    lambda s: F.trim(s),
                ),
                lambda s: s != "",
            )
        ).alias("unit_idx", "unit"),
    ).withColumn(
        "n_tokens", F.size(F.split(F.col("unit"), r"\s+"))
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("unit_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    assigned = units.withColumn(
        "chunk_id",
        F.floor(
            F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
            / F.lit(CHUNK_BUDGET)
        ).cast("long"),
    )
    return assigned.groupBy("doc_id", "chunk_id").agg(
        F.count(F.lit(1)).alias("n_units"),
        F.sum("n_tokens").alias("chunk_tokens"),
    )


ORACLE_CHUNK_SENTENCES = rf"""
WITH units AS (
  SELECT doc_id, i - 1 AS unit_idx, u[i] AS unit
  FROM (
    SELECT doc_id,
           list_filter(list_transform(string_split(text, '.'),
                                      s -> trim(s)), s -> s != '') AS u
    FROM documents
  ), unnest(range(1, len(u) + 1)) AS t(i)
), toks AS (
  SELECT doc_id, unit_idx,
         len(string_split_regex(unit, '\s+')) AS n_tokens
  FROM units
), assigned AS (
  SELECT doc_id, unit_idx, n_tokens,
         CAST(floor(coalesce(sum(n_tokens) OVER (
                PARTITION BY doc_id ORDER BY unit_idx
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              / {CHUNK_BUDGET}) AS BIGINT) AS chunk_id
  FROM toks
)
SELECT doc_id, chunk_id,
       CAST(count(*) AS BIGINT) AS n_units,
       CAST(sum(n_tokens) AS BIGINT) AS chunk_tokens
FROM assigned GROUP BY 1, 2
""".strip()


def q_split_group_aware(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/val/test split: the split key is the SOURCE
    (all of a source's docs land in one split), not the row — the
    grouping discipline that keeps near-duplicate documents from the
    same crawl on both sides of an eval boundary. Same stateless
    deterministic bucket expression as `split_train_val`
    (a cross-engine rolling hash mod 100 on the GROUP key — the same
    polynomial fold as `text_fingerprint`, reproducible in the SQL
    oracle), so the assignment is row-local and rerun-stable; the
    report proves the invariant (each source in exactly one split)."""
    from monasca_aggregator_spark.functions.text import (
        rolling_fingerprint,
    )

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    bucket = F.pmod(rolling_fingerprint(F.col("source")), F.lit(100))
    split = (
        F.when(bucket < 80, F.lit("train"))
        .when(bucket < 90, F.lit("val"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(split.alias("split"), "source", "n_chars")
        .groupBy("split")
        .agg(
            F.countDistinct("source").alias("n_sources"),
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").alias("total_chars"),
        )
    )


ORACLE_SPLIT_GROUP = r"""
WITH fp AS (
  SELECT source, n_chars,
         list_reduce(
           list_prepend(CAST(0 AS BIGINT),
             list_transform(string_split_regex(lower(trim(source)), '\s+'),
               tok -> list_reduce(
                 list_prepend(CAST(7 AS BIGINT),
                   list_transform(string_split(tok, ''),
                                  ch -> CAST(ascii(ch) AS BIGINT))),
                 (acc, x) -> (acc * 31 + x) % 2147483647))),
           (acc, x) -> (acc * 31 + x) % 2147483647) % 100 AS b
  FROM documents
), s AS (
  SELECT CASE WHEN b < 80 THEN 'train'
              WHEN b < 90 THEN 'val' ELSE 'test' END AS split,
         source, n_chars
  FROM fp
)
SELECT split, CAST(count(DISTINCT source) AS BIGINT) AS n_sources,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars
FROM s GROUP BY split
""".strip()


# -------------------- DSIR-style importance resampling toward a target


_DSIR_BUCKETS = 256  # hashed unigram feature space (md5 first byte)
_DSIR_TARGET_LANG = "en"  # the distribution the mix is steered toward
_DSIR_K = 100


def q_sample_importance_dsir(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.
    2023): rank raw-corpus docs by how target-like their hashed
    n-gram distribution is — log p_target(x)/p_raw(x) under unigram
    bucket models — and keep the top-K. The quality-filter family's
    distribution-matching member: ``sample_top_p_source`` keeps "best
    by score", this keeps "most like the data you actually want"
    (here: the English slice stands in for the curated target).

    Feature hashing is md5-first-byte → 256 buckets (SQL-reproducible
    in both engines, production swaps xxhash64); both bucket models
    get add-1 smoothing. Exactness: each bucket's log-ratio is ONE
    ln of ONE division of exact DECIMAL(38,0) cross-products
    ((t_b+1)·(R+B)) / ((r_b+1)·(T+B)), e6-fixed immediately, so the
    per-doc score is an order-free INTEGER sum; one final division
    normalizes per token.

    Scale: bucket models are 256-row aggregates (broadcast); the doc
    score is a map-side join + partial sum keyed by doc — no shuffle
    wider than (doc, bucket); top-K is TakeOrdered, no global sort.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    scored = dsir_importance(docs, F.col("lang") == _DSIR_TARGET_LANG)
    meta = docs.select("doc_id", "lang", "source")
    return (
        scored.join(meta, "doc_id")
        .select("doc_id", "lang", "source", "n_tokens", "importance")
        .orderBy(F.col("importance").desc(), F.col("doc_id"))
        .limit(_DSIR_K)
    )


ORACLE_DSIR = rf"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(string_split_regex(lower(trim(text)), '\s+')) AS token
  FROM documents
),
tb AS (
  SELECT doc_id, lang,
         CAST('0x' || substr(md5(token), 1, 2) AS INTEGER) AS b
  FROM toks
),
raw AS (SELECT b, count(*) AS r FROM tb GROUP BY b),
tgt AS (
  SELECT b, count(*) AS t FROM tb
  WHERE lang = '{_DSIR_TARGET_LANG}' GROUP BY b
),
tots AS (
  SELECT (SELECT sum(r) FROM raw) AS big_r,
         (SELECT coalesce(sum(t), 0) FROM tgt) AS big_t
),
model AS (
  SELECT raw.b,
         CAST(floor(ln(
           CAST((coalesce(tgt.t, 0) + 1)::HUGEINT
                * (tots.big_r + {_DSIR_BUCKETS})::HUGEINT AS DOUBLE)
           / CAST((raw.r + 1)::HUGEINT
                  * (tots.big_t + {_DSIR_BUCKETS})::HUGEINT AS DOUBLE)
         ) * 1e6 + 0.5) AS BIGINT) AS lr6
  FROM raw LEFT JOIN tgt USING (b) CROSS JOIN tots
),
scored AS (
  SELECT tb.doc_id, count(*) AS n_tokens, sum(model.lr6) AS s6
  FROM tb JOIN model USING (b) GROUP BY tb.doc_id
)
SELECT d.doc_id, d.lang, d.source,
       CAST(s.n_tokens AS BIGINT) AS n_tokens,
       {sql_stable_round(
           "CAST(s.s6 AS DOUBLE) / CAST(s.n_tokens AS DOUBLE) / 1e6", 6
       )} AS importance
FROM scored s JOIN documents d USING (doc_id)
ORDER BY importance DESC, d.doc_id
LIMIT {_DSIR_K}
""".strip()


def q_pack_chunk_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk → document SPAN MAP for concat-and-chunk packing — the
    artifact a packed-training dataloader actually consumes: for every
    (source, chunk) and every document overlapping it, the in-chunk
    byte span [span_start, span_start+span_len). This is what builds
    the block-diagonal attention mask / per-token loss mask when
    documents straddle chunk boundaries (`pack_chunks` reports only
    the start-chunk assignment; training needs the straddle spans).

    Closed-form integer arithmetic end to end: running start offsets
    per source (the pack_concat_chunk window), each doc explodes into
    exactly the chunks it overlaps via sequence(first, last) — the
    pack_sliding_chunks explode idiom, O(docs + straddles) rows, no
    range join. Window partitions by source (the documented packing
    posture), never global."""
    docs = load_table(spark, sf_dir, "documents")
    w = (
        Window.partitionBy("source")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    b = F.lit(PACK_BUDGET)
    s = F.coalesce(F.sum("n_chars").over(w), F.lit(0))
    with_off = docs.select(
        "source", "doc_id", "n_chars", s.alias("s")
    ).filter(F.col("n_chars") > 0)
    # integer floor division (`div`), NOT double `/` + floor: s is an
    # exact BIGINT running offset, and past ~2^53 total chars per
    # source a double quotient can misassign a straddle chunk
    # (ADVICE r7); DuckDB mirrors with `//`
    first_c = F.expr(f"s div {PACK_BUDGET}")
    last_c = F.expr(f"(s + n_chars - 1) div {PACK_BUDGET}")
    ex = with_off.select(
        "source",
        "doc_id",
        "n_chars",
        "s",
        F.explode(F.sequence(first_c, last_c)).alias("chunk_id"),
    )
    seg_start = F.greatest(F.col("s"), F.col("chunk_id") * b)
    seg_end = F.least(
        F.col("s") + F.col("n_chars"), (F.col("chunk_id") + 1) * b
    )
    return ex.select(
        "source",
        "chunk_id",
        "doc_id",
        (seg_start - F.col("chunk_id") * b).alias("span_start"),
        (seg_end - seg_start).alias("span_len"),
    )


ORACLE_PACK_SPANS = f"""
WITH o AS (
  SELECT source, doc_id, n_chars,
         coalesce(sum(n_chars) OVER (PARTITION BY source ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS s
  FROM documents
  WHERE n_chars > 0
), x AS (
  SELECT source, doc_id, n_chars, s,
         unnest(range(CAST(s // {PACK_BUDGET} AS BIGINT),
                      CAST((s + n_chars - 1) // {PACK_BUDGET} AS BIGINT)
                        + 1))
           AS chunk_id
  FROM o
)
SELECT source, chunk_id, doc_id,
       CAST(greatest(s, chunk_id * {PACK_BUDGET})
            - chunk_id * {PACK_BUDGET} AS BIGINT) AS span_start,
       CAST(least(s + n_chars, (chunk_id + 1) * {PACK_BUDGET})
            - greatest(s, chunk_id * {PACK_BUDGET}) AS BIGINT)
         AS span_len
FROM x
""".strip()


# ---------------------------------------------- URL/domain filtering

# deterministic URL synthesis: domain by doc_id % 8 (same expression
# both engines), so the PARSE + policy rules are what's under test —
# the entry gate every web corpus runs before content ever loads
# (CCNet/fineweb line: blocklists, TLD policy, per-domain caps).
_URL_DOMAINS = [
    "news.example.com",
    "blog.example.org",
    "docs.example.net",
    "forum.example.io",
    "tracker-ads.example",
    "spam-mirror.example",
    "freebies.xyz",
    "wiki.example.edu",
]
_URL_BLOCKLIST = ["tracker-ads.example", "spam-mirror.example"]
_URL_CAP = 40  # max docs kept per domain (crawl-balance cap)
# mirrors operators/urlfilter.HOST_RE (no trailing-slash requirement —
# ADVICE r7; case-insensitive scheme — VERDICT r8): same
# RE2-compatible pattern on both engines; `(?i)` is identity on the
# lowercase-scheme synthesized url_filter corpus, so that oracle's
# hashes stay untouched
_HOST_RE = r"(?i)https?://([^/?#]+)"


def q_curation_url_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL/domain curation gate — the stage that runs BEFORE the HTML
    extractor in a real web pipeline: parse the host out of each
    document's URL, then apply (in precedence order) the domain
    BLOCKLIST (broadcast set membership), a TLD policy (.xyz here),
    and a per-domain CAP (keep the first _URL_CAP docs by doc_id —
    the crawl-balance rule that stops one hot domain from dominating
    the corpus). URLs are synthesized deterministically (domain =
    doc_id % 8) so the parse + policy arithmetic is what the oracle
    pins.

    Output: per-domain accounting (docs, per-reason drops, kept) —
    bounded at the domain count.

    Scale: blocklist/TLD are row-local; the cap is a rank inside each
    domain (window PARTITIONED by host — never global), exactly the
    per-group-limit shape WindowGroupLimit pushes down; a skewed
    mega-domain is the documented salt-then-cap case (docs/SCALING.md
    skew section)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    dom = F.element_at(
        F.array(*[F.lit(d) for d in _URL_DOMAINS]),
        (F.col("doc_id") % 8 + 1).cast("int"),
    )
    url = F.concat(
        F.lit("https://"), dom, F.lit("/"), F.col("source"),
        F.lit("/doc/"), F.col("doc_id"),
    )
    parsed = docs.select(  # case-folded host: DNS is case-insensitive
        "doc_id",
        F.lower(F.regexp_extract(url, _HOST_RE, 1)).alias("host"),
    )
    rn = F.row_number().over(
        Window.partitionBy("host").orderBy(F.col("doc_id"))
    )
    reason = (
        F.when(
            F.col("host").isin(*_URL_BLOCKLIST), F.lit("blocklist")
        )
        .when(F.col("host").endswith(".xyz"), F.lit("bad_tld"))
        .when(F.col("rn") > _URL_CAP, F.lit("over_cap"))
        .otherwise(F.lit("kept"))
    )
    return (
        parsed.withColumn("rn", rn)
        .withColumn("reason", reason)
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.sum((F.col("reason") == "blocklist").cast("long")).alias(
                "n_blocklist"
            ),
            F.sum((F.col("reason") == "bad_tld").cast("long")).alias(
                "n_bad_tld"
            ),
            F.sum((F.col("reason") == "over_cap").cast("long")).alias(
                "n_over_cap"
            ),
            F.sum((F.col("reason") == "kept").cast("long")).alias(
                "n_kept"
            ),
        )
    )


_URL_DOMAINS_SQL = "[" + ", ".join(f"'{d}'" for d in _URL_DOMAINS) + "]"
_URL_BLOCK_SQL = "[" + ", ".join(f"'{d}'" for d in _URL_BLOCKLIST) + "]"

ORACLE_URL_FILTER = f"""
WITH u AS (
  SELECT doc_id,
         lower(regexp_extract(
           'https://' || {_URL_DOMAINS_SQL}[CAST(doc_id % 8 AS INT) + 1]
             || '/' || source || '/doc/' || doc_id,
           '{_HOST_RE}', 1)) AS host
  FROM documents
), ranked AS (
  SELECT doc_id, host,
         row_number() OVER (PARTITION BY host ORDER BY doc_id) AS rn
  FROM u
), r AS (
  SELECT host,
         CASE
           WHEN list_contains({_URL_BLOCK_SQL}, host) THEN 'blocklist'
           WHEN host LIKE '%.xyz' THEN 'bad_tld'
           WHEN rn > {_URL_CAP} THEN 'over_cap'
           ELSE 'kept'
         END AS reason
  FROM ranked
)
SELECT host, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(CASE WHEN reason = 'blocklist' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_blocklist,
       CAST(sum(CASE WHEN reason = 'bad_tld' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_bad_tld,
       CAST(sum(CASE WHEN reason = 'over_cap' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_over_cap,
       CAST(sum(CASE WHEN reason = 'kept' THEN 1 ELSE 0 END) AS BIGINT)
         AS n_kept
FROM r GROUP BY host
""".strip()


# ------------------------------------------ canonical-URL dedup stage


def q_dedup_url_canonical(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """URL-level dedup accounting (the CCNet/fineweb stage BEFORE
    `curation_url_filter`'s policy gates): crawl records of the same
    page under cosmetic URL variation — scheme, host case, a leading
    ``www.``, trailing slashes, tracking query strings, fragments —
    collapse to one canonical key (operators/urlfilter.canonical_url,
    deliberately query-insensitive), and the per-domain report says
    how much of each domain's crawl volume is URL-duplicated before
    any content loads.

    URLs are synthesized deterministically (4 cosmetic variants per
    page, page = doc_id div 4, domain = page % 8) so the
    CANONICALIZATION arithmetic is what the oracle pins — every
    4-variant group must collapse to exactly one key. The variants
    exercise every normalization rule: uppercase SCHEME + host
    (VERDICT r8: the case-sensitive regex collapsed all of these to
    the '' key), userinfo + default :443 port + www. + trailing
    slash, and query/fragment stripping; every 89th doc carries a
    GARBLED (schemeless) URL, which must keep its raw string as its
    own key — never merge (the `garbled:` host group pins
    n_dup_docs = 0).

    Scale: synthesis + canonicalization are row-local JVM regex (zero
    shuffle); the per-(host, canonical) collapse is one hash
    aggregation with map-side partials keyed by the canonical string,
    and the report is domain-sized. The real-corpus composition is
    ``exact_dedup`` keyed on canonical_url(url) instead of the text
    hash.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True).select(
        "doc_id"
    )
    g = F.expr("doc_id div 4")
    dom = F.element_at(
        F.array(*[F.lit(d) for d in _URL_DOMAINS]),
        (g % 8 + 1).cast("int"),
    )
    variant = (F.col("doc_id") % 4).cast("int")
    url = (
        F.when(
            F.col("doc_id") % 89 == 0,
            F.concat(F.lit("garbled://x/"), F.col("doc_id")),
        )
        .when(
            variant == 1,
            F.concat(
                F.lit("HTTPS://"), F.upper(dom), F.lit("/p/"), g,
                F.lit("?utm_source=feed"),
            ),
        )
        .when(
            variant == 2,
            F.concat(
                F.lit("https://user@www."), dom, F.lit(":443/p/"), g,
                F.lit("/"),
            ),
        )
        .when(
            variant == 3,
            F.concat(
                F.lit("http://"), dom, F.lit("/p/"), g,
                F.lit("/?gclid=1#f"),
            ),
        )
        .otherwise(F.concat(F.lit("https://"), dom, F.lit("/p/"), g))
    )
    canon = docs.select(canonical_url(url).alias("c"))
    return (
        canon.withColumn("host", F.substring_index(F.col("c"), "/", 1))
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.countDistinct("c").alias("n_canonical"),
        )
        .select(
            "host",
            "n_docs",
            "n_canonical",
            (F.col("n_docs") - F.col("n_canonical")).alias(
                "n_dup_docs"
            ),
            stable_round(
                (F.col("n_docs") - F.col("n_canonical")).cast("double")
                / F.col("n_docs").cast("double"),
                6,
            ).alias("dup_rate"),
        )
    )


ORACLE_URL_CANONICAL = f"""
WITH u AS (
  SELECT doc_id, (doc_id // 4) AS g,
         {_URL_DOMAINS_SQL}[CAST((doc_id // 4) % 8 AS INT) + 1] AS dom
  FROM documents
), urls AS (
  SELECT CASE
           WHEN doc_id % 89 = 0 THEN 'garbled://x/' || doc_id
           WHEN CAST(doc_id % 4 AS INT) = 1
             THEN 'HTTPS://' || upper(dom) || '/p/' || g
                    || '?utm_source=feed'
           WHEN CAST(doc_id % 4 AS INT) = 2
             THEN 'https://user@www.' || dom || ':443/p/' || g || '/'
           WHEN CAST(doc_id % 4 AS INT) = 3
             THEN 'http://' || dom || '/p/' || g || '/?gclid=1#f'
           ELSE 'https://' || dom || '/p/' || g
         END AS url
  FROM u
), hosts AS (
  SELECT url,
         regexp_replace(regexp_replace(regexp_replace(
             lower(regexp_extract(url, '{_HOST_RE}', 1)),
             '^[^@]*@', ''), '^www\\.', ''), ':(80|443)$', '') AS h
  FROM urls
), canon AS (
  SELECT CASE WHEN h = '' THEN url ELSE
           h || regexp_replace(regexp_extract(url,
                  '(?i)https?://[^/?#]+([^?#]*)', 1), '/+$', '')
         END AS c
  FROM hosts
)
SELECT split_part(c, '/', 1) AS host,
       CAST(count(*) AS BIGINT) AS n_docs,
       CAST(count(DISTINCT c) AS BIGINT) AS n_canonical,
       CAST(count(*) - count(DISTINCT c) AS BIGINT) AS n_dup_docs,
       {sql_stable_round(
           "CAST(count(*) - count(DISTINCT c) AS DOUBLE)"
           " / CAST(count(*) AS DOUBLE)", 6)} AS dup_rate
FROM canon GROUP BY 1
""".strip()


_NEYMAN_BUDGET = 1000  # total labeling/eval budget to allocate
_DEC_PIPE = "decimal(38,0)"  # n·Σx² for n_chars ≈ 10⁵ passes BIGINT at
# corpus scale (10⁹ docs × 10¹⁰ per-term ≈ 10¹⁹·n) — DEC38 mirrors
# DuckDB's HUGEINT


def q_sample_neyman_draw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEYMAN allocation APPLIED (r9): close the loop the allocation
    row opens — compute each stratum's Neyman-optimal k
    (n_h ∝ N_h·σ_h against the {_NEYMAN_BUDGET}-row budget, the
    `sample_neyman_allocation` arithmetic) and then DRAW exactly that
    many docs per source with the consistent min-hash priority
    (`sample_consistent_k`'s machinery) — so the drawn eval set is
    simultaneously variance-optimal AND rerun/partitioning-stable.
    The per-source md5 over the sorted drawn ids pins the exact SET,
    not just its size.

    Scale: the allocation is strata-sized and broadcasts; the draw
    is one rank window PARTITIONED BY SOURCE (WindowGroupLimit
    pushes the per-group k) — no global sort; the checksum
    aggregates ≤ k ids per stratum."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(
            F.col("n_chars").cast(_DEC_PIPE)
            * F.col("n_chars").cast(_DEC_PIPE)
        ).alias("q"),
    )
    var = (
        F.col("n").cast(_DEC_PIPE) * F.col("q")
        - F.col("s").cast(_DEC_PIPE) * F.col("s").cast(_DEC_PIPE)
    ).cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    w_e3 = F.floor(
        F.col("n").cast("double") * F.sqrt(var) * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    # r11 (guide §2.4, closing batch): the strata-sized weight table
    # feeds BOTH the budget total and the allocation join — without
    # the cache each consumer re-ran the full documents aggregate
    # (3 documents scans → 2). ≤ |sources| rows, bounded.
    weighted = per.select("source", w_e3.alias("w")).cache()
    tot = weighted.agg(F.sum("w").alias("tw"))
    alloc = weighted.crossJoin(F.broadcast(tot)).select(
        "source",
        F.expr(
            f"(CAST(w AS {_DEC_PIPE}) * {_NEYMAN_BUDGET}) div tw"
        ).alias("k_target"),
    )
    pri = F.pmod(
        F.pmod(F.col("doc_id"), F.lit(_PRIORITY_MOD))
        * F.lit(_PRIORITY_MULT),
        F.lit(_PRIORITY_MOD),
    )
    ranked = docs.select(
        "doc_id", "source", pri.alias("p")
    ).withColumn(
        "rk",
        F.row_number().over(
            Window.partitionBy("source").orderBy("p", "doc_id")
        ),
    )
    drawn = ranked.join(F.broadcast(alloc), "source").filter(
        F.col("rk") <= F.col("k_target")
    )
    return drawn.groupBy("source").agg(
        F.max("k_target").alias("k_target"),
        F.count(F.lit(1)).alias("n_drawn"),
        F.md5(
            F.array_join(
                F.array_sort(F.collect_list(F.col("doc_id"))), ","
            )
        ).alias("ids_md5"),
    )


ORACLE_NEYMAN_DRAW = f"""
WITH per AS (
  SELECT source, count(*) AS n, sum(n_chars) AS s,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
  FROM documents GROUP BY 1
), w AS (
  SELECT source,
         CAST(floor(n * sqrt(CAST(n * q - CAST(s AS HUGEINT) * s
                                  AS DOUBLE)
                             / (CAST(n AS DOUBLE) * n)) * 1000.0
                    + 0.5) AS BIGINT) AS wgt
  FROM per
), tot AS (
  SELECT sum(wgt) AS tw FROM w
), alloc AS (
  SELECT source,
         CAST((CAST(wgt AS HUGEINT) * {_NEYMAN_BUDGET}) // tw
              AS BIGINT) AS k_target
  FROM w, tot
), ranked AS (
  SELECT doc_id, source,
         row_number() OVER (
           PARTITION BY source
           ORDER BY (doc_id % {_PRIORITY_MOD}) * {_PRIORITY_MULT}
                      % {_PRIORITY_MOD}, doc_id
         ) AS rk
  FROM documents
), drawn AS (
  SELECT r.source, r.doc_id, a.k_target
  FROM ranked r JOIN alloc a USING (source)
  WHERE r.rk <= a.k_target
)
SELECT source, CAST(max(k_target) AS BIGINT) AS k_target,
       CAST(count(*) AS BIGINT) AS n_drawn,
       md5(string_agg(CAST(doc_id AS VARCHAR), ','
                      ORDER BY doc_id)) AS ids_md5
FROM drawn GROUP BY 1
""".strip()


# ------------------------------------ Neyman-optimal eval allocation



def q_sample_neyman_allocation(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """NEYMAN-optimal allocation of a fixed eval/labeling budget
    across source strata (Neyman 1934): allocate n_h ∝ N_h·σ_h —
    big AND internally-varied strata get the samples; a huge but
    homogeneous stratum needs few. This is the sampling-THEORY
    counterpart of the quota/stratified samplers (which take rates as
    given): it computes the rates that minimize the variance of the
    corpus-level estimate for a fixed budget, with the proportional
    allocation (n_h ∝ N_h) beside it so the variance win is visible.

    Exactness: σ_h comes from exact integer moments of n_chars
    (n·Q − S² in DEC38/HUGEINT); the Neyman weight N_h·σ_h quantizes
    to e3 fixed-point BEFORE the cross-stratum total (float-sum order
    independence), and the allocated counts are integer floor
    divisions of budget·w against that exact total — both engines
    produce identical integers.

    Scale: one source-keyed aggregate with map-side partials; the
    stratum table (|sources| rows) broadcasts through a single total;
    output is strata-sized.
    """
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(
            F.col("n_chars").cast(_DEC_PIPE)
            * F.col("n_chars").cast(_DEC_PIPE)
        ).alias("q"),
    )
    var = (
        F.col("n").cast(_DEC_PIPE) * F.col("q")
        - F.col("s").cast(_DEC_PIPE) * F.col("s").cast(_DEC_PIPE)
    ).cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    w_e3 = F.floor(
        F.col("n").cast("double") * F.sqrt(var) * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    weighted = per.select(
        "source", "n", F.sqrt(var).alias("sd"), w_e3.alias("w")
    )
    tot = weighted.agg(
        F.sum("w").alias("tw"), F.sum("n").alias("tn")
    )
    j = weighted.crossJoin(F.broadcast(tot))
    return j.select(
        "source",
        F.col("n").alias("n_docs"),
        stable_round(F.col("sd"), 4).alias("sd_chars"),
        stable_round(
            F.col("w").cast("double") / F.col("tw").cast("double"), 6
        ).alias("neyman_share"),
        # w·BUDGET carried in DEC38 before the div (ADVICE r8): w ≈
        # n·σ·10³ can push the plain-BIGINT product past 2⁶³ at
        # corpus scale, where non-ANSI Spark wraps silently while
        # DuckDB stays exact — decimal keeps both engines identical;
        # the quotient ≤ BUDGET so the decimal div is exact
        F.expr(
            f"(CAST(w AS {_DEC_PIPE}) * {_NEYMAN_BUDGET}) div tw"
        ).alias("neyman_k"),
        F.expr(
            f"(CAST(n AS {_DEC_PIPE}) * {_NEYMAN_BUDGET}) div tn"
        ).alias("proportional_k"),
    )


ORACLE_NEYMAN = f"""
WITH per AS (
  SELECT source, count(*) AS n, sum(n_chars) AS s,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
  FROM documents GROUP BY 1
), w AS (
  SELECT source, n,
         sqrt(CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)
              / (CAST(n AS DOUBLE) * n)) AS sd,
         CAST(floor(n * sqrt(CAST(n * q - CAST(s AS HUGEINT) * s
                                  AS DOUBLE)
                             / (CAST(n AS DOUBLE) * n)) * 1000.0
                    + 0.5) AS BIGINT) AS wgt
  FROM per
), tot AS (
  SELECT sum(wgt) AS tw, sum(n) AS tn FROM w
)
SELECT source, CAST(n AS BIGINT) AS n_docs,
       {sql_stable_round("sd", 4)} AS sd_chars,
       {sql_stable_round("CAST(wgt AS DOUBLE) / tw", 6)}
         AS neyman_share,
       CAST((CAST(wgt AS HUGEINT) * {_NEYMAN_BUDGET}) // tw AS BIGINT)
         AS neyman_k,
       CAST((CAST(n AS HUGEINT) * {_NEYMAN_BUDGET}) // tn AS BIGINT)
         AS proportional_k
FROM w, tot
""".strip()


def q_sample_design_effect(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """KISH DESIGN EFFECT of the three stratified allocations (Kish
    1965): for equal / proportional / Neyman splits of the same
    _NEYMAN_BUDGET across source strata, DEFF = Var_st / Var_srs for
    the corpus-mean-chars estimator and n_eff = n / DEFF — the
    missing judgment layer over `sample_neyman_allocation` (which
    computes the Neyman rates): HOW MUCH precision does each design
    buy or cost against simple random sampling? Proportional
    allocation always has DEFF ≤ 1 under this model (stratification
    never hurts); equal allocation over uneven strata pays a
    weighting penalty; Neyman is the optimum by construction.

    Model (documented contract): population variances σ²_h from
    exact integer moments (the Neyman row's convention), real-valued
    allocations n_h (a design audit, not a draw — no rounding to
    integer counts), fpc ignored.

    Exactness: σ²_h and σ²_tot come from exact DEC38/HUGEINT
    moments; Neyman weights quantize to e3 BEFORE the cross-stratum
    total (exactly as `sample_neyman_allocation` does); each
    per-stratum variance term PRE-ROUNDS to an e9 integer so the
    design sums are exact and order-free; DEFF / n_eff are ONE
    fixed-shape expression. stable_round(4)/(1).

    Scale: ONE source-keyed aggregate with map-side partials; the
    design sweep is a 3-literal explode over the |sources|-row
    stratum table; one broadcast global-moment row."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    per = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_chars").alias("s"),
        F.sum(
            F.col("n_chars").cast(_DEC_PIPE)
            * F.col("n_chars").cast(_DEC_PIPE)
        ).alias("q"),
        # r11 (guide §2.4): cached |sources|-row moment table — the
        # global moments (glob below) roll up exactly from these
        # per-stratum integer partials, so the corpus is scanned
        # once, not once per moment set.
    ).cache()
    var_h = (
        F.col("n").cast(_DEC_PIPE) * F.col("q")
        - F.col("s").cast(_DEC_PIPE) * F.col("s").cast(_DEC_PIPE)
    ).cast("double") / (
        F.col("n").cast("double") * F.col("n").cast("double")
    )
    w_e3 = F.floor(
        F.col("n").cast("double") * F.sqrt(var_h) * F.lit(1000.0)
        + F.lit(0.5)
    ).cast("long")
    strata = per.select(
        "source", "n", var_h.alias("v"), w_e3.alias("w")
    )
    tot = strata.agg(
        F.sum("w").alias("tw"),
        F.sum("n").alias("tn"),
        F.count(F.lit(1)).alias("h"),
    )
    glob = per.agg(
        F.sum("n").alias("gn"),
        F.sum("s").alias("gs"),
        F.sum("q").alias("gq"),
    )
    designs = spark.createDataFrame(
        [("equal",), ("neyman",), ("proportional",)], "design string"
    )
    j = strata.crossJoin(F.broadcast(tot)).crossJoin(
        F.broadcast(designs)
    )
    budget = float(_NEYMAN_BUDGET)
    n_h = (
        F.when(
            F.col("design") == "equal",
            F.lit(budget) / F.col("h").cast("double"),
        )
        .when(
            F.col("design") == "proportional",
            F.lit(budget)
            * F.col("n").cast("double")
            / F.col("tn").cast("double"),
        )
        .otherwise(
            F.lit(budget)
            * F.col("w").cast("double")
            / F.col("tw").cast("double")
        )
    )
    share = F.col("n").cast("double") / F.col("tn").cast("double")
    term = F.when(F.col("w") == 0, F.lit(0.0)).otherwise(
        share * share * F.col("v") / n_h
    )
    per_design = (
        j.select(
            "design",
            # e9-integer term: the design sum is exact and order-free
            F.floor(term * F.lit(1e9) + F.lit(0.5))
            .cast("long")
            .alias("t9"),
        )
        .groupBy("design")
        .agg(F.sum("t9").alias("vst9"))
    )
    gvar = (
        F.col("gn").cast(_DEC_PIPE) * F.col("gq")
        - F.col("gs").cast(_DEC_PIPE) * F.col("gs").cast(_DEC_PIPE)
    ).cast("double") / (
        F.col("gn").cast("double") * F.col("gn").cast("double")
    )
    out = per_design.crossJoin(F.broadcast(glob))
    var_st = F.col("vst9").cast("double") / F.lit(1e9)
    var_srs = gvar / F.lit(budget)
    deff = var_st / var_srs
    return out.select(
        "design",
        F.lit(_NEYMAN_BUDGET).cast("long").alias("n_budget"),
        stable_round(deff, 4).alias("deff"),
        stable_round(F.lit(budget) / deff, 1).alias("n_eff"),
    ).orderBy("design")


ORACLE_DESIGN_EFFECT = f"""
WITH per AS (
  SELECT source, count(*) AS n, sum(n_chars) AS s,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS q
  FROM documents GROUP BY 1
), strata AS (
  SELECT source, n,
         CAST(n * q - CAST(s AS HUGEINT) * s AS DOUBLE)
           / (CAST(n AS DOUBLE) * n) AS v,
         CAST(floor(n * sqrt(CAST(n * q - CAST(s AS HUGEINT) * s
                                  AS DOUBLE)
                             / (CAST(n AS DOUBLE) * n)) * 1000.0
                    + 0.5) AS BIGINT) AS w
  FROM per
), tot AS (
  SELECT sum(w) AS tw, sum(n) AS tn, count(*) AS h FROM strata
), gmom AS (
  SELECT count(*) AS gn, sum(n_chars) AS gs,
         sum(CAST(n_chars AS HUGEINT) * n_chars) AS gq
  FROM documents
), designs AS (
  SELECT unnest(['equal', 'neyman', 'proportional']) AS design
), terms AS (
  SELECT d.design,
         CAST(floor(
           CASE WHEN s.w = 0 THEN 0.0 ELSE
             (CAST(s.n AS DOUBLE) / tn) * (CAST(s.n AS DOUBLE) / tn)
             * s.v
             / CASE d.design
                 WHEN 'equal' THEN {float(_NEYMAN_BUDGET)} / h
                 WHEN 'proportional'
                   THEN {float(_NEYMAN_BUDGET)}
                        * CAST(s.n AS DOUBLE) / tn
                 ELSE {float(_NEYMAN_BUDGET)}
                      * CAST(s.w AS DOUBLE) / tw
               END
           END * 1e9 + 0.5) AS BIGINT) AS t9
  FROM strata s, tot, designs d
), per_design AS (
  SELECT design, sum(t9) AS vst9 FROM terms GROUP BY 1
)
SELECT design,
       CAST({_NEYMAN_BUDGET} AS BIGINT) AS n_budget,
       {sql_stable_round(
           "(CAST(vst9 AS DOUBLE) / 1e9)"
           " / ((CAST(gn * gq - CAST(gs AS HUGEINT) * gs AS DOUBLE)"
           "     / (CAST(gn AS DOUBLE) * gn))"
           f"    / {float(_NEYMAN_BUDGET)})", 4)} AS deff,
       {sql_stable_round(
           f"{float(_NEYMAN_BUDGET)} /"
           " ((CAST(vst9 AS DOUBLE) / 1e9)"
           "  / ((CAST(gn * gq - CAST(gs AS HUGEINT) * gs AS DOUBLE)"
           "      / (CAST(gn AS DOUBLE) * gn))"
           f"     / {float(_NEYMAN_BUDGET)}))", 1)} AS n_eff
FROM per_design, gmom ORDER BY design
""".strip()


_PPS_K = 100  # systematic sample size


def q_sample_pps_systematic(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SYSTEMATIC PPS SAMPLING (Madow 1949): documents draw with
    probability proportional to length by walking the cumulative
    weight line in steps of total/k — the zero-variance-per-stratum
    classical design behind "sample tokens, not documents" (a
    uniform doc sample under-represents long documents' tokens; PPS
    makes the TOKEN sample uniform), complementing the weighted-k
    (independent draws) and quota rows with the textbook
    fixed-size-exact design.

    Selection is pure integer arithmetic: doc d with cumulative
    weight c and weight w selects iff (c·k) div W > ((c−w)·k) div W
    — the step boundary falls inside d's weight span. Every engine
    computes the identical BIGINT divisions; exactly k rows when no
    single weight exceeds the step.

    Scale: the cumulative weight is operators/rank.py's DISTRIBUTED
    global cumsum (log-bucketed local cumsum + broadcast prefix
    offsets — no single-task sort of the corpus); selection is a
    row-local filter."""
    from monasca_aggregator_spark.operators.rank import global_cumsum

    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", F.col("n_chars").cast("long").alias("w")
    )
    cum = global_cumsum(
        docs,
        F.floor(F.log(F.col("doc_id").cast("double") + 2.0) * 4).cast(
            "int"
        ),
        [F.col("doc_id").asc()],
        F.col("w"),
        cum_col="c",
        total_col="wt",
    )
    # BIGINT `div` keeps the boundary test exact — a decimal/double
    # quotient could round ACROSS the floor boundary and disagree
    # with the oracle's integer division (c·k ≤ 1e16 at 100 TB of
    # text: inside int64)
    hi = F.expr(f"(c * {_PPS_K}) div wt")
    lo = F.expr(f"((c - w) * {_PPS_K}) div wt")
    return (
        cum.filter(hi > lo)
        .select("doc_id", "w", F.col("c").alias("cum_w"))
        .orderBy("doc_id")
    )


ORACLE_PPS = f"""
WITH cum AS (
  SELECT doc_id, CAST(n_chars AS BIGINT) AS w,
         sum(CAST(n_chars AS BIGINT)) OVER
           (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
            AND CURRENT ROW) AS c,
         sum(CAST(n_chars AS BIGINT)) OVER () AS wt
  FROM documents
)
SELECT doc_id, w, CAST(c AS BIGINT) AS cum_w
FROM cum
WHERE CAST(c AS HUGEINT) * {_PPS_K} // wt
      > CAST(c - w AS HUGEINT) * {_PPS_K} // wt
ORDER BY doc_id
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "sample_pps_systematic": q_sample_pps_systematic,
    "sample_neyman_allocation": q_sample_neyman_allocation,
    "sample_design_effect": q_sample_design_effect,
    "sample_neyman_draw": q_sample_neyman_draw,
    "dedup_url_canonical": q_dedup_url_canonical,
    "skyline_docs": q_skyline_docs,
    "curation_funnel": q_curation_funnel,
    "curation_url_filter": q_curation_url_filter,
    "pack_chunk_spans": q_pack_chunk_spans,
    "chunk_sentences": q_chunk_sentences,
    "split_group_aware": q_split_group_aware,
    "sample_quota_source": q_sample_quota_source,
    "sample_consistent_k": q_sample_consistent_k,
    "sample_consistent_k_group": q_sample_consistent_k_group,
    "corpus_ngram_coverage": q_corpus_ngram_coverage,
    "sample_temperature": q_sample_temperature,
    "sample_stratified": q_sample_stratified,
    "profile_documents": q_profile_documents,
    "split_train_val": q_split_train_val,
    "pack_chunks": q_pack_chunks,
    "pack_chunks_overlap": q_pack_chunks_overlap,
    "pack_length_buckets": q_pack_length_buckets,
    "pack_bins_ffd": q_pack_bins_ffd,  # rows-only (sequential FFD fold)
    "sample_weighted_k": q_sample_weighted_k,
    "sample_budget_mix": q_sample_budget_mix,
    "sample_top_p_source": q_sample_top_p_source,
    "corpus_diff": q_corpus_diff,
    "order_curriculum": q_order_curriculum,
    "order_shuffle": q_order_shuffle,
    "sample_epoch_repeat": q_sample_epoch_repeat,
    "pipeline_curate": q_pipeline_curate,  # rows-only (composed pipeline)
    "sample_importance_dsir": q_sample_importance_dsir,
}

ORACLES: dict[str, str] = {
    "sample_pps_systematic": ORACLE_PPS,
    "skyline_docs": ORACLE_SKYLINE,
    "curation_funnel": ORACLE_CURATION_FUNNEL,
    "curation_url_filter": ORACLE_URL_FILTER,
    "dedup_url_canonical": ORACLE_URL_CANONICAL,
    "sample_neyman_allocation": ORACLE_NEYMAN,
    "sample_design_effect": ORACLE_DESIGN_EFFECT,
    "sample_neyman_draw": ORACLE_NEYMAN_DRAW,
    "pack_chunk_spans": ORACLE_PACK_SPANS,
    "chunk_sentences": ORACLE_CHUNK_SENTENCES,
    "split_group_aware": ORACLE_SPLIT_GROUP,
    "sample_quota_source": ORACLE_QUOTA,
    "sample_consistent_k": ORACLE_CONSISTENT_K,
    "sample_consistent_k_group": ORACLE_CONSISTENT_K_GROUP,
    "corpus_ngram_coverage": ORACLE_NGRAM_COVERAGE,
    "sample_temperature": ORACLE_TEMPERATURE,
    "sample_stratified": ORACLE_STRATIFIED,
    "profile_documents": ORACLE_PROFILE,
    "split_train_val": ORACLE_SPLIT,
    "pack_chunks": ORACLE_PACK,
    "pack_chunks_overlap": ORACLE_PACK_OVERLAP,
    "pack_length_buckets": ORACLE_LENGTH_BUCKETS,
    "sample_weighted_k": ORACLE_WEIGHTED_K,
    "sample_budget_mix": ORACLE_BUDGET_MIX,
    "sample_top_p_source": ORACLE_TOP_P,
    "corpus_diff": ORACLE_CORPUS_DIFF,
    "order_curriculum": ORACLE_CURRICULUM,
    "order_shuffle": ORACLE_SHUFFLE,
    "sample_epoch_repeat": ORACLE_EPOCH_REPEAT,
    "sample_importance_dsir": ORACLE_DSIR,
}
