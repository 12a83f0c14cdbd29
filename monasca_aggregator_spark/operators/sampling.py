"""Dataset-assembly operators for training-data pipelines: quota
sampling, deterministic splits, and sequence packing.

These are the steps between "filtered corpus" and "training shards":
pick a per-source mix, carve out train/val/test, and pack documents
into fixed-size sequences. All three are pure DataFrame plans — one
shuffle each, no Python in the row path — so they compose with the
dedup/quality operators upstream at 100 TB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def quota_per_group(
    df: DataFrame,
    group_col: str,
    order_by: Sequence[Column],
    n: int,
) -> DataFrame:
    """Keep the top-``n`` rows per group (training-mix quota, e.g. "best
    5k docs per source by quality"). One shuffle on the group key; the
    rank is a window row_number, so ``order_by`` must be a total order
    (include a unique id as the last key) for deterministic output.
    Skewed groups are bounded by the quota itself — every partition
    emits ≤ n rows per group after the sort."""
    w = Window.partitionBy(group_col).orderBy(*order_by)
    return (
        df.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= n)
    )


def split_assign(
    df: DataFrame,
    bucket: Column,
    splits: Sequence[tuple[str, int]],
) -> DataFrame:
    """Deterministic split assignment from a 0-99 ``bucket`` column
    expression. ``splits`` are (label, upper_bound_exclusive) pairs in
    ascending order, e.g. [("train", 80), ("val", 90), ("test", 100)].

    The bucket expression owns the randomness policy: pass
    ``pmod(xxhash64(id), 100)`` for a well-mixed production split, or a
    plain ``pmod(id, 100)`` when cross-engine reproducibility matters
    (hash functions don't match across engines). Stateless and
    rerun-stable either way — membership depends only on the row, never
    on partitioning or sampling order (unlike ``df.randomSplit``)."""
    expr = None
    for label, ub in reversed(list(splits)):
        expr = (
            F.lit(label)
            if expr is None
            else F.when(bucket < ub, F.lit(label)).otherwise(expr)
        )
    return df.withColumn("split", expr)


def profile_columns(
    df: DataFrame,
    cols: Sequence[str],
) -> DataFrame:
    """Data-profiling summary — the validation gate a training pipeline
    runs before consuming a drop: per column, row count, null count,
    and exact distinct count, in ONE aggregation pass (Spark plans the
    multiple count-distincts via a single expand + aggregate, not one
    job per column). Output is long-format (column, n_rows, n_null,
    n_distinct) so downstream checks are data, not schema.

    At 100 TB swap count_distinct for approx_count_distinct — same
    plan minus the expand; kept exact here so the oracle can match
    bit-for-bit."""
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"{c}__rows"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}__null"),
            F.count_distinct(F.col(c)).alias(f"{c}__distinct"),
        ]
    wide = df.agg(*aggs)
    stack = ", ".join(
        f"'{c}', {c}__rows, {c}__null, {c}__distinct" for c in cols
    )
    return wide.select(
        F.expr(
            f"stack({len(cols)}, {stack}) AS "
            "(column, n_rows, n_null, n_distinct)"
        )
    )


def stratified_sample(
    df: DataFrame,
    stratum_col: str,
    fractions: dict[str, float],
    bucket: Column,
    *,
    default_fraction: float = 0.0,
) -> DataFrame:
    """Deterministic per-stratum Bernoulli sampling (the rebalancing
    step of a training mix: e.g. keep 100% of low-resource languages,
    25% of English). A row survives iff ``bucket < 100·fraction`` for
    its stratum, so membership is a pure row-local predicate — a
    narrow filter with zero shuffle that pushes down to the scan,
    unlike ``df.sampleBy`` whose RNG draw depends on partitioning and
    is not rerun-stable.

    ``bucket`` must be a 0-99 integer expression (same contract as
    ``split_assign``; pass an xxhash64-based one in production, an
    arithmetic one when cross-engine reproducibility matters)."""
    expr = F.lit(float(default_fraction) * 100.0)
    for label, frac in fractions.items():
        expr = F.when(
            F.col(stratum_col) == label, F.lit(float(frac) * 100.0)
        ).otherwise(expr)
    return df.filter(bucket < expr)


def temperature_mix(
    df: DataFrame,
    source_col: str,
    bucket: Column,
    *,
    target_rows: float,
    temperature: float = 0.5,
    bucket_mod: int = 1_000_000,
) -> DataFrame:
    """Temperature-scaled source mixing — the multinomial rebalance LLM
    training mixes use (target share of source s ∝ n_s^T; T < 1
    flattens the mix toward rare sources). Each source's keep-rate is
    ``min(1, target_rows·share_s / n_s)`` and a row survives iff its
    deterministic ``bucket`` (0..bucket_mod-1, same contract as
    ``split_assign``) falls under the rate — rerun-stable, row-local
    membership.

    Plan shape: one small groupBy(source) count, the per-source rate
    computed on that tiny aggregate and BROADCAST back, so the corpus
    itself sees only a scan + map-side join + filter — no shuffle of
    data rows at any scale. T=0.5 is computed via ``sqrt`` (IEEE
    correctly-rounded in every engine) so the rate threshold is
    bit-reproducible cross-engine; other temperatures go through
    ``pow`` (may differ by 1 ulp across engines — fine in production,
    not for a hash-matching oracle).
    """
    src = F.col(source_col)
    counts = df.groupBy(src.alias("__src")).agg(
        F.count(F.lit(1)).alias("__n")
    )
    wgt = (
        F.sqrt(F.col("__n").cast("double"))
        if temperature == 0.5
        else F.pow(F.col("__n").cast("double"), F.lit(float(temperature)))
    )
    weighted = counts.select("__src", "__n", wgt.alias("__w"))
    total = weighted.agg(F.sum("__w").alias("__tw"))
    rate = F.least(
        F.lit(1.0),
        (F.lit(float(target_rows)) * F.col("__w") / F.col("__tw"))
        / F.col("__n"),
    )
    # integer threshold = floor(rate·mod + 0.5): the survival test is an
    # exact integer compare, immune to float-boundary drift
    rates = weighted.crossJoin(F.broadcast(total)).select(
        "__src",
        F.floor(rate * F.lit(float(bucket_mod)) + F.lit(0.5))
        .cast("long")
        .alias("__thresh"),
    )
    return (
        df.join(F.broadcast(rates), src == F.col("__src"))
        .filter(bucket < F.col("__thresh"))
        .drop("__src", "__thresh")
    )


def top_p_by_mass(
    df: DataFrame,
    group_col: str,
    order_by: Sequence[Column],
    mass_col: str,
    p: float,
) -> DataFrame:
    """Nucleus (top-p) selection by MASS within each group: walk rows
    in ``order_by`` order and keep them while the mass accumulated
    BEFORE each row is under ``p`` of the group total (the first
    crossing row is included, nucleus-style). ``order_by`` must be a
    total order for deterministic membership. One window per group;
    masses should be integers so the only float is the p·total
    threshold. Shared by the batch curation pipeline and the
    sample_top_p_source query — one implementation, one semantics."""
    w = Window.partitionBy(group_col).orderBy(*order_by)
    before = F.coalesce(
        F.sum(mass_col).over(w.rowsBetween(Window.unboundedPreceding, -1)),
        F.lit(0),
    )
    total = F.sum(mass_col).over(
        Window.partitionBy(group_col).rowsBetween(
            Window.unboundedPreceding, Window.unboundedFollowing
        )
    )
    return df.withColumn("__keep", before < F.lit(p) * total).filter(
        F.col("__keep")
    ).drop("__keep")


def waterfill_allocation(
    counts: DataFrame,
    *,
    budget: float,
    n_col: str = "n",
    weight_col: str = "wgt",
    key_cols: Sequence[str] = ("source",),
) -> DataFrame:
    """Exact water-filling budget allocation: give each source
    ``a_s = min(n_s, t·w_s)`` with the water level t chosen so
    Σ a_s = budget — the solver behind "sample B documents across
    sources proportional to weight, capped by what each source has".
    temperature_mix's independent min(1, rate) keep-rates overshoot
    when sources saturate; water-filling redistributes the slack from
    capped sources exactly.

    Closed form via the standard sort: order sources by ratio
    r_s = n_s/w_s ascending; the first index i where
    t_i = (B − Σ_{j<i} n_j)/(Σ_{j≥i} w_j) < r_i gives the level
    (everything before i is capped; if no such i, budget ≥ total and
    every source is capped). One window over the per-source aggregate
    — |sources| rows, a driver-scale relation by construction; the
    corpus itself is touched only by the upstream groupBy that built
    ``counts``.

    Output: key_cols + n, wgt, alloc (floor(t·w+0.5), capped at n),
    capped flag.
    """
    w_order = Window.orderBy(F.col("__r").asc(), *[F.col(c) for c in key_cols])
    prev = w_order.rowsBetween(Window.unboundedPreceding, -1)
    staged = (
        counts.select(
            *key_cols,
            F.col(n_col).cast("double").alias("__n"),
            F.col(weight_col).cast("double").alias("__w"),
        )
        .withColumn("__r", F.col("__n") / F.col("__w"))
        .withColumn("__pn", F.coalesce(F.sum("__n").over(prev), F.lit(0.0)))
        .withColumn("__pw", F.coalesce(F.sum("__w").over(prev), F.lit(0.0)))
        .withColumn(
            "__tw",
            F.sum("__w").over(
                Window.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            ),
        )
        .withColumn(
            "__ti",
            (F.lit(float(budget)) - F.col("__pn"))
            / (F.col("__tw") - F.col("__pw")),
        )
        .withColumn("__i", F.row_number().over(w_order))
    )
    # the water level: t at the FIRST sort-order index where t_i < r_i
    # (t_i is not monotone, so min_by index — NULL → all capped)
    level = staged.filter(F.col("__ti") < F.col("__r")).agg(
        F.min_by("__ti", "__i").alias("__t")
    )
    alloc = (
        F.when(
            F.col("__t").isNull() | (F.col("__r") <= F.col("__t")),
            F.col("__n"),
        )
        .otherwise(
            F.least(
                F.col("__n"), F.floor(F.col("__t") * F.col("__w") + F.lit(0.5))
            )
        )
        .cast("long")
    )
    return (
        staged.crossJoin(F.broadcast(level))
        .select(
            *key_cols,
            F.col("__n").cast("long").alias("n_docs"),
            alloc.alias("alloc_docs"),
            (
                F.col("__t").isNull() | (F.col("__r") <= F.col("__t"))
            ).alias("capped"),
        )
    )


def pack_concat_chunk(
    df: DataFrame,
    group_col: str | Sequence[str],
    order_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """Concat-and-chunk sequence packing: within each group, documents
    are laid head-to-tail in ``order_col`` order and cut into
    ``budget``-sized chunks; a document's chunk is where its first
    unit lands (chunk = floor(start_offset / budget) — the standard
    "concatenate then chop" LLM batching scheme, where sequences may
    straddle a boundary and get truncated/continued by the tokenizer
    stage).

    One shuffle on the group key; the running offset is a window
    cumulative sum. At scale the group is a shard key (source, date,
    ...) so groups are bounded; the window sort is the same order the
    shard writer needs anyway."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum(size_col).over(w), F.lit(0))
    return df.withColumn("chunk_id", F.floor(start / F.lit(budget)))


def pack_sliding_chunks(
    df: DataFrame,
    group_col: str,
    order_col: str,
    size_col: str,
    budget: int,
    stride: int,
) -> DataFrame:
    """Sliding-window packing: documents are laid head-to-tail per
    group (same running-offset window as ``pack_concat_chunk``), but
    chunks of ``budget`` units start every ``stride`` units, so with
    stride < budget consecutive training windows OVERLAP — the standard
    long-context curriculum trick (every token is seen with both its
    left and right context). A document joins every chunk whose window
    [k·stride, k·stride+budget) intersects its span — computed as a
    closed-form integer k-range and exploded with ``sequence``, so
    there is no range join, no UDF, and the fan-out per row is exactly
    its overlap count (≤ budget/stride)."""
    w = (
        Window.partitionBy(group_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # materialize the running offset BEFORE the generator: Spark cannot
    # resolve a window expression nested inside explode()
    staged = df.withColumn(
        "start_offset", F.coalesce(F.sum(size_col).over(w), F.lit(0))
    )
    start = F.col("start_offset")
    end = start + F.col(size_col)
    k_min = F.greatest(
        F.lit(0).cast("long"),
        F.floor((start - F.lit(budget)) / F.lit(stride)) + F.lit(1),
    )
    k_max = F.ceil(end / F.lit(stride)) - F.lit(1)
    return (
        staged.withColumn(
            "chunk_id",
            F.explode(F.sequence(k_min, F.greatest(k_max, k_min))),
        )
        # degenerate guard: greatest() above only fires when a zero-size
        # doc sits exactly on a stride boundary; drop non-overlapping
        .filter(
            (F.col("chunk_id") * stride < end)
            & (F.col("chunk_id") * stride + budget > start)
        )
    )


def pack_first_fit_decreasing(
    df: DataFrame,
    group_col: str,
    id_col: str,
    size_col: str,
    budget: int,
) -> DataFrame:
    """BIN-PACKING sequence packing: within each group, assign whole
    documents to bins by first-fit-decreasing — unlike
    ``pack_concat_chunk`` no document straddles a bin boundary, so
    nothing is truncated, at the cost of padding waste FFD provably
    keeps within 11/9·OPT + 1 bins. This is the batch-shape packer
    for training setups that cannot split sequences.

    FFD is an order-dependent sequential fold, so each group's packing
    runs inside applyInPandas (Arrow; one shuffle on the group key,
    groups are shard-bounded by construction). Deterministic: sizes
    descend with id_col as the tie-break, bins scan in creation order.
    Oversize documents (> budget) get singleton bins. Output adds
    (bin_id, bin_fill) per row; tests pin the invariants (no bin over
    budget except singletons, FFD bins ≤ concat-chunk's padded-bin
    count, rerun/partitioning stability).
    """
    import pandas as pd

    out_fields = list(df.schema.fields)
    schema_ddl = ", ".join(
        f"{f.name} {f.dataType.simpleString()}" for f in out_fields
    ) + ", bin_id int, bin_fill bigint"

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            [size_col, id_col], ascending=[False, True], kind="mergesort"
        )
        fills: list[int] = []
        assign: list[int] = []
        for sz in pdf[size_col]:
            sz = int(sz)
            placed = -1
            for i, f in enumerate(fills):
                if f + sz <= budget:
                    placed = i
                    break
            if placed < 0:
                fills.append(0)
                placed = len(fills) - 1
            fills[placed] += sz
            assign.append(placed)
        pdf = pdf.assign(
            bin_id=pd.array(assign, dtype="int32"),
            bin_fill=pd.array(
                [fills[b] for b in assign], dtype="int64"
            ),
        )
        return pdf

    return df.groupBy(group_col).applyInPandas(_pack, schema_ddl)


# The DSIR feature hash is md5-first-byte — EXACTLY 256 cells, fixed
# by the SQL-reproducibility contract (conv(substring(md5, 1, 2)));
# the smoothing mass must match the cell count, so it is a module
# constant, not a parameter (a caller-supplied width would silently
# mis-specify the model: different smoothing, same 256 cells).
_DSIR_HASH_BUCKETS = 256


def dsir_importance(
    docs: DataFrame,
    target: Column,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DSIR importance scores (Xie et al. 2023) — log p_target/p_raw
    under hashed-unigram bucket models with add-1 smoothing, per-token
    normalized. ``target`` is a boolean Column marking the rows whose
    distribution the mix is steered toward. Each bucket's log-ratio is
    ONE ln of ONE division of exact DECIMAL(38,0) cross-products,
    e6-fixed immediately, so per-doc scores are order-free INTEGER
    sums (plans/pipeline_ops.q_sample_importance_dsir's determinism
    contract, factored here so the curation pipeline composes it).
    Returns (id_col, n_tokens, importance). Bucket models are
    256-row broadcast aggregates; the doc score is a map-side
    join + partial sum — nothing wider than (doc, bucket) shuffles."""
    from monasca_aggregator_spark.functions.rounding import stable_round
    from monasca_aggregator_spark.functions.text import tokens

    toks = docs.select(
        F.col(id_col),
        target.alias("__tgt"),
        F.explode(tokens(F.col(text_col))).alias("token"),
    )
    tb = toks.select(
        id_col,
        "__tgt",
        F.conv(F.substring(F.md5("token"), 1, 2), 16, 10)
        .cast("int")
        .alias("b"),
    )
    # r11 optimization (guide §2.3): BOTH bucket models ride ONE
    # conditional aggregate over the exploded corpus (raw + target
    # counts per bucket) instead of two separate passes, and the
    # ≤256-row model table is materialized once — the corpus explode
    # now runs twice (model build + scoring), down from three times.
    rt = tb.groupBy("b").agg(
        F.count(F.lit(1)).alias("r"),
        F.count(F.when(F.col("__tgt"), 1)).alias("t"),
    ).cache()
    tots = rt.agg(
        F.sum("r").alias("big_r"),
        F.sum(F.coalesce(F.col("t"), F.lit(0))).alias("big_t"),
    )
    dec = "decimal(38,0)"
    model = (
        rt
        .crossJoin(F.broadcast(tots))
        .select(
            "b",
            F.floor(
                F.log(
                    (
                        (F.coalesce(F.col("t"), F.lit(0)) + 1).cast(dec)
                        * (F.col("big_r") + _DSIR_HASH_BUCKETS).cast(dec)
                    ).cast("double")
                    / (
                        (F.col("r") + 1).cast(dec)
                        * (F.col("big_t") + _DSIR_HASH_BUCKETS).cast(dec)
                    ).cast("double")
                )
                * 1e6
                + F.lit(0.5)
            )
            .cast("long")
            .alias("lr6"),
        )
    )
    scored = (
        tb.join(F.broadcast(model), "b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("lr6").alias("s6"),
        )
    )
    return scored.select(
        id_col,
        "n_tokens",
        stable_round(
            F.col("s6").cast("double")
            / F.col("n_tokens").cast("double")
            / F.lit(1e6),
            6,
        ).alias("importance"),
    )
