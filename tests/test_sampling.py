"""Dataset-assembly operators (operators/sampling.py): quota, split,
packing — semantic unit tests on hand-built frames."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.sampling import (
    pack_concat_chunk,
    quota_per_group,
    split_assign,
    stratified_sample,
)


def test_quota_keeps_top_n_deterministically(spark):
    df = spark.createDataFrame(
        [("a", 1, 5.0), ("a", 2, 5.0), ("a", 3, 1.0), ("b", 4, 2.0)],
        "g string, id long, score double",
    )
    out = quota_per_group(
        df, "g", [F.col("score").desc(), F.col("id").asc()], 2
    ).collect()
    kept = {(r.g, r.id, r.rk) for r in out}
    # tie on score 5.0 broken by id: id=1 gets rank 1, id=2 rank 2
    assert kept == {("a", 1, 1), ("a", 2, 2), ("b", 4, 1)}


def test_split_boundaries_and_totality(spark):
    df = spark.createDataFrame(
        [(i,) for i in range(200)], "doc_id long"
    )
    out = split_assign(
        df,
        F.pmod(F.col("doc_id"), F.lit(100)),
        [("train", 80), ("val", 90), ("test", 100)],
    )
    counts = {r.split: r.n for r in out.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert counts == {"train": 160, "val": 20, "test": 20}
    # boundary rows land on the lower split (upper bound exclusive)
    rows = {r.doc_id: r.split for r in out.filter(F.col("doc_id").isin(79, 80, 89, 90, 99)).collect()}
    assert rows == {79: "train", 80: "val", 89: "val", 90: "test", 99: "test"}


def test_split_is_rerun_stable(spark):
    df = spark.createDataFrame([(i,) for i in range(50)], "doc_id long")
    b = F.pmod(F.xxhash64(F.col("doc_id")), F.lit(100))
    splits = [("train", 90), ("val", 100)]
    a = sorted(map(tuple, split_assign(df, b, splits).collect()))
    # repartition between runs: membership must not move
    c = sorted(
        map(tuple, split_assign(df.repartition(7), b, splits).collect())
    )
    assert a == c


def test_pack_chunk_assignment_is_start_offset(spark):
    # sizes 3,3,3 with budget 4: starts 0,3,6 -> chunks 0,0,1
    df = spark.createDataFrame(
        [("s", 1, 3), ("s", 2, 3), ("s", 3, 3)],
        "src string, doc_id long, sz long",
    )
    out = {
        r.doc_id: r.chunk_id
        for r in pack_concat_chunk(df, "src", "doc_id", "sz", 4).collect()
    }
    assert out == {1: 0, 2: 0, 3: 1}


def test_pack_groups_are_independent(spark):
    df = spark.createDataFrame(
        [("a", 1, 10), ("b", 2, 10), ("a", 3, 10), ("b", 4, 10)],
        "src string, doc_id long, sz long",
    )
    out = pack_concat_chunk(df, "src", "doc_id", "sz", 15).collect()
    chunks = {(r.src, r.doc_id): r.chunk_id for r in out}
    # each group restarts at offset 0
    assert chunks == {("a", 1): 0, ("a", 3): 0, ("b", 2): 0, ("b", 4): 0}


def test_stratified_sample_row_local_predicate(spark):
    # bucket = id % 100; en keeps bucket < 50, de keeps all, fr none
    df = spark.createDataFrame(
        [(10, "en"), (60, "en"), (99, "de"), (5, "fr"), (7, "xx")],
        "id long, lang string",
    )
    kept = stratified_sample(
        df, "lang", {"en": 0.5, "de": 1.0, "fr": 0.0},
        F.pmod(F.col("id"), F.lit(100)),
    )
    assert sorted(r.id for r in kept.collect()) == [10, 99]


def test_stratified_sample_filter_pushes_to_scan(spark, sf_small):
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    kept = stratified_sample(
        load_table(spark, sf_small, "documents"),
        "lang", {"en": 0.25},
        F.pmod(F.col("doc_id") * F.lit(37) + F.lit(11), F.lit(100)),
    )
    plan = explain_str(kept.select("doc_id", "lang"))
    assert "Exchange" not in plan      # pure row-local filter


def test_profile_columns_hand_computed(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id long, s string",
    )
    from monasca_aggregator_spark.operators.sampling import profile_columns

    out = {
        r.column: (r.n_rows, r.n_null, r.n_distinct)
        for r in profile_columns(df, ["id", "s"]).collect()
    }
    assert out == {"id": (4, 1, 3), "s": (4, 1, 2)}


def test_profile_columns_single_pass(spark, sf_small):
    from monasca_aggregator_spark.operators.sampling import profile_columns
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    plan = explain_str(
        profile_columns(
            load_table(spark, sf_small, "documents"), ["doc_id", "lang"]
        )
    )
    # one expand-based aggregation over ONE scan, not a scan per column
    assert plan.count("Location: InMemoryFileIndex") == 1
    assert "Expand" in plan


def test_temperature_mix_matches_python_model(spark):
    """Kept set equals an independent Python evaluation of the same
    rate formula, and T=0.5 keeps a higher fraction of the rare source
    than of the dominant one."""
    import math

    from pyspark.sql import functions as F

    from monasca_aggregator_spark.operators.sampling import temperature_mix

    rows = [(i, "big") for i in range(400)] + [
        (1000 + i, "small") for i in range(25)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string")
    mod = 1_000_000
    target = 200.0
    kept = temperature_mix(
        df,
        "source",
        F.pmod(F.col("doc_id") * F.lit(131071), F.lit(mod)),
        target_rows=target,
        temperature=0.5,
        bucket_mod=mod,
    )
    got = {r.doc_id for r in kept.collect()}

    n = {"big": 400, "small": 25}
    w = {s: math.sqrt(c) for s, c in n.items()}
    tw = sum(w.values())
    thresh = {
        s: math.floor(min(1.0, (target * w[s] / tw) / n[s]) * mod + 0.5)
        for s in n
    }
    want = {
        i for i, s in rows if (i * 131071) % mod < thresh[s]
    }
    assert got == want
    frac = {
        s: sum(1 for i, t in rows if t == s and i in got) / n[s] for s in n
    }
    assert frac["small"] > frac["big"]


def test_temperature_mix_corpus_side_has_no_shuffle(spark, sf_small):
    """Only the tiny per-source count aggregate exchanges; the corpus
    rows flow scan → broadcast join → filter."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_sample_temperature,
    )
    from tests.conftest import explain_str

    plan = explain_str(q_sample_temperature(spark, sf_small))
    assert "BroadcastHashJoin" in plan


def test_consistent_sample_is_stable_under_growth(spark, sf_small):
    """Min-wise property: growing the corpus only displaces survivors —
    the new sample is the k best of (old sample ∪ added docs), so it
    never depends on how the data is partitioned or ordered."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        SAMPLE_K,
        q_sample_consistent_k,
    )
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    full = q_sample_consistent_k(spark, sf_small)
    ids_full = [r.doc_id for r in full.collect()]
    assert len(ids_full) == SAMPLE_K
    # restrict to half the corpus: survivors from that half must be a
    # superset-prefix of the full sample's members from the same half
    docs = load_table(spark, sf_small, "documents")
    half_ids = {r.doc_id for r in docs.filter("doc_id % 2 = 0").collect()}
    full_half_members = [i for i in ids_full if i in half_ids]
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.plans.pipeline_ops import (
        _PRIORITY_MOD,
        _PRIORITY_MULT,
    )

    pri = F.pmod(F.col("doc_id") * F.lit(_PRIORITY_MULT), F.lit(_PRIORITY_MOD))
    half_sample_ids = [
        r.doc_id
        for r in docs.filter("doc_id % 2 = 0")
        .select("doc_id", pri.alias("p"))
        .orderBy("p", "doc_id")
        .limit(SAMPLE_K)
        .collect()
    ]
    assert full_half_members == half_sample_ids[: len(full_half_members)]
    plan = explain_str(full)
    assert "TakeOrderedAndProject" in plan  # no global sort


def test_sliding_chunks_overlap_and_coverage(spark):
    from monasca_aggregator_spark.operators.sampling import (
        pack_sliding_chunks,
    )

    docs = spark.createDataFrame(
        [("s", i, 100) for i in range(10)],  # 1000 units head-to-tail
        "source string, doc_id long, n_chars long",
    )
    out = pack_sliding_chunks(
        docs, "source", "doc_id", "n_chars", budget=400, stride=200
    ).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r.doc_id, set()).add(r.chunk_id)
        # membership really overlaps the chunk window
        s = r.start_offset
        assert r.chunk_id * 200 < s + 100 and r.chunk_id * 200 + 400 > s
    # doc 0 spans [0,100): chunks starting at 0 only → {0}
    assert by_doc[0] == {0}
    # doc 3 spans [300,400): windows starting 0,200 cover it → {0,1}
    assert by_doc[3] == {0, 1}
    # interior docs belong to exactly budget/stride = 2 windows
    assert all(len(v) == 2 for d, v in by_doc.items() if d >= 2)


def test_weighted_k_inclusion_tracks_weight(spark):
    """Exponential-clock weighted sampling: heavier docs must be
    overrepresented among winners, and the sample must be identical
    across repartitionings (row-local determinism)."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_sample_weighted_k,
    )

    got1 = q_sample_weighted_k(spark, SF_SMALL := "/root/testdata/sf0.001")
    ids1 = [r.doc_id for r in got1.collect()]
    # determinism across physical layout
    ids2 = [r.doc_id for r in q_sample_weighted_k(spark, SF_SMALL).collect()]
    assert ids1 == ids2
    # weight bias: mean n_chars of winners > corpus mean
    from monasca_aggregator_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, SF_SMALL, "documents")
    corpus_mean = docs.agg(F.avg("n_chars")).collect()[0][0]
    winner_mean = got1.agg(F.avg("n_chars")).collect()[0][0]
    assert winner_mean > corpus_mean


def test_waterfill_spends_budget_and_caps_exactly(spark):
    """Water-filling invariants: sum(alloc) hits the budget to
    rounding, capped sources give everything, uncapped allocations are
    weight-proportional at one shared level; budget >= total caps all."""
    from monasca_aggregator_spark.operators.sampling import (
        waterfill_allocation,
    )
    from pyspark.sql import functions as F

    counts = spark.createDataFrame(
        [("a", 1000), ("b", 100), ("c", 10), ("d", 5000)],
        "source string, n long",
    ).withColumn("wgt", F.sqrt(F.col("n").cast("double")))
    out = {
        r.source: r
        for r in waterfill_allocation(counts, budget=2000).collect()
    }
    total_alloc = sum(r.alloc_docs for r in out.values())
    assert abs(total_alloc - 2000) <= 2  # rounding only
    # rare sources saturate, dominant ones split the rest by weight
    assert out["c"].capped and out["c"].alloc_docs == 10
    assert not out["d"].capped
    ratio = out["d"].alloc_docs / out["a"].alloc_docs
    import math

    assert abs(ratio - math.sqrt(5000 / 1000)) < 0.1
    # budget covers everything → all capped
    full = waterfill_allocation(counts, budget=10_000).collect()
    assert all(r.capped and r.alloc_docs == r.n_docs for r in full)


def test_snapshot_diff_null_fingerprints_classified_by_presence(spark):
    """Presence is tracked with explicit markers: a row present in both
    snapshots with NULL fingerprint(s) is changed/unchanged — never
    added/removed."""
    from monasca_aggregator_spark.operators.snapshot import snapshot_diff

    old = spark.createDataFrame(
        [(1, None), (2, "aa"), (3, None), (4, "dd")],
        "doc_id long, fingerprint string",
    )
    new = spark.createDataFrame(
        [(1, "xx"), (2, "aa"), (3, None), (5, "ee")],
        "doc_id long, fingerprint string",
    )
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    assert got == {
        1: "changed",    # NULL -> value: present both sides, differs
        2: "unchanged",
        3: "unchanged",  # NULL == NULL (null-safe compare)
        4: "removed",
        5: "added",
    }


def test_curriculum_order_interleaves_sources(spark, sf_small):
    """Positions are a contiguous 1..N permutation, and the first
    |sources| positions are every source's best doc (rk=1) — the
    round-robin interleave property."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_order_curriculum,
    )

    rows = q_order_curriculum(spark, sf_small).collect()
    n = len(rows)
    assert sorted(r.position for r in rows) == list(range(1, n + 1))
    n_sources = len({r.source for r in rows})
    head = [r for r in rows if r.position <= n_sources]
    assert all(r.rk == 1 for r in head)
    assert len({r.source for r in head}) == n_sources
    # within a source, position strictly follows the per-source rank
    by_source: dict[str, list] = {}
    for r in rows:
        by_source.setdefault(r.source, []).append(r)
    for rs in by_source.values():
        rs.sort(key=lambda r: r.rk)
        assert all(a.position < b.position for a, b in zip(rs, rs[1:]))


def test_epoch_repeat_upsamples_low_resource_langs(spark, sf_small):
    """The dominant language trains exactly 1 epoch (no repeat); rarer
    languages repeat by sqrt ratio, capped at 4 epochs; virtual counts
    are consistent with the epoch rate to within the fractional-epoch
    bucket granularity."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_sample_epoch_repeat,
    )

    rows = q_sample_epoch_repeat(spark, sf_small).collect()
    by_lang = {r.lang: r for r in rows}
    top = max(rows, key=lambda r: r.n_docs)
    assert top.epochs_e6 == 1_000_000
    assert top.n_virtual == top.n_docs
    for r in rows:
        assert 1_000_000 <= r.epochs_e6 <= 4_000_000
        assert r.n_docs <= r.n_virtual <= 4 * r.n_docs
        # virtual/docs tracks the epoch rate (fractional epochs are a
        # deterministic subset, so only bucket noise separates them)
        expect = r.n_docs * r.epochs_e6 / 1_000_000
        assert abs(r.n_virtual - expect) <= max(10, 0.25 * r.n_docs)
    assert len(by_lang) == len(rows)


def test_ffd_packing_invariants(spark, sf_small):
    """First-fit-decreasing packing: no bin over budget (except
    oversize singletons), strictly fewer-or-equal bins than the
    concat-chunk chunk count with whole-document placement, and
    deterministic across partitionings."""
    from monasca_aggregator_spark.operators.sampling import (
        pack_first_fit_decreasing,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    budget = 2000
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "source", "n_chars"
    )
    packed = pack_first_fit_decreasing(
        docs, "source", "doc_id", "n_chars", budget
    )
    rows = packed.collect()
    by_bin: dict[tuple, list] = {}
    for r in rows:
        by_bin.setdefault((r.source, r.bin_id), []).append(r)
    for (_, _), members in by_bin.items():
        total = sum(m.n_chars for m in members)
        assert total == members[0].bin_fill
        if len(members) > 1:
            assert total <= budget
        else:
            assert total <= budget or members[0].n_chars > budget

    # vs concat-chunk: FFD may not use MORE bins per source
    from pyspark.sql import functions as F

    per_source_bins = {
        r.source: r.nb
        for r in packed.groupBy("source")
        .agg(F.countDistinct("bin_id").alias("nb"))
        .collect()
    }
    naive = {
        r.source: r.nb
        for r in docs.groupBy("source")
        .agg(
            F.ceil(F.sum("n_chars") / F.lit(budget)).alias("lower"),
            F.count(F.lit(1)).alias("n"),
        )
        .selectExpr("source", "greatest(lower, 1) AS nb")
        .collect()
    }
    for src, nb in per_source_bins.items():
        # FFD within 11/9*OPT + 1 of the volume lower bound
        assert nb <= (11 * naive[src]) // 9 + 2

    again = {
        (r.source, r.doc_id): r.bin_id
        for r in pack_first_fit_decreasing(
            docs.repartition(16), "source", "doc_id", "n_chars", budget
        ).collect()
    }
    first = {(r.source, r.doc_id): r.bin_id for r in rows}
    assert again == first


def test_chunk_sentences_budget_and_boundaries(spark, tmp_path):
    """Units never split; chunk breaks at the first unit whose
    PRECEDING cumulative tokens crosses a budget multiple."""
    import pandas as pd

    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_chunk_sentences,
    )

    # 6 sentences × 10 tokens; budget 40 → chunks 0:(s0..s3) 1:(s4,s5)
    sent = " ".join(f"w{i}" for i in range(10))
    text = ". ".join([sent] * 6) + "."
    pd.DataFrame(
        [(0, text, "en", "s", len(text))],
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    got = {
        r.chunk_id: (r.n_units, r.chunk_tokens)
        for r in q_chunk_sentences(spark, str(tmp_path)).collect()
    }
    assert got == {0: (4, 40), 1: (2, 20)}


def test_dsir_ranks_target_like_docs_first(spark, tmp_path):
    """DSIR importance: an out-of-target doc written in the TARGET
    vocabulary outranks out-of-target docs in their own vocabulary —
    the distribution-matching property that distinguishes DSIR from
    per-doc quality scores."""
    from pyspark.sql import functions as F  # noqa: F401

    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_sample_importance_dsir,
    )

    target_vocab = "alpha beta gamma delta"
    other_vocab = "zeta eta theta iota"
    rows = []
    for i in range(10):  # target slice: en docs in target vocab
        rows.append((i, target_vocab, "en", "web", len(target_vocab)))
    for i in range(10, 18):  # raw: xx docs in their own vocab
        rows.append((i, other_vocab, "xx", "crawl", len(other_vocab)))
    rows.append((99, target_vocab, "xx", "crawl", len(target_vocab)))
    spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = q_sample_importance_dsir(spark, str(tmp_path)).collect()
    imp = {r.doc_id: r.importance for r in out}
    # the target-vocab xx doc scores with the en docs, above every
    # other-vocab doc
    assert imp[99] == imp[0]
    assert imp[99] > imp[10]
    # ranking is importance-desc: all target-vocab docs first
    first_block = [r.doc_id for r in out[: len(out) - 8]]
    assert 99 in first_block and 10 not in first_block


def test_consistent_k_group_exact_k_per_source(spark, sf_small):
    """Every source contributes min(k, |source|) survivors, ranks are
    contiguous from 1, and the survivors are exactly the k smallest
    (priority, doc_id) keys of their own source — per-group min-wise
    consistency."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        GROUP_SAMPLE_K,
        _PRIORITY_MOD,
        _PRIORITY_MULT,
        q_sample_consistent_k_group,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    rows = q_sample_consistent_k_group(spark, sf_small).collect()
    docs = load_table(spark, sf_small, "documents").select(
        "doc_id", "source"
    ).collect()
    by_src = {}
    for d in docs:
        pri = (d.doc_id % _PRIORITY_MOD) * _PRIORITY_MULT % _PRIORITY_MOD
        by_src.setdefault(d.source, []).append((pri, d.doc_id))
    got = {}
    for r in rows:
        got.setdefault(r.source, []).append((r.sample_rank, r.doc_id))
    for src, members in by_src.items():
        want = [d for _, d in sorted(members)[:GROUP_SAMPLE_K]]
        g = [d for _, d in sorted(got.get(src, []))]
        assert g == want, src
        ranks = sorted(rk for rk, _ in got[src])
        assert ranks == list(range(1, len(want) + 1))


def test_ngram_coverage_bounds(spark, sf_small):
    """Coverage is a fraction in [0, 1] and both held-out splits
    report; counts are consistent (covered ≤ total)."""
    from monasca_aggregator_spark.plans.pipeline_ops import (
        q_corpus_ngram_coverage,
    )

    rows = {r.split: r for r in q_corpus_ngram_coverage(spark, sf_small).collect()}
    assert set(rows) == {"val", "test"}
    for r in rows.values():
        assert 0 <= r.n_covered <= r.n_shingles
        assert 0.0 <= r.coverage <= 1.0


def test_neyman_beats_proportional_on_heteroscedastic_strata(
    spark, tmp_path
):
    """A big but CONSTANT stratum needs (almost) no samples under
    Neyman (σ_h = 0 → weight 0) while proportional allocation wastes
    most of the budget on it; a small varied stratum takes the whole
    Neyman budget."""
    import pandas as pd

    from monasca_aggregator_spark.plans.pipeline_ops import (
        _NEYMAN_BUDGET,
        q_sample_neyman_allocation,
    )

    rows = []
    did = 0
    # 'flat': 900 docs, all exactly 500 chars → sd 0
    for _ in range(900):
        rows.append((did, "x", "en", "flat", 500)); did += 1
    # 'varied': 100 docs alternating 100 / 10000 chars → big sd
    for i in range(100):
        rows.append(
            (did, "x", "en", "varied", 100 if i % 2 else 10000)
        )
        did += 1
    pd.DataFrame(
        rows,
        columns=["doc_id", "text", "lang", "source", "n_chars"],
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.source: r
        for r in q_sample_neyman_allocation(
            spark, str(tmp_path)
        ).collect()
    }
    flat, varied = out["flat"], out["varied"]
    assert flat.sd_chars == 0.0
    assert flat.neyman_k == 0 and flat.neyman_share == 0.0
    assert varied.neyman_k == _NEYMAN_BUDGET
    # proportional would have sent 90% of the budget to the flat one
    assert flat.proportional_k == 900
    assert varied.proportional_k == 100
