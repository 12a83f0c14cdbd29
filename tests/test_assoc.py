"""plans/assoc.py semantics pins on hand-built data. The DuckDB
oracle gate covers full-output parity at sf0.01; these pin the
behaviors a hash can't explain (lift's independence baseline, the
star graph's −1 assortativity, exact NTILE decile shares, the bot
thresholds, G²'s independence zero)."""

from __future__ import annotations

from datetime import datetime, timezone


def _ts(sec):
    return datetime.fromtimestamp(sec, tz=timezone.utc)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


def _write_lineitem(spark, tmp_path, pairs):
    rows = [
        (o, p, 1, i, 1.0, 10.0, 0.0, 0.0, "N", "O", _ts(1000))
        for i, (o, p) in enumerate(pairs)
    ]
    _write(
        spark, tmp_path, "lineitem", rows,
        "l_orderkey long, l_partkey long, l_suppkey long,"
        " l_linenumber int, l_quantity double, l_extendedprice double,"
        " l_discount double, l_tax double, l_returnflag string,"
        " l_linestatus string, l_shipdate timestamp",
    )


def test_lift_against_independence(spark, tmp_path):
    """Pair (1,2) co-occurs in all 4 of each part's orders →
    lift = N·4/(4·4) = N/4; with 8 orders total that's 2.0 exactly.
    Confidence = 4/4 = 1."""
    pairs = []
    for o in range(4):  # orders 0..3 contain both 1 and 2
        pairs += [(o, 1), (o, 2)]
    for o in range(4, 8):  # 4 more orders with unrelated parts
        pairs += [(o, 10 + o), (o, 20 + o)]
    _write_lineitem(spark, tmp_path, pairs)
    from monasca_aggregator_spark.plans.assoc import (
        q_basket_association_lift,
    )

    out = q_basket_association_lift(spark, str(tmp_path)).collect()
    top = out[0]
    assert (top.p1, top.p2) == (1, 2)
    assert top.n_ab == 4
    assert top.lift == 2.0
    assert top.confidence == 1.0


def test_assortativity_star_is_minus_one(spark, tmp_path):
    """A perfect star (hub bought with each leaf in _LIFT_MINSUP
    orders) has every edge joining deg-k to deg-1 → r = −1."""
    pairs = []
    o = 0
    for leaf in range(1, 6):  # hub part 0, leaves 1..5
        for _ in range(2):  # support ≥ 2 per edge
            pairs += [(o, 0), (o, leaf)]
            o += 1
    _write_lineitem(spark, tmp_path, pairs)
    from monasca_aggregator_spark.plans.assoc import (
        q_graph_assortativity,
    )

    row = q_graph_assortativity(spark, str(tmp_path)).collect()[0]
    assert row.n_nodes == 6
    assert row.n_edges == 5
    assert row.assortativity == -1.0


def test_lorenz_decile_shares(spark, tmp_path):
    """10 customers with revenue 1..10 → one per decile, share of
    decile d = d/55, cum share = d(d+1)/110."""
    rows = [
        (i, i, "O", float(i), _ts(1000), "1-URGENT")
        for i in range(1, 11)
    ]
    _write(
        spark, tmp_path, "orders", rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_revenue_lorenz_deciles,
    )

    out = q_revenue_lorenz_deciles(spark, str(tmp_path)).collect()
    assert [r.decile for r in out] == list(range(1, 11))
    assert all(r.n_customers == 1 for r in out)
    assert out[0].revenue_cents == 100  # poorest customer first
    assert out[-1].cum_share == 1.0
    assert abs(out[-1].share - 10 / 55) < 1e-6  # stable_round(6)


def test_bot_flags_burst_and_rate(spark, tmp_path):
    """User 1 fires 10 events in one minute (burst ≥ 5 → bot); user 2
    spreads 10 events over 10 minutes (rate 1.0 < 2.0 → clean)."""
    rows = []
    eid = 0
    for i in range(10):
        rows.append((eid, _ts(30 + i), 1, "click", 1.0, "{}"))
        eid += 1
        rows.append((eid, _ts(i * 60), 2, "click", 1.0, "{}"))
        eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_events_bot_detection,
    )

    out = {
        r.user_id: r
        for r in q_events_bot_detection(spark, str(tmp_path)).collect()
    }
    assert out[1].bot_flag and out[1].max_per_minute == 10
    assert not out[2].bot_flag
    assert out[2].events_per_active_minute == 1.0


def test_ngram_paths_counts_ordered_trigrams(spark, tmp_path):
    """Two users walking a→b→c→d yield trigrams (a,b,c) and (b,c,d)
    twice each; ordering is by (ts, event_id) so same-ts ties are
    deterministic."""
    rows = []
    eid = 0
    for u in (1, 2):
        for i, e in enumerate("abcd"):
            rows.append((eid, _ts(i), u, e, 1.0, "{}"))
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_events_ngram_paths,
    )

    out = [
        ((r.e1, r.e2, r.e3), r.n)
        for r in q_events_ngram_paths(spark, str(tmp_path)).collect()
    ]
    assert out == [(("a", "b", "c"), 2), (("b", "c", "d"), 2)]


def test_g2_zero_under_independence_positive_under_association(
    spark, tmp_path
):
    """'x y' always adjacent (never apart) scores G² > 0; a bigram
    whose observed count equals its independence expectation scores
    exactly 0 after rounding."""
    docs = []
    # 'x y' 8 times: x only ever precedes y → strong association
    for i in range(8):
        docs.append((i, "x y", "en", "s", 3))
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_text_collocation_g2,
    )

    out = q_text_collocation_g2(spark, str(tmp_path)).collect()
    # only one bigram exists and it IS its own marginal: the 2x2
    # table degenerates to one cell, O == E everywhere → G² = 0
    assert [(r.w1, r.w2, r.g2) for r in out] == [("x", "y", 0.0)]


def test_simpson_diversity_extremes(spark, tmp_path):
    """A one-word source has D = 1 (any two tokens match); a
    same-count two-word source has D ≈ (2·n(n−1)/2)/(N(N−1))."""
    docs = [
        (1, "a a a a", "en", "mono", 7),
        (2, "a a b b", "en", "duo", 7),
    ]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_text_simpson_diversity,
    )

    out = {
        r.source: r
        for r in q_text_simpson_diversity(spark, str(tmp_path)).collect()
    }
    assert out["mono"].simpson == 1.0
    assert out["mono"].effective_vocab == 1.0
    # N=4, two words ×2: D = 2·(2·1)/(4·3) = 4/12
    assert abs(out["duo"].simpson - 4 / 12) < 1e-7  # stable_round(8)


def test_stopword_cosine_identical_and_disjoint(spark, tmp_path):
    """Sources with identical stopword profiles score 1; disjoint
    profiles score 0."""
    docs = [
        (1, "the of the of", "en", "s1", 9),
        (2, "the of the of the of", "en", "s2", 9),
        (3, "and in and in", "en", "s3", 9),
    ]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_text_stopword_cosine,
    )

    out = {
        (r.s1, r.s2): r.cosine
        for r in q_text_stopword_cosine(spark, str(tmp_path)).collect()
    }
    assert out[("s1", "s2")] == 1.0  # same direction, different norm
    assert ("s1", "s3") not in out  # no shared stopword → no dot row


def test_entropy_rate_deterministic_vs_uniform_chains(spark, tmp_path):
    """A deterministic cycle a→b→a→b has zero entropy rate
    (perplexity 1); the statistic rises once transitions branch."""
    rows = []
    eid = 0
    for u in range(5):
        for i in range(20):
            e = "a" if i % 2 == 0 else "b"
            rows.append((eid, _ts(i), u, e, 1.0, "{}"))
            eid += 1
    _write(
        spark, tmp_path, "events", rows,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_events_entropy_rate,
    )

    row = q_events_entropy_rate(spark, str(tmp_path)).collect()[0]
    assert row.n_transitions == 5 * 19
    assert row.n_states == 2
    assert row.entropy_rate_nats == 0.0
    assert row.perplexity == 1.0


def test_chao1_estimates_unseen_types(spark, tmp_path):
    """All-singletons: Chao1 blows past the observed count (many
    unseen types predicted); no singletons: Chao1 equals V and
    coverage is 1."""
    docs = [
        (1, "a b c d", "en", "rich", 7),       # 4 singletons
        (2, "x x y y z z", "en", "flat", 7),   # no singletons
    ]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    from monasca_aggregator_spark.plans.assoc import q_corpus_chao1

    out = {
        r.source: r
        for r in q_corpus_chao1(spark, str(tmp_path)).collect()
    }
    # rich: V=4, F1=4, F2=0 -> chao1 = 4 + 4*3/2 = 10
    assert out["rich"].chao1 == 10.0
    assert out["rich"].coverage == 0.0
    # flat: V=3, F1=0 -> chao1 = 3, coverage 1
    assert out["flat"].chao1 == 3.0
    assert out["flat"].coverage == 1.0


def test_mtld_repetitive_vs_diverse(spark, tmp_path):
    """A repetitive doc closes many factors (low MTLD); an
    all-distinct doc never closes one (unfactored, excluded from the
    mean); a mixed source averages only its scored docs."""
    rep = " ".join(["a a"] * 20)           # TTR collapses immediately
    div = " ".join(f"w{i}" for i in range(30))  # TTR stays 1
    docs = [
        (1, rep, "en", "rep", 7),
        (2, div, "en", "div", 7),
        (3, rep, "en", "mix", 7),
        (4, div, "en", "mix", 7),
    ]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    from monasca_aggregator_spark.plans.assoc import q_text_mtld

    out = {
        r.source: r for r in q_text_mtld(spark, str(tmp_path)).collect()
    }
    # "a a a a ...": factor completes every 2nd token -> MTLD = 2
    assert out["rep"].mean_mtld == 2.0
    assert out["rep"].n_unfactored == 0
    assert out["div"].n_unfactored == 1
    assert out["div"].mean_mtld is None  # no scored docs
    assert out["mix"].n_docs == 2 and out["mix"].n_unfactored == 1
    assert out["mix"].mean_mtld == 2.0  # only the repetitive doc scores


def test_lz_complexity_repetitive_vs_diverse(spark, tmp_path):
    """All-distinct tokens parse into n phrases (ratio 1); a cycled
    two-token pattern collapses into O(sqrt n) phrases (low ratio)."""
    div = " ".join(f"w{i}" for i in range(20))
    rep = " ".join(["a b"] * 20)
    docs = [(1, div, "en", "div", 7), (2, rep, "en", "rep", 7)]
    _write(
        spark, tmp_path, "documents", docs,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    from monasca_aggregator_spark.plans.assoc import (
        q_text_lz_complexity,
    )

    out = {
        r.source: r
        for r in q_text_lz_complexity(spark, str(tmp_path)).collect()
    }
    assert out["div"].mean_lz_ratio == 1.0
    assert out["rep"].mean_lz_ratio < 0.35
