"""Space-Saving heavy hitters (operators/heavyhitters.py): sequential
algorithm guarantees, Spark two-stage merge accuracy, and plan shape."""

from __future__ import annotations

import numpy as np

from monasca_aggregator_spark.operators.heavyhitters import (
    _space_saving,
    explode_tokens,
    guaranteed_heavy_hitters,
    heavy_hitters,
)


def _zipf_tokens(n, n_vocab, seed):
    rng = np.random.default_rng(seed)
    ranks = rng.zipf(1.3, n) % n_vocab
    return [f"tok{r}" for r in ranks]


def test_space_saving_bounds_state_and_frequency():
    toks = _zipf_tokens(50_000, 5_000, 3)
    cap = 256
    summary = _space_saving(toks, cap)
    assert len(summary) <= cap
    from collections import Counter

    truth = Counter(toks)
    for t, (cnt, err) in summary.items():
        # count is an upper bound; count - err a lower bound
        assert cnt >= truth[t] >= cnt - err
    # every item with true frequency > N/cap must be present
    for t, c in truth.items():
        if c > len(toks) / cap:
            assert t in summary


def test_spark_heavy_hitters_match_exact_top_k(spark):
    toks = _zipf_tokens(60_000, 2_000, 7)
    df = spark.createDataFrame([(t,) for t in toks], "token string")
    df = df.repartition(8)
    got = heavy_hitters(df, "token", k=10, capacity=1024).collect()

    from collections import Counter

    exact = Counter(toks).most_common(10)
    assert [r.token for r in got] == [t for t, _ in exact]
    for r, (t, c) in zip(got, exact):
        assert r.count_hi >= c >= r.count_lo

    # with ample capacity the top set is provably correct
    assert len(guaranteed_heavy_hitters(got, 10)) == 10


def test_spark_plan_shuffles_only_summaries(spark):
    df = spark.createDataFrame([("a",)] * 10, "token string")
    plan = heavy_hitters(df, "token", k=5, capacity=16)
    s = plan._jdf.queryExecution().executedPlan().toString()
    # the Space-Saving summary runs upstream of the exchange
    assert s.index("MapInPandas") > s.index("Exchange")


def test_explode_tokens_splits_whitespace(spark):
    df = spark.createDataFrame([("a b  c",), ("d",)], "text string")
    assert sorted(r.token for r in explode_tokens(df).collect()) == [
        "a",
        "b",
        "c",
        "d",
    ]
