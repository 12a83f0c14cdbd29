"""Two-phase distributed skyline vs a brute-force dominance oracle."""

from __future__ import annotations

import itertools
import random

import pytest

from monasca_aggregator_spark.operators.skyline import skyline


def _brute(points, senses):
    def better(d, x):
        ge = all(
            (dv >= xv if s == "max" else dv <= xv)
            for dv, xv, s in zip(d, x, senses)
        )
        gt = any(
            (dv > xv if s == "max" else dv < xv)
            for dv, xv, s in zip(d, x, senses)
        )
        return ge and gt

    return sorted(
        i
        for i, x in enumerate(points)
        if not any(better(d, x) for d in points)
    )


@pytest.mark.parametrize("senses", [("max", "max"), ("max", "min")])
@pytest.mark.parametrize(
    "kwargs",
    [
        {},  # auto → 2-D JVM sweep fast path
        {"algo": "generic"},
        {"algo": "generic", "prefilter": True},
    ],
)
def test_skyline_matches_brute_force(spark, senses, kwargs):
    rng = random.Random(42)
    pts = [(rng.randrange(100), rng.randrange(100)) for _ in range(300)]
    df = spark.createDataFrame(
        [(i, a, b) for i, (a, b) in enumerate(pts)], "id long, x long, y long"
    ).repartition(8)
    got = sorted(
        r.id
        for r in skyline(
            df, [("x", senses[0]), ("y", senses[1])], **kwargs
        ).collect()
    )
    assert got == _brute(pts, senses)


def test_skyline_2d_fast_path_handles_nulls_like_generic(spark):
    """NULL-dim rows are mutually non-dominated and always kept —
    identical semantics on the JVM sweep and the Arrow generic path."""
    rows = [
        (0, 10, 1),
        (1, None, 0),
        (2, 5, None),
        (3, 1, 10),
        (4, 5, 5),
        (5, 10, 1),  # tie of id 0 — both survive
        (6, 4, 4),  # dominated by (5,5)
    ]
    df = spark.createDataFrame(rows, "id long, x long, y long")
    fast = sorted(
        r.id for r in skyline(df, [("x", "max"), ("y", "max")]).collect()
    )
    gen = sorted(
        r.id
        for r in skyline(
            df, [("x", "max"), ("y", "max")], algo="generic"
        ).collect()
    )
    assert fast == gen == [0, 1, 2, 3, 4, 5]


def test_skyline_keeps_ties_and_three_dims(spark):
    pts = [(5, 5, 5), (5, 5, 5), (4, 6, 5), (4, 4, 4), (6, 1, 1)]
    df = spark.createDataFrame(
        [(i, *p) for i, p in enumerate(pts)], "id long, x long, y long, z long"
    ).repartition(3)
    got = sorted(
        r.id
        for r in skyline(df, [("x", "max"), ("y", "max"), ("z", "max")]).collect()
    )
    # both identical (5,5,5) rows survive (mutual non-dominance);
    # (4,4,4) is dominated by (5,5,5); (4,6,5) and (6,1,1) survive
    assert got == _brute(pts, ("max", "max", "max")) == [0, 1, 2, 4]


def test_skyline_partition_invariance(spark):
    rng = random.Random(7)
    pts = [(rng.randrange(20), rng.randrange(20)) for _ in range(120)]
    results = []
    for nparts in (1, 4, 13):
        df = spark.createDataFrame(
            [(i, a, b) for i, (a, b) in enumerate(pts)],
            "id long, x long, y long",
        ).repartition(nparts)
        results.append(
            sorted(
                r.id
                for r in skyline(df, [("x", "max"), ("y", "min")]).collect()
            )
        )
    assert results[0] == results[1] == results[2]
