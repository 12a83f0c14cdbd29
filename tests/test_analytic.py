"""Extended analytic shapes (plans/analytic.py): oracle equivalence at
sf0.001 plus plan-shape guards for the join strategies each shape is
designed around."""

from __future__ import annotations

import hashlib

import duckdb
import pytest

from monasca_aggregator_spark.plans import analytic
from tests.conftest import SF_SMALL, explain_str


def _norm(rows, columns):
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    lines = []
    for row in rows:
        vals = []
        for i in order:
            v = row[i]
            if isinstance(v, float):
                v = f"{v:.9g}"
            elif isinstance(v, bool):
                v = str(int(v))
            vals.append(str(v))
        lines.append("\x1f".join(vals))
    lines.sort()
    return hashlib.sha256("\n".join(lines).encode()).hexdigest()[:16]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in (
        "customer", "supplier", "part", "orders", "lineitem", "events",
        "documents", "nation", "region",
    ):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_SMALL}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.mark.parametrize("name", sorted(analytic.QUERIES))
def test_matches_oracle(spark, name, duck):
    df = analytic.QUERIES[name](spark, SF_SMALL)
    got = df.collect()
    got_hash = _norm([tuple(r) for r in got], df.columns)

    res = duck.execute(analytic.ORACLES[name])
    exp_rows = res.fetchall()
    exp_cols = [d[0] for d in res.description]

    assert sorted(df.columns) == sorted(exp_cols)
    assert len(got) == len(exp_rows)
    assert got_hash == _norm(exp_rows, exp_cols)


def test_semijoin_plan_is_left_semi(spark):
    plan = explain_str(analytic.q_tpch_q4_semijoin(spark, SF_SMALL))
    assert "LeftSemi" in plan


def test_antijoin_plan_is_left_anti_with_broadcast_scalar(spark):
    plan = explain_str(analytic.q_tpch_q22_antijoin(spark, SF_SMALL))
    assert "LeftAnti" in plan
    # the 1-row avg subquery must broadcast, not window
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "Window" not in plan


def test_q19_part_filter_pushed_and_broadcast(spark):
    plan = explain_str(analytic.q_tpch_q19_disjunct(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan
    assert "Brand#11" in plan  # brand pre-filter reaches the part scan


def test_argmax_broadcasts_group_maxima(spark):
    plan = explain_str(analytic.q_argmax_per_group(spark, SF_SMALL))
    assert "BroadcastHashJoin" in plan


def _n_shuffles(plan: str) -> int:
    # formatted explain prints each node in the tree AND the detail
    # section; count only detail headers like "(4) Exchange"
    import re

    return len(re.findall(r"\(\d+\) Exchange\b", plan))


def test_rollup_single_shuffle(spark):
    plan = explain_str(analytic.q_rollup_pricing(spark, SF_SMALL))
    assert _n_shuffles(plan) == 1


def test_pivot_no_distinct_job(spark):
    # explicit value list ⇒ the plan is a plain one-shuffle aggregate
    plan = explain_str(analytic.q_pivot_events_user(spark, SF_SMALL))
    assert _n_shuffles(plan) == 1


def test_weighted_median_hand_case(spark, tmp_path):
    """Weights shift the median away from the unweighted one: prices
    [1,2,3] with weights [1,1,8] → weighted median 3 (cum 10/2=5
    first reached at price 3); unweighted median would be 2."""
    import pandas as pd

    from monasca_aggregator_spark.plans.analytic import q_weighted_median

    rows = [
        ("A", 1.0, 1.0, 1, 1),
        ("A", 2.0, 1.0, 1, 2),
        ("A", 3.0, 8.0, 1, 3),
        # group B: equal weights → lower median of [5,7] is 5... cum at
        # price 5 is 1, 2*1 >= 2 ⇒ picks 5
        ("B", 5.0, 1.0, 2, 1),
        ("B", 7.0, 1.0, 2, 2),
    ]
    pd.DataFrame(
        rows,
        columns=[
            "l_returnflag", "l_extendedprice", "l_quantity",
            "l_orderkey", "l_linenumber",
        ],
    ).to_parquet(tmp_path / "lineitem.parquet")
    got = {
        r.l_returnflag: (r.weighted_median_price, r.total_weight)
        for r in q_weighted_median(spark, str(tmp_path)).collect()
    }
    assert got == {"A": (3.0, 10), "B": (5.0, 2)}
