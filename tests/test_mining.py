"""plans/mining.py semantics pins on hand-built data. The DuckDB
oracle gate covers full-output parity at sf0.01; these pin the
protocol behaviors a hash can't explain (leave-last-out split rules,
wedge-not-edge candidate generation, exact symbolization)."""

from __future__ import annotations

from datetime import datetime, timezone

DAY = 86_400


def _ts(day, sec=0):
    return datetime.fromtimestamp(day * DAY + sec, tz=timezone.utc)


def _write(spark, tmp_path, name, rows, schema):
    spark.createDataFrame(rows, schema).write.mode("overwrite").parquet(
        str(tmp_path / f"{name}.parquet")
    )


# ------------------------------------------- recsys_popularity_hitrate


def test_recsys_protocol_split_and_hits(spark, tmp_path):
    """Leave-LAST-order-out: single-order customers never test; the
    held-out order leaves train; hit ⇔ the test basket intersects the
    popularity top-10."""
    from monasca_aggregator_spark.plans.mining import (
        q_recsys_popularity_hitrate,
    )

    orders, lineitem, customers = [], [], []
    # 10 fillers (segment F): first order buys ALL of parts 100..109
    # (making them the unambiguous top-10), later TEST order buys part
    # 100 → every filler hits.
    for i in range(10):
        ck, o_train, o_test = 100 + i, 1000 + i, 2000 + i
        customers.append((ck, "F"))
        orders.append((o_train, ck, _ts(1)))
        orders.append((o_test, ck, _ts(5)))
        lineitem.extend((o_train, p) for p in range(100, 110))
        lineitem.append((o_test, 100))
    # segment A: c1's test order holds only the never-trained part 115
    # → miss; c2 has ONE order → excluded from the test population.
    customers += [(1, "A"), (2, "A")]
    orders += [(10, 1, _ts(1)), (11, 1, _ts(5)), (12, 2, _ts(1))]
    lineitem += [(10, 100), (11, 115), (12, 101)]
    # segment B: c3's later order re-buys popular part 100 → hit.
    customers += [(3, "B")]
    orders += [(20, 3, _ts(2)), (21, 3, _ts(6))]
    lineitem += [(20, 101), (21, 100)]

    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    _write(
        spark, tmp_path, "lineitem", lineitem,
        "l_orderkey long, l_partkey long",
    )
    _write(
        spark, tmp_path, "customer",
        customers,
        "c_custkey long, c_mktsegment string",
    )

    out = {
        r["segment"]: r
        for r in q_recsys_popularity_hitrate(
            spark, str(tmp_path)
        ).collect()
    }
    assert out["F"]["n_test_users"] == 10
    assert out["F"]["n_hits"] == 10
    assert out["A"]["n_test_users"] == 1  # c2 (1 order) excluded
    assert out["A"]["n_hits"] == 0  # part 115 is not popular
    assert out["B"]["n_hits"] == 1
    assert abs(out["F"]["hitrate_at_10"] - 1.0) < 1e-9


def test_recsys_heldout_order_leaves_train(spark, tmp_path):
    """A part bought ONLY in held-out orders has zero train users, so
    it cannot enter the recommendation list (the leakage the split
    exists to prevent)."""
    from monasca_aggregator_spark.plans.mining import (
        q_recsys_popularity_hitrate,
    )

    orders, lineitem, customers = [], [], []
    # 11 customers: train orders cover parts 0..10 (one user each);
    # every TEST order buys part 99 only. If test orders leaked into
    # train, part 99 (11 "train" users) would top the list and every
    # customer would hit; correctly split, nobody hits.
    for i in range(11):
        customers.append((i, "S"))
        orders.append((10 + i, i, _ts(1)))
        orders.append((50 + i, i, _ts(5)))
        lineitem.append((10 + i, i))
        lineitem.append((50 + i, 99))
    _write(
        spark, tmp_path, "orders", orders,
        "o_orderkey long, o_custkey long, o_orderdate timestamp",
    )
    _write(
        spark, tmp_path, "lineitem", lineitem,
        "l_orderkey long, l_partkey long",
    )
    _write(
        spark, tmp_path, "customer", customers,
        "c_custkey long, c_mktsegment string",
    )
    rows = q_recsys_popularity_hitrate(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["n_test_users"] == 11
    assert rows[0]["n_hits"] == 0


# ----------------------------------------------- graph_link_prediction


def test_link_prediction_wedge_not_edge(spark, tmp_path):
    """Edges (1,2) and (2,3) at support 2 with no (1,3) basket →
    exactly the candidate (1,3): cn=1, degrees 1/1, Jaccard 1.0.
    Support-1 co-occurrence must NOT create an edge."""
    from monasca_aggregator_spark.plans.mining import (
        q_graph_link_prediction,
    )

    baskets = {
        1: [1, 2], 2: [1, 2],  # edge (1,2) support 2
        3: [2, 3], 4: [2, 3],  # edge (2,3) support 2
        5: [3, 7],             # support 1 → no edge, no wedge via 3
    }
    lineitem = [
        (ok, p) for ok, parts in baskets.items() for p in parts
    ]
    _write(
        spark, tmp_path, "lineitem", lineitem,
        "l_orderkey long, l_partkey long",
    )
    rows = q_graph_link_prediction(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["part_a"], r["part_b"]) == (1, 3)
    assert r["common_neighbors"] == 1
    assert (r["deg_a"], r["deg_b"]) == (1, 1)
    assert abs(r["neighbor_jaccard"] - 1.0) < 1e-9


def test_link_prediction_excludes_existing_edges(spark, tmp_path):
    """A triangle's wedges all close — a fully-connected support-2
    clique yields zero predictions."""
    from monasca_aggregator_spark.plans.mining import (
        q_graph_link_prediction,
    )

    lineitem = [
        (ok, p) for ok in (1, 2) for p in (1, 2, 3)
    ]  # two identical {1,2,3} baskets: all three edges exist
    _write(
        spark, tmp_path, "lineitem", lineitem,
        "l_orderkey long, l_partkey long",
    )
    assert q_graph_link_prediction(spark, str(tmp_path)).count() == 0


# --------------------------------------------------- metric_sax_motifs


def test_sax_symbols_and_motif_ranking(spark, tmp_path):
    """A linear ramp symbolizes to 0,1,2,3 (equal-width integer
    buckets) → motifs 012 and 123; a constant series degenerates to
    symbol 0 and motif 000."""
    from monasca_aggregator_spark.plans.mining import (
        q_metric_sax_motifs,
    )

    events = []
    eid = 0
    # ramp metric: hourly sums 0, 10, 20, 30 (e2 units)
    for h, v in enumerate([0.00, 0.10, 0.20, 0.30]):
        events.append((eid, _ts(1, h * 3600), 1, "ramp", v, "{}"))
        eid += 1
    # constant metric: five identical hours
    for h in range(5):
        events.append((eid, _ts(1, h * 3600), 1, "flat", 0.42, "{}"))
        eid += 1
    _write(
        spark, tmp_path, "events", events,
        "event_id long, ts timestamp, user_id long,"
        " event_type string, value double, props string",
    )
    out = q_metric_sax_motifs(spark, str(tmp_path)).collect()
    ramp = sorted(
        [(r["rank"], r["motif"], r["n"]) for r in out
         if r["event_type"] == "ramp"]
    )
    assert ramp == [(1, "012", 1), (2, "123", 1)]
    flat = [(r["rank"], r["motif"], r["n"]) for r in out
            if r["event_type"] == "flat"]
    assert flat == [(1, "000", 3)]
