"""plans/audits.py semantics the zero-PII synthetic corpus can't
exercise: nonzero PII counting, injected money mismatches, and
redelivery accounting on hand-built rows."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.plans.audits import _PII_PATTERNS


def test_pii_patterns_count_real_matches(spark):
    """The driver corpus contains no PII at all (the oracle run checks
    plumbing on zeros), so pin the actual counting here: Spark's
    regexp_count over the shared patterns vs Python re on the same
    text."""
    import re

    docs = [
        (1, "s1", "mail me at a.b+c@ex-ample.co.uk or x@y.io thanks"),
        (2, "s1", "see https://spark.apache.org/docs and http://a.b/c?q=1"),
        (3, "s2", "host 10.0.0.1 talks to 192.168.1.254 and 8.8.8.8"),
        (4, "s2", "no pii here, just words"),
        (5, "s2", None),
    ]
    df = spark.createDataFrame(docs, "doc_id long, source string, text string")
    got = df.select(
        *[
            F.sum(
                F.regexp_count(F.col("text"), F.lit(pat)).cast("long")
            ).alias(kind)
            for kind, pat in _PII_PATTERNS.items()
        ]
    ).first()
    for kind, pat in _PII_PATTERNS.items():
        expected = sum(
            len(re.findall(pat, t or "")) for _, _, t in docs
        )
        assert got[kind] == expected, (kind, got[kind], expected)
    assert got["email"] == 2 and got["url"] == 2 and got["ipv4"] == 3


def test_orders_consistency_flags_injected_mismatch(spark):
    """Recompute-vs-stored reconciliation: a tampered order total and
    a lineitem-less order are both flagged; clean orders are not."""
    from monasca_aggregator_spark.plans import audits

    orders = spark.createDataFrame(
        [
            (1, "1-URGENT", 216.00),   # = recomputed (200 * .9 * 1.2)
            (2, "1-URGENT", 999.99),   # tampered
            (3, "2-HIGH", 50.00),      # no lineitems
        ],
        "o_orderkey long, o_orderpriority string, o_totalprice double",
    )
    li = spark.createDataFrame(
        [
            (1, 200.00, 0.10, 0.20),
            (2, 100.00, 0.00, 0.00),
        ],
        "l_orderkey long, l_extendedprice double, l_discount double,"
        " l_tax double",
    )
    # drive the same expressions the query builds, on local relations
    line_e6 = (
        audits._e2(F.col("l_extendedprice"))
        * (F.lit(100) - audits._e2(F.col("l_discount")))
        * (F.lit(100) + audits._e2(F.col("l_tax")))
    )
    per_order = li.select("l_orderkey", line_e6.alias("e6")).groupBy(
        "l_orderkey"
    ).agg(F.sum("e6").alias("recomputed_e6"))
    j = orders.select(
        F.col("o_orderkey").alias("l_orderkey"),
        "o_orderpriority",
        (audits._e2(F.col("o_totalprice")) * F.lit(10_000)).alias(
            "stored_e6"
        ),
    ).join(per_order, "l_orderkey", "left")
    rows = {r.l_orderkey: r for r in j.collect()}
    assert rows[1].stored_e6 == rows[1].recomputed_e6
    assert rows[2].stored_e6 != rows[2].recomputed_e6
    assert rows[3].recomputed_e6 is None


def test_dup_rate_counts_redeliveries(spark):
    """(user, type, ts) identity: 3 copies of one event = 2
    redeliveries; distinct events contribute zero."""
    import datetime as dt

    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        (1, "click", t0),
        (1, "click", t0),
        (1, "click", t0),
        (2, "view", t0),
        (1, "click", t0.replace(hour=13)),
    ]
    df = spark.createDataFrame(
        rows, "user_id long, event_type string, ts timestamp"
    )
    per_key = df.groupBy(
        F.date_trunc("day", "ts").alias("day"), "user_id",
        "event_type", "ts",
    ).agg(F.count(F.lit(1)).alias("c"))
    day = per_key.groupBy("day").agg(
        F.sum("c").alias("n_events"),
        F.count(F.lit(1)).alias("n_identities"),
        F.sum(F.col("c") - 1).alias("n_redelivered"),
    ).first()
    assert (day.n_events, day.n_identities, day.n_redelivered) == (5, 3, 2)


def test_jsd_bounds_identical_zero_disjoint_ln2(spark, tmp_path):
    """JSD must live in [0, ln 2]: two sources with IDENTICAL token
    distributions score ~0, two sources with DISJOINT vocabularies
    score ~ln 2 (add-1 smoothing keeps it slightly below). Pins the
    ln-2 inflation fixed in round 6 (every jsd used to carry a +ln 2
    term, so identical sources reported jsd = ln 2)."""
    import math

    from monasca_aggregator_spark.plans.audits import q_text_jsd_by_source

    ln2 = math.log(2.0)

    def run(rows):
        d = tmp_path / "docs"
        spark.createDataFrame(
            rows,
            "doc_id long, text string, lang string, source string,"
            " n_chars long",
        ).write.mode("overwrite").parquet(str(d / "documents.parquet"))
        return {
            r.source: r for r in q_text_jsd_by_source(spark, str(d)).collect()
        }

    same = ("alpha beta gamma delta " * 125).strip()  # 500 tokens/doc
    identical = run(
        [(i, same, "en", "sA" if i % 2 else "sB", len(same))
         for i in range(1, 41)]
    )
    for r in identical.values():
        assert abs(r.jsd) < 0.01, r
        assert abs(r.jsd_normalized) < 0.02, r

    a_text = ("aardvark " * 500).strip()
    b_text = ("zebra " * 500).strip()
    disjoint = run(
        [(i, a_text if i % 2 else b_text, "en",
          "sA" if i % 2 else "sB", 100) for i in range(1, 41)]
    )
    for r in disjoint.values():
        assert 0.9 * ln2 <= r.jsd <= ln2 + 1e-6, r
        assert 0.9 <= r.jsd_normalized <= 1.0 + 1e-6, r


def test_corpus_checksum_fingerprint_semantics(spark, tmp_path):
    """corpus_checksum_by_source: the fingerprint is the TUPLE (docs,
    distinct, chars, xor) — xor alone has multiset-parity semantics
    (an even-multiplicity text cancels), which the counts disambiguate;
    the checksum is invariant to the exact-dedup cosmetic
    normalization and changes when any content byte changes."""
    import shutil

    from monasca_aggregator_spark.plans.audits import (
        q_corpus_checksum_by_source,
    )

    def run(rows, name):
        d = tmp_path / name
        spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string,"
            " n_chars long"
        ).write.parquet(str(d / "documents.parquet"))
        out = {
            r.source: r
            for r in q_corpus_checksum_by_source(spark, str(d)).collect()
        }
        shutil.rmtree(d)
        return out

    base = [
        (1, "Alpha beta GAMMA", "en", "s", 16),
        (2, "delta epsilon", "en", "s", 13),
    ]
    a = run(base, "a")["s"]

    # cosmetic normalization invariance: case/punct/whitespace changes
    # that exact dedup ignores leave the fingerprint IDENTICAL
    cosmetic = [
        (1, "alpha  beta gamma!!", "en", "s", 16),
        (2, "DELTA epsilon.", "en", "s", 13),
    ]
    b = run(cosmetic, "b")["s"]
    assert (a.content_xor, a.distinct_texts) == (
        b.content_xor,
        b.distinct_texts,
    )

    # any content change moves the xor
    changed = run(
        [(1, "alpha beta gamma", "en", "s", 16),
         (2, "delta zeta", "en", "s", 10)], "c"
    )["s"]
    assert changed.content_xor != a.content_xor

    # parity: duplicating a text an EVEN number of times cancels in the
    # xor — the docs/distinct counts are what catch it (documented)
    doubled = run(
        base + [(3, "alpha beta gamma", "en", "s", 16),
                (4, "ALPHA BETA gamma", "en", "s", 16)], "d"
    )["s"]
    assert doubled.content_xor == a.content_xor
    assert doubled.docs == a.docs + 2
    assert doubled.distinct_texts == a.distinct_texts


def test_duplicate_invoice_screen_catches_injected_dupes(spark, tmp_path):
    """orders_duplicate_invoices: spec-generated TPC-H data has ZERO
    same-customer-same-cents collisions (verified — the 0-row result
    on clean data IS the correct audit outcome), so the detector is
    pinned on injected duplicates: same customer + same cents within
    the window fires; a different customer, a different amount, or a
    gap past the window does not."""
    import datetime as dt

    from monasca_aggregator_spark.plans.audits import (
        q_orders_duplicate_invoices,
    )

    def d(day):
        return dt.datetime(1995, 3, day)

    rows = [
        # pair: same cust, same cents, 2 days apart -> fires
        (1, 100, "O", 1234.56, d(1), "1-URGENT"),
        (2, 100, "O", 1234.56, d(3), "1-URGENT"),
        # same cust + cents but 20 days apart -> outside window
        (3, 100, "O", 1234.56, d(23), "1-URGENT"),
        # same cents, different customer -> no pair
        (4, 200, "O", 1234.56, d(2), "1-URGENT"),
        # same cust, different cents -> no pair
        (5, 100, "O", 1234.57, d(2), "1-URGENT"),
        # triple: one customer, three identical orders in 3 days ->
        # 3 pairs, 3 orders involved
        (6, 300, "O", 50.00, d(10), "2-HIGH"),
        (7, 300, "O", 50.00, d(11), "2-HIGH"),
        (8, 300, "O", 50.00, d(12), "2-HIGH"),
    ]
    df = spark.createDataFrame(
        rows,
        "o_orderkey long, o_custkey long, o_orderstatus string,"
        " o_totalprice double, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    df.write.parquet(str(tmp_path / "orders.parquet"))
    got = {
        r.month: r
        for r in q_orders_duplicate_invoices(
            spark, str(tmp_path)
        ).collect()
    }
    assert set(got) == {"1995-03"}
    r = got["1995-03"]
    # pairs: (1,2) + the triple's (6,7),(6,8),(7,8) = 4
    assert r.n_pairs == 4
    # orders involved: 1,2,6,7,8
    assert r.n_orders_involved == 5
    # dollars at risk = 1234.56 + 3*50.00
    assert abs(r.dollars_at_risk - (1234.56 + 150.0)) < 1e-6
