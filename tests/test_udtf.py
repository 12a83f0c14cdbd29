"""Python UDTF surface (operators/udtf_ops.py): the lateral-join
sentence exploder must reproduce the JVM posexplode unit split
row-for-row, register idempotently, and handle NULL/empty text."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.udtf_ops import register_udtfs


def _jvm_units(docs):
    return docs.select(
        "doc_id",
        F.posexplode(
            F.filter(
                F.transform(
                    F.split(F.col("text"), r"\."), lambda s: F.trim(s)
                ),
                lambda s: s != "",
            )
        ).alias("unit_idx", "unit"),
    )


def test_udtf_matches_jvm_split(spark):
    register_udtfs(spark)
    docs = spark.createDataFrame(
        [
            (1, "One. Two sentences here.  Three!?"),
            (2, "no terminator at all"),
            (3, "...."),
            (4, ""),
            (5, None),
            (6, " padded .  units . "),
            # tab/newline-adjacent units: F.trim strips ONLY ASCII
            # space, and the UDTF must agree (strip(' '), not the
            # all-Unicode-whitespace str.strip())
            (7, "tab\there.\n newline led . trailing tab\t. x"),
            (8, "\nlead. mid \t mid. trail\n"),
        ],
        "doc_id long, text string",
    )
    docs.createOrReplaceTempView("udtf_docs")
    got = spark.sql(
        "SELECT u.doc_id, u.unit_idx, u.unit "
        "FROM udtf_docs d, LATERAL split_sentences(d.doc_id, d.text) u"
    )
    want = _jvm_units(docs)
    assert sorted(got.collect()) == sorted(want.collect())


def test_udtf_register_idempotent(spark):
    register_udtfs(spark)
    register_udtfs(spark)  # re-register must not raise
    n = spark.sql(
        "SELECT count(*) FROM (SELECT 7 AS doc_id, 'a. b' AS text) t, "
        "LATERAL split_sentences(t.doc_id, t.text)"
    ).first()[0]
    assert n == 2
