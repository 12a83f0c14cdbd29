"""JSONL/CSV ingestion: lossless roundtrip from the real documents
parquet, corrupt-line quarantine, report gate, good/bad split."""

from __future__ import annotations

import glob
import json

import pytest

from monasca_aggregator_spark.sources.tables import load_table
from monasca_aggregator_spark.sources.text_formats import (
    CORRUPT_COL,
    ingest_report,
    quarantine_split,
    read_csv,
    read_jsonl,
    write_jsonl,
)


def _docs_fingerprint(df):
    rows = df.select("doc_id", "text", "lang", "source", "n_chars").collect()
    return sorted((r.doc_id, r.text, r.lang, r.source, r.n_chars) for r in rows)


def test_jsonl_roundtrip_is_lossless(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "docs_jsonl")
    write_jsonl(docs, path, shards=3)
    assert len(glob.glob(path + "/part-*")) == 3
    back = read_jsonl(spark, path)
    assert ingest_report(back)["corrupt"] == 0
    assert _docs_fingerprint(back) == _docs_fingerprint(docs)


def test_jsonl_corrupt_lines_are_quarantined_not_fatal(spark, tmp_path):
    p = tmp_path / "mixed.jsonl"
    lines = [
        json.dumps({"doc_id": 1, "text": "ok one", "lang": "en",
                    "source": "s", "n_chars": 6}),
        "{definitely not json",
        json.dumps({"doc_id": 2, "text": "ok two", "lang": "en",
                    "source": "s", "n_chars": 6}),
        '{"doc_id": "not-a-number", "text": 3}',  # type mismatch
    ]
    p.write_text("\n".join(lines) + "\n")
    df = read_jsonl(spark, str(p))
    rep = ingest_report(df)
    assert rep["rows"] == 4
    assert rep["corrupt"] == 2 and rep["good"] == 2
    assert any("not json" in e for e in rep["corrupt_examples"])
    good, bad = quarantine_split(df)
    assert sorted(r.doc_id for r in good.collect()) == [1, 2]
    assert CORRUPT_COL not in good.columns
    assert bad.count() == 2


def test_csv_roundtrip_with_quoted_separators(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "docs_csv")
    docs.write.mode("overwrite").option("header", "true").csv(path)
    back = read_csv(spark, str(path))
    assert ingest_report(back)["corrupt"] == 0
    assert _docs_fingerprint(back) == _docs_fingerprint(docs)
    # embedded separators/quotes survive the JVM parser
    tricky = spark.createDataFrame(
        [(9, 'a,"quoted",b', "en", "s", 12)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    p2 = str(tmp_path / "tricky_csv")
    tricky.write.mode("overwrite").option("header", "true").csv(p2)
    got = read_csv(spark, p2).collect()[0]
    assert got.text == 'a,"quoted",b'


def test_csv_malformed_rows_quarantined(spark, tmp_path):
    p = tmp_path / "bad.csv"
    p.write_text(
        "doc_id,text,lang,source,n_chars\n"
        "1,hello,en,s,5\n"
        "oops,this,row,is,not-a-number\n"
    )
    df = read_csv(spark, str(p))
    rep = ingest_report(df)
    assert rep == {
        "rows": 2,
        "corrupt": 1,
        "good": 1,
        "corrupt_examples": ["oops,this,row,is,not-a-number"],
    }


def test_xml_roundtrip_and_quarantine(spark, sf_small, tmp_path):
    """Spark 4's built-in XML source under the same quarantine
    contract: documents roundtrip losslessly via XML shards; a
    type-mismatched record quarantines instead of failing."""
    from monasca_aggregator_spark.sources.text_formats import read_xml

    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "docs_xml")
    docs.write.mode("overwrite").option("rowTag", "doc").format("xml").save(
        path
    )
    back = read_xml(spark, path)
    assert ingest_report(back)["corrupt"] == 0
    assert _docs_fingerprint(back) == _docs_fingerprint(docs)

    p = tmp_path / "bad.xml"
    p.write_text(
        "<rows>"
        "<doc><doc_id>1</doc_id><text>ok</text><lang>en</lang>"
        "<source>s</source><n_chars>2</n_chars></doc>"
        "<doc><doc_id>not-a-number</doc_id><text>bad</text></doc>"
        "</rows>"
    )
    rep = ingest_report(read_xml(spark, str(p)))
    assert rep["rows"] == 2 and rep["corrupt"] == 1 and rep["good"] == 1


def test_failfast_mode_raises(spark, tmp_path):
    p = tmp_path / "bad.jsonl"
    p.write_text('{"doc_id": 1}\nnot json\n')
    with pytest.raises(Exception):
        read_jsonl(spark, str(p), mode="FAILFAST").collect()


def test_ingest_report_requires_quarantine_column(spark):
    df = spark.createDataFrame([(1,)], "x long")
    with pytest.raises(ValueError, match=CORRUPT_COL):
        ingest_report(df)


def test_orc_roundtrip_pushdown_and_evolution(spark, sf_small, tmp_path):
    """ORC ingestion: lossless roundtrip, predicate pushdown + column
    pruning reaching the executed scan, and name-based schema
    evolution (older files' missing column reads as NULL)."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.text_formats import (
        read_orc,
        write_orc,
    )
    from tests.conftest import explain_str

    docs = load_table(spark, sf_small, "documents")
    path = str(tmp_path / "docs_orc")
    write_orc(docs, path, shards=3)
    assert len(glob.glob(path + "/part-*.orc")) == 3
    back = read_orc(spark, path)
    assert _docs_fingerprint(back) == _docs_fingerprint(docs)

    # pushdown + pruning: the filter and the 2-column projection must
    # reach the ORC scan, not run post-scan over all columns
    q = back.filter(F.col("doc_id") < 10).select("doc_id", "n_chars")
    plan = explain_str(q)
    assert "PushedFilters" in plan and "doc_id" in plan.split("PushedFilters")[1][:200]
    read_schema = plan.split("ReadSchema")[1][:200]
    assert "text" not in read_schema and "n_chars" in read_schema

    # schema evolution: a second shard carries an extra column; the
    # union read resolves by NAME, old files' missing column -> NULL
    evolved = docs.limit(5).withColumn("quality", F.lit(0.5))
    write_orc(evolved, path + "/extra", shards=1)
    merged = read_orc(spark, [path, path + "/extra"], merge_schema=True)
    assert "quality" in merged.columns
    n_null = merged.filter(F.col("quality").isNull()).count()
    assert n_null == docs.count()  # every original row, none of the 5
