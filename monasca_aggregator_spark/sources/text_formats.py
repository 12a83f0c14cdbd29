"""JSONL / CSV ingestion with corrupt-record quarantine.

Real training corpora arrive as line-delimited JSON and CSV long
before they are parquet; this module wires Spark's native readers
(JVM-side parsing, splittable inputs, pushdown-aware once the schema
is explicit) into the same table model the parquet catalog serves,
with the failure-handling posture an ingestion pipeline needs:

- **PERMISSIVE + quarantine**: malformed lines land in a
  ``_corrupt_record`` column instead of failing the job; the
  ``ingest_report`` aggregate turns that into the accept/reject gate
  (good/corrupt counts + a bounded sample of offending lines).
- **Explicit schemas**: schema inference reads the data twice and
  types by guesswork — both wrong at 100 TB. Callers pass the schema
  (or take the documents-table default) so the scan is single-pass
  and the reader can drop non-projected fields at parse time.
- **Splittability**: one JSON object per line (``multiLine=False``)
  keeps inputs splittable so a 1 GB shard fans across tasks. Gzip
  shards are NOT splittable (one task per file — size shards
  accordingly, or use zstd/bzip2); this is a property of the codec,
  not the reader, and is documented here because it is the #1
  ingestion-throughput foot-gun.

Reference parity: the reference consumes only Kafka JSON envelopes
(server.go); file-based JSONL/CSV ingestion is pipeline-extension
scope, and the envelope JSON parser in sources/envelope.py stays the
wire-format authority.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

CORRUPT_COL = "_corrupt_record"

DOCUMENTS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("n_chars", T.LongType(), True),
    ]
)


def _with_corrupt(schema: T.StructType) -> T.StructType:
    """Schema + the quarantine column (PERMISSIVE mode only populates
    it when it exists in the declared schema)."""
    if CORRUPT_COL in schema.fieldNames():
        return schema
    return T.StructType(
        list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType(), True)]
    )


def read_jsonl(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """Line-delimited JSON → DataFrame with malformed-line quarantine.

    ``mode``: PERMISSIVE (default — bad lines become rows with every
    data field NULL and the raw line in ``_corrupt_record``),
    DROPMALFORMED, or FAILFAST.
    """
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("mode", mode)
        .option("multiLine", "false")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.json(path)


def read_csv(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    header: bool = True,
    mode: str = "PERMISSIVE",
    sep: str = ",",
) -> DataFrame:
    """CSV → DataFrame, same quarantine contract as ``read_jsonl``.
    Quoted fields with embedded separators/newlines are handled by the
    JVM parser (``quote``/``escape`` defaults); ``multiLine`` stays
    off so inputs split — quote-embedded newlines need
    ``multiLine=true`` at the cost of one-task-per-file."""
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("header", str(header).lower())
        .option("mode", mode)
        .option("sep", sep)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.csv(path)


def read_xml(
    spark: SparkSession,
    path: str,
    schema: T.StructType = DOCUMENTS_SCHEMA,
    *,
    row_tag: str = "doc",
    mode: str = "PERMISSIVE",
) -> DataFrame:
    """XML → DataFrame via Spark 4's built-in XML source (one record
    per ``row_tag`` element), same quarantine contract as the other
    readers. XML records span lines, so inputs are NOT line-splittable
    like JSONL — shard the files instead (the reader parallelizes
    across files)."""
    reader = (
        spark.read.schema(_with_corrupt(schema))
        .option("rowTag", row_tag)
        .option("mode", mode)
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
    )
    return reader.format("xml").load(path)


def ingest_report(df: DataFrame, *, sample: int = 5) -> dict:
    """Accept/reject gate over a quarantined read: one aggregate pass
    for (rows, corrupt, good) plus a bounded sample of corrupt lines
    (a second tiny job over the corrupt subset only). Returns a plain
    dict so callers can raise/alert on thresholds."""
    if CORRUPT_COL not in df.columns:
        raise ValueError(f"input has no {CORRUPT_COL} column")
    # Spark disallows querying ONLY the corrupt column straight off a
    # raw file scan (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — the parsed
    # relation must be materialized first. Cache covers the report +
    # sample pair; at corpus scale land the parsed read in parquet and
    # report off that instead of caching raw text.
    df = df.cache()
    try:
        row = df.agg(
            F.count(F.lit(1)).alias("rows"),
            F.sum(
                F.col(CORRUPT_COL).isNotNull().cast("long")
            ).alias("corrupt"),
        ).collect()[0]
        corrupt = row.corrupt or 0
        examples = []
        if corrupt:
            examples = [
                r[0]
                for r in df.filter(F.col(CORRUPT_COL).isNotNull())
                .select(CORRUPT_COL)
                .limit(sample)
                .collect()
            ]
    finally:
        # both consumers (count + sample) ran above — release the
        # cached partitions instead of leaking them for the app
        # lifetime (r3 ADVICE)
        df.unpersist()
    return {
        "rows": row.rows,
        "corrupt": int(corrupt),
        "good": row.rows - int(corrupt),
        "corrupt_examples": examples,
    }


def quarantine_split(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """(good, quarantined): good rows lose the corrupt column;
    quarantined rows keep only the raw line — the write-audit-publish
    input shape (good → staging, quarantined → the reject store).
    Cached for the same corrupt-column-projection restriction as
    ``ingest_report``; the cache's lifetime is CALLER-owned — both
    returned frames are lazy views over the shared cached parent, so
    after materializing them (writes/collects) call
    ``release_quarantine_split(good)`` (or ``bad``) to free the cached
    partitions rather than leaking them for the application lifetime
    (r3 ADVICE)."""
    df = df.cache()
    good = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull()).select(CORRUPT_COL)
    good._quarantine_parent = df  # shared handle for release below
    bad._quarantine_parent = df
    return good, bad


def release_quarantine_split(part: DataFrame) -> None:
    """Unpersist the cached parent behind a ``quarantine_split``
    result once both halves have been materialized."""
    parent = getattr(part, "_quarantine_parent", None)
    if parent is not None:
        parent.unpersist()


def write_jsonl(df: DataFrame, path: str, *, shards: int | None = None) -> None:
    """Export as line-delimited JSON shards (the interchange format
    downstream tokenizer/training jobs read). ``shards`` repartitions
    for a target file count; omitted keeps the upstream layout."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").json(path)


def read_orc(
    spark: SparkSession,
    path: str | list[str],
    schema: T.StructType | None = None,
    *,
    merge_schema: bool = False,
) -> DataFrame:
    """ORC → DataFrame via Spark's built-in columnar ORC source.

    ORC is the second first-class columnar interchange format next to
    parquet (Hive/Trino-side pipelines commonly hand data over as
    ORC); the reader keeps the properties the 100 TB posture needs:
    column pruning and predicate pushdown reach the scan (min/max
    stripe + row-group statistics — asserted on the executed plan in
    tests/test_text_formats.py), inputs split per stripe, and the
    vectorized reader stays JVM-side. There is no quarantine contract
    here: ORC is self-describing binary — a damaged file fails the
    scan loudly rather than producing rows of nulls, which is the
    correct posture for a checksummed format (vs the line-oriented
    text readers above, where a bad LINE is recoverable). Passing
    ``schema`` pins column types up front (skips footer inference on
    huge file lists). ``merge_schema=True`` turns on name-based
    schema EVOLUTION across mixed-schema file sets: the read resolves
    to the union schema and files missing a column surface it as NULL
    (off by default — merging inspects every file's footer; without
    it the scan types from one footer, which is correct and cheaper
    for single-schema tables)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    if merge_schema:
        reader = reader.option("mergeSchema", "true")
    # NB: DataFrameReader.orc's extra positional params are OPTIONS
    # (mergeSchema, ...), so multiple paths must go as ONE list arg
    return reader.orc(path if isinstance(path, str) else list(path))


def write_orc(
    df: DataFrame,
    path: str,
    *,
    shards: int | None = None,
    compression: str = "zstd",
) -> None:
    """Export as ORC shards (zstd-compressed by default — the
    best-ratio splittable codec the built-in writer offers). Same
    sharding contract as ``write_jsonl``."""
    out = df.repartition(shards) if shards else df
    out.write.mode("overwrite").option("compression", compression).orc(path)
