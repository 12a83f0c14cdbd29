"""``snapshot_table`` — stream FROM the log-structured snapshot table
(the Delta/Iceberg ``readStream`` analogue, r8): a Spark 4 Python
DataSource whose offsets are the table's committed VERSION numbers, so
every micro-batch is exactly the rows some commits added and a
restarted query resumes from its checkpoint with no side state at all
— the commit log IS the broker (contrast loadgen_source, whose
generator must persist its own high-water mark).

This closes the lakehouse loop: streams already write INTO the table
(``snapshot_sink`` / ``minhash_dedup_sink`` / ``ivf_index_sink``);
now a downstream pipeline can subscribe to the same table and see each
commit exactly once — e.g. index maintenance chained AFTER streaming
curation without re-reading the curated corpus.

Semantics: append-only change feed. A version's rows are the files
that version ADDED (its own commit group) — append commits feed their
new rows; an overwrite commit feeds its full new content (readers that
need update/delete granularity use ``snapshot_changes``' CDF
batch-side). Commits are immutable, so a replayed offset range yields
byte-identical rows — exactly-once end to end with an idempotent sink.

Options:
    path              snapshot table path (required)
    starting_version  LAST version to treat as already consumed;
                      serving begins at starting_version + 1.
                      Default 0 = serve everything already committed
                      ("1" skips the initial-load commit)

Schema: derived from the newest commit's first data file footer
(pyarrow, driver-side). Streaming across schema evolution is not
supported — restart the query to pick up a widened schema.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T


def _spark_type(pa_type) -> T.DataType:
    import pyarrow as pa

    if pa.types.is_int64(pa_type):
        return T.LongType()
    if pa.types.is_int32(pa_type):
        return T.IntegerType()
    if pa.types.is_float64(pa_type):
        return T.DoubleType()
    if pa.types.is_float32(pa_type):
        return T.FloatType()
    if pa.types.is_string(pa_type) or pa.types.is_large_string(pa_type):
        return T.StringType()
    if pa.types.is_boolean(pa_type):
        return T.BooleanType()
    if pa.types.is_binary(pa_type) or pa.types.is_large_binary(pa_type):
        return T.BinaryType()
    if pa.types.is_timestamp(pa_type):
        return T.TimestampType()
    if pa.types.is_date(pa_type):
        return T.DateType()
    if pa.types.is_list(pa_type) or pa.types.is_large_list(pa_type):
        return T.ArrayType(_spark_type(pa_type.value_type))
    raise ValueError(
        f"snapshot_table source: unsupported parquet type {pa_type}"
    )


def _table_schema(path: str) -> T.StructType:
    import pyarrow.parquet as pq

    from monasca_aggregator_spark.sources.table_log import (
        _file_groups,
        _read_commit,
        snapshot_versions,
    )

    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    record = _read_commit(path, versions[-1])
    first = next(
        f for g in _file_groups(record) for f in g["files"]
    )
    pa_schema = pq.ParquetFile(first).schema_arrow
    return T.StructType(
        [
            T.StructField(f.name, _spark_type(f.type), True)
            for f in pa_schema
        ]
    )


class _FilePartition(InputPartition):
    def __init__(self, file_path: str, fields: tuple):
        self.file_path = file_path
        self.fields = fields


class _TableStreamReader(DataSourceStreamReader):
    """Offset contract: ``{"version": n}`` = versions [1, n] consumed.
    ``latestOffset`` re-reads the commit log (the external truth), so
    an idle table plans empty batches and a restart can never regress
    — no side state, unlike generator-style sources."""

    def __init__(self, options: dict, schema: T.StructType):
        self._path = options["path"]
        self._schema = schema
        self._start = int(options.get("starting_version", 0))

    def initialOffset(self) -> dict:
        return {"version": self._start}

    def latestOffset(self) -> dict:
        from monasca_aggregator_spark.sources.table_log import (
            snapshot_versions,
        )

        versions = snapshot_versions(self._path)
        return {"version": versions[-1] if versions else self._start}

    def partitions(self, start: dict, end: dict):
        from monasca_aggregator_spark.sources.table_log import (
            _file_groups,
            _read_commit,
        )

        s, e = int(start["version"]), int(end["version"])
        fields = tuple(f.name for f in self._schema.fields)
        parts = []
        for v in range(s + 1, e + 1):
            record = _read_commit(self._path, v)
            # the files THIS commit added = its newest group's files
            # (append keeps parents' groups in front; overwrite has
            # exactly one group)
            new_group = _file_groups(record)[-1]
            parts.extend(
                _FilePartition(f, fields) for f in new_group["files"]
            )
        return parts

    def read(self, part: _FilePartition):
        import pyarrow as pa
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        table = pq.read_table(part.file_path)
        cols = []
        for name in part.fields:
            col = table.column(name)
            if (
                pa.types.is_timestamp(col.type)
                and col.type.tz is None
            ):
                # Spark writes parquet TIMESTAMP UTC-normalized but
                # pyarrow reads it tz-NAIVE; the Arrow row serializer
                # upstream tz_convert-s TimestampType values and
                # crashes on naive ones (r9: rate-source ts columns) —
                # stamp the UTC the writer meant.
                col = pc.assume_timezone(col, "UTC")
            cols.append(col.to_pylist())
        yield from zip(*cols)

    def commit(self, end: dict) -> None:
        pass  # the commit log needs nothing from the consumer


class SnapshotTableDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "snapshot_table"

    def schema(self) -> T.StructType:
        return _table_schema(self.options["path"])

    def streamReader(self, schema: T.StructType):
        return _TableStreamReader(self.options, schema)


def register(spark) -> None:
    spark.dataSource.register(SnapshotTableDataSource)
