"""Log-structured snapshot table: versioned datasets with time travel.

The missing piece between the writers (sources/sinks.py) and a
reproducible training run: a dataset that can answer "read me exactly
as I was when run X trained". Minimal log-structured table format on
the public Iceberg/Delta design (immutable data files + an ordered
commit log of file lists — snapshot isolation without a metastore):

    <table>/
      data/<commit-uuid>/part-*.parquet   (immutable once committed)
      _log/v00000001.json                 {"version", "op", "files",
                                           "n_rows", "parent"}

Semantics:
- ``snapshot_write(mode="append")``   — new commit = parent files + new
- ``snapshot_write(mode="overwrite")``— new commit = new files only
- ``snapshot_read(version=N)``        — the file list of commit N,
  scanned directly (no copy); latest when version is omitted
- readers NEVER see partial writes: data files land fully before the
  one-file commit record is atomically renamed into _log/, and a
  crashed writer leaves only an unreferenced data dir
- optimistic concurrency: two writers racing to commit version N —
  the commit is published with an EXCLUSIVE-create primitive
  (``os.link``, which raises ``FileExistsError`` on an existing
  target — unlike ``os.rename``, which silently replaces), so the
  loser raises and must rebase; this matches how Delta/Iceberg
  commit on HDFS (rename-without-overwrite)
- ``snapshot_delete(predicate)``      — copy-on-write row-level DELETE:
  only files actually containing matching rows rewrite; the rest
  carry by reference (stats intact)
- ``snapshot_compact(cluster_by=...)``— Z-order clustered rewrite (the
  OPTIMIZE/ZORDER maintenance pass)
- ``snapshot_tag(name)``              — immutable named refs pinning a
  version (and its files) against expiry; ``snapshot_read(tag=...)``
  is the "exactly as run X trained" read
- ``snapshot_expire`` — time-travel retention: drop log entries older
  than the keep window (tagged versions always survive) and delete
  data files no surviving version references (the vacuum that keeps
  100 TB of history affordable)

Scale: a commit is ONE small JSON (file paths only); reads plan from
the file list so Spark's parquet scan still does row-group pruning and
partition-size packing; nothing touches the driver beyond the file
list. On an object store the atomic-rename commit becomes a
conditional PUT — the documented swap caveat shared with
compact_dataset/write_audit_publish.

Reference parity: none (the reference has no storage layer); this
extends the sink family SURVEY §2 rows 41a-41f.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from collections.abc import Sequence
from urllib.parse import unquote, urlparse

from pyspark.sql import DataFrame, SparkSession


def _log_dir(path: str) -> str:
    return os.path.join(path, "_log")


def _data_dir(path: str) -> str:
    return os.path.join(path, "data")


def _version_file(path: str, v: int) -> str:
    return os.path.join(_log_dir(path), f"v{v:08d}.json")


def _file_row_count(file_path: str) -> int:
    """Record count from the parquet footer — a metadata read."""
    import pyarrow.parquet as pq

    return int(pq.ParquetFile(file_path).metadata.num_rows)


def _file_stats(file_path: str, cols: Sequence[str]) -> dict:
    """Per-column [min, max] from the parquet footer (across row
    groups) — a microsecond metadata read, no Spark job. Columns
    missing from the file or lacking statistics record null (readers
    must keep such files)."""
    import pyarrow.parquet as pq

    md = pq.ParquetFile(file_path).metadata
    idx = {md.schema.column(i).name: i for i in range(md.num_columns)}
    out: dict = {}
    for c in cols:
        if c not in idx:
            out[c] = None
            continue
        lo = hi = None
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx[c]).statistics
            if st is None or not st.has_min_max:
                lo = hi = None
                break
            lo = st.min if lo is None else min(lo, st.min)
            hi = st.max if hi is None else max(hi, st.max)
        out[c] = None if lo is None else [lo, hi]
    return out


_BLOOM_K = 7  # hash functions (~1% fpp at 10 bits/value)
_BLOOM_BITS_PER_VALUE = 10
_BLOOM_MAX_NDV = 100_000  # beyond this a per-file bloom stops paying


def _bloom_canon(value) -> bytes:
    """Canonical byte form hashed on BOTH the write and lookup side.
    Numerics canonicalize across logical types — int 5, 5.0 and
    Decimal('5.0') all hash as '5' — so a point lookup written as a
    Python int still probes a DOUBLE/DECIMAL column's filter
    correctly; a type mismatch must degrade to 'might contain',
    never to a wrong prune (ADVICE r10: str(5) vs str(5.0) silently
    dropped the file holding the value). Non-numeric values keep the
    plain str() form (int 5 and string '5' intentionally coincide,
    as before)."""
    import decimal

    if isinstance(value, (int, float, decimal.Decimal)) and not isinstance(
        value, bool
    ):
        try:
            if value == int(value):
                return str(int(value)).encode("utf-8")
        except (OverflowError, ValueError, decimal.InvalidOperation):
            pass  # inf / nan — fall through to the textual form
        if isinstance(value, decimal.Decimal):
            # normalize trailing zeros: Decimal('5.250') ≡ 5.25
            value = float(value)
        return repr(value).encode("utf-8")
    return str(value).encode("utf-8")


def _bloom_hashes(value, m: int) -> list[int]:
    """Kirsch-Mitzenmacher double hashing: two 64-bit halves of one
    sha1 generate all _BLOOM_K probe positions."""
    import hashlib

    d = hashlib.sha1(_bloom_canon(value)).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:16], "big") | 1
    return [(h1 + i * h2) % m for i in range(_BLOOM_K)]


def _bloom_build(values) -> dict | None:
    """m-bit Bloom filter over the distinct values (None above the
    density cap — a filter that big stops being cheap metadata)."""
    import base64

    vals = [v for v in values if v is not None]
    if not vals or len(vals) > _BLOOM_MAX_NDV:
        return None
    m = max(64, len(vals) * _BLOOM_BITS_PER_VALUE)
    m += (-m) % 8
    bits = bytearray(m // 8)
    for v in vals:
        for pos in _bloom_hashes(v, m):
            bits[pos // 8] |= 1 << (pos % 8)
    return {
        "m": m,
        "k": _BLOOM_K,
        "b64": base64.b64encode(bytes(bits)).decode("ascii"),
    }


def _bloom_might_contain(bloom: dict, value) -> bool:
    import base64

    bits = base64.b64decode(bloom["b64"])
    return all(
        bits[pos // 8] & (1 << (pos % 8))
        for pos in _bloom_hashes(value, bloom["m"])
    )


def _file_blooms(file_path: str, cols: Sequence[str]) -> dict:
    """Per-column Bloom filter from ONE pyarrow column read per
    column (no Spark job) — the Delta bloom-filter-index pattern for
    point lookups min/max stats can't prune (high-cardinality keys
    scattered across every file span the full range everywhere)."""
    import pyarrow.parquet as pq

    pf = pq.ParquetFile(file_path)
    names = set(pf.schema_arrow.names)
    out: dict = {}
    for c in cols:
        if c not in names:
            out[c] = None
            continue
        col = pf.read(columns=[c]).column(c)
        out[c] = _bloom_build(col.unique().to_pylist())
    return out


def _prune_group_point(group: dict, point: dict) -> dict:
    """Copy of ``group`` keeping only files whose Bloom filter MIGHT
    contain every point-lookup value; files lacking a filter are
    kept (skipping is an optimization, never a filter)."""
    blooms = group.get("blooms") or {}
    kept = []
    for f in group["files"]:
        fb = blooms.get(f)
        keep = True
        if fb:
            for col, value in point.items():
                bl = fb.get(col)
                if bl is None:
                    continue
                if not _bloom_might_contain(bl, value):
                    keep = False
                    break
        if keep:
            kept.append(f)
    out = dict(group)
    out["files"] = kept
    return out


def _prune_group(group: dict, prune: dict) -> dict:
    """Copy of ``group`` keeping only files whose recorded stats may
    overlap every (lo, hi) predicate; files lacking stats are kept."""
    stats = group.get("stats") or {}
    kept = []
    for f in group["files"]:
        fs = stats.get(f)
        keep = True
        if fs:
            for col, (lo, hi) in prune.items():
                mm = fs.get(col)
                if mm is None:
                    continue
                if (hi is not None and mm[0] > hi) or (
                    lo is not None and mm[1] < lo
                ):
                    keep = False
                    break
        if keep:
            kept.append(f)
    out = dict(group)
    out["files"] = kept
    return out


def _file_groups(record: dict) -> list[dict]:
    """A commit's per-layout file groups; commits written before
    partition evolution landed synthesize one unpartitioned group."""
    return record.get("file_groups") or [
        {"base": "", "partition_by": [], "files": record["files"]}
    ]


def snapshot_versions(path: str) -> list[int]:
    """Committed versions, ascending. Empty list = no table yet."""
    d = _log_dir(path)
    if not os.path.isdir(d):
        return []
    out = []
    for name in os.listdir(d):
        if name.startswith("v") and name.endswith(".json"):
            out.append(int(name[1:-5]))
    return sorted(out)


def _read_commit(path: str, v: int) -> dict:
    with open(_version_file(path, v)) as f:
        return json.load(f)


def snapshot_write(
    df: DataFrame,
    path: str,
    *,
    mode: str = "append",
    shards: int | None = None,
    extra_record: dict | None = None,
    partition_by: Sequence[str] = (),
    stats_cols: Sequence[str] = (),
    bloom_cols: Sequence[str] = (),
) -> dict:
    """Commit ``df`` as a new version. Returns the commit record.

    ``extra_record`` entries (e.g. a streaming batch_id) are merged
    into the commit record BEFORE it is atomically published, so they
    are visible to any reader that can see the commit at all — there
    is no window where the commit exists without them.

    ``partition_by`` hive-partitions THIS commit's data files; each
    commit records its own layout (a ``file_groups`` entry carrying
    base dir + partition columns + leaf files), so the table supports
    PARTITION EVOLUTION (the Iceberg partition-spec-evolution
    semantics): later commits may pick a different layout — or none —
    and ``snapshot_read`` unions the groups transparently, each read
    under its own basePath so its partition columns come back. Old
    data is never rewritten when the layout changes.

    ``stats_cols`` records per-FILE min/max for the named columns in
    the commit log (read from the parquet footers at commit time — a
    metadata pass, no Spark job), the Iceberg/Delta manifest-stats
    pattern: ``snapshot_read(prune={col: (lo, hi)})`` then drops
    non-overlapping files BEFORE the reader ever lists them — at
    100 TB the win is skipping the file listing itself, one level
    above the row-group skipping parquet already does.

    ``bloom_cols`` additionally records a per-FILE Bloom filter over
    each named column's distinct values (one pyarrow column read per
    file at commit time), the Delta bloom-filter-index pattern:
    ``snapshot_read(point={col: value})`` then drops files whose
    filter PROVES the value absent — the skipping min/max can't do
    for point lookups on high-cardinality keys scattered across
    every file (each file spans the whole range, but each contains
    only ~1/n_files of the values). ~10 bits/distinct value in the
    commit log; columns denser than 100k distinct values
    per file record no filter (readers keep the file).
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    os.makedirs(_log_dir(path), exist_ok=True)
    commit_id = uuid.uuid4().hex[:12]
    out_dir = os.path.join(_data_dir(path), commit_id)
    w = df.repartition(shards) if shards else df
    writer = w.write.mode("error")
    if partition_by:
        writer = writer.partitionBy(*partition_by)
    writer.parquet(out_dir)
    new_files = sorted(
        os.path.join(root, f)
        for root, _dirs, fs in os.walk(out_dir)
        for f in fs
        if f.endswith(".parquet")
    )
    versions = snapshot_versions(path)
    parent = versions[-1] if versions else 0
    files = list(new_files)
    new_group = {
        "base": out_dir,
        "partition_by": list(partition_by),
        "files": new_files,
        # per-file record counts (parquet footer reads, no Spark job)
        # — the Iceberg manifest record_count: metadata-only COUNT(*)
        # via snapshot_metadata_stats never touches a data page
        "row_counts": {f: _file_row_count(f) for f in new_files},
    }
    if stats_cols:
        new_group["stats"] = {
            f: _file_stats(f, stats_cols) for f in new_files
        }
    if bloom_cols:
        new_group["blooms"] = {
            f: _file_blooms(f, bloom_cols) for f in new_files
        }
    groups = [new_group]
    if mode == "append" and versions:
        prev = _read_commit(path, parent)
        files = prev["files"] + files
        groups = _file_groups(prev) + groups
    v = parent + 1
    record = {
        "version": v,
        "op": mode,
        "parent": parent,
        "files": files,
        "n_new_files": len(new_files),
        "file_groups": groups,
    }
    if extra_record:
        record.update(extra_record)
    _publish_commit(path, record, commit_id)
    return record


def _publish_commit(path: str, record: dict, commit_id: str) -> None:
    """Atomically publish a commit record as its version file.

    Exclusive-create publish: ``os.link`` raises FileExistsError if
    the target exists, unlike ``os.rename`` which silently REPLACES
    it on POSIX — so of two racing writers exactly one wins and the
    other raises (conditional PUT / If-None-Match on object stores).
    """
    tmp = os.path.join(_log_dir(path), f".tmp-{commit_id}.json")
    with open(tmp, "w") as f:
        json.dump(record, f)
    target = _version_file(path, record["version"])
    try:
        os.link(tmp, target)
    except FileExistsError:
        raise RuntimeError(
            f"concurrent commit: version {record['version']} already "
            "exists (rebase: re-read latest and retry)"
        ) from None
    finally:
        os.unlink(tmp)


def snapshot_read(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    tag: str | None = None,
    merge_schema: bool = False,
    prune: dict | None = None,
    point: dict | None = None,
) -> DataFrame:
    """The table exactly as of ``version`` (latest if omitted).

    ``prune={col: (lo, hi)}`` drops data files whose commit-log
    min/max stats (``snapshot_write(stats_cols=...)``) provably miss
    the CLOSED interval [lo, hi] — manifest-level data skipping
    BEFORE file listing. Files without recorded stats are kept
    (pruning is an optimization, never a filter: the caller still
    applies the real predicate; pruning only shrinks the scan).

    ``point={col: value}`` drops data files whose commit-log Bloom
    filter (``snapshot_write(bloom_cols=...)``) PROVES the value
    absent — point-lookup skipping where min/max can't help. Same
    contract: never a filter, the caller still applies the real
    predicate; false positives only cost a scanned file.

    ``merge_schema=True`` enables SCHEMA EVOLUTION across commits: an
    append whose DataFrame carries a column older data files lack
    reads back as the UNION schema, with the old files' missing
    column as NULL (parquet name-based resolution — the Iceberg/Delta
    add-column semantics). Off by default because merging reads every
    file footer up front; a table known to have one schema skips
    that."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    if tag is not None:
        if version is not None:
            raise ValueError("pass version= or tag=, not both")
        tags = snapshot_tags(path)
        if tag not in tags:
            raise ValueError(
                f"tag {tag!r} not found (have {sorted(tags)})"
            )
        version = tags[tag]
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not in table (have {versions[0]}..{versions[-1]}"
            f", expired versions are gone)"
        )
    record = _read_commit(path, v)
    files = record["files"]
    if not files:
        # a legal state, not an error (ADVICE r8): a DELETE matching
        # every row publishes a commit with no files. Rebuild an
        # empty relation from the schema the delete commit recorded,
        # falling back to the nearest non-empty ancestor's footer.
        return spark.createDataFrame([], _empty_version_schema(
            spark, path, record
        ))
    groups = _file_groups(record)
    if prune:
        groups = [_prune_group(g, prune) for g in groups]
    if point:
        groups = [_prune_group_point(g, point) for g in groups]
    if prune or point:
        files = [f for g in groups for f in g["files"]]
        if not files:
            # every file provably outside the predicate: an empty
            # relation with the table's schema (read one footer)
            schema = spark.read.parquet(
                _file_groups(record)[0]["files"][0]
            ).schema
            return spark.createDataFrame([], schema)
    if all(not g["partition_by"] for g in groups):
        # single-layout fast path (also serves pre-evolution tables)
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        return reader.parquet(*files)
    # PARTITION EVOLUTION: each commit's group reads under its own
    # basePath so its hive partition columns materialize; layouts
    # union by name with nulls where a column doesn't exist
    out = None
    for g in groups:
        if not g["files"]:
            continue
        reader = spark.read
        if merge_schema:
            reader = reader.option("mergeSchema", "true")
        if g["partition_by"]:
            reader = reader.option("basePath", g["base"])
        part = reader.parquet(*g["files"])
        out = (
            part
            if out is None
            else out.unionByName(part, allowMissingColumns=True)
        )
    return out


def _empty_version_schema(spark, path: str, record: dict):
    """Schema for an all-rows-deleted version: the delete commit's
    recorded schema if present, else the nearest non-empty ancestor's
    parquet footer (pre-fix tables whose delete commits carry no
    schema)."""
    from pyspark.sql.types import StructType

    if record.get("schema") is not None:
        return StructType.fromJson(record["schema"])
    anc = record
    while not anc["files"]:
        parent = anc.get("parent")
        try:
            anc = _read_commit(path, parent)
        except (FileNotFoundError, TypeError):
            raise ValueError(
                f"version {record['version']} is empty and no schema "
                "is recorded (ancestors expired)"
            ) from None
    return spark.read.parquet(anc["files"][0]).schema


def snapshot_history(path: str) -> list[dict]:
    """Commit records, ascending — the audit trail of the dataset."""
    return [_read_commit(path, v) for v in snapshot_versions(path)]


# ------------------------------------------------- named refs (tags)


def _ref_file(path: str, name: str) -> str:
    if not name or "/" in name or name.startswith("."):
        raise ValueError(f"invalid tag name {name!r}")
    return os.path.join(_log_dir(path), f"ref-{name}.json")


def snapshot_tag(
    path: str, name: str, version: int | None = None
) -> dict:
    """Pin a NAMED TAG to a version (latest if omitted) — the Iceberg
    tag semantics that close the reproducibility loop: "read me
    exactly as run X trained" becomes ``snapshot_read(tag="run-x")``,
    and ``snapshot_expire`` keeps every tagged version (and its data
    files) alive no matter how old, until the tag is dropped.

    Tags are immutable once created (exclusive-create publish, the
    commit-record contract — racing writers can't silently clobber a
    run's pin); re-pointing a tag is delete + re-create, which leaves
    an explicit gap in the audit trail instead of a silent mutation.
    """
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in table")
    record = {"name": name, "version": v}
    tmp = os.path.join(_log_dir(path), f".tmp-ref-{uuid.uuid4().hex[:8]}")
    with open(tmp, "w") as f:
        json.dump(record, f)
    try:
        os.link(tmp, _ref_file(path, name))
    except FileExistsError:
        raise RuntimeError(
            f"tag {name!r} already exists (tags are immutable: "
            "snapshot_untag first to re-point)"
        ) from None
    finally:
        os.unlink(tmp)
    return record


def snapshot_untag(path: str, name: str) -> None:
    """Drop a tag. The pinned version becomes expirable again."""
    os.remove(_ref_file(path, name))


def snapshot_tags(path: str) -> dict[str, int]:
    """{tag name: pinned version} for every live tag."""
    d = _log_dir(path)
    out: dict[str, int] = {}
    if not os.path.isdir(d):
        return out
    for f in os.listdir(d):
        if f.startswith("ref-") and f.endswith(".json"):
            with open(os.path.join(d, f)) as fh:
                rec = json.load(fh)
            out[rec["name"]] = rec["version"]
    return out


def batch_committed(path: str, batch_id: int) -> bool:
    """True when ANY commit record carries this micro-batch id — not
    just the newest: a restored/rebuilt checkpoint can rewind MORE
    than one batch (ADVICE r7), and every replayed id must skip or
    the table double-appends. Commit records are tiny JSON, so this
    is O(#versions) driver-side reads per micro-batch — retention
    expiry keeps the log bounded."""
    return any(
        _read_commit(path, v).get("batch_id") == batch_id
        for v in snapshot_versions(path)
    )


def snapshot_sink(
    path: str,
    *,
    mode: str = "append",
    auto_compact_every: int | None = None,
    compact_shards: int = 1,
    stats_cols: Sequence[str] = (),
):
    """``foreachBatch`` sink: every micro-batch commits as a NEW
    snapshot version, so the stream's output is a versioned table —
    any past micro-batch boundary is a reproducible
    ``snapshot_read(version=...)`` training view, and the commit log
    doubles as the stream's audit trail.

    Exactly-once across restarts: the commit record carries the
    micro-batch id IN the atomically-published commit itself (threaded
    through ``snapshot_write(extra_record=...)``), so there is no
    crash window in which a commit exists without its batch_id — a
    replayed batch (same id as ANY prior commit, so multi-batch
    checkpoint rewinds skip too) is dropped instead of
    double-committed, the snapshot-table counterpart of the
    idempotent batch_id-keyed parquet sink.

    ``auto_compact_every=N`` (r9, the Delta auto-optimize pattern):
    after every N non-compaction commits the sink rewrites the
    current contents as one ``snapshot_compact`` commit — a
    long-running stream's read path stays a bounded file listing
    instead of one-file-per-micro-batch forever, with time travel
    and replay guards untouched (a replayed data batch is still
    skipped by batch_id; an extra compaction after a crash is a
    harmless rewrite, never a data change). Pair with
    ``snapshot_expire`` to reclaim the superseded files.
    """

    def _sink(df: DataFrame, batch_id: int) -> None:
        if batch_committed(path, batch_id):
            return  # replay of an already-committed batch
        snapshot_write(
            df, path, mode=mode, extra_record={"batch_id": batch_id}
        )
        if auto_compact_every:
            since = 0
            for rec in reversed(snapshot_history(path)):
                if "compacted_from" in rec:
                    break
                since += 1
            if since >= auto_compact_every:
                snapshot_compact(
                    df.sparkSession,
                    path,
                    shards=compact_shards,
                    stats_cols=stats_cols,
                )

    return _sink


def snapshot_merge_sink(
    path: str, key_cols: Sequence[str], order_col: str
):
    """``foreachBatch`` MERGE-upsert sink (r8): each micro-batch
    UPSERTS into the snapshot table by key — the streaming
    materialized DIMENSION table (latest account profile, live device
    registry) that `snapshot_sink`'s append log isn't: reading the
    latest version yields exactly one row per key.

    Per batch: rows collapse to the latest per key (greatest
    ``order_col``, deterministic), the current snapshot's matched keys
    are anti-joined away, and the union commits as ONE overwrite
    version — so the table keeps time travel ("the dimension as of
    batch N"), the commit log stays the audit trail, and the
    batch_id-in-commit replay guard gives exactly-once across
    restarts and multi-batch checkpoint rewinds.

    Cost model: copy-on-write of a DIMENSION-sized table per
    micro-batch (the whole point is that it stays small); for
    fact-sized upserts use the partitioned ``sinks.merge_upsert``
    per snapshot instead. Complements `streaming_cdc_latest`
    (bounded per-key STATE inside the stream) by materializing the
    same latest-wins contract as a versioned TABLE."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    keys = list(key_cols)

    def _sink(df: DataFrame, batch_id: int) -> None:
        if batch_committed(path, batch_id):
            return
        rn = F.row_number().over(
            Window.partitionBy(*keys).orderBy(F.col(order_col).desc())
        )
        latest = (
            df.withColumn("__rn", rn).filter(F.col("__rn") == 1).drop("__rn")
        )
        if snapshot_versions(path):
            base = snapshot_read(df.sparkSession, path)
            merged = base.join(
                latest.select(*keys).distinct(), keys, "left_anti"
            ).unionByName(latest.select(*base.columns))
        else:
            merged = latest
        snapshot_write(
            merged,
            path,
            mode="overwrite",
            extra_record={"batch_id": batch_id},
        )

    return _sink


def snapshot_changes(
    spark: SparkSession,
    path: str,
    *,
    start_version: int,
    end_version: int | None = None,
) -> DataFrame:
    """CHANGE DATA FEED between two versions: every row inserted or
    deleted by the commits in ``(start_version, end_version]``, tagged
    ``_change_type`` ('insert' | 'delete') and ``_commit_version`` —
    the Delta/Iceberg ``table_changes`` surface that lets a downstream
    consumer incrementally maintain its own derived state instead of
    re-reading the table (the storage-layer sibling of
    ``corpus_diff``'s content-level CDC).

    Exactness for free from the log-structured design: data files are
    IMMUTABLE, so each commit's row-level change set is precisely the
    rows of the files it added plus the rows of the files it dropped —
    computed per commit step, so an overwrite in the middle of the
    range attributes its deletes to the right version. No row
    comparison, no shuffle: the feed is a parquet scan of exactly the
    touched files (at 100 TB an incremental consumer reads only the
    delta, never the table).

    Schema evolution across the range unions by NAME with missing
    columns as NULL (same contract as ``snapshot_read(merge_schema)``).
    """
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    end = versions[-1] if end_version is None else end_version
    for v in (start_version, end):
        if v not in versions:
            raise ValueError(
                f"version {v} not in table (have "
                f"{versions[0]}..{versions[-1]}, expired versions are gone)"
            )
    if end < start_version:
        raise ValueError(
            f"end_version {end} precedes start_version {start_version}"
        )
    from pyspark.sql import functions as F

    parts: list[DataFrame] = []
    prev_files = set(_read_commit(path, start_version)["files"])
    for v in versions:
        if v <= start_version or v > end:
            continue
        cur_files = set(_read_commit(path, v)["files"])
        for change_type, touched in (
            ("insert", sorted(cur_files - prev_files)),
            ("delete", sorted(prev_files - cur_files)),
        ):
            if touched:
                parts.append(
                    spark.read.option("mergeSchema", "true")
                    .parquet(*touched)
                    .withColumn("_change_type", F.lit(change_type))
                    .withColumn("_commit_version", F.lit(v))
                )
        prev_files = cur_files
    if not parts:  # empty range: table schema + the two feed columns
        return (
            snapshot_read(spark, path, version=end)
            .withColumn("_change_type", F.lit("insert"))
            .withColumn("_commit_version", F.lit(end))
            .limit(0)
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p, allowMissingColumns=True)
    return out


def snapshot_delete(
    spark: SparkSession,
    path: str,
    predicate: str,
    *,
    stats_cols: Sequence[str] = (),
) -> dict:
    """Row-level DELETE as a copy-on-write commit (the Delta/Iceberg
    ``DELETE FROM t WHERE ...`` semantics): only data files that
    ACTUALLY CONTAIN matching rows are rewritten without them; every
    untouched file carries into the new version by reference (with
    its recorded stats), so a selective delete on a 100 TB table
    rewrites the few files the predicate touches, not the table.
    Time travel is preserved — prior versions still see the deleted
    rows; ``snapshot_expire`` reclaims superseded files when history
    may go.

    ``predicate`` is a Spark SQL boolean expression over the table's
    columns (including a group's hive partition columns). NULL
    evaluations keep the row (SQL DELETE semantics: only
    predicate=TRUE rows go). Matching files are found with ONE scan
    that aggregates matches per ``input_file_name`` — the collected
    list is file-path-sized (the same order as the commit log
    itself), never row data.

    Returns the new commit record (op='delete', with n_deleted /
    n_rewritten_files / predicate recorded for the audit trail); a
    predicate matching nothing returns the CURRENT record unchanged
    with n_deleted=0 — no empty commit.
    """
    from pyspark.sql import functions as F

    pred = F.expr(predicate)
    return _cow_rewrite(
        spark,
        path,
        predicate,
        lambda df: df.filter(~F.coalesce(pred, F.lit(False))),
        op="delete",
        count_key="n_deleted",
        stats_cols=stats_cols,
    )


def snapshot_update(
    spark: SparkSession,
    path: str,
    set_exprs: dict[str, str],
    predicate: str,
    *,
    stats_cols: Sequence[str] = (),
) -> dict:
    """Row-level UPDATE as a copy-on-write commit (the Delta/Iceberg
    ``UPDATE t SET col = expr WHERE ...`` semantics — the sibling of
    ``snapshot_delete``, completing the DML trio next to
    ``snapshot_merge_sink``'s keyed upsert): only data files that
    actually contain predicate-TRUE rows are rewritten with
    ``set_exprs`` applied to those rows; untouched files — and
    untouched ROWS within rewritten files — carry unchanged. Time
    travel preserved; ``snapshot_expire`` reclaims superseded files.

    ``set_exprs`` maps existing column names to Spark SQL expressions
    evaluated against the PRE-update row (standard SQL UPDATE
    semantics: ``{"a": "b", "b": "a"}`` swaps). New columns are
    rejected — schema evolution is an append concern. NULL predicate
    evaluations leave the row unchanged.

    Returns the new commit record (op='update', n_updated /
    n_rewritten_files / predicate / set recorded); a no-match
    predicate returns the current record with n_updated=0.
    """
    from pyspark.sql import functions as F

    pred = F.expr(predicate)

    def _apply(df: DataFrame) -> DataFrame:
        bad = [c for c in set_exprs if c not in df.columns]
        if bad:
            raise ValueError(
                f"snapshot_update: SET targets not in table: {bad}"
            )
        cond = F.coalesce(pred, F.lit(False))
        # all assignments read the PRE-update row: build every new
        # value in one select (not chained withColumn, which would
        # let later assignments see earlier ones)
        return df.select(
            *[
                F.when(cond, F.expr(set_exprs[c]))
                .otherwise(F.col(c))
                .cast(df.schema[c].dataType)
                .alias(c)
                if c in set_exprs
                else F.col(c)
                for c in df.columns
            ]
        )

    return _cow_rewrite(
        spark,
        path,
        predicate,
        _apply,
        op="update",
        count_key="n_updated",
        stats_cols=stats_cols,
        extra_record={"set": dict(set_exprs)},
    )


def _cow_rewrite(
    spark: SparkSession,
    path: str,
    predicate: str,
    rewrite,
    *,
    op: str,
    count_key: str,
    stats_cols: Sequence[str] = (),
    extra_record: dict | None = None,
) -> dict:
    """Shared copy-on-write machinery for row-level DELETE/UPDATE:
    ONE scan finds the files containing predicate-TRUE rows
    (aggregated per ``input_file_name`` — the collected list is
    file-path-sized, never row data), those files re-read through
    ``rewrite`` into a fresh commit group, and every untouched file
    carries by reference with its recorded stats."""
    from pyspark.sql import functions as F

    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    parent = versions[-1]
    record = _read_commit(path, parent)
    pred = F.expr(predicate)
    commit_id = uuid.uuid4().hex[:12]
    out_base = os.path.join(_data_dir(path), commit_id)
    new_groups: list[dict] = []
    n_matched = 0
    n_rewritten = 0
    schema_json: dict | None = None
    for gi, g in enumerate(_file_groups(record)):
        if not g["files"]:
            continue
        reader = spark.read
        if g["partition_by"]:
            reader = reader.option("basePath", g["base"])
        df = reader.parquet(*g["files"])
        if schema_json is None:
            # recorded so a full-table DELETE (empty version) stays
            # readable: snapshot_read rebuilds an empty relation
            # from this instead of raising (ADVICE r8)
            schema_json = df.schema.jsonValue()
        touched_rows = (
            df.filter(pred)
            .groupBy(F.input_file_name().alias("_f"))
            .count()
            .collect()
        )
        # input_file_name returns PERCENT-ENCODED URIs
        # (file:///a/b%20c); commit-log paths are plain filesystem
        # paths — urldecode before matching, or any path with
        # spaces/special/non-ASCII chars (hive partition VALUES are
        # the common case) never matches and its predicate-matching
        # rows silently survive the rewrite (ADVICE r8)
        by_path: dict = {}
        for r in touched_rows:
            t = r["_f"]
            if t.startswith("file:") or "://" in t:
                t = unquote(urlparse(t).path)
            by_path[t] = r["count"]
        touched = {
            f: by_path[os.path.abspath(f)]
            for f in g["files"]
            if os.path.abspath(f) in by_path
        }
        # every file that reported matches must resolve to a
        # commit-log path — an unresolved URI means matching rows
        # would be carried as 'untouched'; fail loudly instead
        unmatched = set(by_path) - {
            os.path.abspath(f) for f in g["files"]
        }
        if unmatched:
            raise RuntimeError(
                f"snapshot_{op}: scan reported predicate matches in "
                f"files absent from the commit log: "
                f"{sorted(unmatched)[:3]} (URI normalization bug or "
                "concurrent writer)"
            )
        untouched = [f for f in g["files"] if f not in touched]
        if untouched:
            kept = dict(g)
            kept["files"] = untouched
            if g.get("stats"):
                kept["stats"] = {
                    f: g["stats"][f]
                    for f in untouched
                    if f in g["stats"]
                }
            new_groups.append(kept)
        if not touched:
            continue
        n_matched += sum(touched.values())
        n_rewritten += len(touched)
        reader = spark.read
        if g["partition_by"]:
            reader = reader.option("basePath", g["base"])
        out_df = rewrite(reader.parquet(*sorted(touched)))
        out_dir = os.path.join(out_base, f"g{gi}")
        writer = out_df.write.mode("error")
        if g["partition_by"]:
            writer = writer.partitionBy(*g["partition_by"])
        writer.parquet(out_dir)
        rewritten = sorted(
            os.path.join(root, f)
            for root, _dirs, fs in os.walk(out_dir)
            for f in fs
            if f.endswith(".parquet")
        )
        ng = {
            "base": out_dir,
            "partition_by": list(g["partition_by"]),
            "files": rewritten,
        }
        cols = list(stats_cols) or sorted(
            next(iter((g.get("stats") or {}).values()), {})
        )
        if cols:
            ng["stats"] = {f: _file_stats(f, cols) for f in rewritten}
        new_groups.append(ng)
    if n_matched == 0:
        out = dict(record)
        out[count_key] = 0
        return out
    v = parent + 1
    new_record = {
        "version": v,
        "op": op,
        "parent": parent,
        "files": [f for g in new_groups for f in g["files"]],
        "n_new_files": sum(
            len(g["files"])
            for g in new_groups
            if g["base"].startswith(out_base)
        ),
        "file_groups": new_groups,
        "predicate": predicate,
        count_key: n_matched,
        "n_rewritten_files": n_rewritten,
    }
    if extra_record:
        new_record.update(extra_record)
    if schema_json is not None:
        new_record["schema"] = schema_json
    _publish_commit(path, new_record, commit_id)
    return new_record


def snapshot_clone(
    src_path: str, dst_path: str, *, version: int | None = None
) -> dict:
    """SHALLOW CLONE (r9, the Delta ``CREATE TABLE ... SHALLOW
    CLONE`` semantics): a NEW table whose first commit references the
    source version's data files BY REFERENCE — zero data copy, so an
    experiment branch of a 100 TB corpus costs one commit record.
    The clone then evolves independently: appends/DML land in ITS
    data dir; the source never sees them.

    Safety: the clone does not OWN the referenced files —
    ``snapshot_expire``/``snapshot_orphans`` only ever touch files
    under a table's own data dir, so vacuuming the clone cannot
    reach into the source's storage (and vice versa). The one
    documented hazard mirrors Delta's: expiring the SOURCE can
    remove files the clone still references — pin the cloned version
    with ``snapshot_tag`` on the source for as long as the clone
    must stay readable."""
    versions = snapshot_versions(src_path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {src_path}")
    if snapshot_versions(dst_path):
        raise FileExistsError(
            f"snapshot table already exists at {dst_path}"
        )
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(f"version {v} not in source table")
    target = _read_commit(src_path, v)
    os.makedirs(_log_dir(dst_path), exist_ok=True)
    record = {
        "version": 1,
        "op": "clone",
        "parent": 0,
        "files": list(target["files"]),
        "n_new_files": 0,
        "file_groups": _file_groups(target),
        "cloned_from": {"path": os.path.abspath(src_path), "version": v},
    }
    if target.get("schema") is not None:
        record["schema"] = target["schema"]
    _publish_commit(dst_path, record, uuid.uuid4().hex[:12])
    return record


def snapshot_restore(path: str, version: int) -> dict:
    """RESTORE the table to a prior version as a NEW commit (the
    Delta ``RESTORE TABLE t TO VERSION`` semantics): the new tip
    re-references the target version's data files BY REFERENCE —
    zero data copy, the bad commits stay in history for audit, and
    time travel still reads them until ``snapshot_expire``. The
    mistake-undo operation the DML trio needs: a botched DELETE/
    UPDATE/overwrite is one ``snapshot_restore(path, good_version)``
    away from gone.

    Returns the new commit record (op='restore', restored_from
    recorded). Restoring to the current tip is a no-op (returns the
    current record unchanged — no empty commit)."""
    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    if version not in versions:
        raise ValueError(
            f"version {version} not in table (have "
            f"{versions[0]}..{versions[-1]}, expired versions are "
            "gone)"
        )
    parent = versions[-1]
    if version == parent:
        return _read_commit(path, parent)
    target = _read_commit(path, version)
    new_record = {
        "version": parent + 1,
        "op": "restore",
        "parent": parent,
        "files": list(target["files"]),
        "n_new_files": 0,
        "file_groups": _file_groups(target),
        "restored_from": version,
    }
    if target.get("schema") is not None:
        new_record["schema"] = target["schema"]
    _publish_commit(path, new_record, uuid.uuid4().hex[:12])
    return new_record


def snapshot_orphans(path: str, *, remove: bool = False) -> dict:
    """VACUUM dry-run / orphan-file detection: parquet files under the
    table's data dir referenced by NO live commit — the debris of
    crashed or conflict-losing writers (the exclusive-create publish
    means a loser's data dir is never referenced; see
    ``test_commit_conflict_raises``). Reports {n_orphans, bytes,
    orphans}; ``remove=True`` additionally deletes them and prunes
    commit dirs left without any parquet (the ``snapshot_expire``
    rule).

    CAUTION with ``remove=True`` on a live table: a writer that has
    written its data dir but not yet published its commit record
    looks orphaned in that window — run removal only when no write
    is in flight (the same contract as Delta's VACUUM retention
    guard, which this local log solves by operator discipline rather
    than timestamps)."""
    live: set[str] = set()
    for v in snapshot_versions(path):
        live.update(
            os.path.abspath(f) for f in _read_commit(path, v)["files"]
        )
    orphans: list[str] = []
    total = 0
    ddir = _data_dir(path)
    if os.path.isdir(ddir):
        for root, _dirs, fs in os.walk(ddir):
            for f in fs:
                p = os.path.join(root, f)
                if f.endswith(".parquet") and os.path.abspath(p) not in live:
                    orphans.append(p)
                    total += os.path.getsize(p)
    if remove:
        for p in orphans:
            os.remove(p)
        for sub in os.listdir(ddir) if os.path.isdir(ddir) else ():
            p = os.path.join(ddir, sub)
            if os.path.isdir(p) and not any(
                f.endswith(".parquet")
                for _root, _dirs, fs in os.walk(p)
                for f in fs
            ):
                shutil.rmtree(p)
    return {
        "n_orphans": len(orphans),
        "bytes": total,
        "orphans": sorted(orphans),
        "removed": bool(remove),
    }


def snapshot_compact(
    spark: SparkSession,
    path: str,
    *,
    shards: int = 1,
    stats_cols: Sequence[str] = (),
    cluster_by: Sequence[str] = (),
    cluster_bits: int = 16,
) -> dict:
    """Compact the snapshot table (r8): rewrite the CURRENT contents
    as ONE overwrite commit of ``shards`` right-sized files — the
    maintenance pass that undoes the file-per-micro-batch
    accumulation of the streaming sinks (every commit appends ≥1
    file; a long-running stream turns reads into thousands-of-file
    listings). Time travel is preserved: prior versions still
    reference their own files; run ``snapshot_expire`` afterwards to
    reclaim the superseded files once history can go. The rewrite
    may re-record ``stats_cols`` so manifest pruning survives
    compaction. Returns the new commit record (op recorded as a
    normal overwrite + a ``compacted_from`` marker).

    ``cluster_by`` additionally Z-ORDERS the rewrite (the Delta
    ``OPTIMIZE ... ZORDER BY`` maintenance pass): rows
    range-partition + sort on the Morton key of the named columns
    (``sinks.zorder_value`` — non-negative integers pre-scaled into
    [0, 2^cluster_bits)), so each rewritten file covers a compact
    hyper-rectangle of the key space and a predicate on ANY subset
    of the clustered columns prunes both via the commit-log stats
    (record them with ``stats_cols``) and parquet row-group min/max.
    """
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.sinks import zorder_value

    latest = snapshot_versions(path)[-1]
    df = snapshot_read(spark, path)
    if cluster_by:
        df = (
            df.withColumn(
                "__z", zorder_value(cluster_by, bits=cluster_bits)
            )
            .repartitionByRange(shards, F.col("__z"))
            .sortWithinPartitions("__z")
            .drop("__z")
        )
        shards = None  # the range exchange above already sized shards
    return snapshot_write(
        df,
        path,
        mode="overwrite",
        shards=shards,
        stats_cols=stats_cols,
        extra_record={
            "compacted_from": latest,
            **(
                {"clustered_by": list(cluster_by)} if cluster_by else {}
            ),
        },
    )


def snapshot_expire(path: str, *, keep_last: int) -> dict:
    """Retention vacuum: keep the newest ``keep_last`` versions PLUS
    every tagged version (a tag is a reproducibility pin — see
    ``snapshot_tag``; drop the tag to let its version expire), drop
    other log entries, and delete every data file no surviving
    version references. Returns {removed_versions, removed_files}.

    OWNERSHIP rule (r9): only files under THIS table's own data dir
    are ever deleted — a commit may reference files it does not own
    (``snapshot_clone``'s zero-copy shallow clone), and expiring the
    clone must never reach into the source table's storage."""
    if keep_last < 1:
        raise ValueError("keep_last must be >= 1")
    versions = snapshot_versions(path)
    pinned = set(snapshot_tags(path).values())
    keep = sorted(set(versions[-keep_last:]) | pinned)
    drop = [v for v in versions if v not in keep]
    live: set[str] = set()
    for v in keep:
        live.update(_read_commit(path, v)["files"])
    own_prefix = os.path.abspath(_data_dir(path)) + os.sep
    dead: set[str] = set()
    for v in drop:
        dead.update(
            f
            for f in _read_commit(path, v)["files"]
            if f not in live
            and os.path.abspath(f).startswith(own_prefix)
        )
    for f in sorted(dead):
        if os.path.exists(f):
            os.remove(f)
    for v in drop:
        os.remove(_version_file(path, v))
    # prune now-dead commit data dirs. Live parquet must be detected
    # RECURSIVELY: delete/hive-partitioned commits nest their files
    # under data/<commit>/g{i}/ or partition dirs, and the old
    # top-level check os.remove'd those subdirectories
    # (IsADirectoryError — ADVICE r8 high). Every dead parquet was
    # already os.remove'd above, so a dir holding any remaining
    # .parquet is live; otherwise only markers/empty dirs remain and
    # the whole commit dir goes.
    ddir = _data_dir(path)
    if os.path.isdir(ddir):
        for sub in os.listdir(ddir):
            p = os.path.join(ddir, sub)
            if os.path.isdir(p) and not any(
                f.endswith(".parquet")
                for _root, _dirs, fs in os.walk(p)
                for f in fs
            ):
                shutil.rmtree(p)
    return {
        "removed_versions": drop,
        "removed_files": len(dead),
        "kept_versions": keep,
    }


def snapshot_metadata_stats(
    spark: SparkSession,
    path: str,
    *,
    version: int | None = None,
    tag: str | None = None,
) -> DataFrame:
    """METADATA-ONLY file statistics — the Iceberg ``table.files``
    metadata-table pattern: one row per data file of the resolved
    version carrying its record count and any commit-recorded
    min/max stats, answered ENTIRELY from the commit log + parquet
    footers. ``SELECT sum(n_rows)`` over this relation is the
    metadata-only COUNT(*) a 100 TB table must answer without
    scanning a single data page (Iceberg/Delta both resolve plain
    counts from manifests; here the manifest IS the commit log).

    Files committed before row counts were recorded fall back to one
    footer read each — still metadata, never data pages. Stats
    columns (``snapshot_write(stats_cols=...)``) surface as a JSON
    string per file ({col: [min, max]}), schema-stable across
    arbitrary column types.

    Scale: the output is file-count-sized; nothing here launches a
    Spark job over the data — the ONLY Spark work is building the
    tiny local DataFrame."""
    import json as _json

    versions = snapshot_versions(path)
    if not versions:
        raise FileNotFoundError(f"no snapshot table at {path}")
    if tag is not None:
        if version is not None:
            raise ValueError("pass version= or tag=, not both")
        tags = snapshot_tags(path)
        if tag not in tags:
            raise ValueError(
                f"tag {tag!r} not found (have {sorted(tags)})"
            )
        version = tags[tag]
    v = versions[-1] if version is None else version
    if v not in versions:
        raise ValueError(
            f"version {v} not in table (have {versions[0]}.."
            f"{versions[-1]}, expired versions are gone)"
        )
    record = _read_commit(path, v)
    rows = []
    for g in _file_groups(record):
        counts = g.get("row_counts") or {}
        stats = g.get("stats") or {}
        for f in g["files"]:
            n = counts.get(f)
            if n is None:
                # pre-upgrade commit: one footer read, still metadata
                n = _file_row_count(f)
            st = stats.get(f)
            rows.append(
                (
                    int(record["version"]),
                    f,
                    int(n),
                    _json.dumps(st, sort_keys=True)
                    if st is not None
                    else None,
                )
            )
    return spark.createDataFrame(
        rows, "version int, file string, n_rows long, stats string"
    )
