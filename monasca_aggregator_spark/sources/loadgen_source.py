"""`metric_envelopes` — a Spark 4 Python DataSource that generates the
reference's MetricEnvelope wire format as a first-class source.

The reference ships a load-generator publisher that posts a
deterministic dimension grid of envelopes to Kafka
(reference: tools/publisher.go; our file-based parity tool is
tools/publisher.py). This module lifts that generator into Spark's
Python DataSource API (SPARK-44076, GA in Spark 4) so the SAME
deterministic stream is available:

- as a BATCH relation (``spark.read.format("metric_envelopes")``) for
  oracle-checked plans, and
- as a STREAMING source (``spark.readStream.format(...)``) with
  offset-tracked micro-batches — the broker-less way to exercise the
  continuous pipeline end-to-end (watermarks, state, restart/resume)
  with NO Kafka and NO files: with ``state_dir`` set, offsets resume
  across restarts exactly like a Kafka source (the generator's
  high-water mark persists where a broker would hold real offsets —
  see _StreamReader's restart note).

Records are Kafka-shaped — ``(partition int, offset bigint, value
string)`` with ``value`` the envelope JSON — so everything downstream
(``parse_envelopes`` → spec aggregation) is byte-identical to the
broker path's input, and batch/stream equivalence over a fixed offset
range is testable (test_loadgen_source.py pins it).

Determinism: row content is a pure function of (partition, offset) and
the options — no wall clock, no RNG state — which is what makes the
source usable in correctness harnesses, not just soak tests.

Options (all strings, per the DataSource API):
    partitions          number of Kafka-like partitions     (default 2)
    rows_per_partition  batch row count per partition       (default 1000)
    rows_per_batch      streaming rows/partition/microbatch (default 100)
    start_ms            first event-time epoch ms  (default 2024-01-01)
    step_ms             event-time step per offset          (default 1000)
    names               comma-separated metric names
                        (default "cpu.idle,mem.used,net.rx")
    tenant              tenantId in meta                    (default "t0")
"""

from __future__ import annotations

import json
import os

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)
from pyspark.sql import types as T

DEFAULT_START_MS = 1_704_067_200_000  # 2024-01-01T00:00:00Z
_SCHEMA = T.StructType(
    [
        T.StructField("partition", T.IntegerType(), False),
        T.StructField("offset", T.LongType(), False),
        T.StructField("value", T.StringType(), False),
    ]
)


def _opts(options: dict) -> dict:
    names = options.get("names", "cpu.idle,mem.used,net.rx").split(",")
    return {
        "partitions": int(options.get("partitions", 2)),
        "rows_per_partition": int(options.get("rows_per_partition", 1000)),
        "rows_per_batch": int(options.get("rows_per_batch", 100)),
        "start_ms": int(options.get("start_ms", DEFAULT_START_MS)),
        "step_ms": int(options.get("step_ms", 1000)),
        "names": [n.strip() for n in names if n.strip()],
        "tenant": options.get("tenant", "t0"),
    }


def make_envelope_json(p: int, o: int, cfg: dict) -> str:
    """The deterministic envelope at (partition, offset) — the same
    3-name × 2-host grid shape as the reference publisher, value a
    pure LCG-ish function of the coordinates (integral, so downstream
    sums stay exact)."""
    names = cfg["names"]
    name = names[(o + p) % len(names)]
    host = f"h{o % 2}"
    ts = cfg["start_ms"] + o * cfg["step_ms"]
    value = float((o * 31 + p * 17) % 1000)
    env = {
        "metric": {
            "name": name,
            "dimensions": {"host": host, "service": "loadgen"},
            "timestamp": float(ts),
            "value": value,
            "value_meta": {"src": f"p{p}"},
        },
        "meta": {"tenantId": cfg["tenant"]},
        "creation_time": ts,
    }
    return json.dumps(env, separators=(",", ":"), sort_keys=True)


class _RangePartition(InputPartition):
    def __init__(self, p: int, start: int, end: int):
        self.p = p
        self.start = start
        self.end = end


class _BatchReader(DataSourceReader):
    def __init__(self, options: dict):
        self.cfg = _opts(options)

    def partitions(self):
        n = self.cfg["rows_per_partition"]
        return [
            _RangePartition(p, 0, n)
            for p in range(self.cfg["partitions"])
        ]

    def read(self, part: _RangePartition):
        cfg = self.cfg
        for o in range(part.start, part.end):
            yield (part.p, o, make_envelope_json(part.p, o, cfg))


class _StreamReader(DataSourceStreamReader):
    """Offset contract: the global offset is a dict
    ``{"offset": n}`` meaning every partition has produced rows
    [0, n). ``latestOffset`` advances by ``rows_per_batch`` per
    micro-batch — a rate-style source whose CONTENT is the
    deterministic envelope grid, so replays produce byte-identical
    rows (exactly-once end to end with an idempotent sink).

    RESTART: a Kafka-like source has an external broker holding the
    true latest offset; a generator's only truth is its own counter,
    and the Python DataSource API gives a restarted reader no look at
    the checkpoint before its first ``latestOffset()`` call — so a
    naive in-memory counter REGRESSES below the checkpointed offset
    after restart, and Spark happily plans the stale range again
    (observed as duplicated (partition, offset) rows — r5). The fix
    is the same concept as the Scala rate source persisting its
    start timestamp in checkpoint metadata: pass ``state_dir`` and
    the reader durably records its high-water mark there (atomic
    tmp+rename on every advance, driver-side), seeding the counter on
    restart — offsets then continue exactly where the stream left
    off. Without ``state_dir`` a restart that would regress raises in
    ``partitions()`` instead of silently re-serving data; single
    fresh runs never hit it.
    """

    def __init__(self, options: dict):
        self.cfg = _opts(options)
        self._state_path = None
        state_dir = options.get("state_dir")
        if state_dir:
            os.makedirs(state_dir, exist_ok=True)
            self._state_path = os.path.join(state_dir, "offset_hwm.json")
        self._current = self._load_hwm()

    def _load_hwm(self) -> int:
        if self._state_path and os.path.exists(self._state_path):
            with open(self._state_path) as f:
                return int(json.load(f)["offset"])
        return 0

    def _save_hwm(self) -> None:
        if self._state_path:
            tmp = self._state_path + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"offset": self._current}, f)
            os.replace(tmp, self._state_path)

    def initialOffset(self) -> dict:
        return {"offset": 0}

    def latestOffset(self) -> dict:
        self._current += self.cfg["rows_per_batch"]
        # persist BEFORE returning: if the planned batch never commits,
        # a restart replans from the checkpoint and the recorded mark
        # only skips ahead (gap-free — content is a pure function of
        # offset; an idle jump is fine, a regression is data served
        # twice)
        self._save_hwm()
        return {"offset": self._current}

    def partitions(self, start: dict, end: dict):
        s, e = int(start["offset"]), int(end["offset"])
        if e < s:
            raise ValueError(
                f"metric_envelopes offset regressed ({s} -> {e}): the "
                "stream was restarted from a checkpoint without "
                "state_dir, so the generator's counter restarted from "
                "zero. Pass .option('state_dir', <dir>) to make "
                "offsets resume across restarts."
            )
        if e > self._current:
            self._current = e
            self._save_hwm()
        return [
            _RangePartition(p, s, e)
            for p in range(self.cfg["partitions"])
        ]

    def read(self, part: _RangePartition):
        cfg = self.cfg
        for o in range(part.start, part.end):
            yield (part.p, o, make_envelope_json(part.p, o, cfg))

    def commit(self, end: dict) -> None:
        pass  # high-water mark already persisted at plan time


class EnvelopeLoadgenDataSource(DataSource):
    """``spark.dataSource.register(EnvelopeLoadgenDataSource)`` then
    ``spark.read.format("metric_envelopes")`` /
    ``spark.readStream.format("metric_envelopes")``."""

    @classmethod
    def name(cls) -> str:
        return "metric_envelopes"

    def schema(self):
        return _SCHEMA

    def reader(self, schema) -> _BatchReader:
        return _BatchReader(self.options)

    def streamReader(self, schema) -> _StreamReader:
        return _StreamReader(self.options)


def register(spark) -> None:
    spark.dataSource.register(EnvelopeLoadgenDataSource)
