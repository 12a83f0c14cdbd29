"""Pipeline self-instrumentation: in/out message counters.

The reference registers Prometheus ``in_messages`` / ``out_messages``
counters and increments them per consumed/produced message
(reference: server.go:42-48, 232, 330). A Spark pipeline must NOT
count driver-side (that would collect the stream) — the native
mechanism is ``DataFrame.observe``: named aggregate expressions
evaluated inside the job, surfaced on the driver after each
batch/epoch without a second pass over the data.

Usage — wrap the edges of any plan:

    src, in_o = count_edge(src, IN_METRIC)        # source edge
    out = build_plan(src)
    out, out_o = count_edge(out, OUT_METRIC)      # sink edge
    out.collect()                                 # or writeStream...
    in_o.get["n"], out_o.get["n"]                 # batch counters

Streaming: pass ``streaming=True`` (Observation handles are
batch-only); the same named metrics then arrive per micro-batch in
``StreamingQueryProgress.observedMetrics`` — poll ``lastProgress`` or
attach a ``StreamingQueryListener`` and forward anywhere. The
Prometheus HTTP endpoint itself is a process concern; the engine's
job is making the counts observable with zero extra passes, which
observe() does (one codegen'd count per edge, no shuffle, no rescan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import (
    StreamingQueryListener as _StreamingQueryListener,
)

IN_METRIC = "in_messages"
OUT_METRIC = "out_messages"


def count_edge(
    df: DataFrame, name: str, *, streaming: bool = False
):
    """Attach a row counter at this edge of the plan.

    Returns (instrumented_df, observation) — build the rest of the
    plan from ``instrumented_df`` so the count rides the same job.
    ``observation`` is a batch ``Observation`` handle (read
    ``.get["n"]`` after an action) or None when ``streaming`` (read
    the metric by ``name`` from observedMetrics instead).
    """
    if streaming:
        return df.observe(name, F.count(F.lit(1)).alias("n")), None
    from pyspark.sql import Observation

    obs = Observation(name)
    return df.observe(obs, F.count(F.lit(1)).alias("n")), obs


class CounterRegistry:
    """Minimal Prometheus counter registry + text exposition.

    The reference exposes ``in_messages``/``out_messages`` over HTTP in
    the Prometheus text format (server.go:42-48; docs/local_install.md).
    prometheus_client isn't a dependency here, and the 0.0.4 text
    format is a public two-line-per-metric spec — so this implements
    exactly the slice needed: monotonic counters and ``exposition()``.
    Thread-safe (listener callbacks arrive on Py4J callback threads).
    """

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self._counters: dict[str, float] = {}

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] = self._counters.get(name, 0.0) + value

    def get(self, name: str) -> float:
        with self._lock:
            return self._counters.get(name, 0.0)

    def exposition(self) -> str:
        """Prometheus text format 0.0.4 (one HELP/TYPE/value stanza per
        counter; trailing newline required by the spec)."""
        with self._lock:
            items = sorted(self._counters.items())
        lines = []
        for name, value in items:
            lines.append(f"# HELP {name} pipeline counter")
            lines.append(f"# TYPE {name} counter")
            v = int(value) if float(value).is_integer() else value
            lines.append(f"{name} {v}")
        return "\n".join(lines) + "\n"


def make_progress_listener(registry: CounterRegistry):
    """StreamingQueryListener forwarding per-micro-batch
    ``observedMetrics`` (the count_edge counters) into ``registry``.

    Attach with ``spark.streams.addListener(...)``; every progress
    event's observed metric named ``in_messages``/``out_messages`` (or
    any other count_edge name) increments the matching counter — the
    streaming equivalent of the reference incrementing its counters per
    consumed/produced message (server.go:232, 330).
    """
    from pyspark.sql.streaming import StreamingQueryListener

    class _Forward(StreamingQueryListener):
        def onQueryStarted(self, event):  # noqa: N802
            pass

        def onQueryProgress(self, event):  # noqa: N802
            for name, row in (event.progress.observedMetrics or {}).items():
                try:
                    n = row["n"]
                except (KeyError, TypeError, ValueError):
                    continue
                if n is not None:
                    registry.inc(name, float(n))

        def onQueryIdle(self, event):  # noqa: N802
            pass

        def onQueryTerminated(self, event):  # noqa: N802
            pass

    return _Forward()


def start_http_exporter(
    registry: CounterRegistry, port: int = 0
) -> tuple[object, int]:
    """Serve ``registry.exposition()`` at ``/metrics`` on a daemon
    thread (stdlib http.server — scrape-compatible with Prometheus).
    Returns (server, bound_port); ``server.shutdown()`` stops it.
    ``port=0`` binds an ephemeral port (tests)."""
    import threading
    from http.server import BaseHTTPRequestHandler, HTTPServer

    class _Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802
            if self.path.rstrip("/") not in ("", "/metrics"):
                self.send_response(404)
                self.end_headers()
                return
            body = registry.exposition().encode()
            self.send_response(200)
            self.send_header(
                "Content-Type", "text/plain; version=0.0.4; charset=utf-8"
            )
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, *args):  # silence per-request stderr spam
            pass

    server = HTTPServer(("127.0.0.1", port), _Handler)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    return server, server.server_address[1]


class ProgressRecorder(_StreamingQueryListener):
    """Per-micro-batch stream telemetry as a queryable relation — the
    operational readout beside the counters: batch duration, input
    volume, processing rate, WATERMARK LAG (wall clock at progress
    time minus the event-time watermark — the reference's consumer-lag
    observable, server.go:213-296, generalized to event time), and
    stateful-operator footprint.

    A ``StreamingQueryListener`` subclass that keeps the newest
    ``capacity`` progress records in a bounded deque (thread-safe;
    callbacks arrive on Py4J threads; a long-running stream cannot
    grow driver memory). ``records()`` returns plain dicts;
    ``to_df(spark)`` a DataFrame for SQL over the stream's own health;
    ``health()`` the one-glance summary an alert rule consumes.

    Attach with ``spark.streams.addListener(recorder)`` — one recorder
    observes every query on the session; filter by ``query_name``.
    """

    _FIELDS = (
        "query_name query_id batch_id ts_ms n_input_rows"
        " input_rows_per_sec processed_rows_per_sec trigger_ms"
        " watermark_ms watermark_lag_ms state_rows state_bytes"
    ).split()

    def __init__(self, capacity: int = 1024) -> None:
        import collections
        import threading

        self._lock = threading.Lock()
        self._buf = collections.deque(maxlen=capacity)

    # -- StreamingQueryListener interface --
    def onQueryStarted(self, event):  # noqa: N802
        pass

    def onQueryIdle(self, event):  # noqa: N802
        pass

    def onQueryTerminated(self, event):  # noqa: N802
        pass

    def onQueryProgress(self, event):  # noqa: N802
        import json as _json

        p = event.progress
        rec = _json.loads(p.json) if hasattr(p, "json") else dict(p)
        self.record(rec)

    @staticmethod
    def _iso_ms(s: str | None) -> int | None:
        if not s:
            return None
        from datetime import datetime, timezone

        dt = datetime.fromisoformat(s.replace("Z", "+00:00"))
        if dt.tzinfo is None:
            dt = dt.replace(tzinfo=timezone.utc)
        return int(dt.timestamp() * 1000)

    def record(self, progress: dict) -> None:
        """Fold one StreamingQueryProgress JSON dict into the buffer
        (exposed for tests and for polling ``query.lastProgress``
        without a listener)."""
        ts_ms = self._iso_ms(progress.get("timestamp"))
        wm_ms = self._iso_ms(
            (progress.get("eventTime") or {}).get("watermark")
        )
        state = progress.get("stateOperators") or []
        row = {
            "query_name": progress.get("name"),
            "query_id": progress.get("id"),
            "batch_id": progress.get("batchId"),
            "ts_ms": ts_ms,
            "n_input_rows": progress.get("numInputRows"),
            "input_rows_per_sec": progress.get("inputRowsPerSecond"),
            "processed_rows_per_sec": progress.get(
                "processedRowsPerSecond"
            ),
            "trigger_ms": (progress.get("durationMs") or {}).get(
                "triggerExecution"
            ),
            "watermark_ms": wm_ms,
            "watermark_lag_ms": (
                ts_ms - wm_ms
                if ts_ms is not None and wm_ms is not None
                else None
            ),
            "state_rows": sum(
                s.get("numRowsTotal") or 0 for s in state
            )
            if state
            else None,
            "state_bytes": sum(
                s.get("memoryUsedBytes") or 0 for s in state
            )
            if state
            else None,
        }
        with self._lock:
            self._buf.append(row)

    def records(self, *, query_name: str | None = None) -> list[dict]:
        with self._lock:
            rows = list(self._buf)
        if query_name is not None:
            rows = [r for r in rows if r["query_name"] == query_name]
        return rows

    def to_df(self, spark, *, query_name: str | None = None):
        """The buffer as a DataFrame (stable schema even when empty) —
        the stream's own health is then just SQL: lag percentiles,
        batch-duration trend, state growth."""
        rows = self.records(query_name=query_name)
        schema = (
            "query_name string, query_id string, batch_id long,"
            " ts_ms long, n_input_rows long,"
            " input_rows_per_sec double, processed_rows_per_sec double,"
            " trigger_ms long, watermark_ms long, watermark_lag_ms long,"
            " state_rows long, state_bytes long"
        )
        return spark.createDataFrame(
            [tuple(r[f] for f in self._FIELDS) for r in rows], schema
        )

    def health(self, *, query_name: str | None = None) -> dict:
        """One-glance summary: batches seen, total/mean input volume,
        worst and latest trigger latency, newest watermark lag, state
        footprint of the newest batch. None-safe on partial fields."""
        rows = self.records(query_name=query_name)
        if not rows:
            return {"n_batches": 0}
        trig = [r["trigger_ms"] for r in rows if r["trigger_ms"] is not None]
        lag = [
            r["watermark_lag_ms"]
            for r in rows
            if r["watermark_lag_ms"] is not None
        ]
        newest = rows[-1]
        return {
            "n_batches": len(rows),
            "total_input_rows": sum(
                r["n_input_rows"] or 0 for r in rows
            ),
            "max_trigger_ms": max(trig) if trig else None,
            "last_trigger_ms": trig[-1] if trig else None,
            "last_watermark_lag_ms": lag[-1] if lag else None,
            "last_state_rows": newest["state_rows"],
            "last_state_bytes": newest["state_bytes"],
        }
