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
