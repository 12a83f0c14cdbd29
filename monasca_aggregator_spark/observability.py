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
