"""End-to-end daemon smoke test: the `python -m
monasca_aggregator_spark` entrypoint run in-process against
reference-format config + specification YAML files and a file-based
envelope source — the broker-less deployment mode. Covers argument
validation, YAML loading, pipeline startup, bounded run, and that
aggregated envelope JSON actually lands in the sink directory."""

from __future__ import annotations

import json
import time
from pathlib import Path

import pytest


def _write_yaml_files(tmp_path):
    (tmp_path / "config.yaml").write_text(
        "windowSize: 2\n"
        "windowLag: 1\n"
        "consumerTopic: metrics\n"
        "producerTopic: metrics\n"
        # availableNow-less bounded file run: heartbeat stays ON (the
        # daemon default) — the rate source keeps advancing processing
        # time so lagged windows publish during the bounded run
    )
    (tmp_path / "specs.yaml").write_text(
        "aggregationSpecifications:\n"
        "  - name: sum_metric2\n"
        "    aggregatedMetricName: metric2.sum\n"
        "    filteredMetricName: metric2\n"
        "    function: sum\n"
        "    groupedDimensions: [service]\n"
    )


def test_cli_requires_paired_source_sink(tmp_path):
    from monasca_aggregator_spark.__main__ import main

    _write_yaml_files(tmp_path)
    with pytest.raises(SystemExit):
        main(
            [
                "--config", str(tmp_path / "config.yaml"),
                "--specs", str(tmp_path / "specs.yaml"),
                "--source-dir", str(tmp_path / "src"),
            ]
        )


def test_cli_file_mode_end_to_end(spark, tmp_path):
    import sys

    sys.path.insert(0, "tools")
    import publisher

    from monasca_aggregator_spark.__main__ import main

    _write_yaml_files(tmp_path)
    src = tmp_path / "src"
    sink = tmp_path / "sink"
    src.mkdir()
    # two batches a window apart so at least one window closes + lags out
    t0 = int(time.time() * 1000) - 20_000
    for b in range(4):
        lines = publisher.make_envelopes(
            name="metric2", value=2.0, now_ms=t0 + b * 2000, tenant="t1"
        )
        (src / f"batch{b}.jsonl").write_text("\n".join(lines) + "\n")

    rc = main(
        [
            "--config", str(tmp_path / "config.yaml"),
            "--specs", str(tmp_path / "specs.yaml"),
            "--source-dir", str(src),
            "--sink-dir", str(sink),
            "--checkpoint-dir", str(tmp_path / "ckpt"),
            "--duration", "25",
            "--cpus", "8",
        ],
        stop_session=False,
    )
    assert rc == 0

    # Read the sink through its _spark_metadata commit log, not a raw
    # glob: a bounded-run stop can abort an in-flight batch whose
    # uncommitted part files are still being cleaned up when main()
    # returns (publish-then-commit, reference server.go:222-258) —
    # committed files are the sink's actual output contract.
    from monasca_aggregator_spark.sources.sinks import committed_sink_files

    out_lines = []
    for path in committed_sink_files(str(sink / "sum_metric2")):
        p = Path(path.removeprefix("file:"))
        out_lines += [
            ln for ln in p.read_text().splitlines() if ln.strip()
        ]
    assert out_lines, "no aggregated envelopes published"
    env = json.loads(out_lines[0])
    m = env["metric"]
    assert m["name"] == "metric2.sum"
    assert "service" in m["dimensions"]
    # 2 hosts x value 2.0 summed per service per window
    assert m["value"] == pytest.approx(4.0)
    assert env["meta"]["tenantId"] == "t1"


def test_emit_sql_prints_each_rule_and_exits():
    """--emit-sql: the reference YAML comes out as one SQL statement
    per rule with no Spark session started."""
    import io
    from contextlib import redirect_stdout

    from monasca_aggregator_spark.__main__ import main

    buf = io.StringIO()
    with redirect_stdout(buf):
        rc = main(
            [
                "--config", "/root/reference/config.yaml",
                "--specs",
                "/root/reference/aggregation-specifications.yaml",
                "--emit-sql",
            ],
            stop_session=False,
        )
    out = buf.getvalue()
    assert rc == 0
    assert out.count("-- rule: ") == 5
    assert out.count("FROM agg;") == 5  # one final SELECT per rule
