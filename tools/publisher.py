"""Synthetic MetricEnvelope publisher — parity with the reference's
load generator (reference: tools/publisher.go:66-88, which loops a
3×2 service/hostname dimension grid of "metric2" envelopes at 1 Hz
into Kafka).

Here the default sink is a JSON-lines directory (one file per batch),
which the engine's file-streaming source (`sources.envelope.
read_envelope_json(streaming=True)`) consumes exactly like a topic —
that is how the no-broker CI drives the continuous pipeline. With
``--broker`` it instead writes through the Spark Kafka sink builders
(`sources.kafka`), which require the spark-sql-kafka connector and a
reachable broker.

Usage:
  python tools/publisher.py --out /tmp/envelopes --batches 10 --rate 1
  python tools/publisher.py --broker host:9092 --topic metrics
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

_REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(_REPO))


def make_envelopes(
    *,
    name: str = "metric2",
    value: float = 2.0,
    services: int = 3,
    hosts: int = 2,
    now_ms: int | None = None,
    tenant: str = "",
) -> list[str]:
    """One batch of envelope JSON lines: the reference's dimension grid
    (service 0..services-1 × hostname 0..hosts-1), stamped now."""
    ts = float(now_ms if now_ms is not None else time.time() * 1000)
    out = []
    for i in range(services):
        for j in range(hosts):
            out.append(
                json.dumps(
                    {
                        "metric": {
                            "name": name,
                            "dimensions": {
                                "service": str(i),
                                "hostname": str(j),
                            },
                            "timestamp": ts,
                            "value": value,
                            "value_meta": {},
                        },
                        "meta": {"tenantId": tenant} if tenant else {},
                        "creation_time": int(ts),
                    }
                )
            )
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--out", help="JSONL output directory (file sink)")
    ap.add_argument("--broker", help="Kafka bootstrap servers")
    ap.add_argument("--topic", default="metrics")
    ap.add_argument("--batches", type=int, default=10)
    ap.add_argument("--rate", type=float, default=1.0, help="batches/sec")
    ap.add_argument("--name", default="metric2")
    ap.add_argument("--value", type=float, default=2.0)
    args = ap.parse_args()

    if not args.out and not args.broker:
        ap.error("need --out or --broker")

    if args.out:
        dest = Path(args.out)
        dest.mkdir(parents=True, exist_ok=True)
        for b in range(args.batches):
            lines = make_envelopes(name=args.name, value=args.value)
            (dest / f"batch_{b:06d}.jsonl").write_text("\n".join(lines))
            if b + 1 < args.batches:
                time.sleep(1.0 / args.rate)
        print(f"wrote {args.batches} batches to {dest}")
        return 0

    # Kafka path: envelopes → one-row-per-message DataFrame → kafka sink
    from monasca_aggregator_spark.session import get_spark
    from monasca_aggregator_spark.sources.kafka import sink_options

    spark = get_spark("publisher")
    for b in range(args.batches):
        lines = make_envelopes(name=args.name, value=args.value)
        df = spark.createDataFrame([(v,) for v in lines], "value string")
        opts = sink_options(
            args.broker, args.topic, checkpoint_dir="/tmp/publisher_ckpt"
        )
        opts.pop("checkpointLocation")  # batch writes carry no offset log
        df.write.format("kafka").options(**opts).save()
        if b + 1 < args.batches:
            time.sleep(1.0 / args.rate)
    print(f"published {args.batches} batches to {args.topic}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
