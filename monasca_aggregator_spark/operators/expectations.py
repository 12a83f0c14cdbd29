"""Declarative data-quality expectations compiled to ONE aggregate pass.

A rule list (not-null / range / accepted-set / arbitrary predicate /
key-uniqueness) compiles into a single ``groupBy().agg`` over the
table — one scan, no joins, map-side partial aggregation — producing a
fixed-size violation report ``(rule, violations, checked, passed)``.
This is the ingestion-gate pattern (Great-Expectations-style checks)
re-expressed as a Catalyst plan: every predicate rule is a
``sum(CASE WHEN ...)`` inside the same whole-stage-codegen'd
aggregate, and the wide 1-row result is unpivoted JVM-side (inline of
a struct array, no Python).

Uniqueness rules ride the same pass as ``count(key tuple fully
non-null) − count(DISTINCT key...)`` (duplicate non-null key tuples
only — ``checked`` for a unique rule is the non-null-tuple count, so
rows with a null key component are the not-null rules' business and
never count as uniqueness violations).

Referential-integrity edges are deliberately NOT rules here — they
need per-edge anti-joins and live in plans/advanced.py's
``audit_referential``.

Reference parity: the reference validates its aggregation specs at
load time (aggregation.go specification checks) but has no data-side
gate; this extends that validation posture to the data itself.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Rule:
    """One expectation: either a row predicate (pass iff true; a NULL
    predicate outcome counts as a violation) or a unique-key spec."""

    name: str
    predicate: Column | None = None
    unique_on: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if (self.predicate is None) == (not self.unique_on):
            raise ValueError(
                f"rule {self.name!r}: exactly one of predicate/unique_on"
            )


def not_null(col: str) -> Rule:
    return Rule(f"not_null({col})", F.col(col).isNotNull())


def in_range(col: str, lo, hi) -> Rule:
    return Rule(
        f"range({col})", (F.col(col) >= F.lit(lo)) & (F.col(col) <= F.lit(hi))
    )


def in_set(col: str, values) -> Rule:
    vals = sorted(values)
    return Rule(f"in_set({col})", F.col(col).isin(vals))


def satisfies(name: str, predicate: Column) -> Rule:
    return Rule(f"satisfies({name})", predicate)


def unique(*cols: str) -> Rule:
    return Rule(f"unique({','.join(cols)})", unique_on=tuple(cols))


def check(df: DataFrame, rules: list[Rule]) -> DataFrame:
    """(rule, violations, checked, passed) — one row per rule, one scan.

    ``checked`` is the table row count for predicate rules (evaluated
    on all rows; NULL outcomes violate — a not-null rule is the
    explicit way to track nullness) and the fully-non-null key-tuple
    count for unique rules (countDistinct skips null-component tuples,
    so counting them in would misreport every null-key row as a
    duplicate).
    """
    if not rules:
        raise ValueError("no rules")
    aggs = [F.count(F.lit(1)).alias("__checked")]
    checked_col: dict[int, str] = {}
    for i, r in enumerate(rules):
        if r.predicate is not None:
            checked_col[i] = "__checked"
            aggs.append(
                F.sum(
                    F.when(r.predicate, F.lit(0)).otherwise(F.lit(1))
                ).alias(f"__v{i}")
            )
        else:
            checked_col[i] = f"__c{i}"
            keys_not_null = F.lit(True)
            for c in r.unique_on:
                keys_not_null = keys_not_null & F.col(c).isNotNull()
            aggs.append(
                F.count(F.when(keys_not_null, F.lit(1))).alias(f"__c{i}")
            )
            aggs.append(
                (
                    F.count(F.when(keys_not_null, F.lit(1)))
                    - F.countDistinct(*[F.col(c) for c in r.unique_on])
                ).alias(f"__v{i}")
            )
    wide = df.agg(*aggs)
    report = F.inline(
        F.array(
            *[
                F.struct(
                    F.lit(r.name).alias("rule"),
                    F.col(f"__v{i}").cast("long").alias("violations"),
                    F.col(checked_col[i]).cast("long").alias("checked"),
                    (F.col(f"__v{i}") == 0).alias("passed"),
                )
                for i, r in enumerate(rules)
            ]
        )
    )
    return wide.select(report)


def observe_rules(df: DataFrame, rules: list[Rule], *, name: str = "expectations"):
    """Streaming-safe expectations: attach the same compiled rule
    aggregates as ``check`` to the plan via ``DataFrame.observe`` —
    per-micro-batch violation counts arrive in
    ``StreamingQueryProgress.observedMetrics[name]`` with zero extra
    passes (one codegen'd aggregate riding the batch's own job). The
    in-flight ingestion gate: alert when a batch's violation counts
    jump, without a second scan of the stream.

    Predicate rules only — uniqueness needs cross-batch state (that's
    the streaming dedup operator's business, not an observation's).
    """
    if not rules:
        raise ValueError("no rules")
    aggs = [F.count(F.lit(1)).alias("checked")]
    for r in rules:
        if r.predicate is None:
            raise ValueError(
                f"rule {r.name!r}: unique rules are not observable "
                "per-batch (need cross-batch state)"
            )
        aggs.append(
            F.sum(F.when(r.predicate, F.lit(0)).otherwise(F.lit(1)))
            .cast("long")
            .alias(r.name)
        )
    return df.observe(name, *aggs)
