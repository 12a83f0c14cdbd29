"""Rule DSL data model.

Mirrors the reference's aggregation-specification schema
(reference: models/aggregation_specification.go:17-31 and
docs/aggregations.md) with the same validation rules as
aggregation.NewAggregationRule (reference: aggregation/aggregation_rule.go:30-48):

- aggregatedMetricName, filteredMetricName, function are required;
- rollup.groupedDimensions must be a subset of groupedDimensions.
"""

from __future__ import annotations

from dataclasses import dataclass, field

SUPPORTED_FUNCTIONS = frozenset(
    {"sum", "count", "avg", "min", "max", "delta", "rate",
     # beyond the reference's seven: sketch-backed, bounded-state
     # functions that stay map-side-combinable in streaming
     "distinct", "p95"}
)


class SpecError(ValueError):
    """Invalid aggregation specification."""


@dataclass(frozen=True)
class Rollup:
    """Second-stage re-aggregation of a window's group results."""

    function: str
    grouped_dimensions: tuple[str, ...] = ()

    def __post_init__(self) -> None:
        if self.function not in SUPPORTED_FUNCTIONS:
            raise SpecError(f"rollup function {self.function!r} not supported")


@dataclass(frozen=True)
class AggregationSpec:
    """One aggregation rule.

    ``filtered_dimensions`` keep only metrics carrying those exact k=v
    pairs; ``rejected_dimensions`` drop metrics carrying a k=v pair (an
    empty-string value rejects *every* value of that key);
    ``grouped_dimensions`` become part of the group key (alongside the
    tenant) and of the output dimensions. Metrics missing a grouped key
    are not matched (reference: aggregation/aggregation_rule.go:166-172).
    """

    name: str
    aggregated_metric_name: str
    filtered_metric_name: str
    function: str
    filtered_dimensions: dict[str, str] = field(default_factory=dict)
    rejected_dimensions: dict[str, str] = field(default_factory=dict)
    grouped_dimensions: tuple[str, ...] = ()
    rollup: Rollup | None = None
    # delta/rate first/last ordering: "event" (event-time, the
    # deterministic default) or "arrival" (reference parity with
    # delta_metric.go / rate_metric.go's Kafka consume order — needs an
    # arrival column, e.g. the Kafka offset, in the input relation)
    time_source: str = "event"

    def __post_init__(self) -> None:
        if self.time_source not in ("event", "arrival"):
            raise SpecError(
                f"rule {self.name}: timeSource must be 'event' or "
                f"'arrival', got {self.time_source!r}"
            )
        if not self.name:
            raise SpecError("rule must have a name")
        if not self.aggregated_metric_name:
            raise SpecError(f"rule {self.name} must have an aggregated metric name")
        if not self.filtered_metric_name:
            raise SpecError(f"rule {self.name} must have a filtered metric name")
        if self.function not in SUPPORTED_FUNCTIONS:
            raise SpecError(
                f"rule {self.name}: function {self.function!r} not supported"
            )
        if self.rollup is not None:
            missing = set(self.rollup.grouped_dimensions) - set(
                self.grouped_dimensions
            )
            if missing:
                raise SpecError(
                    f"rule {self.name}: rollup.groupedDimensions {sorted(missing)} "
                    "must all be in groupedDimensions"
                )
