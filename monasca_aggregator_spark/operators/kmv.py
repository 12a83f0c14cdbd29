"""KMV (k-minimum-values / bottom-k theta) distinct sketch with SET
OPERATIONS — the capability HLL cannot provide.

The repo already has two cardinality paths: exact ``count_distinct``
and union-mergeable HLL (plans/metrics.py `agg_distinct_hll`,
reference parity for the ref's per-window counting in
/root/reference/aggregation/counting_metric.go).  Neither can answer
*set-expression* cardinalities — "how many users were active in BOTH
window A and window B" — because HLL unions but does not intersect.
The KMV sketch does: keep the k smallest (distinct) 64-bit hash values
of each set; then

- ``|A| ≈ (k-1) / θ_k``        (θ_k = k-th smallest hash, mapped to (0,1])
- union sketch = k smallest of the merged arrays (lossless re-sketch)
- ``|A∩B| ≈ ρ/K · |A∪B|``      (ρ = matching hashes under the union θ)

State is a bounded sorted array of ≤ k longs (k·8 bytes — at k=1024
that is 8 KiB per group, independent of corpus size), and the
aggregation is a map-side-combinable ``collect_set`` + sort + slice:
the shuffle carries sketches, never raw members.  When the true
cardinality is below k the sketch degrades to the EXACT distinct set
of hashes, so estimates are exact integers — the same
exact-at-test-SF / approximate-at-scale posture as the HLL sparse
mode and GK sketch paths, which is what lets the intersection query
sit under the DuckDB exact oracle.

Scale posture (100 TB): one shuffle keyed by the group; per-group
state capped at k hashes regardless of input rows; estimators are
pure column expressions (no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Flipping the sign bit makes signed ordering of the result equal the
# UNSIGNED ordering of the raw xxhash64 — so "k smallest" is over the
# uniform unsigned hash domain, not biased toward negative halves.
_SIGN_BIT = -(1 << 63)
_TWO_63 = float(1 << 63)


def kmv_hash(col: Column) -> Column:
    """Uniform 64-bit hash of ``col``, sign-bit-flipped so that the
    natural BIGINT sort order equals unsigned hash order."""
    return F.xxhash64(col).bitwiseXOR(F.lit(_SIGN_BIT))


def kmv_agg(col: Column, k: int) -> Column:
    """Aggregate expression: sorted array of the ≤ k smallest distinct
    hash values of ``col`` within the group (the KMV sketch)."""
    return F.slice(F.array_sort(F.collect_set(kmv_hash(col))), 1, k)


def kmv_agg_if(col: Column, cond: Column, k: int) -> Column:
    """Conditional sketch aggregate: like :func:`kmv_agg` but only
    rows satisfying ``cond`` contribute.  The hash is applied INSIDE
    the when() so non-matching rows yield NULL (skipped by
    collect_set) — hashing a when() that returned NULL would instead
    produce xxhash64's seed value and pollute the sketch.  Lets one
    groupBy pass build a sketch per segment from a single scan."""
    return F.slice(
        F.array_sort(F.collect_set(F.when(cond, kmv_hash(col)))), 1, k
    )


def kmv_merge(a: Column, b: Column, k: int) -> Column:
    """Union of two KMV sketches: k smallest of the distinct merged
    hashes — a lossless re-sketch (same result as sketching A∪B)."""
    return F.slice(
        F.array_sort(F.array_distinct(F.concat(a, b))), 1, k
    )


def _theta(sk: Column) -> Column:
    """k-th smallest hash mapped to (0, 1] — the sampled fraction of
    the unsigned hash space."""
    last = F.element_at(sk, F.size(sk))
    return (last.cast("double") / F.lit(_TWO_63) + F.lit(1.0)) / F.lit(2.0)


def kmv_estimate(sk: Column, k: int) -> Column:
    """Distinct-count estimate.  Exact (= array size) while the set is
    below the cap; (k-1)/θ_k once the sketch saturates."""
    return (
        F.when(F.size(sk) < k, F.size(sk).cast("double"))
        .otherwise(F.lit(float(k - 1)) / _theta(sk))
    )


def kmv_intersect_estimate(a: Column, b: Column, k: int) -> Column:
    """|A∩B| estimate from two sketches built with the same k.

    Standard KMV set-operation estimator: restrict both sketches to
    the union's θ (the k-th smallest of the merged hashes), count
    matches ρ among them, and scale: ρ/K · |A∪B|.  Below the cap both
    arrays are the full hash sets, θ covers everything, and the
    estimate is EXACTLY ``|array_intersect(a, b)|`` (returned directly
    in that case — the float round-trip through ρ/K · |A∪B| is not
    bit-exact for whole numbers, and exact mode must be exact)."""
    u = kmv_merge(a, b, k)
    union_est = kmv_estimate(u, k)
    kk = F.size(u)  # = K, the union sketch's effective k
    exact = F.size(F.array_intersect(a, b)).cast("double")
    theta_hash = F.element_at(u, kk)  # largest retained hash
    rho = F.size(
        F.filter(
            F.array_intersect(a, b), lambda h: h <= theta_hash
        )
    )
    scaled = rho.cast("double") / kk.cast("double") * union_est
    return (
        F.when(kk == 0, F.lit(0.0))
        .when(kk < k, exact)  # nothing saturated -> exact set algebra
        .otherwise(scaled)
    )
