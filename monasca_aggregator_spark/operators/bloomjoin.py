"""Bloom-filter join pruning (runtime-filter pattern).

The reference never joins, but every large-scale pipeline built on this
engine does, and at 100 TB the dominant cost of a selective
fact ⋈ filtered-dim join is shuffling fact rows that will never match.
The classic fix is a runtime Bloom filter: build a compact bitset over
the (already filtered) build-side keys, push it into the probe-side
SCAN as a cheap predicate, and only shuffle survivors. Spark's own
optimizer has an injected version of this
(``spark.sql.optimizer.runtime.bloomFilter.enabled``); this module is
the explicit, composable form for when the planner doesn't fire (e.g.
non-equi conditions, pre-aggregated build sides, or reuse of one filter
across several probe queries).

Everything stays JVM-side: positions are ``xxhash64`` column
expressions and the membership test indexes a broadcast literal word
array — no Python UDF, no extra shuffle, and the filter composes with
whole-stage codegen on the scan.

Sizing: ``num_bits`` should be ≳ 10× the build-side key cardinality
for ~1% false positives with ``num_hashes=5`` (fp ≈ (1-e^{-kn/m})^k).
False positives only cost wasted shuffle rows — the join afterwards is
still exact; false negatives are impossible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 16
DEFAULT_NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    return [
        F.pmod(F.xxhash64(key, F.lit(seed)), F.lit(num_bits))
        for seed in range(num_hashes)
    ]


def build_bloom(
    build: DataFrame,
    key_col: str,
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Bitset over the build side's keys, packed as ``num_bits/64``
    64-bit words (Python ints, sign-wrapped to fit Spark LongType).

    One narrow job: project k hash positions per key, explode, distinct
    (map-side combined — the wire carries ≤ k·|keys| ints regardless of
    build-side row count), collect the distinct positions. Intended for
    build sides that are join-build-sized anyway (≲ tens of millions of
    keys); the resulting words list is broadcast-literal sized
    (num_bits/8 bytes).
    """
    key = F.col(key_col)
    pos_rows = (
        build.filter(key.isNotNull())
        .select(
            F.explode(
                F.array(*_positions(key, num_bits, num_hashes))
            ).alias("p")
        )
        .distinct()
        .collect()
    )
    words = [0] * ((num_bits + 63) // 64)
    for r in pos_rows:
        words[r.p >> 6] |= 1 << (r.p & 63)
    # LongType is signed: re-wrap bit 63 so F.lit accepts every word
    return [w - (1 << 64) if w >= (1 << 63) else w for w in words]


def bloom_might_contain(
    key: Column,
    words: list[int],
    *,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership-test column: true iff all k bits for ``key`` are set.

    The bitset rides into the plan as an array<bigint> literal indexed
    with ``element_at`` (O(1) per probe), and the per-bit mask comes
    from a 64-entry literal mask table because ``shiftleft`` only takes
    Python-int shift amounts. Null keys test false.
    """
    words_lit = F.array(*[F.lit(w).cast("bigint") for w in words])
    masks = F.array(
        *[
            F.lit(1 << b if b < 63 else -(1 << 63)).cast("bigint")
            for b in range(64)
        ]
    )
    tests = [
        F.element_at(words_lit, (p / F.lit(64)).cast("int") + F.lit(1))
        .bitwiseAND(
            F.element_at(masks, F.pmod(p, F.lit(64)).cast("int") + F.lit(1))
        )
        != 0
        for p in _positions(key, num_bits, num_hashes)
    ]
    out = tests[0]
    for t in tests[1:]:
        out = out & t
    return key.isNotNull() & out


def bloom_pruned_join(
    probe: DataFrame,
    build: DataFrame,
    on: str,
    *,
    how: str = "inner",
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Equi-join with the probe side pre-pruned by a Bloom filter over
    the build side's keys. Exact: false positives are removed by the
    join itself. NB: building the filter runs an eager (small) job on
    the build side before the joined plan is returned.
    """
    words = build_bloom(build, on, num_bits=num_bits, num_hashes=num_hashes)
    pruned = probe.filter(
        bloom_might_contain(
            F.col(on), words, num_bits=num_bits, num_hashes=num_hashes
        )
    )
    return pruned.join(build, on, how)
