"""Corpus snapshot diff — CDC between two document drops.

A training-data pipeline re-ingests sources continuously; the step
before any incremental work is "what changed since the last drop":
added / removed / changed / unchanged per document. Expressed as ONE
full-outer hash join on the id plus a content-fingerprint compare —
no raw-text shuffle (both sides project to (id, fingerprint) first,
so the exchange carries two thin columns regardless of document
size). With both snapshots bucket-written on the id
(sources/sinks.py), the join is zero-exchange.

The fingerprint column is caller-supplied (md5/xxhash64 of normalized
text, or a precomputed etag) so the cost/collision trade-off stays a
policy decision.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    fingerprint_col: str = "fingerprint",
) -> DataFrame:
    """(id, status) for every id in either snapshot: added (new only),
    removed (old only), changed (both, fingerprint differs),
    unchanged."""
    # explicit presence markers: inferring presence from fingerprint
    # nullness would misclassify present rows whose fingerprint is
    # NULL (e.g. md5 of a NULL text)
    o = old.select(
        F.col(id_col).alias(id_col),
        F.col(fingerprint_col).alias("__fp_old"),
        F.lit(True).alias("__in_old"),
    )
    n = new.select(
        F.col(id_col).alias(id_col),
        F.col(fingerprint_col).alias("__fp_new"),
        F.lit(True).alias("__in_new"),
    )
    joined = o.join(n, id_col, "full_outer")
    status = (
        F.when(F.col("__in_old").isNull(), F.lit("added"))
        .when(F.col("__in_new").isNull(), F.lit("removed"))
        .when(
            ~F.col("__fp_old").eqNullSafe(F.col("__fp_new")),
            F.lit("changed"),
        )
        .otherwise(F.lit("unchanged"))
    )
    return joined.select(F.col(id_col), status.alias("status"))
