"""Text-analysis operators over a documents relation.

All pure column expressions (see functions/text.py) — each operator is
a narrow projection, no shuffle at all: at 100 TB these run at parquet
scan speed with full column pruning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import stable_round
from monasca_aggregator_spark.functions.text import (
    BPE_REGEX,
    STOPWORDS,
    lang_id,
    rolling_fingerprint,
    tokens,
)


def language_id(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col), lang_id(F.col(text_col)).alias("pred_lang")
    )


def token_counts(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    text = F.col(text_col)
    return docs.select(
        F.col(id_col),
        F.size(tokens(text)).alias("n_ws_tokens"),
        F.regexp_count(text, F.lit(BPE_REGEX)).alias("n_bpe_tokens"),
        F.length(text).alias("n_chars"),
    )


def quality_scores(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Heuristic quality score from length, stopword and punctuation
    ratios (the classic pre-training text filters)."""
    text = F.col(text_col)
    toks = tokens(text)
    n_tokens = F.size(toks)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.array_intersect(toks, stop_arr))  # distinct-hit count
    stop_ratio = n_stop / n_tokens
    punct_ratio = F.regexp_count(text, F.lit(r"[.,!?;:]")) / F.length(text)
    quality = (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * F.least(n_tokens / F.lit(100.0), F.lit(1.0))
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio)
    )
    return docs.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        stable_round(stop_ratio, 4).alias("stop_ratio"),
        stable_round(punct_ratio, 4).alias("punct_ratio"),
        stable_round(quality, 4).alias("quality"),
    )


def fingerprints(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    return docs.select(
        F.col(id_col),
        rolling_fingerprint(F.col(text_col)).alias("fingerprint"),
    )
