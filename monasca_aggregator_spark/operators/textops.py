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


def compression_ratio(
    docs: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """zlib compression ratio per document (compressed/raw bytes) — the
    classic repetitiveness signal: boilerplate and template spam
    compress far below ~0.4 while natural prose sits near 0.5-0.8.

    No deflate exists JVM-side, so this is the one text op that runs in
    Python — as an Arrow-batched pandas UDF (a narrow projection, still
    no shuffle; at 100 TB it scans at Arrow transfer speed, not
    per-row-pickle speed). Empty/null texts yield null."""
    return docs.select(
        F.col(id_col),
        stable_round(_make_zlib_ratio()(F.col(text_col)), 4).alias(
            "compress_ratio"
        ),
    )


def _make_zlib_ratio():
    # built lazily: pandas_udf needs an active SparkSession. Real
    # (non-string) hints are attached so pandas_udf's type-hint
    # inference works under `from __future__ import annotations`
    import zlib

    import pandas as pd

    from pyspark.sql.functions import pandas_udf

    def _ratio(texts):
        def one(t):
            if t is None or len(t) == 0:
                return None
            raw = t.encode("utf-8")
            return len(zlib.compress(raw, 6)) / len(raw)

        return texts.map(one)

    _ratio.__annotations__ = {"texts": pd.Series, "return": pd.Series}
    return pandas_udf("double")(_ratio)
