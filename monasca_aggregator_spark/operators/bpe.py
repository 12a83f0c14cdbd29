"""Distributed BPE (byte-pair-encoding) merge-rule training.

Classic BPE (Sennrich et al. 2016) trains on the WORD-FREQUENCY
dictionary, not the raw corpus: after one exploded word count, every
iteration touches only (distinct word, freq) rows — for web-scale text
that dictionary is orders of magnitude smaller than the corpus and is
the only thing that ever shuffles again.

Per merge iteration, entirely in DataFrame ops:
- adjacent symbol pairs via a zip_with over the symbol array with its
  own tail (no posexplode self-join);
- pair counts = explode + groupBy (map-side partials; weighting by
  word freq);
- the argmax pair via orderBy().limit(1) — TakeOrdered, a per-partition
  1-row heap, not a global sort;
- the merge applied to every dictionary entry as a left fold
  (``F.aggregate``) in whole-stage codegen — greedy leftmost,
  non-overlapping, exactly the reference semantics of merging a pair
  list-wise ("aaa" + (a,a) → "aa","a").

The driver loop holds only the winning pair per round (the iterative
structure shared with IVF k-means training, similarity.py). Output is
the ranked merge table — the artifact a tokenizer ships.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.text import tokens

END_MARK = "</w>"


def _word_dict(docs: DataFrame, text_col: str) -> DataFrame:
    """(word, freq) dictionary — the one corpus-sized aggregation."""
    return (
        docs.select(F.explode(tokens(F.col(text_col))).alias("word"))
        .filter(F.col("word") != "")
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )


def _adjacent_pairs(syms):
    """Array of 'a b' strings for each adjacent symbol pair."""
    tail = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    return F.zip_with(
        F.slice(syms, 1, F.greatest(F.size(syms) - 1, F.lit(0))),
        tail,
        lambda a, b: F.concat_ws(" ", a, b),
    )


def _merge_fold(syms, a: str, b: str):
    """Greedy leftmost merge of adjacent (a, b) into a+b. The merged
    token a+b is strictly longer than a, so a freshly merged tail can
    never be re-consumed — no flag needed in the fold state."""
    merged = a + b
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0)
            & (F.element_at(acc, -1) == F.lit(a))
            & (x == F.lit(b)),
            F.concat(
                F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(merged))
            ),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _merge_pass(syms: list, a: str, b: str, merged: str) -> list:
    """Python mirror of ``_merge_fold``'s single greedy-leftmost pass —
    the encode side must replicate training's fold EXACTLY (including
    its re-check of the freshly merged tail against the next symbol)
    so encoded words equal the dictionary state training left behind."""
    acc: list = []
    for x in syms:
        if acc and acc[-1] == a and x == b:
            acc[-1] = merged
        else:
            acc.append(x)
    return acc


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple[str, str, str]],
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Apply learned merge rules to documents → (doc_id, n_tokens,
    n_words). ``merges`` is the rank-ordered [(left, right, merged)]
    list from ``train_bpe_merges`` (a few hundred rows — rides the
    task closure).

    Tokenization is the one pipeline stage where per-word Python is
    the honest choice (production tokenizers are native code; there is
    no built-in column fold over a rule LIST), so this is an Arrow
    mapInPandas with a WORD-LEVEL MEMO: Zipf's law means a batch's
    distinct-word count is a small fraction of its token count, and
    each distinct word is encoded once per task, not once per
    occurrence. No shuffle — the output is a per-doc projection.
    """
    import pandas as pd

    rules = [(a, b, m) for a, b, m in merges]

    def _encode(batches):
        memo: dict[str, int] = {}

        def word_len(w: str) -> int:
            hit = memo.get(w)
            if hit is not None:
                return hit
            syms = list(w) + [END_MARK]
            for a, b, m in rules:
                if len(syms) < 2:
                    break
                syms = _merge_pass(syms, a, b, m)
            memo[w] = len(syms)
            return memo[w]

        for pdf in batches:
            n_tokens, n_words = [], []
            for text in pdf["__text"]:
                ws = [w for w in (text or "").lower().split() if w]
                n_words.append(len(ws))
                n_tokens.append(sum(word_len(w) for w in ws))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["__id"],
                    "n_words": n_words,
                    "n_tokens": n_tokens,
                }
            )

    prepared = docs.select(
        F.col(id_col).alias("__id"),
        F.lower(F.col(text_col)).alias("__text"),
    )
    return prepared.mapInPandas(
        _encode, "doc_id long, n_words long, n_tokens long"
    )


def train_bpe_merges(
    spark: SparkSession,
    docs: DataFrame,
    *,
    n_merges: int = 12,
    text_col: str = "text",
    min_freq: int = 2,
) -> DataFrame:
    """Learn ``n_merges`` merge rules; returns (rank, left, right,
    merged, freq) ordered by rank. Stops early when no pair reaches
    ``min_freq``."""
    seqs = _word_dict(docs, text_col).select(
        "freq",
        F.concat(
            F.split(F.col("word"), ""), F.array(F.lit(END_MARK))
        ).alias("syms"),
    )
    # localCheckpoint (eager) truncates lineage each round: without it
    # the logical plan accretes one nested fold per iteration and
    # analyzer/optimizer time — not execution — comes to dominate
    # (measured ~10× the whole job by merge 16 at sf0.01).
    seqs = seqs.localCheckpoint(eager=True)
    merges: list[tuple] = []
    for rank in range(n_merges):
        top = (
            seqs.select(
                "freq", F.explode(_adjacent_pairs(F.col("syms"))).alias("pair")
            )
            .groupBy("pair")
            .agg(F.sum("freq").alias("n"))
            .orderBy(F.col("n").desc(), F.col("pair").asc())
            .limit(1)
            .collect()
        )
        if not top or top[0].n < min_freq:
            break
        a, b = top[0].pair.split(" ", 1)
        merges.append((rank, a, b, a + b, int(top[0].n)))
        seqs = seqs.select(
            "freq", _merge_fold(F.col("syms"), a, b).alias("syms")
        ).localCheckpoint(eager=True)
    return spark.createDataFrame(
        merges, "rank int, left string, right string, merged string, freq long"
    )
