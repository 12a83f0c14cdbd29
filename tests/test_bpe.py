"""Distributed BPE training (operators/bpe.py) vs a local reference
implementation of Sennrich-style merge learning."""

from __future__ import annotations

from collections import Counter

from monasca_aggregator_spark.operators.bpe import END_MARK, train_bpe_merges


def _ref_bpe(texts: list[str], n_merges: int, min_freq: int = 2):
    freqs = Counter()
    for t in texts:
        for w in t.strip().lower().split():
            freqs[w] += 1
    seqs = {w: tuple(list(w) + [END_MARK]) for w in freqs}
    merges = []
    for rank in range(n_merges):
        counts: Counter = Counter()
        for w, syms in seqs.items():
            for a, b in zip(syms, syms[1:]):
                counts[(a, b)] += freqs[w]
        if not counts:
            break
        best, n = min(
            counts.items(), key=lambda kv: (-kv[1], f"{kv[0][0]} {kv[0][1]}")
        )
        if n < min_freq:
            break
        a, b = best
        merges.append((rank, a, b, a + b, n))
        for w, syms in list(seqs.items()):
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            seqs[w] = tuple(out)
    return merges


TEXTS = [
    "low lower lowest new newer newest",
    "low low new wide wider widest",
    "the lowest newest widest low",
]


def test_bpe_matches_reference(spark):
    docs = spark.createDataFrame(
        list(enumerate(TEXTS)), "doc_id long, text string"
    )
    got = [
        (r.rank, r.left, r.right, r.merged, r.freq)
        for r in train_bpe_merges(spark, docs, n_merges=8).collect()
    ]
    assert got == _ref_bpe(TEXTS, 8)
    assert len(got) > 3  # the corpus supports several merges


def test_bpe_overlapping_pair_merges_leftmost(spark):
    # "aaaa" + pair (a,a) must yield aa,aa (greedy leftmost,
    # non-overlapping). Round 2 ties (aa,aa) with (aa,</w>) at 3 and
    # the lexicographic tie-break picks "aa </w>" ('<' < 'a').
    docs = spark.createDataFrame(
        [(0, "aaaa aaaa aaaa")], "doc_id long, text string"
    )
    got = [
        (r.left, r.right, r.merged)
        for r in train_bpe_merges(spark, docs, n_merges=2).collect()
    ]
    assert got[0] == ("a", "a", "aa")
    assert got[1] == ("aa", END_MARK, "aa" + END_MARK)


def test_bpe_respects_min_freq_stop(spark):
    docs = spark.createDataFrame(
        [(0, "x y z")], "doc_id long, text string"
    )  # every word unique, freq 1 → no merge reaches min_freq=2
    assert train_bpe_merges(spark, docs, n_merges=4).count() == 0


def test_bpe_encode_matches_fold_semantics_and_counts(spark):
    """Encode must replicate training's fold pass exactly (greedy
    leftmost with merged-tail recheck) and count corpus tokens right
    through the Arrow path."""
    from monasca_aggregator_spark.operators.bpe import (
        _merge_pass,
        bpe_encode,
    )

    # fold-semantics pins: "aaaa" under (a,a) → [aa, aa]; chain rule
    assert _merge_pass(list("aaaa"), "a", "a", "aa") == ["aa", "aa"]
    assert _merge_pass(["aa", "a", "b"], "a", "b", "ab") == ["aa", "ab"]

    docs = spark.createDataFrame(
        [(1, "aa ab"), (2, "b aa aa")], "doc_id long, text string"
    )
    merges = [("a", "a", "aa"), ("aa", "</w>", "aa</w>")]
    got = {r.doc_id: r for r in bpe_encode(docs, merges).collect()}
    # "aa" → [aa</w>] (1); "ab" → [a, b, </w>] (3); "b" → [b, </w>] (2)
    assert (got[1].n_words, got[1].n_tokens) == (2, 1 + 3)
    assert (got[2].n_words, got[2].n_tokens) == (3, 2 + 1 + 1)


def test_bpe_train_then_encode_compresses_corpus(spark, sf_small):
    """End-to-end tokenizer: merges trained on the corpus must shorten
    its own encoding vs character count (that is BPE's objective)."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.operators.bpe import (
        bpe_encode,
        train_bpe_merges,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    docs = load_table(spark, sf_small, "documents").limit(100)
    merges_df = train_bpe_merges(spark, docs, n_merges=10)
    merges = [
        (r.left, r.right, r.merged)
        for r in merges_df.orderBy("rank").collect()
    ]
    assert merges, "training must learn rules on real text"
    enc = bpe_encode(docs, merges)
    row = enc.agg(
        F.sum("n_tokens").alias("t"), F.sum("n_words").alias("w")
    ).collect()[0]
    # chars+end-mark per word is the no-merge baseline; learned rules
    # must beat it
    base = docs.select(
        F.explode(F.split(F.lower(F.trim("text")), r"\s+")).alias("w")
    ).filter(F.col("w") != "").agg(
        F.sum(F.length("w") + F.lit(1)).alias("chars")
    ).collect()[0]["chars"]
    assert row["t"] < base
    assert row["t"] >= row["w"]  # at least one token per word
