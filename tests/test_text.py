"""Text-analysis column functions and operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions import text as X
from monasca_aggregator_spark.operators import textops


def _vals(spark, text, expr):
    df = spark.createDataFrame([(text,)], "text string")
    return df.select(expr.alias("v")).collect()[0].v


def test_word_shingles(spark):
    v = _vals(spark, "a b c d", X.word_shingles(F.col("text"), 3))
    assert v == ["a b c", "b c d"]


def test_word_shingles_short_text_empty(spark):
    assert _vals(spark, "a b", X.word_shingles(F.col("text"), 3)) == []


def test_word_shingles_distinct(spark):
    v = _vals(spark, "x y x y x y", X.word_shingles(F.col("text"), 2))
    assert sorted(v) == ["x y", "y x"]


def test_simhash_deterministic_and_sensitive(spark):
    sh = X.word_shingles(F.col("text"), 2)
    a = _vals(spark, "one two three four", X.simhash64(sh))
    a2 = _vals(spark, "one two three four", X.simhash64(sh))
    b = _vals(spark, "five six seven eight", X.simhash64(sh))
    assert a == a2
    assert a != b


def test_minhash_signature_containment(spark):
    """Superset's per-seed min ≤ is not guaranteed, but identical sets ⇒
    identical signatures, and signature length is num_hashes."""
    sh = X.word_shingles(F.col("text"), 2)
    s1 = _vals(spark, "p q r s", X.minhash_signature(sh, 8))
    s2 = _vals(spark, "p q r s", X.minhash_signature(sh, 8))
    assert s1 == s2 and len(s1) == 8


@pytest.mark.parametrize(
    "text,lang",
    [
        ("the cat and the dog of the house", "en"),
        ("der Hund und die Katze und der Vogel", "de"),
        ("le chat et la maison et le chien", "fr"),
        ("el perro que los gatos que el", "es"),
        ("xyzzy plugh 12345", "und"),
    ],
)
def test_lang_id(spark, text, lang):
    assert _vals(spark, text, X.lang_id(F.col("text"))) == lang


def test_rolling_fingerprint_order_sensitive(spark):
    fp = X.rolling_fingerprint(F.col("text"))
    a = _vals(spark, "alpha beta gamma", fp)
    b = _vals(spark, "gamma beta alpha", fp)
    a2 = _vals(spark, "alpha beta gamma", fp)
    assert a == a2
    assert a != b  # order matters (unlike a bag-of-words hash)


def test_token_counts(spark):
    df = spark.createDataFrame([(1, "Hello world, it is 2024!")], "doc_id long, text string")
    r = textops.token_counts(df).collect()[0]
    assert r.n_ws_tokens == 5
    # BPE-ish: hello|world|,|it|is|2|0|2|4|! = 10
    assert r.n_bpe_tokens == 10
    assert r.n_chars == 24


def test_quality_scores_bounds(spark):
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat and it is fine"), (2, "zzz qqq")],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in textops.quality_scores(df).collect()}
    for r in rows.values():
        assert 0.0 <= r.stop_ratio <= 1.0
        assert 0.0 <= r.punct_ratio <= 1.0
        assert 0.0 <= r.quality <= 1.0
    assert rows[1].quality > rows[2].quality


def test_compression_ratio_separates_repetitive_from_varied(spark):
    from monasca_aggregator_spark.operators.textops import compression_ratio

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam " * 200),
            (2, " ".join(f"w{i*7919%6133}x{i}" for i in range(600))),
            (3, ""),
            (4, None),
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r.compress_ratio for r in compression_ratio(docs).collect()}
    assert out[1] < 0.05          # pure repetition collapses
    assert out[2] > 0.3           # varied text stays high
    assert out[3] is None and out[4] is None


def test_compression_ratio_plan_is_arrow(spark, sf_small):
    from monasca_aggregator_spark.operators.textops import compression_ratio
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    plan = explain_str(
        compression_ratio(load_table(spark, sf_small, "documents"))
    )
    assert "ArrowEvalPython" in plan    # vectorized, not BatchEvalPython
    assert "Exchange" not in plan       # narrow projection, no shuffle


def test_repetition_scores_hand_computed(spark):
    df = spark.createDataFrame(
        [
            ("d1", "a a a a"),          # dup 3/4; bigrams: "a a"×3 → 1.0
            ("d2", "a b c d"),          # all distinct; 3 distinct bigrams
            ("d3", "x y x y x"),        # dup 3/5; "x y"×2 of 4 → 0.5
        ],
        "doc_id string, text string",
    )
    out = {
        r.doc_id: (r.dup_word_frac, r.top_bigram_frac)
        for r in textops.repetition_scores(df).collect()
    }
    assert out["d1"] == (0.75, 1.0)
    assert out["d2"] == (0.0, pytest.approx(1 / 3, abs=1e-4))
    assert out["d3"] == (0.6, 0.5)


def test_repetition_scores_no_shuffle(spark, sf_small):
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    plan = explain_str(
        textops.repetition_scores(load_table(spark, sf_small, "documents"))
    )
    assert "Exchange" not in plan       # pure narrow projection


def test_boilerplate_fraction_hand_computed(spark):
    # "a b" appears in every doc (df=3 ≥ 0.5·3); the other bigrams are
    # singletons, so each doc's fraction = common_grams / total_grams.
    df = spark.createDataFrame(
        [("d1", "a b c"), ("d2", "a b d"), ("d3", "z a b")],
        "doc_id string, text string",
    )
    out = {
        r.doc_id: r.boilerplate_frac
        for r in textops.boilerplate_fraction(df, min_df_frac=0.5).collect()
    }
    assert out == {"d1": 0.5, "d2": 0.5, "d3": 0.5}


def test_boilerplate_common_set_broadcasts(spark, sf_small):
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    plan = explain_str(
        textops.boilerplate_fraction(load_table(spark, sf_small, "documents"))
    )
    assert "BroadcastHashJoin" in plan  # common-gram set joins broadcast


def test_unigram_logprob_hand_computed(spark):
    # corpus: 4 tokens total — "a"×2 (p=0.5), "b"×1, "c"×1 (p=0.25)
    df = spark.createDataFrame(
        [("d1", "a a"), ("d2", "b c")], "doc_id string, text string"
    )
    import math

    out = {
        r.doc_id: r.avg_logprob
        for r in textops.unigram_logprob(df).collect()
    }
    assert out["d1"] == pytest.approx(math.log(0.5), abs=1e-4)
    assert out["d2"] == pytest.approx(math.log(0.25), abs=1e-4)
    # rare-token docs score strictly lower: the filter signal
    assert out["d2"] < out["d1"]


def test_unigram_logprob_vocab_broadcasts(spark, sf_small):
    from monasca_aggregator_spark.sources.tables import load_table
    from tests.conftest import explain_str

    plan = explain_str(
        textops.unigram_logprob(load_table(spark, sf_small, "documents"))
    )
    assert "BroadcastHashJoin" in plan


def test_contamination_scores_hand_computed(spark):
    """Identical doc → containment 1.0 (flagged); disjoint doc → 0.0;
    half-overlapping doc → exact trigram fraction."""
    from monasca_aggregator_spark.operators.textops import (
        contamination_scores,
    )

    bench = spark.createDataFrame(
        [(100, "a b c d e")], "doc_id long, text string"
    )
    # trigram shingles of bench: {a b c, b c d, c d e}
    docs = spark.createDataFrame(
        [
            (1, "a b c d e"),      # 3/3 shingles contaminated
            (2, "x y z w"),        # 0/2
            (3, "a b c q r"),      # 1/3: only "a b c"
            (4, "ab"),             # < 3 tokens → excluded
        ],
        "doc_id long, text string",
    )
    out = {
        r.doc_id: r
        for r in contamination_scores(docs, bench, threshold=0.8).collect()
    }
    assert set(out) == {1, 2, 3}
    assert out[1].contamination == 1.0 and out[1].is_contaminated
    assert out[2].contamination == 0.0 and not out[2].is_contaminated
    assert out[3].n_shingles == 3 and out[3].n_contaminated == 1
    assert abs(out[3].contamination - round(1 / 3, 4)) < 1e-9
    assert not out[3].is_contaminated


def test_contamination_benchmark_set_broadcasts(spark, sf_small):
    """The benchmark shingle set must be broadcast — the training side
    is never shuffled by shingle."""
    from monasca_aggregator_spark.plans.textops import q_text_decontaminate
    from tests.conftest import explain_str

    plan = explain_str(q_text_decontaminate(spark, sf_small))
    assert "BroadcastHashJoin" in plan


def test_tfidf_ranks_rare_heavy_terms_first(spark):
    from monasca_aggregator_spark.operators.textops import tfidf_top_terms

    docs = spark.createDataFrame(
        [
            (1, "zebra zebra zebra common common"),
            (2, "common common apple"),
            (3, "common banana banana"),
        ],
        "doc_id long, text string",
    )
    out = {
        (r.doc_id, r.rk): r for r in tfidf_top_terms(docs, k=2).collect()
    }
    # 'common' appears in every doc → idf = ln(3/3) = 0 → never beats
    # a doc-unique term
    assert out[(1, 1)].token == "zebra" and out[(1, 1)].tf == 3
    assert out[(2, 1)].token == "apple"
    assert out[(3, 1)].token == "banana" and out[(3, 1)].tf == 2
    assert out[(1, 1)].doc_freq == 1
    assert out[(1, 2)].token == "common" and out[(1, 2)].tfidf == 0.0


def test_conjunctive_search_requires_all_terms(spark):
    from monasca_aggregator_spark.operators.textops import conjunctive_search

    docs = spark.createDataFrame(
        [
            (1, "spark window merge join", "en", "s", 23),
            (2, "spark window", "en", "s", 12),
            (3, "merge window spark spark", "en", "s", 24),
            (4, "nothing relevant", "en", "s", 16),
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = sorted(
        r.doc_id
        for r in conjunctive_search(docs, ("spark", "merge", "window")).collect()
    )
    assert got == [1, 3]


def test_conjunctive_search_broadcasts_survivors(spark, sf_small):
    from monasca_aggregator_spark.plans.textops import q_text_search
    from tests.conftest import explain_str

    plan = explain_str(q_text_search(spark, sf_small))
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan


def test_bigram_pmi_prefers_exclusive_collocations(spark):
    from monasca_aggregator_spark.plans.textops import PMI_MIN_COUNT

    assert PMI_MIN_COUNT <= 5  # fixture sized for this
    docs = spark.createDataFrame(
        [(i, "hong kong " + "a b " * 10) for i in range(5)]
        + [(100 + i, "a hong b kong a b a b a b") for i in range(5)],
        "doc_id long, text string",
    )
    from monasca_aggregator_spark.plans import textops as P

    # build via the same query fn on a temp view-free path: call the
    # operator pipeline directly by monkey-loading docs
    import monasca_aggregator_spark.plans.textops as tx
    from pyspark.sql import functions as F

    orig = tx.load_table
    try:
        tx.load_table = lambda spark, sf, name, **kw: docs
        out = tx.q_text_bigram_pmi(spark, "ignored").collect()
    finally:
        tx.load_table = orig
    top = out[0]
    # 'hong kong' co-occur ~exclusively; 'a b' is everywhere alongside
    # independent uses → PMI must rank 'hong kong' first
    assert (top.w1, top.w2) == ("hong", "kong")
    ab = [r for r in out if (r.w1, r.w2) == ("a", "b")]
    assert not ab or ab[0].pmi < top.pmi


def test_langid_ngram_short_texts_produce_no_phantom_trigrams(spark):
    """Sub-3-char texts must contribute zero trigrams (Spark's
    sequence(1, 0) runs DESCENDING — the guard prevents phantom
    substrings) and classification still runs on the rest."""
    from monasca_aggregator_spark.plans.textops import q_text_langid_ngram
    import tempfile
    from pathlib import Path

    tmp = Path(tempfile.mkdtemp())
    rows = [(i, "the quick brown fox jumps over it all day long", "en", "s", 46)
            for i in range(1, 20)]
    rows += [(20, "ab", "en", "s", 2), (25, "", "en", "s", 0)]  # holdout ids %5==0
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(str(tmp / "documents.parquet"))
    out = q_text_langid_ngram(spark, str(tmp)).collect()
    # the short/empty holdout docs produce no trigrams → never predicted;
    # remaining holdout docs classify as en
    total = sum(r.n_docs for r in out)
    assert total == len([r for r in rows if r[0] % 5 == 0 and len(r[1]) >= 3])
    assert all(r.true_lang == "en" and r.predicted_lang == "en" for r in out)


def test_text_novelty_first_doc_fully_novel(spark, sf_small):
    """The smallest doc_id that has any trigram is by definition the
    first occurrence of all its shingles → novelty 1.0; fractions lie
    in (0, 1]; shingle counts bound novel counts."""
    from monasca_aggregator_spark.plans.textops import q_text_novelty

    rows = q_text_novelty(spark, sf_small).collect()
    assert rows
    first = min(rows, key=lambda r: r.doc_id)
    assert first.n_novel == first.n_shingles
    assert first.novelty_frac == 1.0
    for r in rows:
        assert 0 <= r.n_novel <= r.n_shingles
        assert 0.0 <= r.novelty_frac <= 1.0


def test_fuzzy_token_search_finds_ed1_matches_only(spark):
    from monasca_aggregator_spark.operators.textops import (
        fuzzy_token_search,
    )

    docs = spark.createDataFrame(
        [
            (0, "run a query against the table"),   # exact 'query'
            (1, "the querry was misspelled here"),  # insertion (ED 1)
            (2, "a quer about something"),          # deletion (ED 1)
            (3, "qwery is a substitution case"),    # substitution (ED 1)
            (4, "quarry stones are unrelated"),     # ED 2 → excluded
            (5, "nothing relevant at all"),
        ],
        "doc_id long, text string",
    )
    got = {
        (r.doc_id, r.token): r.dist
        for r in fuzzy_token_search(docs, "query").collect()
    }
    assert got == {
        (0, "query"): 0,
        (1, "querry"): 1,
        (2, "quer"): 1,
        (3, "qwery"): 1,
    }


def test_stem_rules_collapse_inflections(spark):
    from monasca_aggregator_spark.plans.textops import _stem
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [("merging",), ("merged",), ("merges",), ("merge",), ("tables",),
         ("class",), ("is",), ("runs",)],
        "token string",
    )
    got = {r.token: r.stem for r in df.select("token", _stem(F.col("token")).alias("stem")).collect()}
    assert got["merging"] == "merg"
    assert got["merged"] == "merg"
    assert got["merges"] == "merg"
    assert got["merge"] == "merge"   # no rule fires
    assert got["tables"] == "tabl"
    assert got["class"] == "class"   # 'ss' guard
    assert got["is"] == "is"         # min-length guard
    assert got["runs"] == "run"


def test_oov_rate_counts(spark, tmp_path):
    """OOV accounting on a controlled vocabulary: with K far above the
    corpus vocabulary nothing is OOV; tokens absent from the top-K set
    count once per OCCURRENCE, per source."""
    from monasca_aggregator_spark.plans import textops as T

    rows = [
        (1, "alpha alpha beta", "s1"),
        (2, "alpha gamma", "s2"),
    ]
    import pandas as pd

    pd.DataFrame(rows, columns=["doc_id", "text", "source"]).to_parquet(
        tmp_path / "documents.parquet"
    )
    out = {r.source: r for r in T.q_text_oov_rate(spark, str(tmp_path)).collect()}
    # corpus vocab {alpha:3, beta:1, gamma:1} <= K -> zero OOV
    assert out["s1"].n_tokens == 3 and out["s1"].n_oov == 0
    assert out["s2"].n_tokens == 2 and out["s2"].n_oov == 0
    assert out["s1"].oov_rate == 0.0

    saved = T._OOV_VOCAB_K
    try:
        T._OOV_VOCAB_K = 1  # only 'alpha' survives (count desc, token asc)
        out = {
            r.source: r for r in T.q_text_oov_rate(spark, str(tmp_path)).collect()
        }
        assert out["s1"].n_oov == 1      # beta
        assert out["s2"].n_oov == 1      # gamma
        assert abs(out["s2"].oov_rate - 0.5) < 1e-9
    finally:
        T._OOV_VOCAB_K = saved


def test_quality_pivot_consistent_with_corpus(spark, sf_small):
    """The (lang, source) quality pivot must partition the corpus: cell
    doc counts sum to |documents|, every mean lies within [min, 1], and
    each cell mean matches a direct recomputation."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.operators.textops import quality_scores
    from monasca_aggregator_spark.plans.textops import (
        q_quality_by_lang_source,
    )
    from monasca_aggregator_spark.sources.tables import load_table

    rows = q_quality_by_lang_source(spark, sf_small).collect()
    docs = load_table(spark, sf_small, "documents")
    assert sum(r.n_docs for r in rows) == docs.count()
    direct = {
        (r.lang, r.source): r
        for r in quality_scores(docs)
        .join(docs.select("doc_id", "lang", "source"), "doc_id")
        .groupBy("lang", "source")
        .agg(F.avg("quality").alias("m"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for r in rows:
        d = direct[(r.lang, r.source)]
        assert r.n_docs == d.n
        assert r.min_quality <= r.avg_quality <= 1.0
        assert abs(r.avg_quality - d.m) < 1e-3


def test_langid_calibration_buckets(spark, tmp_path):
    """Hand-separable languages: pure holdout docs classify with
    confidence 1.0 → top bucket, zero calibration gap; a 50/50 mixed
    doc lands in the 0.5 bucket with confidence exactly 500000/1e6
    (integer division end to end)."""
    import pandas as pd

    from monasca_aggregator_spark.plans import textops as T

    rows = []
    # lang 'aa': train ids 1-4 ('aaaa' → only trigram 'aaa'),
    # holdout id 0; lang 'bb' mirrors on ids 6-9 / 5.
    for i in (1, 2, 3, 4):
        rows.append((i, "aaaa", "aa", "s"))
    rows.append((0, "aaaa", "aa", "s"))
    for i in (6, 7, 8, 9):
        rows.append((i, "bbbb", "bb", "s"))
    rows.append((5, "bbbb", "bb", "s"))
    # mixed holdout doc: trigrams {aaa, aab, abb, bbb} → overlap 1
    # with each profile, tie → 'aa' predicted (asc), conf = 1/2
    rows.append((10, "aaaabbbb", "aa", "s"))
    pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source"]
    ).to_parquet(tmp_path / "documents.parquet")
    out = {
        r.bucket: r
        for r in T.q_langid_calibration(spark, str(tmp_path)).collect()
    }
    top = out[9]
    assert top.n_docs == 2 and top.n_correct == 2
    assert top.accuracy == 1.0 and top.mean_confidence == 1.0
    assert top.calibration_gap == 0.0
    mid = out[5]
    assert mid.n_docs == 1 and mid.n_correct == 1
    assert abs(mid.mean_confidence - 0.5) < 1e-9
    assert abs(mid.calibration_gap - 0.5) < 1e-9


def test_contamination_single_pass_schema_and_zero_match(spark):
    """Output-contract pin for contamination_scores (kept across the
    r11 single-pass rewrite AND its measured revert — the left-outer
    single-pass variant was 11x slower at sf0.1, see the in-code
    note): schema stays (n_shingles int, n_contaminated long) and
    zero-match docs flow through the left-join null path as 0."""
    from pyspark.sql.types import IntegerType, LongType

    from monasca_aggregator_spark.operators.textops import (
        contamination_scores,
    )

    bench = spark.createDataFrame(
        [(100, "p q r s")], "doc_id long, text string"
    )
    docs = spark.createDataFrame(
        [(1, "a b c d e f")], "doc_id long, text string"
    )
    out = contamination_scores(docs, bench)
    schema = {f.name: f.dataType for f in out.schema.fields}
    assert isinstance(schema["n_shingles"], IntegerType)
    assert isinstance(schema["n_contaminated"], LongType)
    row = out.collect()[0]
    assert row.n_shingles == 4 and row.n_contaminated == 0
    assert row.contamination == 0.0 and not row.is_contaminated
