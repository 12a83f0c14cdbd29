"""Dedup operators on a hand-built corpus with known ground truth."""

from __future__ import annotations

import pytest

from monasca_aggregator_spark.operators import dedup as D

DOCS = [
    # 0 and 1: identical after normalization (case/punct differences)
    (0, "The quick brown fox jumps over the lazy dog"),
    (1, "the QUICK brown fox, jumps over the lazy dog!!"),
    # 2: near-dup of 0 (one word changed)
    (2, "The quick brown fox jumps over the sleepy dog"),
    # 3: unrelated
    (3, "Completely different content about distributed query engines"),
    # 4: too short to shingle (n=3)
    (4, "tiny doc"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string").cache()


def test_exact_dedup_groups_normalized_duplicates(docs):
    rows = {r.keeper_id: r.group_size for r in D.exact_dedup(docs).collect()}
    assert rows[0] == 2  # docs 0 and 1 collapse, keeper = min id
    assert rows[2] == 1
    assert rows[3] == 1
    assert 1 not in rows


def test_ngram_jaccard_finds_near_dup_pair(docs):
    pairs = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    # 0-1 are not identical strings pre-normalization (shingling is on raw
    # lowercase tokens) but share most shingles; 0-2 share all but the
    # 2 shingles covering the changed word (7 shingles each, 5 shared)
    assert (0, 2) in pairs
    assert pairs[(0, 2)] == pytest.approx(5 / 9, abs=1e-4)
    assert all(a < b for a, b in pairs)  # canonical pair order
    assert not any(3 in p or 4 in p for p in pairs)


def test_minhash_no_false_positives_and_finds_exact_dups(docs):
    """Verification step makes every emitted pair's jaccard exact — so
    minhash output ⊆ the exact-jaccard pair set, and identical docs
    (jaccard 1.0) are always found (every band collides)."""
    exact = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.ngram_jaccard_pairs(docs, threshold=0.3).collect()
    }
    mh = {
        (r.id_a, r.id_b): r.jaccard
        for r in D.minhash_lsh_pairs(docs, threshold=0.3).collect()
    }
    for pair, j in mh.items():
        assert pair in exact
        assert j == pytest.approx(exact[pair], abs=1e-4)
    identical = [p for p, j in exact.items() if j == 1.0]
    for p in identical:
        assert p in mh


def test_simhash_identical_docs_distance_zero(spark):
    df = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon"), (11, "alpha beta gamma delta epsilon"), (12, "unrelated words entirely here now")],
        "doc_id long, text string",
    )
    rows = {(r.id_a, r.id_b): r.hamming for r in D.simhash_pairs(df).collect()}
    assert rows.get((10, 11)) == 0
    assert (10, 12) not in rows and (11, 12) not in rows


def test_normalize_text(spark):
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("  Hello,   WORLD!! 42  ",)], "t string")
    out = df.select(D.normalize_text(F.col("t")).alias("n")).collect()[0].n
    assert out == "hello world 42"


def test_connected_components_chain_and_islands(spark):
    """Chain a-b-c-d collapses to one cluster labeled min(id); separate
    pair stays its own cluster; multi-hop propagation converges."""
    from monasca_aggregator_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(30, 20), (20, 10), (10, 5), (100, 200), (7, 7)],
        "id_a bigint, id_b bigint",
    )
    got = {
        r.doc_id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == {5: 5, 10: 5, 20: 5, 30: 5, 100: 100, 200: 100, 7: 7}


def test_edit_distance_pairs_basic(docs):
    # docs 0 and 2 differ by one word ("lazy" -> "sleepy": distance 4);
    # doc 1 differs from 0 in its PREFIX (case), so blocking excludes it
    pairs = {
        (r.id_a, r.id_b): r.edit_distance
        for r in D.edit_distance_pairs(docs, max_distance=10).collect()
    }
    assert pairs == {(0, 2): 4}


def test_edit_distance_blocking_full_recall_on_corpus(spark):
    """Prefix-16 blocking must lose NOTHING vs the exhaustive quadratic
    formulation on the driver corpus (the oracle gate relies on this).
    Exhaustive side runs JVM-side on a 200-doc slice."""
    from pyspark.sql import functions as F

    from monasca_aggregator_spark.sources.tables import load_table

    docs = load_table(spark, "/root/testdata/sf0.001", "documents").filter(
        F.col("doc_id") < 200
    )
    blocked = {
        (r.id_a, r.id_b)
        for r in D.edit_distance_pairs(docs, max_distance=20).collect()
    }
    a = docs.select(
        F.col("doc_id").alias("id_a"), F.col("text").alias("text_a")
    )
    b = docs.select(
        F.col("doc_id").alias("id_b"), F.col("text").alias("text_b")
    )
    exhaustive = {
        (r.id_a, r.id_b)
        for r in a.join(b, F.col("id_a") < F.col("id_b"))
        .select(
            "id_a", "id_b",
            F.levenshtein("text_a", "text_b", 20).alias("ed"),
        )
        .filter(F.col("ed") >= 0)
        .collect()
    }
    assert blocked == exhaustive
    assert len(exhaustive) > 0  # the corpus does contain near-dups


def test_span_dup_coverage_counts(spark):
    from monasca_aggregator_spark.operators.textops import span_dup_coverage

    shared = "a b c d"
    docs = spark.createDataFrame(
        [
            (1, f"{shared} e f"),     # spans: abcd bcde cdef
            (2, f"x {shared} y"),     # spans: xabc abcd bcdy... wait n=4
            (3, "p q r s t"),         # no overlap
            (4, "p q"),               # too short -> excluded
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in span_dup_coverage(docs, n=4).collect()}
    assert set(out) == {1, 2, 3}
    # doc1 spans: 'a b c d','b c d e','c d e f'; doc2: 'x a b c','a b c d','b c d y'
    assert out[1].n_spans == 3 and out[2].n_spans == 3
    assert out[1].n_dup_spans == 1 and out[2].n_dup_spans == 1
    assert out[3].n_dup_spans == 0 and out[3].dup_frac == 0.0
    assert abs(out[1].dup_frac - round(1 / 3, 4)) < 1e-9


def test_connected_components_long_chain_converges_fast(spark):
    """A 1000-long chain (diameter 1000) must converge in the star
    contraction's O(log² n) rounds, not one round per hop — plain
    min-label propagation would need 1000 sequential barriers here."""
    import time

    from monasca_aggregator_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(1000)], "id_a bigint, id_b bigint"
    )
    t0 = time.time()
    got = {
        r.doc_id: r.cluster_id
        for r in connected_components(pairs, max_iterations=15).collect()
    }
    elapsed = time.time() - t0
    assert got == {i: 0 for i in range(1001)}
    # 15 iterations is far below the 1000 propagation would need; the
    # wall-clock bound guards against quiet non-convergence fallbacks
    assert elapsed < 120


def test_minhash_hot_bucket_cap_bounds_join_and_keeps_signal(spark):
    """max_bucket_size drops degenerate LSH buckets (shared boilerplate
    colliding a whole corpus into one bucket) without losing pairs
    that collide in other, selective bands: identical docs still pair
    (every band matches, including non-hot ones)."""
    # 40 docs sharing one boilerplate sentence (hot shingles) + two
    # true duplicates with distinctive bodies
    rows = [
        (i, f"common header boilerplate sentence repeated everywhere w{i} x{i} y{i} z{i}")
        for i in range(40)
    ]
    rows += [
        (100, "entirely distinctive duplicate body alpha beta gamma delta epsilon zeta"),
        (101, "entirely distinctive duplicate body alpha beta gamma delta epsilon zeta"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(
            docs, threshold=0.9, max_bucket_size=10, persist="disk"
        ).collect()
    }
    assert (100, 101) in capped
    # uncapped finds the same exact-dup pair — the cap changed cost,
    # not the verified-signal contract
    uncapped = {
        (r.id_a, r.id_b)
        for r in D.minhash_lsh_pairs(docs, threshold=0.9).collect()
    }
    assert (100, 101) in uncapped


def test_containment_catches_partial_copy_jaccard_misses(spark):
    """A short doc lifted verbatim into a much longer one: containment
    ≈ 1 while Jaccard is small — the pair must appear in containment
    output and not in the jaccard output at matching thresholds."""
    short = "alpha beta gamma delta epsilon zeta eta theta"
    long = short + " " + " ".join(f"filler{i} pad{i} more{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, short), (2, long), (3, "totally unrelated content words here")],
        "doc_id long, text string",
    )
    cont = {
        (r.id_a, r.id_b): r.containment
        for r in D.shingle_containment_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert cont.get((1, 2)) == 1.0
    jac = {
        (r.id_a, r.id_b)
        for r in D.ngram_jaccard_pairs(docs, n=3, threshold=0.8).collect()
    }
    assert (1, 2) not in jac


def test_incremental_minhash_equals_full_selfjoin_restriction(spark, sf_small):
    """Index the 'existing corpus' (90% of docs), probe with the 'new
    drop' (10%): the incremental pairs must equal the full self-join's
    pairs restricted to (new, indexed) — same banding, no recall loss
    from indexing, and the probe never rescans the corpus."""
    from monasca_aggregator_spark.operators.dedup import (
        minhash_index,
        minhash_lsh_pairs,
        minhash_lsh_pairs_incremental,
    )
    from monasca_aggregator_spark.sources.tables import load_table
    from pyspark.sql import functions as F

    docs = load_table(spark, sf_small, "documents")
    existing = docs.filter(F.pmod("doc_id", F.lit(10)) != 0)
    new = docs.filter(F.pmod("doc_id", F.lit(10)) == 0)

    idx = minhash_index(existing)
    inc = {
        (r.id_new, r.id_indexed): r.jaccard
        for r in minhash_lsh_pairs_incremental(
            new, idx, existing, threshold=0.3
        ).collect()
    }
    full = {}
    for r in minhash_lsh_pairs(docs, threshold=0.3).collect():
        full[(r.id_a, r.id_b)] = r.jaccard
        full[(r.id_b, r.id_a)] = r.jaccard
    expected = {
        (a, b): j
        for (a, b), j in full.items()
        if a % 10 == 0 and b % 10 != 0
    }
    assert inc == expected
    assert expected, "fixture must contain cross-drop near-dups"


def test_connected_components_random_graphs_vs_union_find(spark):
    """Star contraction vs a plain union-find reference over 20 random
    graphs (seeded; id-offset so they share one Spark job): component
    labeling must match exactly, min-id as the cluster label."""
    import random

    rng = random.Random(42)
    edges = []
    expected = {}
    for g in range(20):
        base = g * 10_000
        n = rng.randint(2, 60)
        m = rng.randint(1, 120)
        g_edges = [
            (base + rng.randrange(n), base + rng.randrange(n))
            for _ in range(m)
        ]
        edges.extend(g_edges)
        # union-find reference
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in g_edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        nodes = {x for e in g_edges for x in e}
        for x in nodes:
            expected[x] = find(x)
        # path-compress to true minimum root
        for x in nodes:
            expected[x] = find(x)

    from monasca_aggregator_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r.doc_id: r.cluster_id for r in connected_components(pairs).collect()
    }
    assert got == expected


def test_span_rewrite_removes_exact_copy_keeps_original(spark):
    """An exact later copy loses everything; the first doc keeps all
    tokens; a doc sharing no 8-token span is untouched; and a partial
    copy loses exactly the lifted stretch (plus nothing else)."""
    from monasca_aggregator_spark.operators.textops import (
        span_dedup_rewrite,
    )

    base = " ".join(f"w{i}" for i in range(20))
    lifted = " ".join(f"w{i}" for i in range(8)) + " unique tail here now"
    rows = [
        (1, base),
        (2, base),                          # exact copy → fully removed
        (3, "totally different words " * 5),  # untouched
        (4, lifted),                        # loses the 8-token prefix
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in span_dedup_rewrite(docs, n=8).collect()}
    assert out[1].n_removed == 0
    assert out[2].n_removed == out[2].n_tokens
    assert out[3].n_removed == 0
    assert out[4].n_tokens == 12 and out[4].n_removed == 8
    # survivors of doc 4 are its unique tail
    import hashlib

    assert out[4].kept_md5 == hashlib.md5(
        b"unique tail here now"
    ).hexdigest()


def test_line_dedup_rewrite_strips_repeated_lines(spark):
    """Line-level boilerplate removal (r9, the fineweb/CCNet line
    dedup): a line repeated across >= min_df docs is stripped
    everywhere except the first corpus occurrence; unique lines,
    blank lines, and sub-threshold repeats survive; trim-variant
    lines match (matching is on the trimmed line, output keeps the
    original bytes)."""
    import hashlib

    from monasca_aggregator_spark.operators.textops import (
        line_dedup_rewrite,
    )

    footer = "this site uses cookies"
    rows = [
        (1, f"alpha body one\n{footer}\nunique tail one"),
        (2, f"beta body two\n  {footer}  \n\nunique tail two"),
        (3, f"{footer}\ngamma body three"),
        (4, "no boilerplate here at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {
        r.doc_id: r
        for r in line_dedup_rewrite(docs, min_df=2).collect()
    }
    # doc 1 is the first occurrence → keeps the footer
    assert out[1].n_removed == 0
    # doc 2 loses its (trim-variant) footer; the blank line survives
    assert out[2].n_removed == 1
    assert out[2].kept_md5 == hashlib.md5(
        b"beta body two\n\nunique tail two"
    ).hexdigest()
    assert out[3].n_removed == 1
    assert out[3].kept_md5 == hashlib.md5(
        b"gamma body three"
    ).hexdigest()
    assert out[4].n_removed == 0
    # return_text=True rewrites in place, preserving other columns
    txt = {
        r.doc_id: r.text
        for r in line_dedup_rewrite(
            docs, min_df=2, return_text=True
        ).collect()
    }
    assert txt[1] == rows[0][1]
    assert txt[2] == "beta body two\n\nunique tail two"
    # min_df above the repeat count -> nothing removed
    untouched = line_dedup_rewrite(docs, min_df=4).collect()
    assert all(r.n_removed == 0 for r in untouched)


def test_line_rewrite_windowmin_plan_and_tie(spark):
    """r11 window-MIN rewrite of line_dedup_rewrite (min_df<=2):
    "df>=2 AND first_doc<id" == "min(id) OVER (PARTITION BY h) < id",
    so the stats join (which re-ran the docs line-explode for the
    probe side) is gone — the plan carries exactly ONE Generate (the
    rewrite join-back is a JVM higher-order filter, not an explode),
    no df-stats join on h, and first-occurrence ties still resolve
    to the smallest doc_id. min_df>2 keeps the df-stats join path."""
    from tests.conftest import explain_str

    from monasca_aggregator_spark.operators.textops import (
        line_dedup_rewrite,
    )

    docs = spark.createDataFrame(
        [(9, "dup line\nown nine"), (4, "dup line\nown four")],
        "doc_id long, text string",
    )
    out = line_dedup_rewrite(docs, min_df=2)
    plan = explain_str(out)
    assert plan.count("Generate (") == 1
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[4].n_removed == 0  # smaller doc_id = first occurrence
    assert rows[9].n_removed == 1
    # the general-min_df join path still computes the same answer
    # when its threshold is met
    via_join = {
        r.doc_id: r.n_removed
        for r in line_dedup_rewrite(docs, min_df=3).collect()
    }
    assert via_join == {4: 0, 9: 0}  # df=2 < 3 → nothing removed


def test_prefix_filter_equals_exact_allpairs(docs):
    """Prefix-filtering candidate generation is lossless: output is
    byte-identical to the exhaustive shingle self-join at several
    thresholds (incl. one where τ·|x| is an exact integer, exercising
    the ceil boundary of the prefix-length formula)."""
    for thr in (0.3, 0.5, 5 / 9):
        exact = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in D.ngram_jaccard_pairs(docs, threshold=thr).collect()
        )
        pref = sorted(
            (r.id_a, r.id_b, r.jaccard)
            for r in D.jaccard_prefix_pairs(docs, threshold=thr).collect()
        )
        assert pref == exact, f"mismatch at threshold {thr}"
    assert exact  # the 0.5/0.55 runs still see the 0-1 pair


def test_prefix_filter_on_wider_corpus(spark):
    """16 docs: 4 templates × 4 variants with small word edits — the
    prefix join must reproduce the exhaustive pair set exactly."""
    base = [
        "alpha beta gamma delta epsilon zeta eta theta iota kappa",
        "one two three four five six seven eight nine ten eleven",
        "spark shuffles data between stages using hash partitioning",
        "completely unrelated text about cooking pasta with tomato sauce",
    ]
    rows = []
    for i, t in enumerate(base):
        words = t.split()
        for v in range(4):
            w = list(words)
            if v:
                w[v] = f"edit{v}"
            rows.append((i * 10 + v, " ".join(w)))
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    exact = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in D.ngram_jaccard_pairs(docs, threshold=0.4).collect()
    )
    pref = sorted(
        (r.id_a, r.id_b, r.jaccard)
        for r in D.jaccard_prefix_pairs(docs, threshold=0.4).collect()
    )
    assert pref == exact
    assert len(exact) >= 12  # every within-template pair qualifies


def test_incremental_new_docs_drops_indexed_content(spark):
    corpus = spark.createDataFrame(
        [(0, "shared doc one"), (2, "corpus only text")],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            (11, "SHARED doc one!!"),   # normalizes to an indexed doc → dropped
            (13, "fresh new content"),  # new → kept
            (15, "corpus only text"),   # exact dup of indexed → dropped
            (17, "another new doc"),
        ],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in D.incremental_new_docs(batch, corpus).collect()
    )
    assert kept == [13, 17]


def test_exact_all_pairs_guard_trips_above_cap(spark):
    """VERDICT r2: the exact quadratic ground-truth ops must refuse a
    corpus beyond max_docs at RUNTIME (guard rides the plan; build
    stays job-free), pointing at the scale-safe siblings."""
    import pyspark.sql.utils  # noqa: F401

    docs = spark.createDataFrame(
        [(i, f"some shared text body {i % 3}") for i in range(20)],
        "doc_id long, text string",
    )
    # plan BUILD must not raise (no job launched)
    plan = D.ngram_jaccard_pairs(docs, max_docs=10)
    with pytest.raises(Exception, match="ground-truth operator refused"):
        plan.collect()
    with pytest.raises(Exception, match="ground-truth operator refused"):
        D.shingle_containment_pairs(docs, max_docs=10).collect()
    # under the cap (or opted out) both still work
    assert D.ngram_jaccard_pairs(docs, max_docs=20).count() >= 0
    assert D.shingle_containment_pairs(docs, max_docs=None).count() >= 0


def test_incremental_null_text_rows_are_definitely_new(spark):
    """ADVICE r2: xxhash64(normalize_text(NULL)) is the seed constant,
    so null-text batch rows used to collide with null-text corpus rows
    and vanish. Null content equality is undefined → keep them."""
    corpus = spark.createDataFrame(
        [(0, None), (1, "indexed text")], "doc_id long, text string"
    )
    batch = spark.createDataFrame(
        [(10, None), (11, "indexed text"), (12, "new text")],
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id for r in D.incremental_new_docs(batch, corpus).collect()
    )
    assert kept == [10, 12]
    # output columns unchanged (internal markers dropped)
    out = D.incremental_new_docs(batch, corpus, num_bits=64)
    assert out.columns == ["doc_id", "text"]


def test_incremental_small_bloom_stays_exact(spark):
    """A deliberately tiny (high-FP) bloom must not change the result —
    false positives are removed by the exact anti-join."""
    corpus = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(0, 40, 2)],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [(i, f"doc number {i}") for i in range(1, 40, 2)]  # all new (odd)
        + [(100, "doc number 0")],                          # dup of corpus
        "doc_id long, text string",
    )
    kept = sorted(
        r.doc_id
        for r in D.incremental_new_docs(batch, corpus, num_bits=64).collect()
    )
    assert kept == list(range(1, 40, 2))


def test_phrase_search_adjacency_and_counts(spark):
    from monasca_aggregator_spark.operators.textops import phrase_search

    docs = spark.createDataFrame(
        [
            (0, "the quick brown fox and the quick brown dog"),  # 2 hits
            (1, "quick the brown fox"),                          # terms, wrong order
            (2, "the quick red brown fox"),                      # gap breaks phrase
            (3, "prefix words the quick brown"),                 # 1 hit at end
            (4, "no relevant words here"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(docs, ("the", "quick", "brown")).collect()
    }
    assert got == {0: 2, 3: 1}


def test_phrase_search_repeated_term_phrase(spark):
    from monasca_aggregator_spark.operators.textops import phrase_search

    docs = spark.createDataFrame(
        [(0, "batch batch batch stream"), (1, "batch stream batch")],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: r.n_occurrences
        for r in phrase_search(docs, ("batch", "batch")).collect()
    }
    assert got == {0: 2}


def test_incremental_minhash_finds_cross_side_near_dups_only(spark):
    corpus = spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog tonight"),
            (2, "completely unrelated corpus text about query engines"),
        ],
        "doc_id long, text string",
    )
    batch = spark.createDataFrame(
        [
            # near-dup of corpus doc 0 (one word changed)
            (11, "the quick brown fox jumps over the sleepy dog tonight"),
            # exact dup of corpus doc 2
            (13, "completely unrelated corpus text about query engines"),
            # near-dup of 11 (batch-internal — must NOT pair)
            (15, "the quick brown fox leaps over the sleepy dog tonight"),
            (17, "fresh novel content with no twin anywhere"),
        ],
        "doc_id long, text string",
    )
    pairs = {
        (r.batch_id, r.corpus_id): r.jaccard
        for r in D.incremental_minhash_pairs(
            batch, corpus, threshold=0.3
        ).collect()
    }
    assert (13, 2) in pairs and pairs[(13, 2)] == 1.0
    assert (11, 0) in pairs
    # no batch×batch or corpus×corpus pairs by construction
    assert all(b in (11, 13, 15, 17) and c in (0, 2) for b, c in pairs)
    assert not any(b == 17 for b, _ in pairs)


def test_lsh_calibration_theory_and_recall(spark, sf_small):
    """Calibration table: theory column matches 1-(1-s^4)^8 at bucket
    midpoints, every bucket's ground-truth pairs >= collided pairs,
    and high-similarity buckets (>=0.7, theory >0.97) are caught at
    high measured recall."""
    from monasca_aggregator_spark.plans.dedup import (
        _CAL_STEP,
        q_dedup_lsh_calibration,
    )

    rows = q_dedup_lsh_calibration(spark, sf_small).collect()
    assert rows, "no ground-truth pairs at this SF?"
    for r in rows:
        mid = r.bucket + _CAL_STEP / 2
        expect = 1.0 - (1.0 - mid**4) ** 8
        assert abs(r.theoretical_recall - round(expect, 4)) < 1e-9
        assert 0 <= r.n_collided <= r.n_pairs
    hi = [r for r in rows if r.bucket >= 0.7]
    if hi:
        tot = sum(r.n_pairs for r in hi)
        hit = sum(r.n_collided for r in hi)
        assert hit / tot >= 0.9


def test_minhash_estimate_tracks_exact_jaccard(spark, sf_small):
    """E[matches/H] = J: with H=16 permutations the estimator's error
    on every exact near-dup pair stays within 5σ of the binomial bound
    (σ = sqrt(J(1-J)/16) ≤ 0.125) and the mean error is well inside
    1.5σ — a broken permutation hash fails both instantly."""
    from monasca_aggregator_spark.plans.dedup import (
        q_dedup_minhash_estimate,
    )

    rows = q_dedup_minhash_estimate(spark, sf_small).collect()
    assert rows, "expected near-dup pairs at sf0.001"
    errs = [r.abs_err for r in rows]
    assert all(e <= 0.45 for e in errs), max(errs)
    assert sum(errs) / len(errs) < 0.19, sum(errs) / len(errs)
    for r in rows:
        assert 0 <= r.matches <= 16
        assert abs(r.jaccard_est - r.matches / 16.0) < 1e-9


def test_embedding_uniqueness_audit_counts(spark, tmp_path):
    """Injected exact-duplicate vectors are counted per label (dup rows
    = rows − distinct, max_group tracks the biggest replay), and a
    1-ulp-different vector is NOT a duplicate at the e6 key."""
    from monasca_aggregator_spark.plans.dedup import (
        q_dedup_embedding_exact,
    )

    base = [0.5] * 64
    near = [0.5] * 63 + [0.500001]  # differs at the e6 precision edge? no:
    # floor(0.500001*1e6+0.5)=500001 vs 500000 -> distinct key
    rows = [
        (1, base, "a"),
        (2, base, "a"),          # exact dup of 1
        (3, near, "a"),          # NOT a dup (e6 key differs)
        (4, [0.1] * 64, "b"),
        (5, [0.1] * 64, "b"),    # dup pair
        (6, [0.2] * 64, "b"),
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label string"
    ).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    got = {
        r.label: r
        for r in q_dedup_embedding_exact(spark, str(tmp_path)).collect()
    }
    assert got["a"].n_vecs == 3 and got["a"].n_distinct == 2
    assert got["a"].n_dup_rows == 1 and got["a"].max_group == 2
    assert got["b"].n_vecs == 3 and got["b"].n_distinct == 2
    assert got["b"].n_dup_rows == 1 and got["b"].max_group == 2


def test_simhash_estimate_inverse_relation(spark, sf_small):
    """Charikar's identity in practice: high-Jaccard pairs must show
    LOW simhash hamming (P(bit differs) = θ/π). Near-identical pairs
    (J ≥ 0.9) stay under 8/32 differing bits; the mean hamming of the
    high-J half is no larger than the low-J half's (monotone in
    expectation); ham_frac is hamming/32 at 4-dp half-up."""
    from monasca_aggregator_spark.plans.dedup import (
        q_dedup_simhash_estimate,
    )

    rows = q_dedup_simhash_estimate(spark, sf_small).collect()
    assert rows
    for r in rows:
        assert 0 <= r.hamming <= 32
        assert abs(r.ham_frac - r.hamming / 32.0) <= 5e-5 + 1e-12
    near = [r.hamming for r in rows if r.jaccard >= 0.9]
    if near:
        assert all(h <= 8 for h in near), near
    hi = [r.hamming for r in rows if r.jaccard >= 0.7]
    lo = [r.hamming for r in rows if r.jaccard < 0.7]
    if hi and lo:
        assert sum(hi) / len(hi) <= sum(lo) / len(lo) + 1.0


def test_calibration_docs_sample_bound_and_keepall(spark, tmp_path):
    """_calibration_docs (r7): keep-all when the corpus is within
    2x _EST_CAP (oracle SF shape — relation identical to unsampled),
    ~1/every hash-sample above it (every = n // _EST_CAP from the
    parquet FOOTER, no Spark job), and the count() fallback when the
    dataset is a directory instead of a single file."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from monasca_aggregator_spark.plans.dedup import (
        _EST_CAP,
        _calibration_docs,
    )

    def mk(n, name, as_dir=False):
        d = tmp_path / name
        d.mkdir()
        tbl = pa.table(
            {"doc_id": list(range(n)), "text": ["w w w"] * n}
        )
        if as_dir:
            df = spark.createDataFrame(
                zip(range(n), ["w w w"] * n), "doc_id long, text string"
            )
            df.coalesce(1).write.parquet(str(d / "documents.parquet"))
        else:
            pq.write_table(tbl, d / "documents.parquet")
        return str(d), spark.read.parquet(str(d / "documents.parquet"))

    # above the cap: every = 10, expect ~n/10 by uniform hash
    sf_big, docs_big = mk(10 * _EST_CAP, "sf_big")
    kept = _calibration_docs(docs_big, sf_big).count()
    assert 0.6 * _EST_CAP <= kept <= 1.4 * _EST_CAP

    # within 2x cap: every = 1, keep-all (the oracle-SF contract)
    sf_small, docs_small = mk(2 * _EST_CAP - 1, "sf_small")
    assert (
        _calibration_docs(docs_small, sf_small).count()
        == 2 * _EST_CAP - 1
    )

    # directory layout: footer read fails, count() fallback samples
    sf_dir, docs_dir = mk(10 * _EST_CAP, "sf_dir", as_dir=True)
    kept_dir = _calibration_docs(docs_dir, sf_dir).count()
    assert 0.6 * _EST_CAP <= kept_dir <= 1.4 * _EST_CAP
    # identical selection regardless of how n was obtained
    assert kept_dir == kept


def test_span_rewrite_single_explode_plan(spark):
    """r11 window-MIN rewrite: first-seen resolution must not re-run
    the span explode for a probe side — the plan carries exactly one
    Generate over the span entries (plus a partitioned window), and
    the tie case (two docs sharing a span, smaller doc_id wins) still
    resolves by min doc_id."""
    from tests.conftest import explain_str

    from monasca_aggregator_spark.operators.textops import (
        span_dedup_rewrite,
    )

    base = " ".join(f"t{i}" for i in range(9))
    docs = spark.createDataFrame(
        [(7, base), (3, base)], "doc_id long, text string"
    )
    out = span_dedup_rewrite(docs, n=8)
    plan = explain_str(out)
    # formatted explain prints each node once in the tree ("Generate
    # (7)") and once as a detail header ("(7) Generate") — count the
    # tree form only
    assert plan.count("Generate (") == 1
    rows = {r.doc_id: r for r in out.collect()}
    assert rows[3].n_removed == 0          # first occurrence kept
    assert rows[7].n_removed == rows[7].n_tokens
