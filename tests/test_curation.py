"""End-to-end curation pipeline (curation.py): the composed
dedup → quality → rebalance → split → pack → write flow over real
testdata, with manifest lineage and readable partitioned output."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.curation import curate_corpus
from monasca_aggregator_spark.sources.tables import load_table


def test_curate_corpus_end_to_end(spark, sf_small, tmp_path):
    docs = load_table(spark, sf_small, "documents")
    out = str(tmp_path / "curated")
    curated, manifest = curate_corpus(
        spark,
        docs,
        out,
        strata={"en": 0.5},
        top_p=0.8,
    )
    m = {r.stage: (r.n_docs, r.total_chars) for r in manifest.collect()}
    assert list(m) == [
        "raw",
        "html_extract",
        "exact_dedup",
        "near_dedup",
        "quality_top_p",
        "lang_rebalance",
        "packed",
    ]
    # plain-text corpus: the HTML stage is a byte-identical pass-through
    assert m["html_extract"] == m["raw"]
    # monotone non-increasing doc counts through the filters
    order = ["raw", "html_extract", "exact_dedup", "near_dedup", "quality_top_p", "lang_rebalance"]
    for a, b in zip(order, order[1:]):
        assert m[b][0] <= m[a][0]
    # the pipeline as a whole did real work (this corpus has near-dups
    # and English docs; exact byte-dups may not exist at tiny SF)
    assert m["near_dedup"][0] < m["raw"][0]
    assert m["quality_top_p"][0] < m["near_dedup"][0]
    assert m["lang_rebalance"][0] < m["quality_top_p"][0]
    # packing keeps every surviving doc and assigns chunk ids
    assert m["packed"][0] == m["lang_rebalance"][0]

    back = spark.read.parquet(out)
    assert back.count() == m["packed"][0]
    assert set(
        r.split for r in back.select("split").distinct().collect()
    ) <= {"train", "val", "test"}
    # split is a pure function of doc_id: no doc in two splits
    assert (
        back.groupBy("doc_id")
        .agg(F.count_distinct("split").alias("k"))
        .filter(F.col("k") > 1)
        .count()
        == 0
    )
    # chunk ids pack contiguously from 0 within each (source, split)
    chunks = back.groupBy("source").agg(F.min("chunk_id").alias("lo"))
    assert all(r.lo == 0 for r in chunks.collect())


def test_curate_corpus_with_decontamination_and_dsir(spark, sf_small):
    """The optional r5 stages slot into the manifest in order, each
    only ever shrinks the corpus, and DSIR's cut size is exactly
    ceil(frac·n) of the docs entering it."""
    import math

    docs = load_table(spark, sf_small, "documents")
    train = docs.filter(F.col("doc_id") % 20 != 0)
    bench = docs.filter(F.col("doc_id") % 20 == 0)
    _, manifest = curate_corpus(
        spark,
        train,
        None,
        benchmark=bench,
        contamination_threshold=0.5,
        dsir_target=F.col("lang") == "en",
        dsir_keep_frac=0.7,
        strata={"en": 0.5},
        top_p=0.8,
    )
    m = {r.stage: r.n_docs for r in manifest.collect()}
    assert list(m) == [
        "raw",
        "html_extract",
        "exact_dedup",
        "near_dedup",
        "decontaminate",
        "quality_top_p",
        "dsir_filter",
        "lang_rebalance",
        "packed",
    ]
    assert m["decontaminate"] <= m["near_dedup"]
    assert m["dsir_filter"] == math.ceil(0.7 * m["quality_top_p"])


def test_curate_corpus_url_gate(spark):
    """Optional URL stage: blocklist, TLD policy and per-domain cap
    drop rows before any content gate, with a url_filter manifest row;
    corpora without URLs never see the stage."""
    rows = [
        (i, f"useful text with many plain words number {i} "
            "and a few more to pass quality gates easily",
         "en",
         "web",
         90,
         url)
        for i, url in [
            (1, "https://news.example.com/a/1"),
            (2, "https://news.example.com/a/2"),
            (3, "https://news.example.com/a/3"),  # over cap of 2
            (4, "https://tracker-ads.example/x/4"),  # blocklist
            (5, "https://freebies.xyz/y/5"),  # bad tld
            (6, "https://wiki.example.edu/z/6"),
        ]
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long, url string",
    )
    _, manifest = curate_corpus(
        spark,
        docs,
        None,
        url_col="url",
        url_blocklist=("tracker-ads.example",),
        url_per_domain_cap=2,
    )
    m = {r.stage: r.n_docs for r in manifest.collect()}
    assert m["raw"] == 6
    # 3 (cap), 4 (blocklist), 5 (tld) dropped -> 3 survive the gate
    assert m["url_filter"] == 3
    assert list(m)[:3] == ["raw", "url_filter", "html_extract"]


def test_url_domain_filter_pathless_and_bad_urls(spark):
    """ADVICE r7: the old HOST_RE required a trailing slash, so
    path-less URLs extracted host='' — bypassing blocklist/TLD gates
    and pooling into one '' cap partition. Path-less URLs must parse
    their real host; unparseable URLs are an explicit 'bad_url' drop,
    never 'kept'."""
    from monasca_aggregator_spark.operators.urlfilter import (
        url_domain_filter,
    )

    rows = [
        (1, "https://tracker-ads.example"),          # pathless blocklist
        (2, "https://tracker-ads.example?q=1"),      # query, no path
        (3, "https://freebies.xyz"),                 # pathless bad tld
        (4, "https://ok.example.com#frag"),          # fragment, no path
        (5, "not a url at all"),                     # unparseable
        (6, None),                                   # null url
        (7, "https://ok.example.com/a"),
        (8, "https://ok.example.com/b"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: r._url_reason
        for r in url_domain_filter(
            df,
            blocklist=("tracker-ads.example",),
            per_domain_cap=2,
            keep_reason=True,
        ).collect()
    }
    assert got[1] == "blocklist"
    assert got[2] == "blocklist"
    assert got[3] == "bad_tld"
    assert got[5] == "bad_url"
    assert got[6] == "bad_url"
    # ok.example.com has 3 rows; cap=2 keeps the first two by doc_id
    assert got[4] == "kept" and got[7] == "kept"
    assert got[8] == "over_cap"
    # and the kept-only projection drops every flagged row
    kept = url_domain_filter(
        df, blocklist=("tracker-ads.example",), per_domain_cap=2
    )
    assert {r.doc_id for r in kept.collect()} == {4, 7}


def test_canonical_url_collapses_cosmetic_variants(spark):
    """Scheme, host case, leading www., trailing slashes, query
    strings and fragments are all cosmetic; pages and hosts are
    not."""
    from monasca_aggregator_spark.operators.urlfilter import (
        canonical_url,
    )
    from pyspark.sql import functions as F

    urls = [
        # one page, ten cosmetic variants
        "https://news.example.com/p/7",
        "http://news.example.com/p/7",
        "https://NEWS.Example.COM/p/7",
        "https://www.news.example.com/p/7/",
        "https://news.example.com/p/7?utm_source=feed&gclid=1",
        "https://news.example.com/p/7/#frag",
        # VERDICT r8: uppercase SCHEMES are legal (RFC 3986) and used
        # to extract host='' — every such URL shared one '' key
        "HTTPS://news.example.com/p/7",
        "HTTP://WWW.NEWS.EXAMPLE.COM/p/7/",
        # userinfo and default ports are cosmetic too (ADVICE r8)
        "https://user:pw@news.example.com/p/7",
        "https://news.example.com:443/p/7",
        # different page / different host: must NOT collapse
        "https://news.example.com/p/8",
        "https://blog.example.org/p/7",
        # non-default port is NOT cosmetic — a different origin
        "https://news.example.com:8443/p/7",
        # path-less URL canonicalizes to the bare host
        "https://news.example.com",
        "https://news.example.com/?q=1",
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got = [
        r["c"]
        for r in df.select(
            canonical_url(F.col("url")).alias("c")
        ).collect()
    ]
    assert got[:10] == ["news.example.com/p/7"] * 10
    assert got[10] == "news.example.com/p/8"
    assert got[11] == "blog.example.org/p/7"
    assert got[12] == "news.example.com:8443/p/7"
    assert got[13] == got[14] == "news.example.com"


def test_canonical_url_bad_urls_never_merge(spark):
    """VERDICT r8: two DIFFERENT unparseable URLs must never share a
    canonical key (the old '' key made dropDuplicates silently drop
    one of them — cross-page data loss). Unparseable URLs keep their
    raw string as the key; NULL url stays NULL."""
    from monasca_aggregator_spark.operators.urlfilter import (
        canonical_url,
    )
    from pyspark.sql import functions as F

    rows = [
        (1, "not a url at all"),
        (2, "also not a url"),
        (3, "ftp://unsupported.scheme/x"),
        (4, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    got = {
        r.doc_id: r.c
        for r in df.select(
            "doc_id", canonical_url(F.col("url")).alias("c")
        ).collect()
    }
    assert got[1] == "not a url at all"
    assert got[2] == "also not a url"
    assert got[3] == "ftp://unsupported.scheme/x"
    assert got[4] is None
    # the exact_dedup composition (groupBy canonical key) keeps all
    # three distinct bad-URL rows
    canon = df.withColumn("c", canonical_url(F.col("url")))
    keep = canon.groupBy("c").agg(F.min("doc_id").alias("doc_id"))
    survivors = {
        r.doc_id
        for r in canon.join(
            keep, ["c", "doc_id"], "left_semi"
        ).collect()
    }
    assert {1, 2, 3}.issubset(survivors)


def test_curate_corpus_url_dedup_stage(spark):
    """url_dedup=True collapses cosmetic URL variants of the same
    page to the lowest doc_id BEFORE content stages, with its own
    manifest row between url_filter and html_extract; distinct pages
    survive."""
    base = (
        "useful text with many plain words and a few more to pass"
        " quality gates easily"
    )
    rows = [
        (1, base + " one", "en", "web", 90,
         "https://news.example.com/p/7"),
        (2, base + " two", "en", "web", 90,
         "https://WWW.news.example.com/p/7/"),  # variant of 1
        (3, base + " three", "en", "web", 90,
         "http://news.example.com/p/7?utm_source=x"),  # variant of 1
        (4, "completely different clean sentence about gardens"
            " rivers mountains and weather patterns in autumn",
         "en", "web", 90,
         "https://news.example.com/p/8"),  # distinct page
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long, url string",
    )
    curated, manifest = curate_corpus(
        spark, docs, None, url_col="url", url_dedup=True
    )
    m = {r.stage: r.n_docs for r in manifest.collect()}
    assert m["url_filter"] == 4
    assert m["url_dedup"] == 2  # 1 survives its variant group, + 4
    ids = {r.doc_id for r in curated.select("doc_id").collect()}
    assert 1 in ids and 4 in ids
    assert not {2, 3} & ids
    assert list(m)[:4] == [
        "raw", "url_filter", "url_dedup", "html_extract",
    ]


def test_curate_corpus_line_dedup_stage(spark):
    """line_dedup=True strips cross-doc repeated lines (the chrome
    the HTML extractor let through) everywhere except the first
    occurrence, BEFORE exact dedup — so two pages differing only in
    their shared footer don't collapse, and the footer itself
    survives exactly once."""
    footer = "subscribe to our newsletter for daily updates"
    a = ("useful text with many plain words and a few more to pass"
         " quality gates easily")
    b = ("completely different clean sentence about gardens rivers"
         " mountains and weather patterns in autumn")
    rows = [
        (1, a + "\n" + footer, "en", "web", 90),
        (2, b + "\n" + footer, "en", "web", 90),
        (3, b + " with an extra twist at the end", "en", "web", 90),
    ]
    docs = spark.createDataFrame(
        rows,
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    curated, manifest = curate_corpus(spark, docs, None, line_dedup=True)
    m = {r.stage: r.n_docs for r in manifest.collect()}
    assert m["line_dedup"] == 3  # removal rewrites, never drops rows
    assert list(m)[:3] == ["raw", "html_extract", "line_dedup"]
    texts = {r.doc_id: r.text for r in curated.collect()}
    assert texts[1] == a + "\n" + footer  # first occurrence keeps it
    assert texts[2] == b                  # later copy stripped


def test_curate_corpus_lz_repetition_gate(spark):
    """The optional LZ78 gate (r10) drops the looping boilerplate doc
    and keeps diverse prose; the manifest records the stage between
    extraction and exact dedup."""
    from monasca_aggregator_spark.curation import curate_corpus

    prose = " ".join(f"word{i}" for i in range(40))
    loop = " ".join(["click here"] * 40)
    docs = spark.createDataFrame(
        [
            (1, prose, "en", "s", len(prose)),
            (2, loop, "en", "s", len(loop)),
            (3, prose + " extra tail tokens", "en", "s", 7),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    curated, manifest = curate_corpus(
        spark, docs, lz_min_ratio=0.3, near_dup_threshold=0.95,
        top_p=1.0,
    )
    m = {r.stage: r.n_docs for r in manifest.collect()}
    assert m["raw"] == 3
    assert m["lz_gate"] == 2  # the loop doc is gone
    kept = {r.doc_id for r in curated.collect()}
    assert 2 not in kept and 1 in kept


def test_curate_corpus_lz_gate_scores_prefix_only(spark, monkeypatch):
    """PREFIX CONTRACT (VERDICT r10 #2): the LZ gate folds only the
    first _LZ_GATE_PREFIX_TOKENS tokens, so a book-length document
    can't pay an O(tokens × dict) fold at ingest. A doc whose PREFIX
    is looping boilerplate drops even though a diverse tail would
    have rescued the full-array ratio — and vice versa."""
    import monasca_aggregator_spark.curation as cur

    # shrink the cap so the test corpus is tiny
    monkeypatch.setattr(cur, "_LZ_GATE_PREFIX_TOKENS", 64)

    diverse_tail = " ".join(f"tail{i}" for i in range(400))
    loop_prefix = " ".join(["spam loop"] * 32)  # 64 tokens, ratio ~0.03
    # doc 1: looping prefix + diverse tail — full-array ratio would be
    # high (~0.87) but the 64-token prefix ratio is tiny → must DROP
    doc1 = loop_prefix + " " + diverse_tail
    # doc 2: diverse prefix + looping tail — full-array ratio would be
    # low but the prefix is all-novel → must KEEP
    doc2 = (
        " ".join(f"fresh{i}" for i in range(64))
        + " "
        + " ".join(["spam loop"] * 400)
    )
    docs = spark.createDataFrame(
        [
            (1, doc1, "en", "s", len(doc1)),
            (2, doc2, "en", "s", len(doc2)),
        ],
        "doc_id long, text string, lang string, source string,"
        " n_chars long",
    )
    curated, manifest = cur.curate_corpus(
        spark, docs, lz_min_ratio=0.3, near_dup_threshold=0.95,
        top_p=1.0,
    )
    m = {r.stage: r.n_docs for r in manifest.collect()}
    assert m["lz_gate"] == 1
    kept = {r.doc_id for r in curated.collect()}
    assert kept == {2}
