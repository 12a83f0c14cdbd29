"""HTML → main-content extraction (operators/html.py, jusText-lite):
crafted boilerplate/chrome/nav fixtures with EXACT expected main text,
the quarantine contract for all-chrome pages, and the curation-stage
pass-through semantics for plain text."""

from __future__ import annotations

from pyspark.sql import functions as F

from monasca_aggregator_spark.operators.html import (
    extract_main,
    html_main_content,
    main_text,
)

_ARTICLE = (
    "The aggregation engine assigns every metric to an epoch-aligned "
    "window and publishes once the lag deadline passes."
)
_PARA2 = (
    "Late samples that arrive before the deadline still count; "
    "anything later lands in the next window by design."
)

_PAGE = f"""<html><head><title>Engine docs</title>
<style>body {{ margin: 0; }}</style>
<script type="text/javascript">var t = "<p>not a block</p>"; track(t);</script>
<!-- rendered 2026-08-15 --></head>
<body>
<nav><a href="/">Home</a> <a href="/docs">Docs</a> <a href="/blog">Blog</a></nav>
<div class="sidebar"><ul>
<li><a href="/rel/1">Related article one</a></li>
<li><a href="/rel/2">Related article two</a></li>
</ul></div>
<article>
<h1>Windows &amp; lag</h1>
<p>{_ARTICLE}</p>
<p>{_PARA2}</p>
<p class="meta"><a href="/login">Log in</a> &middot; <a href="/share">Share</a> &middot; <a href="/report">Report</a></p>
</article>
<footer><a href="/tos">Terms of Service</a> <a href="/privacy">Privacy Policy</a> <a href="/contact">Contact us</a> &copy; 2026</footer>
</body></html>"""

# every block is chrome: link-dense or too short
_ALL_CHROME = (
    '<html><body><nav><a href="/">Home</a> <a href="/d">Docs</a></nav>'
    '<footer><a href="/tos">Terms of Service</a> '
    '<a href="/privacy">Privacy Policy</a></footer></body></html>'
)


def test_extract_main_exact_text(spark):
    df = spark.createDataFrame([(1, _PAGE)], "id long, html string")
    row = extract_main(df).collect()[0]
    # nav, sidebar items, h1 (short), meta row (link-dense) and the
    # footer (link-dense) all drop; the two article paragraphs survive
    assert row.main_text == f"{_ARTICLE} {_PARA2}"
    assert row.n_kept == 2
    assert not row._quarantined
    # script/style/comment text must not leak into ANY block
    assert "margin" not in row.main_text
    assert "track" not in row.main_text
    assert "rendered" not in row.main_text


def test_entity_decode_and_whitespace_collapse(spark):
    html = "<p>fish&nbsp;&amp;&nbsp;chips   are\n\tgreat &lt;always&gt; yes</p>"
    df = spark.createDataFrame([(1, html)], "id long, html string")
    got = df.select(main_text(F.col("html")).alias("m")).collect()[0].m
    assert got == "fish & chips are great <always> yes"


def test_link_density_rule_is_exact_thirds(spark):
    # text = "aaaaaaaaaa bbbbbbbbbbbbbbbbbbbb" (len 31; the stripped
    # </a> tag leaves the separating space), anchor len 10:
    # 3*10 <= 31 -> kept
    kept = '<p><a href="/x">aaaaaaaaaa</a>bbbbbbbbbbbbbbbbbbbb</p>'
    # len 29 with the same 10 anchor chars: 3*10 > 29 -> dropped
    dropped = '<p><a href="/x">aaaaaaaaaa</a>bbbbbbbbbbbbbbbbbb</p>'
    df = spark.createDataFrame(
        [(1, kept), (2, dropped)], "id long, html string"
    )
    out = {r.id: r.n_kept for r in extract_main(df).collect()}
    assert out == {1: 1, 2: 0}


def test_min_length_rule(spark):
    short = "<p>" + "x" * 24 + "</p>"
    long_enough = "<p>" + "x" * 25 + "</p>"
    df = spark.createDataFrame(
        [(1, short), (2, long_enough)], "id long, html string"
    )
    out = {r.id: r.n_kept for r in extract_main(df).collect()}
    assert out == {1: 0, 2: 1}


def test_all_chrome_page_is_quarantined(spark):
    df = spark.createDataFrame([(1, _ALL_CHROME)], "id long, html string")
    row = extract_main(df).collect()[0]
    assert row.main_text == ""
    assert row.n_kept == 0
    assert row._quarantined


def test_curation_stage_passthrough_and_drop(spark):
    rows = [
        (1, _PAGE, "en", "web", len(_PAGE)),
        (2, _ALL_CHROME, "en", "web", len(_ALL_CHROME)),
        (3, "plain text stays exactly as it came in", "en", "clean", 39),
        (4, None, "en", "clean", 0),
    ]
    df = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    out = {r.doc_id: r.text for r in html_main_content(df).collect()}
    # HTML page replaced by its extracted main content
    assert out[1] == f"{_ARTICLE} {_PARA2}"
    # all-chrome page dropped (curation quarantine semantics)
    assert 2 not in out
    # plain text byte-identical
    assert out[3] == "plain text stays exactly as it came in"
    # NULL text is not HTML: it passes through for a downstream gate
    # to count, never a silent NULL-filter drop (ADVICE r7)
    assert 4 in out and out[4] is None


def test_plan_has_no_shuffle_or_python(spark):
    """Extraction is one projection pass: no Exchange, no
    BatchEvalPython in the per-doc plan."""
    df = spark.createDataFrame([(1, _PAGE)], "id long, html string")
    plan = extract_main(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
