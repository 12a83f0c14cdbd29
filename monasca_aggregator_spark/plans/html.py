"""HTML main-content extraction queries + DuckDB oracles.

The extractor itself lives in ``operators/html.py`` (jusText-lite:
block segmentation + link-density/length classification, all JVM-side
regex/array expressions).  The oracle-backed queries here wrap every
document in a CRAFTED page — nav bar, link-list sidebar, article body,
share-chrome, link-heavy footer, plus <script>/<style>/comment noise —
built from the same deterministic template on both engines, then pin
the extraction arithmetic (block counts, kept counts, exact extracted
text via md5) against DuckDB.  Chrome blocks are constructed to fail
the classifier two different ways (too short: nav/sidebar items;
link-dense: meta row, footer) so both rules are load-bearing.

Every regex is in the Java-regex ∩ RE2 common subset (no
backreferences, inline flags, non-greedy) — see operators/html.py.

Scale: one projection pass over documents, no shuffle until the
(bounded: one row per source) stats rollup.  At 100 TB this is the
shape of the real first pipeline stage: extraction is row-local,
perfectly parallel, and the only exchange is the report aggregation.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from monasca_aggregator_spark.functions.rounding import (
    sql_stable_round,
    stable_round,
)
from monasca_aggregator_spark.operators.html import (
    MIN_BLOCK_CHARS,
    block_structs,
)
from monasca_aggregator_spark.sources.tables import load_table

# ------------------------------------------------------------------ #
# Shared page template: (kind, payload) pieces — "lit" is a literal
# fragment, "col" a column name, "p1"/"p2" the document text split at
# _P_SPLIT chars. Rendered into F.concat on the Spark side and a ||
# chain on the SQL side, so both engines synthesize byte-identical
# pages.
# ------------------------------------------------------------------ #
_P_SPLIT = 120

_PAGE_PIECES: list[tuple[str, str]] = [
    ("lit", '<html><head><title>'),
    ("col", "source"),
    ("lit",
     ' docs</title><style>body{margin:0;font:14px sans-serif}</style>'
     '<script type="text/javascript">var siteId="'),
    ("col", "source"),
    ("lit",
     '";track(siteId);</script><!-- build 2026 --></head><body>'
     '<nav><a href="/">Home</a> <a href="/docs">Docs</a> '
     '<a href="/blog">Blog</a> <a href="/about">About</a></nav>'
     '<div class="sidebar"><ul>'
     '<li><a href="/rel/1">Related article one</a></li>'
     '<li><a href="/rel/2">Related article two</a></li>'
     '<li><a href="/rel/3">More like this</a></li></ul></div>'
     '<article><h1>'),
    ("col", "source"),
    ("lit", ' notes</h1><p>'),
    ("p1", ""),
    ("lit", '</p><p>'),
    ("p2", ""),
    ("lit",
     '</p><p class="meta"><a href="/login">Log in</a> &middot; '
     '<a href="/share">Share</a> &middot; '
     '<a href="/report">Report</a></p></article>'
     '<footer><a href="/tos">Terms of Service</a> '
     '<a href="/privacy">Privacy Policy</a> '
     '<a href="/contact">Contact us</a> &copy; 2026</footer>'
     '</body></html>'),
]


def _page_col() -> F.Column:
    parts = []
    for kind, payload in _PAGE_PIECES:
        if kind == "lit":
            parts.append(F.lit(payload))
        elif kind == "col":
            parts.append(F.col(payload))
        elif kind == "p1":
            parts.append(F.expr(f"substring(text, 1, {_P_SPLIT})"))
        else:  # p2
            parts.append(F.expr(f"substring(text, {_P_SPLIT + 1})"))
    return F.concat(*parts)


def _page_sql() -> str:
    parts = []
    for kind, payload in _PAGE_PIECES:
        if kind == "lit":
            esc = payload.replace("'", "''")
            parts.append(f"'{esc}'")
        elif kind == "col":
            parts.append(payload)
        elif kind == "p1":
            parts.append(f"substring(text, 1, {_P_SPLIT})")
        else:
            parts.append(f"substring(text, {_P_SPLIT + 1})")
    return " || ".join(parts)


# Oracle twin of operators/html.py: identical regexes, identical
# classifier algebra (len >= MIN and 3*lc <= len).
_SQL_BLOCK_SPLIT = (
    r"(?i)</?(?:p|div|h[1-6]|li|ul|ol|table|thead|tbody|tr|td|th"
    r"|section|article|header|footer|nav|aside|blockquote|pre|figure"
    r"|figcaption|main|form|fieldset|hr|br|html|head|body|title)"
    r"(?:\s[^>]*)?/?>"
)
_SQL_ANCHOR = r"(?is)<a(?:\s[^>]*)?>(.*?)</a>"


def _sql_block_text(v: str) -> str:
    """trim(collapse(entity-decode(tag-strip(v)))) in DuckDB SQL."""
    stripped = f"regexp_replace({v}, '<[^>]*>', ' ', 'g')"
    ent = (
        "replace(replace(replace(replace(replace("
        + stripped
        + ", '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'),"
        " '&gt;', '>'), '&quot;', '\"')"
    )
    return rf"trim(regexp_replace({ent}, '\s+', ' ', 'g'))"


_SQL_STRUCTS = f"""pages AS (
  SELECT doc_id, source, {_page_sql()} AS html FROM documents
), cleaned AS (
  SELECT doc_id, source,
         regexp_replace(regexp_replace(regexp_replace(html,
           '(?is)<script(?:\\s[^>]*)?>.*?</script>', ' ', 'g'),
           '(?is)<style(?:\\s[^>]*)?>.*?</style>', ' ', 'g'),
           '(?s)<!--.*?-->', ' ', 'g') AS c
  FROM pages
), structs AS (
  SELECT doc_id, source,
         list_transform(
           string_split_regex(c, '{_SQL_BLOCK_SPLIT}'),
           b -> struct_pack(
             t := {_sql_block_text('b')},
             lc := coalesce(list_sum(list_transform(
                     regexp_extract_all(b, '{_SQL_ANCHOR}', 1),
                     a -> len({_sql_block_text('a')}))), 0)
           )) AS ss
  FROM cleaned
), per_doc AS (
  SELECT doc_id, source,
         len(list_filter(ss, s -> len(s.t) > 0)) AS n_blocks,
         len(list_filter(ss, s -> len(s.t) >= {MIN_BLOCK_CHARS}
                                   AND 3 * s.lc <= len(s.t))) AS n_kept,
         array_to_string(list_transform(
           list_filter(ss, s -> len(s.t) >= {MIN_BLOCK_CHARS}
                                 AND 3 * s.lc <= len(s.t)),
           s -> s.t), ' ') AS main
  FROM structs
)"""


def _extracted(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    pages = docs.select("doc_id", "source", _page_col().alias("html"))
    ss = block_structs(F.col("html"))
    is_content = lambda s: (  # noqa: E731 - shared lambda, two filters
        F.length(s["t"]) >= F.lit(MIN_BLOCK_CHARS)
    ) & (F.lit(3) * s["lc"] <= F.length(s["t"]))
    return pages.select(
        "doc_id",
        "source",
        F.size(F.filter(ss, lambda s: F.length(s["t"]) > 0)).alias(
            "n_blocks"
        ),
        F.size(F.filter(ss, is_content)).alias("n_kept"),
        F.array_join(
            F.transform(F.filter(ss, is_content), lambda s: s["t"]), " "
        ).alias("main"),
    )


def q_html_extract_main(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document extraction report over crafted pages: block count,
    content-block count, extracted-text length and md5 — the md5 pins
    the EXACT main text (not a statistic of it) against the oracle.
    Expected on this template: nav/sidebar/h1/title blocks drop (too
    short), meta/footer drop (link-dense), the one or two article
    paragraphs survive."""
    ex = _extracted(spark, sf_dir)
    return ex.select(
        "doc_id",
        "n_blocks",
        "n_kept",
        F.length("main").alias("main_len"),
        F.md5(F.col("main")).alias("main_md5"),
    )


ORACLE_HTML_EXTRACT_MAIN = f"""
WITH {_SQL_STRUCTS}
SELECT doc_id, CAST(n_blocks AS BIGINT) AS n_blocks,
       CAST(n_kept AS BIGINT) AS n_kept,
       CAST(len(main) AS BIGINT) AS main_len,
       md5(main) AS main_md5
FROM per_doc
""".strip()


def q_html_chrome_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source boilerplate accounting over the crafted pages: docs,
    total/kept block counts, the kept fraction (one division of exact
    integers), and mean extracted length — the curation-impact view of
    the extractor (how much of each source's raw page volume is
    chrome). Bounded output: one row per source."""
    ex = _extracted(spark, sf_dir)
    return ex.groupBy("source").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum("n_blocks").alias("blocks"),
        F.sum("n_kept").alias("kept"),
        stable_round(
            F.sum("n_kept").cast("double")
            / F.sum("n_blocks").cast("double"),
            4,
        ).alias("kept_frac"),
        stable_round(
            F.sum(F.length("main")).cast("double")
            / F.count(F.lit(1)).cast("double"),
            4,
        ).alias("avg_main_len"),
    )


ORACLE_HTML_CHROME_STATS = f"""
WITH {_SQL_STRUCTS}
SELECT source, CAST(count(*) AS BIGINT) AS docs,
       CAST(sum(n_blocks) AS BIGINT) AS blocks,
       CAST(sum(n_kept) AS BIGINT) AS kept,
       {sql_stable_round(
           'CAST(sum(n_kept) AS DOUBLE) / CAST(sum(n_blocks) AS DOUBLE)',
           4,
       )} AS kept_frac,
       {sql_stable_round(
           'CAST(sum(len(main)) AS DOUBLE) / CAST(count(*) AS DOUBLE)',
           4,
       )} AS avg_main_len
FROM per_doc
GROUP BY source
""".strip()


QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "html_extract_main": q_html_extract_main,
    "html_chrome_stats": q_html_chrome_stats,
}

ORACLES: dict[str, str] = {
    "html_extract_main": ORACLE_HTML_EXTRACT_MAIN,
    "html_chrome_stats": ORACLE_HTML_CHROME_STATS,
}
