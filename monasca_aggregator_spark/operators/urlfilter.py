"""URL/domain filtering — the entry gate of a web-corpus pipeline.

Runs BEFORE content ever loads (CCNet / fineweb line): parse the host
out of each record's URL, drop blocklisted domains and policy TLDs,
and cap how many documents any one domain contributes (crawl-balance —
one hot domain must not dominate the corpus). The registered query
``curation_url_filter`` (plans/pipeline_ops.py) pins the arithmetic
against DuckDB on synthesized URLs; this module is the reusable
dataset-level operator the pipeline composes.

Scale: blocklist/TLD checks are row-local (the blocklist is a literal
``isin`` — at real scale broadcast a blocklist relation and left-anti
join instead, noted below); the cap is a rank inside each host
partition (the per-group-limit shape WindowGroupLimit pushes down). A
skewed mega-domain is the documented salt-then-cap case
(docs/SCALING.md skew section).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

# host = everything after the scheme up to the first path/query/
# fragment delimiter — NO trailing-slash requirement, so path-less
# URLs (https://example.xyz, https://tracker-ads.example?q=1) still
# parse (ADVICE r7: the old r"https?://([^/]+)/" extracted host=''
# for those, silently bypassing every gate). Scheme match is
# case-INSENSITIVE (RFC 3986 §3.1; VERDICT r8: `HTTP://Example.com/a`
# extracted host='' and every uppercase-scheme URL canonicalized to
# one empty dedup key, silently merging distinct pages).
HOST_RE = r"(?i)https?://([^/?#]+)"


def url_domain_filter(
    df: DataFrame,
    url_col: str = "url",
    *,
    blocklist: Sequence[str] = (),
    blocked_tlds: Sequence[str] = (".xyz",),
    per_domain_cap: int | None = None,
    order_col: str = "doc_id",
    keep_reason: bool = False,
) -> DataFrame:
    """Filter rows by URL policy; returns surviving rows (plus a
    ``_url_reason`` column when ``keep_reason`` — 'kept' | 'bad_url'
    | 'blocklist' | 'bad_tld' | 'over_cap' — for funnel accounting,
    in which case dropped rows are RETAINED with their reason and the
    caller filters).

    Precedence: unparseable → blocklist → TLD → cap, so accounting
    attributes each drop to the first gate that caught it. A URL
    whose host can't be extracted (empty/garbled) is an explicit
    'bad_url' drop — never silently 'kept', and never pooled into a
    shared '' cap partition (ADVICE r7). For blocklists beyond a few
    thousand entries, join a broadcast blocklist relation instead of
    the literal ``isin`` this builds.
    """
    # DNS hostnames are case-insensitive: lowercase before any policy
    # check so `HTTPS://Tracker-Ads.Example/x` still hits the
    # blocklist / TLD / cap gates (the cap partitions by the
    # case-folded host, so `Example.com` and `example.com` share one
    # cap budget — they are the same domain)
    host = F.lower(F.regexp_extract(F.col(url_col), HOST_RE, 1))
    out = df.withColumn("_url_host", host)
    reason = F.lit("kept")
    if per_domain_cap is not None:
        rn = F.row_number().over(
            Window.partitionBy("_url_host").orderBy(F.col(order_col))
        )
        out = out.withColumn("_url_rn", rn)
        reason = F.when(
            F.col("_url_rn") > per_domain_cap, F.lit("over_cap")
        ).otherwise(reason)
    for tld in blocked_tlds:
        reason = F.when(
            F.col("_url_host").endswith(tld), F.lit("bad_tld")
        ).otherwise(reason)
    if blocklist:
        reason = F.when(
            F.col("_url_host").isin(*list(blocklist)), F.lit("blocklist")
        ).otherwise(reason)
    # applied last = highest precedence: NULL or empty host (no
    # scheme, no authority, garbled URL) is an explicit counted drop
    reason = F.when(
        F.coalesce(F.col("_url_host"), F.lit("")) == "", F.lit("bad_url")
    ).otherwise(reason)
    out = out.withColumn("_url_reason", reason).drop(
        "_url_host", "_url_rn"
    )
    if keep_reason:
        return out
    return out.filter(F.col("_url_reason") == "kept").drop(
        "_url_reason"
    )


# path = everything between the authority and the first query/
# fragment delimiter (may be empty for path-less URLs); scheme match
# case-insensitive like HOST_RE
PATH_RE = r"(?i)https?://[^/?#]+([^?#]*)"


def canonical_url(url: F.Column) -> F.Column:
    """Canonical form for URL-level dedup (the CCNet/fineweb entry
    dedup that runs before any content loads): two crawl records of
    the SAME page under cosmetic URL variation collapse to one key.

    Normalization (deliberately query-INSENSITIVE — tracking params
    like utm_*/gclid dominate real query strings, and a
    param-whitelist is site policy, not engine mechanics):
    scheme dropped (http/https unified, case-insensitive per RFC
    3986), userinfo (``user:pass@``) dropped, host lowercased with a
    leading ``www.`` stripped, default ports ``:80``/``:443``
    stripped, query + fragment dropped, trailing slashes stripped
    from the path. Pure row-local JVM regex — zero shuffle; compose
    with ``exact_dedup``-style groupBy on the result.

    Unparseable URLs (no scheme/authority) fall back to the RAW url
    string as their own key — NEVER the empty string (VERDICT r8:
    every unparseable URL used to share key '' and
    groupBy/dropDuplicates silently merged unrelated rows — data
    loss, not a missed dedup). Raw fallback rather than NULL because
    ``dropDuplicates``/``groupBy`` treat NULL keys as EQUAL, so NULL
    would re-open the same merge hole; with the raw fallback two
    distinct garbled URLs can only collapse if byte-identical. NULL
    url stays NULL.
    """
    host = F.regexp_replace(  # drop userinfo: everything up to '@'
        F.lower(F.regexp_extract(url, HOST_RE, 1)), r"^[^@]*@", ""
    )
    host = F.regexp_replace(host, r"^www\.", "")
    host = F.regexp_replace(host, r":(80|443)$", "")
    path = F.regexp_replace(
        F.regexp_extract(url, PATH_RE, 1), r"/+$", ""
    )
    return F.when(host == "", url).otherwise(F.concat(host, path))
