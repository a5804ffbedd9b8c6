"""Web-corpus curation operators: URL extraction and host statistics.

Reference scope note: the reference (src/main.rs) touches URLs only as
fixed download endpoints (src/main.rs:68-93) — it has no notion of URLs
*inside* data. These are SURVEY §2.13 rebuild extensions: the
URL-hygiene pass every web-scale training corpus needs (RefinedWeb /
CCNet-style URL filtering starts from exactly these features — per-doc
link density and a corpus-level host frequency table that seeds
blocklists).

Design: per-doc features are a NARROW map — URLs come out of the text
via one regexp_extract_all, hosts via a per-element regexp on the array,
every aggregate (count / distinct hosts / flags) computed array-side, so
the corpus text itself never shuffles and never leaves whole-stage
codegen. The corpus-level host table is the only exchange, and it
carries (host, partial-count) pairs — bytes per mapper per host, never
documents.

Regex portability: patterns restrict to the Java/RE2 common subset
(literal classes, `\\s`, no backrefs/lookahead) so the DuckDB oracle
runs the byte-identical pattern.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Java and RE2 agree on this subset: scheme, then run of non-space,
# non-quote, non-angle-bracket characters. Trailing punctuation is NOT
# stripped (both engines keep it identically); curation treats the raw
# match as the URL.
URL_PATTERN = r"https?://[^\s\"'<>]+"
# Group 1 = host: everything after the scheme up to the first /, ?, #,
# whitespace or end. Ports stay attached to keep the rule trivial and
# identical across engines.
HOST_PATTERN = r"https?://([^/?#\s\"'<>]+)"


def _urls(col: Column) -> Column:
    return F.regexp_extract_all(
        F.coalesce(col, F.lit("")), F.lit(URL_PATTERN), 0
    )


def url_features(
    df: DataFrame, text_col: str, id_col: str
) -> DataFrame:
    """Per-document URL features (link-density curation signals).

    Output: `id_col`, `n_urls` (total URL mentions), `n_hosts` (distinct
    lower-cased hosts), `n_secure` (https mentions), `max_url_len`
    (longest URL, 0 when none — spam pages carry kilometric tracking
    URLs), `hosts_fp` (md5 over the sorted distinct host list — a
    host-set fingerprint for grouping pages that link to the same
    places; empty-set docs share the md5 of '').

    Shape: zero exchanges — one regexp_extract_all per row plus
    array-side transforms; at 100 TB this runs at scan speed inside one
    codegen stage and composes with any downstream gate for free.
    """
    urls = _urls(F.col(text_col))
    hosts = F.array_distinct(
        F.transform(
            urls, lambda u: F.lower(F.regexp_extract(u, HOST_PATTERN, 1))
        )
    )
    return df.select(
        F.col(id_col),
        F.size(urls).cast("long").alias("n_urls"),
        F.size(hosts).cast("long").alias("n_hosts"),
        F.size(
            F.filter(urls, lambda u: u.startswith("https://"))
        ).cast("long").alias("n_secure"),
        F.coalesce(
            F.array_max(F.transform(urls, F.length)), F.lit(0)
        ).cast("long").alias("max_url_len"),
        F.md5(
            F.concat_ws(",", F.array_sort(hosts)).cast("binary")
        ).alias("hosts_fp"),
    )


def url_host_stats(
    df: DataFrame,
    text_col: str,
    id_col: str,
    min_docs: int = 1,
    approx: bool = False,
    rsd: float = 0.02,
) -> DataFrame:
    """Corpus-level host frequency table — the seed for URL blocklists
    and domain-mix audits.

    Output: `host` (lower-cased), `n_mentions` (total URL mentions of
    the host), `n_docs` (distinct documents mentioning it), filtered to
    hosts appearing in >= `min_docs` documents.

    Shape: narrow extract+explode, then ONE aggregation keyed by host.
    n_mentions partial-combines map-side; n_docs is a distinct count
    over (host, doc) — Spark plans it as the standard two-phase expand,
    still bytes-per-host on the wire, never text. Hot hosts (every page
    links google.com) are single-key heavy ONLY in the distinct phase;
    the partial combine already collapsed mentions. approx=True swaps
    the exact distinct for approx_count_distinct (HLL++, mergeable —
    one sketch per mapper per host, fully map-side combined): the 100 TB
    path, where a blocklist threshold tolerates ±rsd on doc counts.
    """
    mentions = df.select(
        F.col(id_col).alias("__doc"),
        F.explode(_urls(F.col(text_col))).alias("__url"),
    ).select(
        "__doc",
        F.lower(F.regexp_extract("__url", HOST_PATTERN, 1)).alias("host"),
    )
    n_docs = (
        F.approx_count_distinct("__doc", rsd)
        if approx
        else F.count_distinct("__doc")
    )
    return (
        mentions.groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_mentions"),
            n_docs.alias("n_docs"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )


def canonicalize_url(col: Column) -> Column:
    """Canonical URL form for pre-fetch dedup — the crawl-frontier pass
    that keeps one representative per 'same page, different spelling':

      1. scheme dropped (http/https identical for identity purposes)
      2. host lowercased, leading 'www.' dropped
      3. tracking params removed (utm_*, fbclid, gclid, ref) — they
         change per click, not per page
      4. remaining query params SORTED (param order is not identity)
      5. trailing '/' dropped; empty query's '?' dropped

    Pure native expressions (regexp + array ops on the query string) —
    zero Python, composes at scan speed; the exact regex set is
    dialect-portable, so the same steps restate in the DuckDB oracle.
    """
    u = F.coalesce(col, F.lit(""))
    # 1-2: strip scheme; split host from path at the first '/'
    no_scheme = F.regexp_replace(u, r"^[Hh][Tt][Tt][Pp][Ss]?://", "")
    # lowercase BEFORE stripping www. — the strip regex is case-
    # sensitive, and 'WWW.' must not survive the canonical form
    host = F.regexp_replace(
        F.lower(F.regexp_extract(no_scheme, r"^([^/?#]*)", 1)),
        r"^www\.",
        "",
    )
    rest = F.regexp_extract(no_scheme, r"^[^/?#]*([^?#]*)", 1)  # path
    query = F.regexp_extract(no_scheme, r"\?([^#]*)", 1)
    # 3-4: drop tracking params, sort the rest
    params = F.array_sort(
        F.filter(
            F.split(query, "&"),
            lambda p: (p != "")
            & ~p.rlike(r"^(utm_[A-Za-z0-9_]*|fbclid|gclid|ref)="),
        )
    )
    qstr = F.array_join(params, "&")
    path = F.regexp_replace(rest, r"/$", "")
    return F.concat(
        host,
        path,
        F.when(qstr != "", F.concat(F.lit("?"), qstr)).otherwise(F.lit("")),
    )


def dedup_urls(
    df: DataFrame, url_col: str, id_col: str
) -> DataFrame:
    """Frontier dedup: group by canonical form, keep the minimum id as
    the deterministic survivor, count the variants collapsed.  One
    partial-combined aggregation on the canonical string — the only
    exchange carries (canonical, partials)."""
    canon = canonicalize_url(F.col(url_col))
    return (
        df.select(F.col(id_col), canon.alias("canonical_url"))
        .groupBy("canonical_url")
        .agg(
            F.min(id_col).alias("survivor_id"),
            F.count(F.lit(1)).alias("n_variants"),
        )
    )


def html_to_text(col: Column) -> Column:
    """Markup-strip a raw HTML column to whitespace-normalized text — the
    first transform of every web-crawl ingestion pipeline, kept in the
    Java/RE2 regex common subset so the DuckDB oracle runs byte-identical
    patterns (no backrefs/lookahead):

      1. drop <script>/<style> ELEMENTS wholly (their text is code, not
         content) — non-greedy across newlines via [\\s\\S],
      2. drop comments <!-- ... -->,
      3. replace block-level closers + <br> with a space so words from
         adjacent blocks don't concatenate,
      4. strip every remaining tag,
      5. decode the five XML entities + &nbsp; (literal replaces),
      6. collapse whitespace runs, trim.

    Narrow projection — one codegen stage, no UDF, no exchange. (A real
    browser-grade extractor (trafilatura-class) is a plug-in boundary,
    like the JPEG codec; this native path handles machine-generated and
    well-formed pages, i.e. the bulk of a crawl.)
    """
    c = col
    c = F.regexp_replace(c, r"(?i)<script[\s\S]*?</script>", " ")
    c = F.regexp_replace(c, r"(?i)<style[\s\S]*?</style>", " ")
    c = F.regexp_replace(c, r"<!--[\s\S]*?-->", " ")
    c = F.regexp_replace(c, r"(?i)</(p|div|li|ul|ol|h[1-6]|tr|table|blockquote)>", " ")
    c = F.regexp_replace(c, r"(?i)<br\s*/?>", " ")
    c = F.regexp_replace(c, r"<[^>]+>", "")
    for ent, rep in (
        ("&amp;", "&"), ("&lt;", "<"), ("&gt;", ">"),
        ("&quot;", "\""), ("&#39;", "'"), ("&nbsp;", " "),
    ):
        c = F.replace(c, F.lit(ent), F.lit(rep))
    c = F.regexp_replace(c, r"\s+", " ")
    return F.trim(c)


def extract_links(
    df: DataFrame,
    html_col: str,
    id_col: str,
) -> DataFrame:
    """Anchor extraction: one row per <a href> with its (markup-stripped)
    anchor text — the link-graph edge list crawl frontiers and anchor-
    text quality signals are built from.

    Shape: one regexp_extract_all pulls every anchor ELEMENT as an array
    (narrow), explode fans out to link rows, then href/text come from
    per-row regexps — the document text itself never shuffles; what
    explodes is anchor-count rows, and downstream consumers (host stats,
    frontier dedup) aggregate immediately. Single/double/no-quote hrefs
    all match; anchors without href are skipped.

    Output: (id, href, anchor_text).
    """
    anchors = df.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.regexp_extract_all(
                F.col(html_col), F.lit(r"(?i)(<a\s[^>]*href[\s\S]*?</a>)"), 1
            )
        ).alias("__a"),
    )
    href = F.regexp_extract(
        F.col("__a"), r"(?i)href\s*=\s*(\"([^\"]*)\"|'([^']*)'|([^\s>]+))", 1
    )
    # unwrap the quoting alternative that matched
    href_clean = F.regexp_replace(href, "^[\"']|[\"']$", "")
    return anchors.select(
        "id",
        href_clean.alias("href"),
        html_to_text(F.col("__a")).alias("anchor_text"),
    ).filter(F.col("href") != "")
