"""URL canonicalization for web-corpus keying.

Exact dedup and latest-capture grouping are only as good as the key:
Common-Crawl URL strings differ in case, default ports, `www.`,
fragments, trailing slashes and query-parameter order while naming the
same resource. `url_normalize` maps each raw URL to a canonical form:

  1. scheme lowercased;
  2. host lowercased, one leading "www." stripped, default port
     (:80 for http, :443 for https) stripped;
  3. fragment dropped;
  4. one trailing "/" stripped from the path ("/" becomes "");
  5. query parameters sorted bytewise (binary UTF-8 order).

Supported shape: scheme://host[:port][/path][?query][#fragment],
no userinfo — the Common-Crawl index subset. Everything is JVM-side
codegen (`parse_url` + array ops, zero Python); the DuckDB oracle
re-derives the same form from scratch with string/list functions, so
the two implementations are independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F  # noqa: N812


def url_normalize(df: DataFrame, url_col: str = "url",
                  id_col: str = "doc_id") -> DataFrame:
    """(id, url, url_norm, host, path, n_params) — canonical key per
    raw URL. Pure column expressions; no shuffle, no Python."""
    url = F.col(url_col)
    proto = F.lower(F.parse_url(url, F.lit("PROTOCOL")))
    auth = F.lower(F.parse_url(url, F.lit("AUTHORITY")))
    dport = F.when(proto == "http", F.lit(":80")) \
        .when(proto == "https", F.lit(":443")).otherwise(F.lit("~none~"))
    noport = F.when(auth.endswith(dport),
                    F.substring(auth, 1, F.length(auth) - F.length(dport))
                    ).otherwise(auth)
    host = F.when(noport.startswith("www."),
                  F.substring(noport, 5, F.length(noport))
                  ).otherwise(noport)
    rawpath = F.coalesce(F.parse_url(url, F.lit("PATH")), F.lit(""))
    path = F.when(rawpath.endswith("/"),
                  F.substring(rawpath, 1, F.length(rawpath) - 1)
                  ).otherwise(rawpath)
    query = F.parse_url(url, F.lit("QUERY"))
    qsorted = F.concat_ws("&", F.array_sort(F.split(query, "&")))
    n_params = F.when(query.isNull() | (query == ""), F.lit(0)) \
        .otherwise(F.size(F.split(query, "&"))).cast("bigint")
    url_norm = F.concat(
        proto, F.lit("://"), host, path,
        F.when(query.isNull() | (query == ""), F.lit(""))
        .otherwise(F.concat(F.lit("?"), qsorted)))
    return df.select(
        F.col(id_col).alias("id"), url.alias("url"),
        url_norm.alias("url_norm"), host.alias("host"),
        path.alias("path"), n_params.alias("n_params"))


def surt_keys(df: DataFrame, url_col: str = "url",
              id_col: str = "doc_id") -> DataFrame:
    """(id, url, surt_key): the Sort-friendly URI Reordering
    Transform — the Common Crawl / web-archive (CDX) index key.
    Scheme dropped, host lowercased, www stripped, default ports
    dropped (non-default ports kept AFTER the reversed host, per the
    convention), host labels REVERSED and comma-joined, then ')' +
    path (trailing slash trimmed) + sorted query.

    The point is the prefix-ordering property: every page of
    example.com and its subdomains shares the 'com,example' prefix,
    so a SURT-sorted (range-partitioned / Iceberg-sorted) index
    serves whole-domain lookups as range scans instead of full scans
    — the reason web archives key their billions of captures this
    way. Builds on url_normalize's parse; zero-shuffle codegen."""
    base = url_normalize(df, url_col, id_col)
    host = F.col("host")
    has_port = F.instr(host, ":") > 0
    port = F.when(has_port, F.expr("substring(host, instr(host, ':'))")) \
        .otherwise(F.lit(""))
    hostonly = F.when(
        has_port, F.expr("substring(host, 1, instr(host, ':') - 1)")) \
        .otherwise(host)
    rev = F.array_join(F.reverse(F.split(hostonly, "\\.")), ",")
    qpart = F.when(F.instr(F.col("url_norm"), "?") > 0,
                   F.expr("substring(url_norm, "
                          "instr(url_norm, '?'))")) \
        .otherwise(F.lit(""))
    surt = F.concat(rev, port, F.lit(")"), F.col("path"), qpart)
    return base.select("id", "url", surt.alias("surt_key"))


def blocklist_filter(df: DataFrame, blocklist: DataFrame,
                     domain_col: str = "source",
                     block_col: str = "domain") -> DataFrame:
    """Drop rows whose domain appears in a blocklist — the standard
    web-corpus exclusion step (spam/adult/opt-out host lists).

    Physical shape: broadcast LEFT ANTI join. The blocklist is a small
    dimension (thousands-to-millions of hosts fit one executor); the
    corpus side never shuffles — at 10^12 rows a hash-shuffle anti
    join would move the whole corpus to drop a fraction of it."""
    return df.join(
        F.broadcast(blocklist.select(F.col(block_col).alias("_blocked"))),
        df[domain_col] == F.col("_blocked"), "left_anti")


# frozen public-suffix subset (PSL-lite): the multi-label registry
# suffixes that dominate web corpora; hosts under unknown TLDs fall
# back to the last two labels. A production run swaps in the full
# publicsuffix.org list (same broadcast-literal shape, ~9k entries).
PSL_MULTI_SUFFIXES = [
    "co.uk", "org.uk", "ac.uk", "gov.uk", "com.au", "net.au",
    "org.au", "co.jp", "or.jp", "ne.jp", "com.br", "com.cn",
    "com.mx", "co.in", "co.kr", "com.tr", "com.ar", "co.za",
    "com.sg", "co.nz",
]


def registered_domain(df: DataFrame, url_col: str = "url") -> DataFrame:
    """(url, host, reg_domain, tld): the registrable domain — what
    per-"domain" statistics, rate caps and blocklists should key on
    (host-level keys overcount sites with many subdomains; raw TLD
    grouping undercounts). `shop.a.example.co.uk` -> `example.co.uk`,
    `a.blog.example.com` -> `example.com`.

    Pure codegen (split + guarded gets + IN over the literal suffix
    table) — zero shuffles, rides the scan. `get` (0-based, NULL out
    of range) rather than element_at, which throws under ANSI mode
    for out-of-range single-label hosts.
    """
    raw = F.split_part(F.split_part(F.col(url_col), F.lit("//"),
                                    F.lit(2)), F.lit("/"), F.lit(1))
    host = F.lower(F.split_part(raw, F.lit(":"), F.lit(1)))
    labels = F.split(host, "\\.")
    n = F.size(labels)
    g = lambda i: F.get(labels, i)  # noqa: E731
    last2 = F.concat_ws(".", g(n - 2), g(n - 1))
    last3 = F.concat_ws(".", g(n - 3), g(n - 2), g(n - 1))
    reg = (F.when((n >= 3) & last2.isin(PSL_MULTI_SUFFIXES), last3)
           .when(n >= 2, last2)
           .otherwise(host))
    return df.select(
        F.col(url_col).alias("url"), host.alias("host"),
        reg.alias("reg_domain"), g(n - 1).alias("tld"))


def crawl_schedule(df: DataFrame, url_col: str = "url",
                   per_host_concurrency: int = 2,
                   salt: str = "crawl-v1") -> DataFrame:
    """(url, host, host_seq, slot): politeness-aware fetch planning —
    every host's URLs are numbered deterministically (md5 order, so
    the plan is reproducible and repartition-stable) and packed into
    slots of `per_host_concurrency` fetches; a scheduler runs slot 0
    everywhere, then slot 1, ... so no host ever sees more than
    `per_host_concurrency` in-flight requests while the fleet stays
    saturated across hosts.

    One exchange (the per-host window); the frontier rows are tiny
    (url + hash). Skewed giant hosts simply stretch into many slots —
    exactly the throttling the schedule exists to express.
    """
    from pyspark.sql import Window

    from ..functions import code15

    host = F.lower(F.split_part(F.split_part(F.col(url_col), F.lit("//"),
                                             F.lit(2)),
                                F.lit("/"), F.lit(1)))
    rk = code15(F.concat(F.col(url_col), F.lit(":" + salt)))
    w = Window.partitionBy("host").orderBy("rk", url_col)
    base = df.select(F.col(url_col).alias("url"), host.alias("host"),
                     rk.alias("rk"))
    seq = F.row_number().over(w).cast("bigint") - 1
    return (base.withColumn("host_seq", seq)
            .select("url", "host", "host_seq",
                    F.expr(f"host_seq div {per_host_concurrency}")
                    .alias("slot")))
