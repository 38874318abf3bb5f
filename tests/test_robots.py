"""robots.txt engine (operators/robots.py): group semantics, comment
handling, subset skips, longest-match verdicts, plan pins."""

import pytest
from pyspark.sql import functions as F

from edspdf_spark.operators.robots import robots_rules, robots_verdicts


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _rules(spark, txt, agent="bot"):
    df = spark.createDataFrame([("h.com", txt)],
                               "host string, robots_txt string")
    return sorted((r.is_allow, r.path)
                  for r in robots_rules(df, agent=agent).collect())


def test_star_group_and_unknown_directives(spark):
    txt = ("# top comment\n"
           "User-agent: *\n"
           "Disallow: /a   # trailing comment\n"
           "Crawl-delay: 5\n"
           "Allow: /a/b\n")
    assert _rules(spark, txt) == [(False, "/a"), (True, "/a/b")]


def test_consecutive_ua_lines_share_one_group(spark):
    txt = ("User-agent: other\n"
           "User-agent: bot\n"
           "Disallow: /x\n"
           "User-agent: nobody\n"
           "Disallow: /y\n")
    # first group lists bot -> /x applies; second group doesn't -> /y out
    assert _rules(spark, txt) == [(False, "/x")]


def test_agent_match_case_insensitive_star_fallback(spark):
    txt = "User-Agent: BoT\nDisallow: /p\n"
    assert _rules(spark, txt) == [(False, "/p")]
    assert _rules(spark, txt, agent="somebody-else") == []


def test_specific_group_excludes_star_group(spark):
    """RFC 9309 §2.2.1: when a host has a literal-agent group, '*'
    groups are inapplicable — a long Allow in the '*' group must not
    override the agent-specific Disallow (r3 ADVICE)."""
    txt = ("User-agent: *\n"
           "Disallow: /private/\n"
           "Allow: /private/pub/\n"
           "User-agent: bot\n"
           "Disallow: /private/pub/\n")
    assert _rules(spark, txt) == [(False, "/private/pub/")]
    robots = spark.createDataFrame([("h.com", txt)],
                                   "host string, robots_txt string")
    frontier = spark.createDataFrame(
        [("https://h.com/private/pub/x",), ("https://h.com/private/a",)],
        "url string")
    v = {r.url: r for r in robots_verdicts(
        frontier, robots_rules(robots, agent="bot")).collect()}
    assert not v["https://h.com/private/pub/x"].allowed
    assert v["https://h.com/private/a"].allowed   # '*' group ignored


def test_wildcard_and_empty_rules_skipped(spark):
    txt = ("User-agent: *\n"
           "Disallow: /x*y\n"
           "Disallow: /end$\n"
           "Disallow:\n"
           "Disallow: /real\n")
    assert _rules(spark, txt) == [(False, "/real")]


@pytest.fixture(scope="module")
def verdicts(spark):
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /private/\n"
                   "Allow: /private/pub/\nDisallow: /private/pub/x\n")],
        "host string, robots_txt string")
    rules = robots_rules(robots, agent="bot")
    urls = ["https://h.com/", "https://h.com/private/secret",
            "https://h.com/private/pub/ok",
            "https://h.com/private/pub/x",   # longer disallow wins
            "https://other.com/anything",    # no rules -> allowed
            "https://h.com"]                 # no path -> '/'
    frontier = spark.createDataFrame([(u,) for u in urls], "url string")
    return {r.url: r for r in robots_verdicts(frontier, rules).collect()}


def test_longest_match_verdicts(verdicts):
    v = verdicts
    assert v["https://h.com/"].allowed
    assert not v["https://h.com/private/secret"].allowed
    assert v["https://h.com/private/pub/ok"].allowed        # allow override
    assert not v["https://h.com/private/pub/x"].allowed     # longest rule
    assert v["https://h.com/private/pub/x"].match_len == 14
    assert v["https://other.com/anything"].allowed
    assert v["https://other.com/anything"].match_len == 0
    assert v["https://h.com"].path == "/" and v["https://h.com"].allowed


def test_allow_wins_length_tie(spark):
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /p/\nAllow: /p/\n")],
        "host string, robots_txt string")
    rules = robots_rules(robots)
    frontier = spark.createDataFrame([("https://h.com/p/q",)],
                                     "url string")
    assert robots_verdicts(frontier, rules).collect()[0].allowed


def test_verdict_plan_broadcasts_rules(spark):
    robots = spark.createDataFrame(
        [("h.com", "User-agent: *\nDisallow: /a\n")],
        "host string, robots_txt string")
    frontier = spark.createDataFrame([("https://h.com/a",)],
                                     "url string")
    plan = _plan(robots_verdicts(frontier, robots_rules(robots)))
    assert "EvalPython" not in plan
    assert "BroadcastHashJoin" in plan, plan


def test_crawl_plan_job_end_to_end(spark, tmp_path):
    """run_crawl_plan: robots verdicts + blocklist + politeness slots
    compose into the deployable frontier plan."""
    import json
    import sys
    sys.path.insert(0, "/root/repo/jobs")
    import run_crawl_plan

    frontier = spark.createDataFrame(
        [(f"https://h{i % 3}.com/p/{i}",) for i in range(30)]
        + [("https://h0.com/private/x",), ("https://bad.com/q",)],
        "url string")
    robots = spark.createDataFrame(
        [("h0.com", "User-agent: *\nDisallow: /private/\n"
                    "Crawl-delay: 3\nSitemap: https://h0.com/s.xml\n"),
         ("h1.com", "User-agent: other\nDisallow: /\n")],
        "host string, robots_txt string")
    p_f, p_r, out = (str(tmp_path / d) for d in ("f", "r", "out"))
    frontier.write.parquet(p_f)
    robots.write.parquet(p_r)

    run_crawl_plan.main(["--frontier", p_f, "--robots", p_r,
                         "--output", out,
                         "--per-host-concurrency", "2",
                         "--block-hosts", "bad.com"])

    plan = spark.read.parquet(f"{out}/plan")
    excluded = {(r.url, r.reason) for r in
                spark.read.parquet(f"{out}/excluded").collect()}
    urls = {r.url for r in plan.collect()}
    assert "https://h0.com/private/x" not in urls
    assert ("https://h0.com/private/x", "robots") in excluded
    assert ("https://bad.com/q", "blocklist") in excluded
    assert len(urls) == 30                       # the clean frontier
    # politeness: max 2 fetches per host per slot
    from collections import Counter
    per = Counter((r.host, r.slot) for r in plan.collect())
    assert max(per.values()) <= 2
    rep = json.load(open(f"{out}/plan.json"))
    assert rep["allowed"] == 30
    assert rep["excluded"] == {"robots": 1, "blocklist": 1}
    assert rep["sitemap_urls"] == 1 and rep["hosts_with_delay"] == 1
    delays = {r.host: r.crawl_delay_s for r in
              spark.read.parquet(f"{out}/delays").collect()}
    assert delays == {"h0.com": 3}


def test_crawl_delays_group_semantics(spark):
    from edspdf_spark.operators.robots import robots_crawl_delays
    robots = spark.createDataFrame(
        [("a.com", "User-agent: *\nCrawl-delay: 5\n"
                   "User-agent: bot\nCrawl-delay: 2\n"),
         ("b.com", "User-agent: other\nCrawl-delay: 9\n"),
         ("c.com", "User-agent: *\nCrawl-delay: 2.5\n"),  # fractional
         ("d.com", "User-agent: *\nDisallow: /x\n")],     # no delay
        "host string, robots_txt string")
    rows = robots_crawl_delays(robots, agent="bot").collect()
    got_ms = {r.host: r.crawl_delay_ms for r in rows}
    got_s = {r.host: r.crawl_delay_s for r in rows}
    # a.com: literal group wins (2 s); c.com: fractional 2.5 s is
    # honored as 2500 ms (per-mille quantization); b/d: no delay
    assert got_ms == {"a.com": 2000, "c.com": 2500}
    assert got_s == {"a.com": 2, "c.com": 2}


def test_crawl_delays_fractional_quantization(spark):
    """Per-mille quantization edge cases: padding, truncation beyond
    ms, leading-zero fractions, and rejection of malformed values."""
    from edspdf_spark.operators.robots import robots_crawl_delays
    robots = spark.createDataFrame(
        [("p.com", "User-agent: *\nCrawl-delay: 0.5\n"),
         ("q.com", "User-agent: *\nCrawl-delay: 1.25\n"),
         ("r.com", "User-agent: *\nCrawl-delay: 3.1459\n"),  # trunc
         ("s.com", "User-agent: *\nCrawl-delay: 2.05\n"),
         ("t.com", "User-agent: *\nCrawl-delay: .5\n"),      # malformed
         ("u.com", "User-agent: *\nCrawl-delay: 5.\n")],     # malformed
        "host string, robots_txt string")
    got = {r.host: (r.crawl_delay_ms, r.crawl_delay_s)
           for r in robots_crawl_delays(robots, agent="bot").collect()}
    assert got == {"p.com": (500, 0), "q.com": (1250, 1),
                   "r.com": (3145, 3), "s.com": (2050, 2)}


def test_sitemaps_group_independent(spark):
    from edspdf_spark.operators.robots import robots_sitemaps
    robots = spark.createDataFrame(
        [("a.com", "User-agent: other\nDisallow: /\n"
                   "Sitemap: https://a.com/s.xml\n"
                   "Sitemap: https://a.com/s2.xml\n"
                   "Sitemap: https://a.com/s.xml\n"),  # dup collapses
         ("b.com", "User-agent: *\nDisallow: /x\n")],
        "host string, robots_txt string")
    got = sorted((r.host, r.sitemap_url)
                 for r in robots_sitemaps(robots).collect())
    # found even though the only group is for another agent
    assert got == [("a.com", "https://a.com/s.xml"),
                   ("a.com", "https://a.com/s2.xml")]
