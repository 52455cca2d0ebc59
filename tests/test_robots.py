"""robots.txt rules table + frontier predicate (north_rule politeness)."""

from __future__ import annotations

from icrawler_spark.crawl import CrawlConfig, CrawlEngine, build_site, site_pages_df
from icrawler_spark.crawl.reference_model import crawl_model
from icrawler_spark.crawl.robots import (
    apply_robots_filter,
    parse_robots_txt,
    robots_rules_df,
)

ROBOTS = """
# comment
User-agent: googlebot
Disallow: /private/

User-agent: *
Disallow: /list/detail_
Allow: /list/detail_1.html
Disallow: /tmp/*case
"""


def test_parse_robots_groups_and_wildcards():
    rules = parse_robots_txt("www.example.test", ROBOTS)
    # googlebot group ignored; * group yields 3 rules
    assert ("www.example.test", "/list/detail_", False, len("/list/detail_")) in rules
    assert ("www.example.test", "/list/detail_1.html", True, len("/list/detail_1.html")) in rules
    # wildcard truncated to pre-* prefix
    assert ("www.example.test", "/tmp/", False, len("/tmp/*case")) in rules
    assert len(rules) == 3


def test_apply_robots_longest_match(spark):
    rules = robots_rules_df(spark, {"www.example.test": ROBOTS})
    frontier = spark.createDataFrame(
        [
            ("t", "https://www.example.test/list/detail_1.html", "www.example.test", 0, 0, 0),
            ("t", "https://www.example.test/list/detail_2.html", "www.example.test", 0, 0, 1),
            ("t", "https://www.example.test/list/index.html", "www.example.test", 0, 0, 2),
            ("t", "https://other.test/list/detail_9.html", "other.test", 0, 0, 3),
        ],
        "task string, url string, netloc string, depth int, discovered_round int, discovery_pos bigint",
    )
    kept = {r.url for r in apply_robots_filter(frontier, rules).collect()}
    assert "https://www.example.test/list/detail_1.html" in kept   # Allow wins (longer)
    assert "https://www.example.test/list/detail_2.html" not in kept
    assert "https://www.example.test/list/index.html" in kept      # no rule matches
    assert "https://other.test/list/detail_9.html" in kept         # host without rules


def test_engine_with_robots_prunes_frontier(spark):
    site = build_site(n_pages=3, entries_per_page=2)
    pages = site_pages_df(spark, site)
    start = "https://www.example.test/list/index.html"
    robots = robots_rules_df(
        spark, {"www.example.test": "User-agent: *\nDisallow: /list/index_2.html\n"}
    )
    eng = CrawlEngine(
        spark, pages, CrawlConfig(start_url=start, max_rounds=10), robots_rules=robots
    )
    eng.run()
    order = eng.crawl_order()
    assert all("index_2" not in u for u in order)
    # unblocked pages crawl in the reference order filtered of the blocked url
    ref_order, _, _ = crawl_model(site, start)
    assert order == [u for u in ref_order if "index_2" not in u]
