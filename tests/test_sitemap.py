"""Sitemap ingestion: robots Sitemap: lines → seeds_df → engine crawl."""

from __future__ import annotations

import datetime as dt

from icrawler_spark.crawl import CrawlConfig, CrawlEngine
from icrawler_spark.crawl.sitemap import sitemap_seeds_df, sitemap_urls_from_robots

SCHEMA = "url string, warc_ts timestamp_ntz, html binary, text string, lang string"


def _page(url, html):
    return (url, dt.datetime(2024, 1, 1), html.encode("utf-8"), "", "en")


def _corpus(spark):
    host = "https://sm.example.test"
    index = f"""<?xml version="1.0"?>
    <sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
      <sitemap><loc>{host}/shard2.xml</loc></sitemap>
      <sitemap><loc> {host}/shard1.xml </loc></sitemap>
      <sitemap><loc>{host}/missing-shard.xml</loc></sitemap>
    </sitemapindex>"""
    shard1 = f"""<urlset><url><loc>{host}/p3.html</loc></url>
                 <url><loc>{host}/p1.html</loc></url></urlset>"""
    shard2 = f"""<urlset><url><loc>{host}/p2.html</loc></url>
                 <url><loc>{host}/p1.html</loc></url></urlset>"""
    flat = f"""<urlset><url><loc>{host}/p9.html</loc></url></urlset>"""
    rows = [
        _page(f"{host}/sitemap.xml", index),
        _page(f"{host}/shard1.xml", shard1),
        _page(f"{host}/shard2.xml", shard2),
        _page(f"{host}/flat.xml", flat),
    ] + [
        _page(f"{host}/p{i}.html", f"<html><body>page {i}</body></html>")
        for i in (1, 2, 3, 9)
    ]
    return host, spark.createDataFrame(rows, SCHEMA)


def test_sitemap_urls_from_robots():
    got = sitemap_urls_from_robots(
        {
            "b.test": "User-agent: *\nDisallow: /x\nSitemap: https://b.test/s.xml",
            "a.test": (
                "Sitemap: https://a.test/1.xml\n"
                "sitemap: https://a.test/2.xml  # lenient case\n"
                "Sitemap: relative/skipped.xml\n"
                "Sitemap: https://a.test/1.xml\n"  # dedup
            ),
        }
    )
    assert got == ["https://a.test/1.xml", "https://a.test/2.xml", "https://b.test/s.xml"]


def test_sitemap_seeds_order_index_and_flat(spark):
    """Index shards expand in index-entry order; a flat urlset listed after
    the index follows it; duplicates keep the first slot; a missing shard
    contributes nothing."""
    host, pages = _corpus(spark)
    seeds = sitemap_seeds_df(
        spark, pages, [f"{host}/sitemap.xml", f"{host}/flat.xml"]
    )
    rows = sorted(seeds.collect(), key=lambda r: r.pos)
    assert [r.url for r in rows] == [
        f"{host}/p2.html",  # shard2 (index entry 0)
        f"{host}/p1.html",  # shard2 second entry — wins the dup
        f"{host}/p3.html",  # shard1 (index entry 1)
        f"{host}/p9.html",  # flat urlset after the whole index
    ]
    assert len({r.pos for r in rows}) == 4  # unique, order-true


def test_sitemap_seeded_engine_crawls_in_sitemap_order(spark):
    host, pages = _corpus(spark)
    robots = {"sm.example.test": f"User-agent: *\nSitemap: {host}/sitemap.xml"}
    seeds = sitemap_seeds_df(spark, pages, sitemap_urls_from_robots(robots))
    eng = CrawlEngine(
        spark,
        pages,
        CrawlConfig(
            start_url=f"{host}/p2.html",
            max_rounds=5,
            use_bloom=False,
            parse_entries=False,
            host_budget=2,
        ),
        seeds_df=seeds,
    )
    eng.run()
    assert eng.crawl_order() == [
        f"{host}/p2.html",
        f"{host}/p1.html",
        f"{host}/p3.html",
    ]


def test_sitemap_garbage_inputs(spark):
    """Empty list, sitemap url absent from corpus, non-XML document."""
    host, pages = _corpus(spark)
    assert sitemap_seeds_df(spark, pages, []).count() == 0
    assert sitemap_seeds_df(spark, pages, ["https://nowhere.test/s.xml"]).count() == 0
    # an html page given as a sitemap has no <loc> entries → no seeds
    assert sitemap_seeds_df(spark, pages, [f"{host}/p1.html"]).count() == 0
