"""Generic columnar href + img-src extraction (parsers/links.py)."""

from __future__ import annotations

from icrawler_spark.parsers.links import extract_links, image_links

HTML = """<html><body>
<a href="next.html">next</a>
<IMG SRC='/img/a.png'>
<a href="../up/page.html">up</a>
<a href="//cdn.test/x.js">proto-rel</a>
<a href="#frag">frag</a>
<a href="javascript:void(0)">js</a>
<a href="https://abs.test/p.html">abs</a>
<img src="thumb.jpg">
<a href="/gallery/full.JPG">full</a>
<a href = 'spaced.html'>s</a>
<img>
</body></html>"""

BASE = "https://h.test/dir/sub/index.html"


def _pages(spark, html=HTML, url=BASE):
    return spark.createDataFrame([(url, html.encode("utf-8"))], "url string, html binary")


def test_extract_links_order_kinds_resolution(spark):
    rows = extract_links(_pages(spark)).orderBy("link_pos").collect()
    assert [(r.link_pos, r.kind, r.url) for r in rows] == [
        (0, "href", "https://h.test/dir/sub/next.html"),      # relative
        (1, "img", "https://h.test/img/a.png"),               # root-rel, caps+squote
        (2, "href", "https://h.test/dir/up/page.html"),       # ../ collapse
        (3, "href", "https://cdn.test/x.js"),                 # protocol-relative
        (6, "href", "https://abs.test/p.html"),               # absolute (4,5 dropped)
        (7, "img", "https://h.test/dir/sub/thumb.jpg"),
        (8, "href", "https://h.test/gallery/full.JPG"),
        (9, "href", "https://h.test/dir/sub/spaced.html"),    # spaced attr
    ]


def test_image_links_candidate_stream(spark):
    got = [(r.kind, r.url) for r in image_links(_pages(spark)).orderBy("link_pos").collect()]
    assert got == [
        ("img", "https://h.test/img/a.png"),
        ("img", "https://h.test/dir/sub/thumb.jpg"),
        ("href", "https://h.test/gallery/full.JPG"),  # gallery href by suffix
    ]


def test_extract_links_plan_jvm_only_and_carry(spark):
    pages = _pages(spark).selectExpr("url", "html", "CAST(42 AS BIGINT) AS doc_id")
    df = extract_links(pages, carry=("doc_id",))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Python" not in plan  # zero Python anywhere (north_star columnar)
    rows = df.collect()
    assert rows and all(r.doc_id == 42 for r in rows)


def test_extract_links_garbage(spark):
    # non-UTF8 bytes, empty html, html with no links, deep ../ beyond bound
    import datetime as dt  # noqa: F401

    rows = [
        ("https://g.test/a.html", b"\xff\xfe<a href='x.html'>"),
        ("https://g.test/b.html", b""),
        ("https://g.test/c.html", b"<p>nothing</p>"),
        ("https://g.test/q/w/e/r/d.html", b'<a href="../../../../../up.html">u</a>'),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    got = {r.page_url: r.url for r in extract_links(pages).collect()}
    assert got["https://g.test/a.html"] == "https://g.test/x.html"
    # bounded collapse: 3 passes resolve 3 levels; the residue stays literal
    assert got["https://g.test/q/w/e/r/d.html"].endswith("up.html")
    assert "https://g.test/b.html" not in got and "https://g.test/c.html" not in got


def test_engine_collect_images_end_to_end(spark, tmp_path):
    """GreedyImageCrawler mode: the engine harvests image targets per round,
    dedupes across pages and rounds, marks corpus-missing images, and the
    images table survives checkpoint resume."""
    import datetime as dt
    import shutil

    from icrawler_spark.crawl import CrawlConfig, CrawlEngine

    host = "https://img.example.test"

    def page(path, html):
        return (f"{host}/{path}", dt.datetime(2024, 1, 1), html.encode(), "", "en")

    rows = [
        page("p0.html", f'<img src="/shared.png"><a href="{host}/p1.html">下一页</a>'),
        page("p1.html", '<img src="/shared.png"><img src="b.gif">'
                        '<a href="/gone.jpg">dead</a>'),
        page("shared.png", "binary-ish"),
        page("b.gif", "binary-ish"),
    ]
    pages = spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
    )
    ckpt = str(tmp_path / "ckpt_img")
    cfg = CrawlConfig(
        start_url=f"{host}/p0.html", max_rounds=10, use_bloom=False,
        parse_entries=False, host_budget=1, collect_images=True,
        checkpoint_dir=ckpt,
    )
    eng = CrawlEngine(spark, pages, cfg)
    eng.run()
    imgs = {(r.url, r.status, r.round) for r in eng.images.collect()}
    # shared.png collected once (round 0, from p0 — first-wins), never re-added
    assert (f"{host}/shared.png", "downloaded", 0) in imgs
    assert (f"{host}/b.gif", "downloaded", 1) in imgs
    assert (f"{host}/gone.jpg", "missing", 1) in imgs
    assert len(imgs) == 3

    resumed = CrawlEngine(spark, pages, cfg)
    resumed.resume_or_init()
    assert {(r.url, r.status, r.round) for r in resumed.images.collect()} == imgs
    shutil.rmtree(ckpt, ignore_errors=True)
