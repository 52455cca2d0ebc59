"""WARC source: from-scratch ISO 28500 reader → input_hint pages table."""

from __future__ import annotations

import datetime as dt

from icrawler_spark.crawl.warc import (
    build_warc_bytes,
    parse_warc_records,
    read_warc,
)

RECS = [
    ("https://w.test/a.html", "2024-01-01T00:00:00Z", b"<html><body>A</body></html>"),
    ("https://w.test/b.html", "2024-01-02T12:30:00Z", b"<html><body>B</body></html>"),
]


def test_parse_records_plain_and_gzip_members():
    for gz in (False, True):
        data = build_warc_bytes(RECS, gzip_members=gz)
        got = list(parse_warc_records(data))
        assert len(got) == 2
        h0, block0 = got[0]
        assert h0["warc-type"] == "response"
        assert h0["warc-target-uri"] == "https://w.test/a.html"
        assert block0.endswith(b"<html><body>A</body></html>")


def test_parse_records_corrupt_tail_keeps_prefix():
    data = build_warc_bytes(RECS) + b"WARC/1.0\r\nContent-Length: oops\r\n\r\nx"
    assert len(list(parse_warc_records(data))) == 2
    # truncated mid-record: prefix survives
    whole = build_warc_bytes(RECS)
    assert len(list(parse_warc_records(whole[: len(whole) - 10]))) == 1
    assert list(parse_warc_records(b"")) == []
    assert list(parse_warc_records(b"not a warc at all")) == []


def test_read_warc_dataframe_and_crawl(spark, tmp_path):
    """read_warc produces the exact input_hint schema; the resulting pages
    table drives the real CrawlEngine (seed fetch + pagination follow)."""
    from icrawler_spark.crawl import CrawlConfig, CrawlEngine

    host = "https://w.test"
    recs = [
        (f"{host}/p0.html", "2024-01-01T00:00:00Z",
         f'<html><body><a href="{host}/p1.html">下一页</a></body></html>'.encode()),
        (f"{host}/p1.html", "2024-01-01T00:00:01Z", b"<html><body>end</body></html>"),
        # a request record must be ignored
    ]
    raw = build_warc_bytes(recs, gzip_members=True)
    raw += (
        b"WARC/1.0\r\nWARC-Type: request\r\n"
        b"WARC-Target-URI: https://w.test/p0.html\r\n"
        b"Content-Length: 2\r\n\r\nhi\r\n\r\n"
    )
    f = tmp_path / "seg-00000.warc.gz"
    f.write_bytes(raw)

    pages = read_warc(spark, str(f))
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    rows = {r.url: r for r in pages.collect()}
    assert set(rows) == {f"{host}/p0.html", f"{host}/p1.html"}
    assert rows[f"{host}/p0.html"].warc_ts == dt.datetime(2024, 1, 1, 0, 0, 0)
    assert bytes(rows[f"{host}/p0.html"].html).startswith(b"<html>")  # http hdrs stripped

    eng = CrawlEngine(
        spark,
        pages,
        CrawlConfig(start_url=f"{host}/p0.html", max_rounds=5,
                    use_bloom=False, parse_entries=False),
    )
    eng.run()
    assert eng.crawl_order() == [f"{host}/p0.html", f"{host}/p1.html"]
