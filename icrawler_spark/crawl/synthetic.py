"""Deterministic synthetic Common-Crawl-style corpus.

Two generators:

1. ``build_site`` — a small pure-Python linked site (dict url→html) in the
   reference's listing dialects, used for crawl-order/seen-set parity tests.
   Driven through ``site_pages_df`` it becomes the input_hint pages table
   ``(url, warc_ts, html:binary, text, lang)``.

2. ``synthetic_pages_df`` — a *distributed* generator for the frontier bench:
   HTML is assembled with native Column string ops from ``spark.range`` (no
   driver-side loop, no Python in the row path), so a 10^6-10^7-page corpus
   materializes in parallel on executors. The link graph is a deterministic
   pagination chain per host plus cross-host links, which yields a frontier
   whose BFS expansion touches every page.

Everything is seed-free *by construction* (pure arithmetic of ids), matching
the no-wall-clock / no-randomness determinism rule.
"""

from __future__ import annotations

import datetime as _dt

from pyspark.sql import DataFrame, SparkSession, functions as F

_EPOCH = _dt.datetime(2024, 1, 1)


# --- pure-Python mini-site (tests) -------------------------------------------


def _listing_page_html(host: str, page_idx: int, n_pages: int, entries_per_page: int) -> str:
    """One ``default``-dialect table listing page with pagination links."""
    rows = []
    for i in range(entries_per_page):
        serial = page_idx * entries_per_page + i + 1
        rows.append(
            f"<tr><td>{serial}</td>"
            f"<td><a href='/list/detail_{serial}.html' title='公告{serial}号文件'>公告{serial}号文件</a></td>"
            f"<td><a href='/files/doc_{serial}.pdf'>附件下载</a></td>"
            f"<td class='gz_tit2'>2024-01-{(serial % 28) + 1:02d}</td></tr>"
        )
    pag = []
    if page_idx + 1 < n_pages:
        nxt = "index.html" if page_idx + 1 == 0 else f"index_{page_idx + 1}.html"
        pag.append(f"<a href='/list/{nxt}'>下一页</a>")
    if page_idx > 0:
        prv = "index.html" if page_idx - 1 == 0 else f"index_{page_idx - 1}.html"
        pag.append(f"<a href='/list/{prv}'>上一页</a>")
    # numbered page links in document order — exercises FIFO append dedup
    for p in range(n_pages):
        name = "index.html" if p == 0 else f"index_{p}.html"
        pag.append(f"<a href='/list/{name}'>{p + 1}</a>")
    return (
        "<html><body><table>"
        + "".join(rows)
        + "</table><div class='list_page'>"
        + "".join(pag)
        + "</div></body></html>"
    )


def _detail_page_html(serial: int) -> str:
    return (
        f"<html><body><h1>公告{serial}号文件</h1>"
        f"<p>正文第{serial}条内容。</p>"
        f"<a href='/files/att_{serial}.docx'>公告{serial}附件</a>"
        "</body></html>"
    )


def build_site(
    host: str = "www.example.test",
    n_pages: int = 4,
    entries_per_page: int = 3,
    with_attachments: bool = False,
) -> dict[str, str | bytes]:
    """url → content for one paginated listing site (default dialect).

    ``with_attachments`` adds the pdf/docx payloads the listing and detail
    pages link to (bytes values) so the download stage has a corpus."""
    base = f"https://{host}"
    site: dict[str, str | bytes] = {}
    for p in range(n_pages):
        name = "index.html" if p == 0 else f"index_{p}.html"
        site[f"{base}/list/{name}"] = _listing_page_html(host, p, n_pages, entries_per_page)
    for serial in range(1, n_pages * entries_per_page + 1):
        site[f"{base}/list/detail_{serial}.html"] = _detail_page_html(serial)
        if with_attachments:
            site[f"{base}/files/doc_{serial}.pdf"] = b"%PDF-1.4 fake payload " + str(serial).encode()
            site[f"{base}/files/att_{serial}.docx"] = b"PK fake docx payload " + str(serial).encode()
    return site


def site_pages_df(spark: SparkSession, site: dict[str, str | bytes], lang: str = "zh") -> DataFrame:
    """Pure-Python site → input_hint pages table (url, warc_ts, html, text, lang)."""
    rows = [
        (
            url,
            _EPOCH + _dt.timedelta(seconds=i),
            content if isinstance(content, bytes) else content.encode("utf-8"),
            "",
            lang,
        )
        for i, (url, content) in enumerate(sorted(site.items()))
    ]
    return spark.createDataFrame(
        rows, "url string, warc_ts timestamp_ntz, html binary, text string, lang string"
    )


# --- distributed generator (bench) -------------------------------------------


def synthetic_pages_df(
    spark: SparkSession,
    n_pages: int,
    n_hosts: int = 1000,
    links_per_page: int = 4,
    hot_host_fraction: float = 0.2,
    filler_paragraphs: int = 0,
) -> DataFrame:
    """Distributed pages table with a deterministic link graph.

    Page ``i`` lives on host ``h(i)``; hosts are skewed (a ``hot`` host takes
    ``hot_host_fraction`` of all pages — the skew the salted partitioning and
    AQE must absorb). Each page links to its successors on the same host
    (pagination chain) and one cross-host page, all as plain <a href> links.

    The HTML is assembled with Column ``concat`` — whole-stage codegen, zero
    Python — so generation scales with executors, not the driver.
    """
    hot_pages = int(n_pages * hot_host_fraction)
    df = spark.range(n_pages).withColumnRenamed("id", "page_id")
    host = (
        F.when(F.col("page_id") < hot_pages, F.lit("hot.example.test"))
        .otherwise(F.concat(F.lit("host-"), (F.col("page_id") % n_hosts).cast("string"), F.lit(".example.test")))
    )
    url = F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("page_id").cast("string"), F.lit(".html"))

    def link_to(target_id):
        return F.concat(
            F.lit("<a href='https://"),
            F.when(target_id < hot_pages, F.lit("hot.example.test"))
            .otherwise(F.concat(F.lit("host-"), (target_id % n_hosts).cast("string"), F.lit(".example.test"))),
            F.lit("/p/"),
            target_id.cast("string"),
            F.lit(".html'>下一页</a>"),
        )

    anchors = []
    for k in range(1, links_per_page):
        # same-host-successor chain with stride, stays within [0, n_pages)
        anchors.append(link_to((F.col("page_id") + k) % n_pages))
    # one deterministic long-range cross link
    anchors.append(link_to((F.col("page_id") * 48271 + 1) % n_pages))

    # realistic page weight: parse cost at 100 TB is dominated by body HTML,
    # so the bench corpus carries filler paragraphs (~230 B each)
    body = [
        F.lit("<html><body><div class='list_page'>"),
        *anchors,
        F.lit("</div><p>synthetic page "),
        F.col("page_id").cast("string"),
        F.lit("</p>"),
    ]
    if filler_paragraphs > 0:
        para = F.concat(
            F.lit("<p>filler content block with tokens alpha beta gamma delta epsilon "
                  "zeta eta theta iota kappa lambda for page "),
            F.col("page_id").cast("string"),
            F.lit(" covering layout text extraction and link-scan throughput measurements.</p>"),
        )
        body.append(F.repeat(para, filler_paragraphs))
    body.append(F.lit("</body></html>"))
    html = F.concat(*body)
    return df.select(
        url.alias("url"),
        (F.lit(_EPOCH) + F.make_interval(secs=F.col("page_id").cast("double") * 0.001)).alias("warc_ts"),
        F.encode(html, "utf-8").alias("html"),
        F.lit("").alias("text"),
        F.lit("zh").alias("lang"),
    )


def synthetic_seed_df(
    spark: SparkSession,
    n_pages: int,
    stride: int = 5,
    n_hosts: int = 1000,
    hot_host_fraction: float = 0.2,
) -> DataFrame:
    """Distributed seed frontier for ``CrawlEngine(seeds_df=...)``:
    (url, pos) rows matching ``synthetic_pages_df``'s URL scheme, built from
    ``spark.range`` — no driver-side list, so a 10^7-URL recrawl seed
    materializes on executors. ``pos`` = page id (unique, order-true; the
    engine does not require dense positions)."""
    hot_pages = int(n_pages * hot_host_fraction)
    df = spark.range(0, n_pages, stride).withColumnRenamed("id", "page_id")
    host = (
        F.when(F.col("page_id") < hot_pages, F.lit("hot.example.test"))
        .otherwise(F.concat(F.lit("host-"), (F.col("page_id") % n_hosts).cast("string"), F.lit(".example.test")))
    )
    return df.select(
        F.concat(F.lit("https://"), host, F.lit("/p/"), F.col("page_id").cast("string"), F.lit(".html")).alias("url"),
        F.col("page_id").alias("pos"),
    )
