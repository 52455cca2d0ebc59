"""Generic href + img-src link extraction — fully columnar (zero Python).

The north_star's "lxml-style href + img-src parsing re-expressed columnar":
where the listing parsers (listing.py) reproduce the reference's dialect
semantics through Arrow UDFs, THIS module is the generic crawler path — the
candidate stream an image/url-list crawler walks — and it never leaves the
JVM: one ``regexp_extract_all`` finds the ``<a>``/``<img>`` tags in document
order, ``posexplode`` turns order into data, and attribute extraction + URL
resolution are expression chains inside whole-stage codegen. At 10^7
pages/round this is the difference between a bandwidth-bound Arrow transfer
of every html payload into Python workers and a scan-local codegen stage.

Every regex is lookaround-free and runs byte-identically under Java regex
(Spark) and RE2 (DuckDB), so the whole extractor has a value-exact SQL
oracle (queries/engineops.html_link_extraction).

URL resolution implements the RFC 3986 subset a crawler meets in the wild:
absolute, scheme-relative (``//``), root-relative (``/``), and relative
paths against the base's directory, with ``./`` elimination and a BOUNDED
``../`` collapse (3 passes — deeper chains resolve partially and simply
yield a URL the corpus join won't match; never an error). Fragments-only,
``javascript:``/``mailto:``/``data:`` links resolve to NULL and are dropped.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# one pass over the document: every <a ...> / <img ...> tag, document order.
TAG_RE = r"(?i)<(?:a|img)\b[^>]*>"
_HREF_DQ = r'(?i)\bhref\s*=\s*"([^"]*)"'
_HREF_SQ = r"(?i)\bhref\s*=\s*'([^']*)'"
_SRC_DQ = r'(?i)\bsrc\s*=\s*"([^"]*)"'
_SRC_SQ = r"(?i)\bsrc\s*=\s*'([^']*)'"


def _attr(tag, dq: str, sq: str):
    """First non-empty of double-/single-quoted attribute value."""
    return F.coalesce(
        F.nullif(F.regexp_extract(tag, dq, 1), F.lit("")),
        F.nullif(F.regexp_extract(tag, sq, 1), F.lit("")),
    )


def resolve_link(base, raw):
    """Columnar URL resolution (the RFC 3986 subset above). NULL = drop."""
    scheme = F.regexp_extract(base, r"^([^:/?#]+)://", 1)
    host = F.regexp_extract(base, r"^[^:/?#]+://([^/?#]*)", 1)
    path = F.regexp_extract(base, r"^[^:/?#]+://[^/?#]*([^?#]*)", 1)
    basedir = F.when(path == "", F.lit("/")).otherwise(
        F.regexp_replace(path, r"[^/]*$", "")
    )
    lower = F.lower(raw)
    joined = (
        F.when(raw.isNull() | (raw == "") | raw.startswith("#"), F.lit(None))
        .when(
            lower.startswith("javascript:")
            | lower.startswith("mailto:")
            | lower.startswith("data:"),
            F.lit(None),
        )
        .when(raw.contains("://"), raw)
        .when(raw.startswith("//"), F.concat(scheme, F.lit(":"), raw))
        .when(raw.startswith("/"), F.concat(scheme, F.lit("://"), host, raw))
        .otherwise(F.concat(scheme, F.lit("://"), host, basedir, raw))
    )
    # ./ elimination then bounded ../ collapse (3 passes)
    out = F.regexp_replace(joined, r"/\./", "/")
    out = F.regexp_replace(out, r"/\./", "/")
    for _ in range(3):
        out = F.regexp_replace(out, r"/[^/.][^/]*/\.\./", "/")
    return out


def extract_links(
    pages: DataFrame,
    url_col: str = "url",
    html_col: str = "html",
    carry: tuple[str, ...] = (),
) -> DataFrame:
    """pages → one row per ``<a href>`` / ``<img src>`` in document order:
    (page_url, link_pos, kind 'href'|'img', url resolved-absolute).

    ``html`` may be binary (cast lenient, same rule as the crawl text path)
    or string. Tags whose attribute is missing/empty or resolves to NULL
    (fragment, javascript:, …) are dropped AFTER position assignment, so
    ``link_pos`` is stable against filtering — it is the tag's document
    index, the property a FIFO frontier needs."""
    html_str = F.col(html_col).cast("string")

    # The whole extraction is ARRAY-SIDE (higher-order functions), exploded
    # last. Why not row-side projections + .where(): the resolver references
    # the raw attribute ~8 times and a pushed-down isnotnull filter re-inlines
    # the full tree — observed 32 regex evals per tag and a >64 KB generated
    # method (janino fallback). Staged transforms bind each heavy value to a
    # struct field exactly once; later stages read fields (cheap), the null
    # filter runs inside the projection (nothing to push down), and the tag's
    # DOCUMENT index rides in the struct so link_pos is stable under
    # filtering — the property a FIFO frontier needs.
    tags_arr = F.regexp_extract_all(html_str, F.lit(TAG_RE), F.lit(0))
    with_raw = F.transform(
        tags_arr,
        lambda t, i: F.struct(
            i.cast("long").alias("link_pos"),
            F.when(t.rlike(r"(?i)^<a\b"), F.lit("href")).otherwise(F.lit("img")).alias("kind"),
            F.when(t.rlike(r"(?i)^<a\b"), _attr(t, _HREF_DQ, _HREF_SQ))
            .otherwise(_attr(t, _SRC_DQ, _SRC_SQ))
            .alias("raw"),
        ),
    )
    base = F.col(url_col)
    resolved = F.transform(
        with_raw,
        lambda s: F.struct(
            s["link_pos"].alias("link_pos"),
            s["kind"].alias("kind"),
            resolve_link(base, s["raw"]).alias("url"),
        ),
    )
    kept = F.filter(resolved, lambda s: s["url"].isNotNull())
    out = pages.select(
        F.col(url_col).alias("page_url"),
        *[F.col(c) for c in carry],  # echoed per link row, join-free
        F.explode(kept).alias("_s"),
    )
    return out.select(
        "page_url",
        *carry,
        F.col("_s.link_pos").alias("link_pos"),
        F.col("_s.kind").alias("kind"),
        F.col("_s.url").alias("url"),
    )


IMAGE_SUFFIXES = (".jpg", ".jpeg", ".png", ".gif", ".webp", ".bmp", ".svg")


def image_links(pages: DataFrame, url_col: str = "url", html_col: str = "html") -> DataFrame:
    """The GreedyImageCrawler candidate stream: ``<img src>`` targets plus
    ``<a href>`` targets with an image suffix (galleries link full-size
    images behind thumbnails), deduped first-wins in document order."""
    links = extract_links(pages, url_col=url_col, html_col=html_col)
    lower = F.lower(F.col("url"))
    is_img_href = F.lit(False)
    for s in IMAGE_SUFFIXES:
        is_img_href = is_img_href | lower.endswith(s)
    cand = links.where((F.col("kind") == "img") | is_img_href)
    from pyspark.sql import Window

    w = Window.partitionBy("page_url", "url").orderBy("link_pos")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
