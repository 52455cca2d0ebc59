"""Sitemap ingestion: robots ``Sitemap:`` lines → seed list (url, pos).

Production crawls seed from sitemaps, not hand lists (sitemaps.org
protocol; referenced by RFC 9309 §2.3 as the discovery companion to
robots.txt). The reference has neither robots nor sitemap handling — this
is north_star surface ("same seed list"): the sitemap IS the seed list,
derived from data already in the corpus.

Spark shape: sitemap documents are ordinary rows of the pages table, so
"fetching" a sitemap is a broadcast semi-join (sitemap-url set is tiny),
and ``<loc>`` extraction is a JVM-side ``regexp_extract_all`` +
``posexplode`` — no Python in the path, document order preserved as data.
``<sitemapindex>`` documents are followed one level (the protocol's 50k-URL
file cap forces big sites to shard behind an index); per spec an index may
only list sitemaps and a urlset may only list content URLs, so the document
root tag — not corpus membership — decides whether a ``<loc>`` is expanded.

Seed positions are FIFO and deterministic: sitemaps in the caller-given
order (robots parse order: sorted netloc, file order within robots.txt),
``<loc>`` entries in document order within each sitemap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

# <loc> with optional surrounding whitespace; [^<]+? keeps the match inside
# one element — lookaround-free so Java regex and any oracle agree.
_LOC_RE = r"<loc>\s*([^<]+?)\s*</loc>"


def sitemap_urls_from_robots(robots_docs: dict[str, str]) -> list[str]:
    """``Sitemap:`` directives from robots.txt bodies, in (sorted netloc,
    file order) — the spec allows them outside any User-agent group, so all
    lines are read. Values are absolute URLs per the protocol; relative
    values are skipped (malformed by spec)."""
    out: list[str] = []
    seen = set()
    for netloc in sorted(robots_docs):
        for raw in (robots_docs[netloc] or "").splitlines():
            line = raw.split("#", 1)[0].strip()
            if ":" not in line:
                continue
            field, value = line.split(":", 1)
            if field.strip().lower() != "sitemap":
                continue
            value = value.strip()
            if "://" in value and value not in seen:
                seen.add(value)
                out.append(value)
    return out


def _locs(pages: DataFrame, sitemap_df: DataFrame) -> DataFrame:
    """``(sm_ord, url)`` sitemap docs ⋈ pages → one row per ``<loc>`` with
    document order and the parent's root kind (index vs urlset)."""
    docs = pages.join(F.broadcast(sitemap_df), "url").select(
        "sm_ord",
        # html binary → string via cast (lenient on stray bytes; ANSI
        # decode() would throw — same rule as the crawl text path)
        F.col("html").cast("string").alias("_xml"),
    )
    is_index = F.col("_xml").rlike(r"<\s*sitemapindex[\s>]")
    return docs.select(
        "sm_ord",
        is_index.alias("is_index"),
        F.posexplode(F.regexp_extract_all(F.col("_xml"), F.lit(_LOC_RE), F.lit(1))).alias(
            "loc_pos", "loc"
        ),
    )


def sitemap_seeds_df(
    spark: SparkSession, pages: DataFrame, sitemap_urls: list[str]
) -> DataFrame:
    """Sitemap URLs → CrawlEngine-ready ``seeds_df`` (url, pos).

    ``<urlset>`` entries become seeds directly. Entries of a
    ``<sitemapindex>`` are expanded one level, the children's seeds keeping
    the index entry's slot in the global order; an index entry missing from
    the pages table contributes nothing (an unfetchable shard — the engine
    would mark it missing anyway). Duplicate urls keep their first
    (lowest-pos) occurrence, matching frontier FIFO semantics."""
    if not sitemap_urls:
        return spark.createDataFrame([], "url string, pos long")
    top = spark.createDataFrame(
        [(i, u) for i, u in enumerate(sitemap_urls)], "sm_ord long, url string"
    )
    level1 = _locs(pages, top)

    # index entries → expand one level; child slot = parent (sm_ord, loc_pos)
    children = level1.where("is_index").select(
        (F.col("sm_ord") * 1_000_000 + F.col("loc_pos")).alias("sm_ord"),
        F.col("loc").alias("url"),
    )
    level2 = _locs(pages, children)

    leaf1 = level1.where(~F.col("is_index")).select(
        (F.col("sm_ord") * 1_000_000).alias("sm_ord"), "loc_pos", "loc"
    )
    # nested indexes are out of spec — a level-2 index's locs are taken as
    # leaves rather than followed further
    leaves = leaf1.unionByName(level2.select("sm_ord", "loc_pos", "loc"))

    w = Window.orderBy("sm_ord", "loc_pos", "loc")
    ranked = leaves.select(
        F.col("loc").alias("url"),
        (F.row_number().over(w) - 1).cast("long").alias("pos"),
    )
    # first occurrence wins on duplicates; positions stay order-true (gaps ok)
    wd = Window.partitionBy("url").orderBy("pos")
    return (
        ranked.withColumn("_rn", F.row_number().over(wd))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
