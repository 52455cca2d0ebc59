"""Invariant tests for the round-3 pipeline operators (link_pagerank,
paragraph_dedup, url_canonicalize) — properties the order-insensitive
oracle hash cannot see on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from icrawler_spark.queries.engineops import _canonicalize_url, url_canonicalize
from icrawler_spark.queries.graphops import (
    _BASE_MICRO,
    _INIT_MICRO,
    link_pagerank,
)
from icrawler_spark.queries.textops import paragraph_dedup
from tests.conftest import SF_DIR


def test_pagerank_mass_conservation(spark):
    """Total rank stays within floor-loss of N * INIT: each node redistributes
    85% of its mass (minus ≤ outdeg integer-floor units) and keeps 15% as
    base, so the total can only leak DOWN by floor losses, never up."""
    ranks = link_pagerank(spark, SF_DIR)
    agg = ranks.agg(
        F.sum("rank_micro").alias("total"), F.count("*").alias("n")
    ).first()
    ideal = agg["n"] * _INIT_MICRO
    assert agg["total"] <= ideal
    # floor loss per node per iteration < 100 * outdeg ≤ 300 micro-units
    assert ideal - agg["total"] < agg["n"] * 8 * 300


def test_pagerank_floor_and_determinism(spark):
    ranks = link_pagerank(spark, SF_DIR)
    assert ranks.filter(F.col("rank_micro") < _BASE_MICRO).count() == 0
    a = {r["node"]: r["rank_micro"] for r in ranks.collect()}
    b = {
        r["node"]: r["rank_micro"]
        for r in link_pagerank(spark, SF_DIR).repartition(7).collect()
    }
    assert a == b  # partition-count independent (integer arithmetic)


def test_paragraph_dedup_first_wins_and_reassembly(spark):
    docs = spark.createDataFrame(
        [
            # doc 0: two identical 16-token chunks + a unique tail
            (0, " ".join(["tok%d" % i for i in range(16)] * 2 + ["tail"])),
            # doc 1: repeats doc 0's first chunk exactly — must lose it
            (1, " ".join(["tok%d" % i for i in range(16)] + ["own", "words"])),
        ],
        "doc_id long, text string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {r["doc_id"]: r for r in paragraph_dedup(spark, td).collect()}
    chunk0 = " ".join("tok%d" % i for i in range(16))
    assert out[0]["n_chunks"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == chunk0 + " tail"
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "own words"


def test_importance_ordered_crawl_end_to_end(spark):
    """The full loop the north_star describes: extract the site's link
    graph, compute integer PageRank over it, feed the scores back as the
    frontier priority — the engine must fetch the most-linked-to pages
    first under a politeness budget."""
    from icrawler_spark.crawl import (
        CrawlConfig,
        CrawlEngine,
        build_site,
        site_pages_df,
    )
    from icrawler_spark.parsers import listing
    from icrawler_spark.queries.graphops import pagerank_from_edges

    site = build_site(n_pages=4, entries_per_page=2)
    start = "https://www.example.test/list/index.html"
    # drop index_3 from every pagination bar except index_2's "next" link:
    # it then has strictly fewer in-links than the others → lowest PageRank
    pruned = {
        u: (
            c.replace("<a href='/list/index_3.html'>4</a>", "")
            if isinstance(c, str)
            else c
        )
        for u, c in site.items()
    }
    edges = []
    for u, c in sorted(pruned.items()):
        html = c if isinstance(c, str) else c.decode("utf-8")
        meta = listing.extract_pagination_meta(u, html, start)
        edges.extend((u, item["url"]) for item in meta["links"])
    edges_df = spark.createDataFrame(edges, "src string, dst string").distinct()
    nodes_df = spark.createDataFrame(
        [(u,) for u in sorted(pruned)], "url string"
    )
    pr = pagerank_from_edges(nodes_df, edges_df)
    scores = {r["node"]: r["rank_micro"] for r in pr.collect()}
    idx = {k: scores[f"https://www.example.test/list/index_{k}.html"] for k in (1, 2, 3)}
    assert idx[3] < idx[1] and idx[3] < idx[2]  # fewest in-links → lowest

    eng = CrawlEngine(
        spark,
        site_pages_df(spark, pruned),
        CrawlConfig(start_url=start, max_rounds=30, host_budget=1),
        priority_df=pr.select(F.col("node").alias("url"), F.col("rank_micro").alias("priority")),
    )
    eng.run()
    order = eng.crawl_order()
    # index_3 (lowest importance) is fetched after the other listing pages
    assert order[0] == start
    assert order.index("https://www.example.test/list/index_3.html") > max(
        order.index(f"https://www.example.test/list/index_{k}.html") for k in (1, 2)
    )


def test_url_canonicalize_rules(spark):
    cases = [
        ("HTTP://Host1.EXAMPLE.com:80/a//b/?z=1&a=2#frag",
         "http://host1.example.com/a/b/?a=2&z=1"),
        ("https://h.example.com:443", "https://h.example.com/"),
        ("https://h.example.com:8443/x", "https://h.example.com:8443/x"),
        ("http://h.example.com/p?", "http://h.example.com/p"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [
        r["c"]
        for r in df.select(_canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    assert got == [c[1] for c in cases]


def test_url_canonicalize_non_absolute_passthrough(spark):
    """Scheme-relative / scheme-less input must NOT collapse onto a
    degenerate '://'-prefixed key (ADVICE r3): distinct non-absolute urls
    stay distinct — returned unchanged."""
    cases = [
        "//cdn.example.com/a/b",
        "/relative/path?b=2&a=1",
        "relative.html",
        "mailto:someone@example.com",  # scheme but no ://
        "",
    ]
    df = spark.createDataFrame([(c,) for c in cases], "u string")
    got = [
        r["c"]
        for r in df.select(_canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    assert got == cases


def test_url_canonicalize_idempotent_and_grouped(spark):
    roll = url_canonicalize(spark, SF_DIR)
    # canonicalizing a canonical url is a no-op
    again = roll.select(
        "canonical_url", _canonicalize_url(F.col("canonical_url")).alias("c2")
    )
    assert again.filter(F.col("c2") != F.col("canonical_url")).count() == 0
    # the three deterministic variants collapse onto one key per page
    assert roll.filter(F.col("n_variants") > 3).count() == 0
    assert roll.filter(F.col("n_variants") == 3).count() > 0
