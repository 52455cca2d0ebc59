"""Crawl-engine semantics: BFS order, seen-set, politeness, bloom, resume.

Oracle = ``crawl/reference_model.py``, the pure-Python transcription of the
reference's FIFO walk (ref pbc_monitor.py:188-260)."""

from __future__ import annotations

import shutil

import pandas as pd
import pytest

from icrawler_spark.crawl import CrawlConfig, CrawlEngine, build_site, site_pages_df
from icrawler_spark.crawl.bloom import BloomFilter
from icrawler_spark.crawl.reference_model import crawl_model


@pytest.fixture(scope="module")
def site():
    return build_site(n_pages=4, entries_per_page=3)


@pytest.fixture(scope="module")
def pages(spark, site):
    return site_pages_df(spark, site).cache()


START = "https://www.example.test/list/index.html"


def test_bfs_order_and_seen_parity(spark, site, pages):
    eng = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    eng.run()
    ref_order, ref_seen, ref_entries = crawl_model(site, START)
    assert eng.crawl_order() == ref_order
    assert eng.seen_urls() == ref_seen
    # every listing page visited exactly once
    assert len(ref_order) == len(set(ref_order)) == 4


def test_entries_match_model(spark, site, pages):
    eng = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    eng.run()
    _, _, ref_entries = crawl_model(site, START)
    got = {
        (r.title, r.serial)
        for r in eng.entries.select("title", "serial").collect()
    }
    want = {(t, s) for t, s, _r, _d in ref_entries}
    assert got == want
    # documents carry every attachment url from the model
    doc_urls = {r.url for r in eng.documents.select("url").collect()}
    want_urls = {u for _t, _s, _r, docs in ref_entries for u in docs}
    assert doc_urls == want_urls


def test_politeness_budget_parity(spark, site, pages):
    cfg = CrawlConfig(start_url=START, max_rounds=30, host_budget=1)
    eng = CrawlEngine(spark, pages, cfg)
    eng.run()
    ref_order, ref_seen, _ = crawl_model(site, START, host_budget=1)
    assert eng.crawl_order() == ref_order
    assert eng.seen_urls() == ref_seen
    # budget respected: ≤1 fetch per host per round
    per_round = (
        eng.visited.groupBy("round").count().orderBy("round").collect()
    )
    assert all(r["count"] <= 1 for r in per_round)
    # budget stretches the crawl over more rounds than the unbudgeted BFS
    assert len(per_round) == len(ref_order)


def test_priority_frontier_reorders_under_budget(spark, site, pages):
    """priority_df turns the FIFO frontier into a priority queue: with a
    1-per-host budget and all pagination pages discovered in round 0,
    higher-priority pages are fetched FIRST (reverse of FIFO), while the
    final seen-set/completeness is unchanged."""
    base = "https://www.example.test/list"
    prio = spark.createDataFrame(
        [(f"{base}/index_{k}.html", k) for k in (1, 2, 3)],
        "url string, priority long",
    )
    cfg = CrawlConfig(start_url=START, max_rounds=30, host_budget=1)
    eng = CrawlEngine(spark, pages, cfg, priority_df=prio)
    eng.run()
    fifo_order, fifo_seen, _ = crawl_model(site, START, host_budget=1)
    got = eng.crawl_order()
    # importance-first: index_3, index_2, index_1 after the seed
    assert got == [
        START,
        f"{base}/index_3.html",
        f"{base}/index_2.html",
        f"{base}/index_1.html",
    ]
    assert got != fifo_order
    assert eng.seen_urls() == fifo_seen  # reordered, never dropped
    per_round = eng.visited.groupBy("round").count().collect()
    assert all(r["count"] <= 1 for r in per_round)  # budget still respected


def test_priority_frontier_duplicate_scores_no_fanout(spark, site, pages):
    """A score table with DUPLICATE urls must not fan out pending rows
    through the per-round left join (ADVICE r3): the engine aggregates to
    one row per url at pin time (max priority wins), so visited has no
    duplicate rows and no url consumes more than one host-budget slot."""
    base = "https://www.example.test/list"
    rows = [(f"{base}/index_{k}.html", k) for k in (1, 2, 3)]
    dup = spark.createDataFrame(
        rows + [(u, p - 10) for u, p in rows] + rows,  # 3 rows per url
        "url string, priority long",
    )
    cfg = CrawlConfig(start_url=START, max_rounds=30, host_budget=1)
    eng = CrawlEngine(spark, pages, cfg, priority_df=dup)
    eng.run()
    # identical outcome to the clean 1-row-per-url score table (max wins)
    assert eng.crawl_order() == [
        START,
        f"{base}/index_3.html",
        f"{base}/index_2.html",
        f"{base}/index_1.html",
    ]
    visited = eng.visited.collect()
    assert len(visited) == len({r.url for r in visited})  # no dup rows
    per_round = eng.visited.groupBy("round").count().collect()
    assert all(r["count"] <= 1 for r in per_round)  # budget still respected


def test_priority_frontier_default_is_fifo(spark, site, pages):
    """No priority_df (or all-equal scores) ⇒ exactly the reference FIFO."""
    prio = spark.createDataFrame(
        [("https://www.example.test/list/index_2.html", 0)],
        "url string, priority long",
    )
    cfg = CrawlConfig(start_url=START, max_rounds=30, host_budget=1)
    eng = CrawlEngine(spark, pages, cfg, priority_df=prio)
    eng.run()
    ref_order, ref_seen, _ = crawl_model(site, START, host_budget=1)
    assert eng.crawl_order() == ref_order
    assert eng.seen_urls() == ref_seen


def test_dedup_near_dups_skips_round_n_plus_1(spark):
    """VERDICT r3 item 7: with ``dedup_near_dups`` on, a page fetched in
    round N+1 that is a SimHash near-dup (Hamming ≤ 6) of a round-N page is
    fetched-but-dropped — its links never enter the frontier — while the
    same crawl without the flag follows them."""
    import datetime as dt

    base = "https://dup.example.test"
    t_common = " ".join(f"token{i} word{i}" for i in range(150))
    t_neardup = t_common.replace("token100", "tokenX")  # one-token delta
    t_distinct = " ".join(f"other{i} thing{i}" for i in range(150))

    def row(path, text, link=None):
        a = f'<a href="{base}/{link}">下一页</a>' if link else ""
        html = f"<html><body><p>page {path}</p>{a}</body></html>"
        return (
            f"{base}/{path}",
            dt.datetime(2024, 1, 1),
            html.encode("utf-8"),
            text,
            "en",
        )

    pages = spark.createDataFrame(
        [
            row("p0.html", "tiny seed page", link="p1.html"),
            row("p1.html", t_common, link="p2.html"),
            row("p2.html", t_neardup, link="p3.html"),  # near-dup of p1
            row("p3.html", t_distinct),
        ],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string",
    )
    kw = dict(start_url=f"{base}/p0.html", max_rounds=10, use_bloom=False,
              parse_entries=False, host_budget=1)

    eng = CrawlEngine(spark, pages, CrawlConfig(dedup_near_dups=True, **kw))
    eng.run()
    urls = {r.url: r.status for r in eng.visited.collect()}
    assert urls.get(f"{base}/p2.html") == "fetched"  # the dup IS fetched...
    assert f"{base}/p3.html" not in urls             # ...but never expanded
    skipped = {m.round: m.near_dups_skipped for m in eng.metrics}
    assert skipped[2] == 1 and skipped[0] == 0 and skipped[1] == 0

    control = CrawlEngine(spark, pages, CrawlConfig(**kw))
    control.run()
    assert f"{base}/p3.html" in {r.url for r in control.visited.collect()}
    assert all(m.near_dups_skipped == 0 for m in control.metrics)


def test_missing_pages_marked_visited(spark, site):
    # drop one listing page from the corpus: engine must mark it missing and
    # never retry it, matching the model's visited semantics
    partial = {k: v for k, v in site.items() if "index_2" not in k}
    pages = site_pages_df(spark, partial)
    eng = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    eng.run()
    ref_order, ref_seen, _ = crawl_model(partial, START)
    assert eng.crawl_order() == ref_order
    statuses = {r.url: r.status for r in eng.visited.collect()}
    missing = [u for u, s in statuses.items() if s == "missing"]
    assert missing == ["https://www.example.test/list/index_2.html"]
    assert eng.seen_urls() == ref_seen


def test_resume_from_checkpoint(spark, site, pages, tmp_path):
    ckpt = str(tmp_path / "ckpt")
    full = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    full.run()
    want_order = full.crawl_order()
    want_seen = full.seen_urls()

    # run only 1 round, "crash", then resume with a fresh engine
    partial_cfg = CrawlConfig(start_url=START, max_rounds=1, checkpoint_dir=ckpt)
    CrawlEngine(spark, pages, partial_cfg).run()

    resumed = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=20, checkpoint_dir=ckpt)
    )
    resumed.run()
    assert resumed.crawl_order() == want_order
    assert resumed.seen_urls() == want_seen
    shutil.rmtree(ckpt, ignore_errors=True)


def test_uncommitted_round_is_ignored_on_resume(spark, site, pages, tmp_path):
    ckpt = str(tmp_path / "ckpt2")
    cfg = CrawlConfig(start_url=START, max_rounds=2, checkpoint_dir=ckpt)
    eng = CrawlEngine(spark, pages, cfg)
    eng.run()
    # simulate a crash mid-round-2: tables written but no commit marker
    import os

    r2 = os.path.join(ckpt, "round=000002")
    os.makedirs(r2, exist_ok=True)
    eng.visited.write.mode("overwrite").parquet(os.path.join(r2, "visited"))
    store_last = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, checkpoint_dir=ckpt)
    )
    assert store_last.resume_or_init() == 2  # resumes AFTER round 1 (committed)
    shutil.rmtree(ckpt, ignore_errors=True)


def test_visited_compaction_preserves_semantics(spark, site, pages):
    """compact_visited_every=1 (compact after every round) must not change
    crawl order or seen-set — the compacted snapshot replaces the delta
    union transparently."""
    eng = CrawlEngine(
        spark, pages,
        CrawlConfig(start_url=START, max_rounds=20, compact_visited_every=1),
    )
    eng.run()
    ref_order, ref_seen, _ = crawl_model(site, START)
    assert eng.crawl_order() == ref_order
    assert eng.seen_urls() == ref_seen
    # the union fan-in actually collapsed
    assert len(eng._visited_parts) == 1


def test_resume_prefers_compacted_snapshot(spark, site, pages, tmp_path):
    """Resume from a checkpoint whose rounds carry visited_full snapshots:
    the resumed crawl must equal the uninterrupted one."""
    ckpt = str(tmp_path / "ckpt_compact")
    full = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    full.run()

    CrawlEngine(
        spark, pages,
        CrawlConfig(start_url=START, max_rounds=2, checkpoint_dir=ckpt,
                    compact_visited_every=1),
    ).run()
    import os

    assert any(
        os.path.isdir(os.path.join(ckpt, d, "visited_full"))
        for d in os.listdir(ckpt)
    )
    resumed = CrawlEngine(
        spark, pages,
        CrawlConfig(start_url=START, max_rounds=20, checkpoint_dir=ckpt,
                    compact_visited_every=1),
    )
    resumed.run()
    assert resumed.crawl_order() == full.crawl_order()
    assert resumed.seen_urls() == full.seen_urls()
    shutil.rmtree(ckpt, ignore_errors=True)


def test_distributed_seed_df_matches_list_seeding(spark, site, pages):
    """CrawlEngine(seeds_df=...) must reproduce the list-seeded crawl
    exactly — order, seen-set, and position bookkeeping (sparse positions
    are allowed: only uniqueness and order matter)."""
    seeds = [START, "https://www.example.test/list/index_2.html"]
    by_list = CrawlEngine(
        spark, pages, CrawlConfig(seed_urls=seeds, start_url=START, max_rounds=20)
    )
    by_list.run()
    # sparse, order-preserving positions (0, 7) instead of (0, 1)
    seeds_df = spark.createDataFrame(
        [(seeds[0], 0), (seeds[1], 7)], "url string, pos long"
    )
    by_df = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=20), seeds_df=seeds_df
    )
    by_df.run()
    assert by_df.crawl_order() == by_list.crawl_order()
    assert by_df.seen_urls() == by_list.seen_urls()


def test_bloom_no_false_negatives():
    bf = BloomFilter(capacity=10_000, fpp=0.01)
    added = pd.Series([f"https://h{i % 7}.test/p/{i}.html" for i in range(5000)])
    bf.add_many(added)
    assert bf.might_contain_many(added).all()
    # fp rate sane on disjoint probes
    probes = pd.Series([f"https://other{i}.test/x/{i}" for i in range(5000)])
    fpr = bf.might_contain_many(probes).mean()
    assert fpr < 0.05


def test_bloom_roundtrip_and_merge():
    a = BloomFilter(capacity=1000)
    b = BloomFilter(capacity=1000)
    a.add_many(pd.Series(["u1", "u2"]))
    b.add_many(pd.Series(["u3"]))
    merged = BloomFilter.from_bytes(a.to_bytes()).merge(b)
    assert merged.might_contain_many(pd.Series(["u1", "u2", "u3"])).all()


def test_bloom_disabled_same_result(spark, site, pages):
    e1 = CrawlEngine(spark, pages, CrawlConfig(start_url=START, use_bloom=False))
    e1.run()
    e2 = CrawlEngine(spark, pages, CrawlConfig(start_url=START, use_bloom=True))
    e2.run()
    assert e1.crawl_order() == e2.crawl_order()
    assert e1.seen_urls() == e2.seen_urls()


def test_per_partition_lineage_checkpointed(spark, site, pages, tmp_path):
    ckpt = str(tmp_path / "ckpt3")
    eng = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=2, checkpoint_dir=ckpt)
    )
    eng.run()
    lineage = spark.read.parquet(f"{ckpt}/round=000000/lineage")
    rows = lineage.collect()
    assert {c for c in lineage.columns} == {"shard", "n_urls", "n_hosts", "round"}
    assert sum(r.n_urls for r in rows) == 1  # round 0 fetched the seed
    shutil.rmtree(ckpt, ignore_errors=True)


def test_high_fanout_round0_routes_distributed(spark):
    """Big-round routing must use the OBSERVED link count, not last round's
    fanout estimate: a round-0 fanout explosion (many links from few pages,
    no previous round to estimate from) used to plan the single-partition
    global window (the r2 stall risk). links_per_page=12 on 20 seeds →
    ~240 candidate links > threshold 200, while the old estimate
    (n_fetched × default fanout 4.0 = 80) stays under it."""
    from icrawler_spark.crawl import synthetic_pages_df, synthetic_seed_df

    pages = synthetic_pages_df(spark, n_pages=400, n_hosts=37, links_per_page=12)
    seeds_df = synthetic_seed_df(spark, n_pages=400, stride=20, n_hosts=37)
    eng = CrawlEngine(
        spark,
        pages,
        CrawlConfig(
            start_url="https://hot.example.test/p/0.html",
            max_rounds=1,
            parse_entries=False,
            big_round_threshold=200,
        ),
        seeds_df=seeds_df,
    )
    m = eng.run()
    assert m[0].links_discovered > 200
    assert eng._last_big_round is True
    # sparse big-round positions must be FIFO-unique and ORDER-IDENTICAL to
    # the dense small-round path over the same input (density itself is
    # traded away for the shuffle-free assignment — no consumer indexes by
    # position, they all sort by it)
    pend = [(r.discovery_pos, r.url) for r in eng.pending.collect()]
    assert len({p for p, _ in pend}) == len(pend)  # unique
    dense = CrawlEngine(
        spark,
        synthetic_pages_df(spark, n_pages=400, n_hosts=37, links_per_page=12),
        CrawlConfig(
            start_url="https://hot.example.test/p/0.html",
            max_rounds=1,
            parse_entries=False,
            big_round_threshold=10**9,
        ),
        seeds_df=synthetic_seed_df(spark, n_pages=400, stride=20, n_hosts=37),
    )
    dense.run()
    assert dense._last_big_round is False
    dense_pend = [(r.discovery_pos, r.url) for r in dense.pending.collect()]
    assert [u for _, u in sorted(pend)] == [u for _, u in sorted(dense_pend)]


def test_multi_snapshot_corpus_does_not_fan_out_metrics(spark, site, pages):
    """A corpus carrying several (url, warc_ts) snapshot rows per url must
    produce the same round metrics, visited rows, and crawl order as the
    single-snapshot corpus — the fetch-join fanout previously inflated
    n_batch/n_fetched (negative n_deferred) and duplicated visited rows."""
    from pyspark.sql import functions as F

    single = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    single.run()

    doubled = pages.unionByName(
        pages.withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 1 SECOND"))
    )
    multi = CrawlEngine(spark, doubled, CrawlConfig(start_url=START, max_rounds=20))
    multi.run()

    assert multi.crawl_order() == single.crawl_order()
    assert multi.seen_urls() == single.seen_urls()
    for ms, mm in zip(single.metrics, multi.metrics):
        assert (mm.pages_fetched, mm.pages_missing, mm.links_new) == (
            ms.pages_fetched,
            ms.pages_missing,
            ms.links_new,
        )
        # parse runs once per snapshot (S×, documented) — never S²× (the
        # join-back fanout this test guards against)
        assert mm.links_discovered <= 2 * ms.links_discovered
    vis = multi.visited.select("url").collect()
    assert len(vis) == len({r.url for r in vis})  # no duplicate visited rows

    # the scale path: latest_snapshot_view collapses the corpus once at
    # read, restoring single-snapshot metrics EXACTLY (incl. parse counts)
    from icrawler_spark.crawl import latest_snapshot_view

    viewed = CrawlEngine(
        spark, latest_snapshot_view(doubled), CrawlConfig(start_url=START, max_rounds=20)
    )
    viewed.run()
    assert viewed.crawl_order() == single.crawl_order()
    for ms, mv in zip(single.metrics, viewed.metrics):
        assert (mv.pages_fetched, mv.links_discovered, mv.links_new, mv.entries_seen) == (
            ms.pages_fetched,
            ms.links_discovered,
            ms.links_new,
            ms.entries_seen,
        )


def test_bucketed_pages_join_has_no_corpus_exchange(spark, tmp_path):
    """North-rule Iceberg layout stand-in (VERDICT r2 item 4): with the
    corpus stored as a parquet table bucketed by url, the fetch join's pages
    side scans pre-bucketed files — the only Exchange in the join is the
    (small) batch side, never the corpus."""
    from pyspark.sql import functions as F

    from icrawler_spark.crawl import synthetic_pages_df

    pages = synthetic_pages_df(spark, n_pages=5000, n_hosts=53)
    spark.sql("DROP TABLE IF EXISTS pages_b_test")
    (
        pages.write.bucketBy(8, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "pages_b"))
        .saveAsTable("pages_b_test")
    )
    try:
        pt = spark.table("pages_b_test")
        batch = spark.range(0, 2000).select(
            F.concat(
                F.lit("https://host-"),
                (F.col("id") % 53).cast("string"),
                F.lit(".example.test/p/"),
                F.col("id").cast("string"),
                F.lit(".html"),
            ).alias("url"),
            F.col("id").alias("discovery_pos"),
        )
        # same shape as CrawlEngine's above-threshold fetch join
        j = pt.join(batch.hint("shuffle_hash"), "url", "inner").select(
            "url", "html", "discovery_pos"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Bucketed: true" in plan
        assert plan.count("Exchange") == 1, plan  # batch side only
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_b_test")


def test_keysonly_cache_on_plain_shuffle_hash_matches_plain(spark):
    """The keys-only fetch cache now covers the plain-corpus shuffle-hash
    path too (html has one consumer when both parses are off, so the payload
    persist was a pure regression there — 537 s vs ~130 s on the 1.28M-URL
    big round at 16c, BENCH/r4_ab_bisect.jsonl). Forcing every round onto
    the shuffle-hash path must not change crawl order or the seen-set."""
    from icrawler_spark.crawl import build_site, site_pages_df

    site = build_site(n_pages=4, entries_per_page=3)
    pages = site_pages_df(spark, site)
    plain = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    plain.run()

    sh = CrawlEngine(
        spark,
        pages,
        CrawlConfig(
            start_url=START,
            max_rounds=20,
            broadcast_batch_threshold=0,  # every batch takes the shuffle-hash join
            parse_entries=False,  # single html consumer -> keys-only cache
        ),
    )
    sh.run()
    # crawl_order is the full frontier contract (BFS order + politeness +
    # dedup); seen_urls is an entries-parse artifact and parse_entries must
    # be off to reach the keys-only branch, so it is not comparable here.
    assert sh.crawl_order() == plain.crawl_order()


def test_crawl_from_bucketed_table_matches_plain(spark, tmp_path):
    """Crawling from the bucketed table read must produce identical rounds,
    order, and seen-set as the plain DataFrame corpus."""
    from icrawler_spark.crawl import build_site, site_pages_df

    site = build_site(n_pages=4, entries_per_page=3)
    pages = site_pages_df(spark, site)
    plain = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    plain.run()

    spark.sql("DROP TABLE IF EXISTS pages_b_site")
    (
        pages.write.bucketBy(4, "url")
        .sortBy("url")
        .option("path", str(tmp_path / "pages_b_site"))
        .saveAsTable("pages_b_site")
    )
    try:
        bucketed = CrawlEngine(
            spark,
            spark.table("pages_b_site"),
            CrawlConfig(start_url=START, max_rounds=20, pages_is_bucketed=True),
        )
        bucketed.run()
        assert bucketed.crawl_order() == plain.crawl_order()
        assert bucketed.seen_urls() == plain.seen_urls()
        # keys-only cache path (pages_is_bucketed) on a forced shuffle-hash
        # round must be identical too: broadcast threshold 0 disables the
        # broadcast fetch join, exercising reuse_html=False on the bucketed
        # corpus — html streams from bucket-local scans, never persisted
        sh = CrawlEngine(
            spark,
            spark.table("pages_b_site"),
            CrawlConfig(
                start_url=START,
                max_rounds=20,
                pages_is_bucketed=True,
                broadcast_batch_threshold=0,
                parse_entries=False,  # reuse_html=False: the keys-only path
            ),
        )
        sh.run()
        assert sh.crawl_order() == plain.crawl_order()
    finally:
        spark.sql("DROP TABLE IF EXISTS pages_b_site")


def test_parse_pagination_carry_and_slim_match_full(spark, pages):
    """The frontier's carry/slim parse (one shuffle join removed per round)
    must emit the SAME link set as the full parse, with the carried
    (depth, discovery_pos) equal to the parent page's input values."""
    from pyspark.sql import functions as F

    from icrawler_spark.parsers import udfs

    inp = (
        pages.withColumn("task", F.lit("t"))
        .withColumn("start_url", F.lit(START))
        .withColumn("depth", F.lit(3).cast("long"))
        .withColumn("discovery_pos", F.monotonically_increasing_id())
    )
    full = udfs.parse_pagination_links(inp)
    slim = udfs.parse_pagination_links(inp, carry=("depth", "discovery_pos"), slim=True)
    assert slim.columns == ["task", "page_url", "link_pos", "url", "depth", "discovery_pos"]
    f = {(r.task, r.page_url, r.link_pos, r.url) for r in full.collect()}
    s_rows = slim.collect()
    assert len(s_rows) > 0
    assert f == {(r.task, r.page_url, r.link_pos, r.url) for r in s_rows}
    pos_by_url = {r.url: r.discovery_pos for r in inp.select("url", "discovery_pos").collect()}
    assert all(r.depth == 3 for r in s_rows)
    assert all(r.discovery_pos == pos_by_url[r.page_url] for r in s_rows)


def test_cuckoo_no_false_negatives_and_fpp():
    from icrawler_spark.crawl.cuckoo import CuckooFilter

    cf = CuckooFilter(capacity=10_000)
    added = pd.Series([f"https://h{i % 7}.test/p/{i}.html" for i in range(5000)])
    cf.add_many(added)
    assert cf.might_contain_many(added).all()
    probes = pd.Series([f"https://other{i}.test/x/{i}" for i in range(5000)])
    assert cf.might_contain_many(probes).mean() < 0.01  # ~1.2e-4 by design


def test_cuckoo_roundtrip_merge_delete_determinism():
    from icrawler_spark.crawl.cuckoo import CuckooFilter

    vals = pd.Series([f"u{i}" for i in range(800)])
    a = CuckooFilter(capacity=1000)
    b = CuckooFilter(capacity=1000)
    a.add_many(vals[:400])
    b.add_many(vals[400:])
    merged = CuckooFilter.from_bytes(a.to_bytes()).merge(b)
    assert merged.might_contain_many(vals).all()
    # deletion — the capability bloom lacks (recrawl invalidation)
    assert merged.delete_many(vals[:100]).all()
    assert merged.might_contain_many(vals[100:]).all()
    assert merged.might_contain_many(vals[:100]).mean() < 0.02
    # byte-identical rebuild (kick loop is RNG-free)
    x1, x2 = CuckooFilter(capacity=1000), CuckooFilter(capacity=1000)
    x1.add_many(vals)
    x2.add_many(vals)
    assert x1.to_bytes() == x2.to_bytes()
    # multiset semantics (deletion safety): re-add stores a second copy, so
    # one delete leaves the value still present
    n0 = x1.n_items
    x1.add_many(vals[:10])
    assert x1.n_items == n0 + 10
    assert x1.delete_many(vals[:10]).all()
    assert x1.might_contain_many(vals[:10]).all()


def test_cuckoo_overflow_autogrows_instead_of_failing():
    """A visited set that outgrows the configured capacity must DEGRADE like
    bloom (higher fpp), never crash mid-crawl: on kick exhaustion the filter
    widens each bucket's slot count (bucket count is frozen by the missing
    key bits), so adds keep succeeding, no added value ever goes
    false-negative, and deletes/serialization stay valid."""
    from icrawler_spark.crawl.cuckoo import CuckooFilter

    cf = CuckooFilter(capacity=16)  # tiny geometry: m*4 slots ≈ 32
    base_slots = cf.n_slots
    vals = pd.Series([f"https://grow.test/{i}" for i in range(2000)])  # ~60× over
    cf.add_many(vals)  # must not raise
    assert cf.n_slots > base_slots
    assert cf.n_items == 2000
    assert cf.might_contain_many(vals).all()  # zero false negatives

    # serialize → deserialize preserves the grown slot width bit-exactly
    back = CuckooFilter.from_bytes(cf.to_bytes())
    assert back.n_slots == cf.n_slots
    assert back.to_bytes() == cf.to_bytes()
    assert back.might_contain_many(vals).all()

    # deletion still exact for added-once values
    assert back.delete_many(vals[:50]).all()
    assert back.might_contain_many(vals[50:]).all()

    # growth is deterministic: same inserts ⇒ byte-identical table
    dup = CuckooFilter(capacity=16)
    dup.add_many(vals)
    assert dup.to_bytes() == cf.to_bytes()

    # merge across different slot widths (one shard grew, one did not)
    small = CuckooFilter(capacity=16)
    small.add_many(vals[:10])
    merged = CuckooFilter.from_bytes(cf.to_bytes()).merge(small)
    assert merged.might_contain_many(vals).all()


def test_cuckoo_engine_matches_exact_only(spark, site, pages):
    """Same equality gate as bloom's: the cuckoo-routed crawl is bit-equal
    to the exact-anti-join-only crawl (false positives only ever cost a
    redundant exact check)."""
    e1 = CrawlEngine(spark, pages, CrawlConfig(start_url=START, use_bloom=False))
    e1.run()
    e2 = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, use_bloom=True, seen_filter="cuckoo")
    )
    e2.run()
    assert e1.crawl_order() == e2.crawl_order()
    assert e1.seen_urls() == e2.seen_urls()


def test_seen_sketch_checkpointed_and_loaded_on_resume(spark, site, pages, tmp_path, monkeypatch):
    """The serialized seen-filter is committed with each round and resume
    loads the blob instead of rebuilding from a full visited scan (north_rule
    'checkpoints frontier, seen-filter shards, and lineage/metrics')."""
    import glob
    import os

    from icrawler_spark.crawl import bloom as bloom_mod

    ckpt = str(tmp_path / "ckpt_sketch")
    full = CrawlEngine(spark, pages, CrawlConfig(start_url=START, max_rounds=20))
    full.run()

    CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=1, checkpoint_dir=ckpt)
    ).run()
    blobs = glob.glob(os.path.join(ckpt, "round=*", "seen_sketch_bloom_h64.bin"))
    assert blobs, "sketch blob not committed with the round"

    # resume must NOT rebuild: poison build_filter across resume_or_init only
    # (the per-round incremental build during the resumed crawl is legitimate)
    def _boom(*a, **k):
        raise AssertionError("resume rebuilt the seen filter instead of loading the blob")

    resumed = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=20, checkpoint_dir=ckpt)
    )
    real = bloom_mod.build_filter
    monkeypatch.setattr(bloom_mod, "build_filter", _boom)
    resumed.resume_or_init()
    # the sketch holds xxhash64 transport keys, so membership probes use the
    # same derivation the engine inserts with
    from pyspark.sql import functions as F

    start_key = spark.range(1).select(F.xxhash64(F.lit(START)).alias("k")).collect()[0].k
    assert resumed._bloom is not None and resumed._bloom.might_contain_many(
        pd.Series([start_key])
    ).all()
    monkeypatch.setattr(bloom_mod, "build_filter", real)
    resumed.run()
    assert resumed.crawl_order() == full.crawl_order()
    assert resumed.seen_urls() == full.seen_urls()
    shutil.rmtree(ckpt, ignore_errors=True)


@pytest.mark.parametrize("kind", ["bloom", "cuckoo"])
def test_invalidate_urls_refetches_only_those(spark, site, pages, kind):
    """Recrawl invalidation: invalidated pages are refetched at the frontier
    tail; everything else (including their outlinks) stays deduped."""
    eng = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=40, seen_filter=kind)
    )
    eng.run()
    order0 = eng.crawl_order()
    targets = sorted(set(order0))[:2]

    n = eng.invalidate_urls(
        spark.createDataFrame([(u,) for u in targets], "url string")
    )
    assert n == 2
    eng.run()
    order1 = eng.crawl_order()
    assert sorted(order1) == sorted(order0)      # same url set, no dups
    assert order1[-2:] == targets                 # refetched at the tail (FIFO by url)
    assert len(order1) == len(order0)
    # unknown urls are ignored (also keeps cuckoo deletion safe)
    assert (
        eng.invalidate_urls(
            spark.createDataFrame([("https://never.seen.test/x",)], "url string")
        )
        == 0
    )


def test_invalidate_survives_checkpoint_resume(spark, site, pages, tmp_path):
    """The invalidation joins the next round's atomic commit: after the
    refetch round commits, a fresh engine resuming from disk sees the
    post-invalidation visited log."""
    ckpt = str(tmp_path / "ckpt_inval")
    eng = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=40, checkpoint_dir=ckpt)
    )
    eng.run()
    order0 = eng.crawl_order()
    targets = sorted(set(order0))[:2]
    assert eng.invalidate_urls(
        spark.createDataFrame([(u,) for u in targets], "url string")
    ) == 2
    eng.run()  # refetch round commits (with the forced visited_full compaction)
    final = eng.crawl_order()
    assert final[-2:] == targets

    resumed = CrawlEngine(
        spark, pages, CrawlConfig(start_url=START, max_rounds=40, checkpoint_dir=ckpt)
    )
    resumed.resume_or_init()
    assert resumed.crawl_order() == final
    shutil.rmtree(ckpt, ignore_errors=True)


def test_follow_redirects_chain_order_and_dedup(spark):
    """3xx semantics: redirect targets enter the frontier ahead of parsed
    links, chains resolve hop by hop, and targets already seen are deduped."""
    import datetime as dt

    base = "https://rdr.test"

    def row(path, html=b"", redirect=None, link=None):
        if link:
            html = f'<html><body><a href="{base}/{link}">下一页</a></body></html>'.encode()
        return (f"{base}/{path}", dt.datetime(2024, 1, 1), html, "", "en",
                f"{base}/{redirect}" if redirect else None)

    pages = spark.createDataFrame(
        [
            # seed redirects AND carries a parsed link: target must come first
            row("seed.html", redirect="r1.html", link="parsed.html"),
            row("r1.html", redirect="r2.html"),            # chain hop 1 (stub body)
            row("r2.html", link="seed.html"),              # chain end; link back = dedup
            row("parsed.html"),
        ],
        "url string, warc_ts timestamp_ntz, html binary, text string, lang string, redirect_to string",
    )
    cfg = CrawlConfig(start_url=f"{base}/seed.html", max_rounds=10,
                      use_bloom=False, parse_entries=False, host_budget=1)
    eng = CrawlEngine(spark, pages, cfg)
    eng.run()
    assert eng.crawl_order() == [
        f"{base}/seed.html",
        f"{base}/r1.html",      # redirect target ahead of the SAME page's parsed link
        f"{base}/parsed.html",  # BFS: discovered in round 0, before r2 (round 1)
        f"{base}/r2.html",      # chain resolved one hop per round, FIFO-faithful
    ]

    # follow_redirects=False ignores the column entirely
    off = CrawlEngine(
        spark, pages,
        CrawlConfig(start_url=f"{base}/seed.html", max_rounds=10, use_bloom=False,
                    parse_entries=False, host_budget=1, follow_redirects=False),
    )
    off.run()
    assert off.crawl_order() == [f"{base}/seed.html", f"{base}/parsed.html"]
