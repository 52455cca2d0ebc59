#!/usr/bin/env python
"""Scaling-evidence bench (BASELINE.md protocol).

Runs the SAME frontier job on the SAME deterministic input at a given
parallelism and prints one JSON line. The driver protocol:

    python bench/frontier_bench.py --cpus 8
    python bench/frontier_bench.py --cpus 32
    efficiency = throughput(32) / (4 × throughput(8))     # target ≥ 0.8

(spark-submit --py-files equivalent: the session factory ships the package
zip via addPyFile — the same artifact a cluster submit would distribute.)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icrawler_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    # defaults chosen so every round is BIG (hundreds of k pages): the metric
    # is sustained frontier throughput, and at 10^10 scale rounds are always
    # large relative to fixed per-round orchestration cost
    ap.add_argument("--cpus", type=int, required=True)
    ap.add_argument("--pages", type=int, default=600_000)
    ap.add_argument("--rounds", type=int, default=3)
    ap.add_argument("--seed-stride", type=int, default=5)
    ap.add_argument("--links-per-page", type=int, default=12)
    ap.add_argument("--filler-paragraphs", type=int, default=30)
    ap.add_argument(
        "--distributed-seeds",
        action="store_true",
        help="seed via synthetic_seed_df (executor-built) instead of a driver list",
    )
    ap.add_argument(
        "--bucketed-pages",
        type=int,
        default=0,
        metavar="N",
        help="write the corpus as a parquet table bucketed by url into N "
        "buckets and crawl from the table read: the fetch join's pages side "
        "scans bucketed files with NO per-round Exchange (the Iceberg "
        "url-bucketed layout of the north rule; only the batch shuffles)",
    )
    ap.add_argument(
        "--reuse-bucketed-table",
        action="store_true",
        help="register an existing pages_bucketed warehouse dir via bucketed "
        "DDL instead of rewriting it (the table write is a one-time layout "
        "cost; reruns only measure the crawl)",
    )
    ap.add_argument(
        "--prime",
        action="store_true",
        help="run a small untimed crawl first so JIT/codegen/arrow warm-up "
        "does not land in round 0 of the timed window (VERDICT r2 item 6: "
        "the three-level round-0 identity showed warm-up dominating)",
    )
    ap.add_argument(
        "--master",
        default=None,
        help="override the local[cpus] master — e.g. local-cluster[4,4,16384] "
        "runs 4 SEPARATE executor JVMs of 4 cores each (the sandbox analog "
        "of the north rule's 'N and 4N executors via spark-submit'); --cpus "
        "must still state the TOTAL core count for shuffle sizing",
    )
    args = ap.parse_args()

    spark = get_spark(
        app_name=f"frontier_bench_{args.cpus}",
        master=args.master or f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
        # 128 GiB box: a tight heap makes GC the scaling bottleneck at high
        # thread counts — size like a real executor fleet would be sized
        extra_conf={"spark.driver.memory": os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g")},
    )
    spark.sparkContext.setLogLevel("ERROR")

    from icrawler_spark.crawl import CrawlConfig, CrawlEngine, synthetic_pages_df

    from pyspark import StorageLevel

    n_pages = args.pages
    pages = synthetic_pages_df(
        spark,
        n_pages=n_pages,
        n_hosts=997,
        links_per_page=args.links_per_page,
        filler_paragraphs=args.filler_paragraphs,
    )
    # manifest: the on-disk bucket layout + corpus-generation params. Reuse
    # must verify against this, not trust the CLI flags — a rerun passing a
    # different --bucketed-pages than the original write would register a
    # bucket spec that disagrees with the physical layout, and the bucketed
    # fetch join would silently pair wrong buckets.
    corpus_manifest = {
        "bucketed_pages": args.bucketed_pages,
        "pages": args.pages,
        "links_per_page": args.links_per_page,
        "filler_paragraphs": args.filler_paragraphs,
    }
    if args.bucketed_pages and args.reuse_bucketed_table:
        # a previous run already paid the layout cost: register the existing
        # bucket files with a fresh metastore via bucketed DDL
        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        loc = os.path.join(wh.removeprefix("file:"), "pages_bucketed")
        assert os.path.isdir(loc), f"no reusable bucketed table at {loc}"
        mpath = loc + "_manifest.json"
        assert os.path.exists(mpath), (
            f"no manifest at {mpath} — table predates the manifest check; "
            "rewrite it (drop --reuse-bucketed-table) before reusing"
        )
        with open(mpath) as fh:
            on_disk = json.load(fh)
        assert on_disk == corpus_manifest, (
            "bucketed-table manifest mismatch — the existing table was "
            f"written with {on_disk}, this run asked for {corpus_manifest}; "
            "rewrite the table or pass the original params"
        )
        if not spark.catalog.tableExists("pages_bucketed"):
            # fresh metastore, existing bucket files: register them external.
            # NEVER DROP here — the previous run's table is managed, and a
            # drop through a shared metastore would delete the data files.
            spark.sql(
                "CREATE TABLE pages_bucketed "
                "(url STRING, warc_ts TIMESTAMP, html BINARY, text STRING, lang STRING) "
                "USING PARQUET "
                f"CLUSTERED BY (url) SORTED BY (url) INTO {args.bucketed_pages} BUCKETS "
                f"LOCATION '{loc}'"
            )
        pages = spark.table("pages_bucketed")
    elif args.bucketed_pages:
        # one-time bucketed layout (outside the timed window), as Iceberg
        # write-distribution would maintain it on a real cluster; per-round
        # fetch joins then read pre-bucketed files — no corpus Exchange
        spark.sql("DROP TABLE IF EXISTS pages_bucketed")
        # a fresh derby metastore doesn't know about a previous run's table,
        # so DROP TABLE alone leaves the warehouse directory behind and
        # saveAsTable fails with LOCATION_ALREADY_EXISTS — clear it
        import shutil

        wh = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        shutil.rmtree(
            os.path.join(wh.removeprefix("file:"), "pages_bucketed"),
            ignore_errors=True,
        )
        (
            pages.write.bucketBy(args.bucketed_pages, "url")
            .sortBy("url")
            .mode("overwrite")
            .saveAsTable("pages_bucketed")
        )
        loc = os.path.join(wh.removeprefix("file:"), "pages_bucketed")
        with open(loc + "_manifest.json", "w") as fh:
            json.dump(corpus_manifest, fh)
        pages = spark.table("pages_bucketed")
    else:
        pages = pages.repartition(args.cpus * 2).persist(StorageLevel.MEMORY_AND_DISK)
        pages.count()  # materialize outside the timed window

    start = "https://hot.example.test/p/0.html"
    seeds_df = None
    seeds = None
    if args.distributed_seeds:
        from icrawler_spark.crawl import synthetic_seed_df

        seeds_df = synthetic_seed_df(spark, n_pages, stride=args.seed_stride, n_hosts=997)
    else:
        seeds = [
            f"https://{'hot.example.test' if i < n_pages // 5 else f'host-{i % 997}.example.test'}/p/{i}.html"
            for i in range(0, n_pages, args.seed_stride)
        ]
    cfg = CrawlConfig(
        seed_urls=seeds,
        start_url=seeds[0] if seeds else start,
        max_rounds=args.rounds,
        parse_entries=False,
        use_bloom=True,
        bloom_capacity=n_pages,
        n_host_shards=max(args.cpus, 8),
        fast_metrics=True,
        pages_is_bucketed=bool(args.bucketed_pages),
    )
    if args.prime:
        prime_pages = synthetic_pages_df(spark, n_pages=5000, n_hosts=53)
        prime_cfg = CrawlConfig(
            start_url="https://hot.example.test/p/0.html",
            seed_urls=[f"https://hot.example.test/p/{i}.html" for i in range(0, 5000, 5)],
            max_rounds=2,
            parse_entries=False,
            use_bloom=True,
            bloom_capacity=5000,
            n_host_shards=max(args.cpus, 8),
            fast_metrics=True,
        )
        CrawlEngine(spark, prime_pages, prime_cfg).run()

    eng = CrawlEngine(spark, pages, cfg, seeds_df=seeds_df)
    t0 = time.time()
    metrics = eng.run()
    wall = time.time() - t0
    fetched = sum(m.pages_fetched for m in metrics)

    # partition-skew evidence: batch sizes per salted shard in the last round
    from pyspark.sql import functions as F

    skew = (
        eng.visited.groupBy(
            F.pmod(F.xxhash64(F.lit("x"), F.col("url")), F.lit(cfg.n_host_shards)).alias("shard")
        )
        .count()
        .agg(F.max("count").alias("mx"), F.expr("percentile_approx(count, 0.5)").alias("med"))
        .collect()[0]
    )

    print(
        json.dumps(
            {
                "cpus": args.cpus,
                "master": args.master or f"local[{args.cpus}]",
                "pages": n_pages,
                "bucketed_pages": args.bucketed_pages,
                "rounds": len(metrics),
                "pages_fetched": fetched,
                "wall_s": round(wall, 2),
                "urls_per_sec": round(fetched / wall, 1),
                "round_wall_s": [round(m.wall_s, 2) for m in metrics],
                "round_fetched": [m.pages_fetched for m in metrics],
                "skew_max_partition": int(skew.mx),
                "skew_median_partition": int(skew.med),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
