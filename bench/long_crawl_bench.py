#!/usr/bin/env python
"""Long-crawl round-cost evidence: per-round wall stays flat over many rounds.

A 1000-round crawl must not pay a plan that grows with crawl age. The two
age-linear costs this guards are the visited-delta union (compacted every
``compact_visited_every`` rounds) and state-merge lineage (pinned per
round). Workload: a chain-linked site (page i links only to page i+1), so
every round fetches exactly one page and the measured wall is pure
per-round overhead — any growth would be orchestration, not data.

    python bench/long_crawl_bench.py --rounds 50 --compact-every 8
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from icrawler_spark.session import get_spark  # noqa: E402


def chain_site(n_pages: int) -> dict[str, str]:
    base = "https://chain.example.test"
    site = {}
    for i in range(n_pages):
        nxt = f"<a href='/p/{i + 1}.html'>下一页</a>" if i + 1 < n_pages else ""
        site[f"{base}/p/{i}.html"] = (
            f"<html><body><div class='list_page'>{nxt}</div>"
            f"<p>chain page {i}</p></body></html>"
        )
    return site


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rounds", type=int, default=50)
    ap.add_argument("--compact-every", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=8)
    args = ap.parse_args()

    spark = get_spark(
        app_name="long_crawl_bench",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(args.cpus, 8),
    )
    spark.sparkContext.setLogLevel("ERROR")

    from icrawler_spark.crawl import CrawlConfig, CrawlEngine, site_pages_df

    site = chain_site(args.rounds + 1)
    pages = site_pages_df(spark, site).persist()
    pages.count()
    eng = CrawlEngine(
        spark,
        pages,
        CrawlConfig(
            start_url="https://chain.example.test/p/0.html",
            max_rounds=args.rounds,
            parse_entries=False,
            compact_visited_every=args.compact_every,
        ),
    )
    eng.run()
    walls = [round(m.wall_s, 2) for m in eng.metrics]
    k = max(len(walls) // 5, 1)
    first, last = walls[:k], walls[-k:]
    # steady-state flatness: JVM warm-up makes the first rounds atypically
    # cheap, so compare the second and fourth quarters of the run
    q = max(len(walls) // 4, 1)
    mid, tail = walls[q : 2 * q], walls[-q:]
    print(
        json.dumps(
            {
                "rounds": len(walls),
                "compact_every": args.compact_every,
                "round_wall_s": walls,
                "first_quintile_mean_s": round(sum(first) / len(first), 2),
                "last_quintile_mean_s": round(sum(last) / len(last), 2),
                "growth_ratio": round((sum(last) / len(last)) / (sum(first) / len(first)), 2),
                "steady_state_ratio": round((sum(tail) / len(tail)) / (sum(mid) / len(mid)), 2),
                "visited_parts_final": len(eng._visited_parts),
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
