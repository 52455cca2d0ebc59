"""Batch-iterative crawl engine: frontier loop over snapshot tables.

The PySpark-native replacement for the reference's single-threaded monitor
loop (ref pbc_monitor.py:1090-1207): each round reads the pending frontier,
filters seen URLs (Bloom pre-filter + exact anti-join), enforces per-host
politeness budgets by window rank, "fetches" by joining the pages table,
parses with Arrow-batched UDFs, and MERGEs the results back — checkpointing
every round so a killed job resumes deterministically.
"""

from .frontier import CrawlEngine, CrawlConfig
from .robots import robots_budgets_df, robots_docs_from_pages, robots_rules_df
from .sitemap import sitemap_seeds_df, sitemap_urls_from_robots
from .sources import latest_snapshot_view
from .warc import read_warc
from .synthetic import build_site, site_pages_df, synthetic_pages_df, synthetic_seed_df

__all__ = [
    "CrawlEngine",
    "CrawlConfig",
    "build_site",
    "latest_snapshot_view",
    "read_warc",
    "robots_budgets_df",
    "robots_docs_from_pages",
    "robots_rules_df",
    "sitemap_seeds_df",
    "sitemap_urls_from_robots",
    "site_pages_df",
    "synthetic_pages_df",
    "synthetic_seed_df",
]
