"""The batch-iterative frontier loop (north_rule core).

Re-architecture of the reference's FIFO listing-page walk
(ref pbc_monitor.py:188-260 ``iterate_listing_pages`` + 814-869
``collect_new_files``): one *round* = one BFS level (plus politeness
deferrals), executed as a dataflow:

    pending ──rank(netloc budget)──▶ batch ──join pages──▶ fetched
       ▲                                                     │
       │                                  ┌─parse pagination UDF─▶ new links
       └──deferred ∪ (new ⟂ seen ⟂ pending ⟂ batch)◀──────────┘
                                          └─parse entries UDF─▶ merge state

Crawl-order determinism (SURVEY §4 hard-part (a)): FIFO order is carried AS
DATA — every frontier row has ``(discovered_round, discovery_pos)`` where
discovery_pos is the global append position: new links are ranked by
(parent discovery_pos, link position in page) exactly like the reference's
append loop (pbc_monitor.py:249-254, first-wins dedup). Processing order =
sort by (discovered_round, discovery_pos); never partition order.

Seen-set: the Bloom pre-filter routes the definitely-new majority around the
exact anti-join; "maybe seen" candidates go through the exact anti-join, so
Bloom false positives cannot drop URLs (§4 hard-part (f)).

Skew: the fetch batch is repartitioned by ``pmod(xxhash64(netloc, round), N)``
— the salt varies per round so a hot host never pins the same partition, and
AQE's skew-join splitting covers the join side.

Scale notes: per-round state merges are full-snapshot rewrites here (parquet
stand-in); on a cluster each merge is an Iceberg ``MERGE INTO`` commit and
the pages "fetch" join targets a url-bucketed table so only the batch side
shuffles. The driver only ever sees counts — no row data is collected.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..parsers import udfs
from . import bloom as bloom_mod
from .state import SnapshotStore, merge_documents, merge_entries, merge_seen, resolve_entry_identity


@dataclass
class CrawlConfig:
    start_url: str
    task: str = "task"
    dialect: str = "default"
    max_rounds: int = 1000
    host_budget: int | None = None     # max pages fetched per netloc per round
    n_host_shards: int = 32            # salted-partition count for fetch batch
    use_bloom: bool = True
    bloom_capacity: int = 1_000_000
    bloom_fpp: float = 0.01
    parse_entries: bool = True         # off for pure-frontier benchmarks
    checkpoint_dir: str | None = None  # None → in-memory (localCheckpoint)


@dataclass
class RoundMetrics:
    round: int
    pages_fetched: int
    pages_missing: int
    links_discovered: int
    links_new: int
    entries_seen: int
    documents_seen: int
    wall_s: float

    def as_tuple(self):
        return (
            self.round, self.pages_fetched, self.pages_missing, self.links_discovered,
            self.links_new, self.entries_seen, self.documents_seen, float(self.wall_s),
        )


_METRICS_SCHEMA = (
    "round int, pages_fetched long, pages_missing long, links_discovered long, "
    "links_new long, entries_seen long, documents_seen long, wall_s double"
)

_VISITED_SCHEMA = (
    "task string, url string, round int, global_pos bigint, status string"
)


class CrawlEngine:
    """Drives rounds over a pages table until the frontier drains."""

    def __init__(self, spark: SparkSession, pages: DataFrame, config: CrawlConfig):
        self.spark = spark
        self.pages = pages
        self.cfg = config
        self.store = SnapshotStore(spark, config.checkpoint_dir) if config.checkpoint_dir else None
        self.metrics: list[RoundMetrics] = []
        # state (DataFrames, lineage broken per round)
        self.visited: DataFrame | None = None
        self.pending: DataFrame | None = None
        self.seen: DataFrame | None = None
        self.entries: DataFrame | None = None
        self.documents: DataFrame | None = None
        self._next_pos = 1
        self._round = 0

    # -- state plumbing --------------------------------------------------------

    def _pin(self, df: DataFrame | None, rnd: int, name: str) -> DataFrame | None:
        """Break lineage each round: snapshot to parquet (resumable) or
        localCheckpoint (in-memory). Without this the iterative loop builds
        an exponentially deep plan."""
        if df is None:
            return None
        if self.store is not None:
            df.write.mode("overwrite").parquet(
                f"{self.store.root}/round={rnd:06d}/{name}"
            )
            return self.store.read(rnd, name)
        return df.localCheckpoint(eager=True)

    def _seed_frontier(self) -> DataFrame:
        c = self.cfg
        return self.spark.createDataFrame(
            [(c.task, c.start_url, _netloc_py(c.start_url), 0, 0, 0)],
            "task string, url string, netloc string, depth int, "
            "discovered_round int, discovery_pos bigint",
        )

    def resume_or_init(self) -> int:
        """Resume from the last committed round, else initialize round 0."""
        if self.store is not None:
            last = self.store.latest_committed_round()
            if last is not None:
                self.visited = self.store.read(last, "visited")
                self.pending = self.store.read(last, "pending")
                self.seen = self.store.read(last, "seen") if self.store.has_table(last, "seen") else None
                self.entries = self.store.read(last, "entries") if self.store.has_table(last, "entries") else None
                self.documents = (
                    self.store.read(last, "documents") if self.store.has_table(last, "documents") else None
                )
                row = (
                    self.pending.agg(F.max("discovery_pos").alias("m")).collect()[0]
                )
                vmax = self.visited.agg(F.max("global_pos").alias("m")).collect()[0]
                self._next_pos = max(
                    (row.m if row.m is not None else 0),
                    (vmax.m if vmax.m is not None else 0),
                ) + 1
                self._round = last + 1
                return self._round
        self.pending = self._seed_frontier()
        self._next_pos = 1
        self._round = 0
        return 0

    # -- one round -------------------------------------------------------------

    def run_round(self) -> RoundMetrics:
        cfg = self.cfg
        rnd = self._round
        t0 = time.time()

        pending = self.pending
        # politeness: window-rank per netloc in FIFO order, emit ≤ budget
        order = [F.asc("discovered_round"), F.asc("discovery_pos")]
        if cfg.host_budget is not None:
            w = Window.partitionBy("netloc").orderBy(*order)
            ranked = pending.withColumn("_hrk", F.row_number().over(w))
            batch = ranked.where(F.col("_hrk") <= cfg.host_budget).drop("_hrk")
            deferred = ranked.where(F.col("_hrk") > cfg.host_budget).drop("_hrk")
        else:
            batch = pending
            deferred = None

        # salted partitioning: hot hosts spread across shards, salt varies per round
        batch = batch.repartition(
            cfg.n_host_shards,
            F.pmod(F.xxhash64(F.col("netloc"), F.lit(rnd)), F.lit(cfg.n_host_shards)),
        )

        # fetch = broadcast the (small) batch against the (huge) pages table
        fetched = (
            self.pages.join(F.broadcast(batch), "url", "inner")
            .select("task", "url", "html", "depth", "discovered_round", "discovery_pos")
        )
        missing = batch.join(self.pages.select("url"), "url", "left_anti")

        # record visited (crawl order carried as data)
        batch_visited = batch.select(
            "task",
            "url",
            F.lit(rnd).alias("round"),
            F.col("discovery_pos").alias("global_pos"),
            F.lit("fetched").alias("status"),
        ).join(missing.select("url", F.lit("missing").alias("_m")), "url", "left").select(
            "task", "url", "round", "global_pos",
            F.coalesce(F.col("_m"), F.col("status")).alias("status"),
        )

        # parse pagination links (Arrow-batched UDF)
        page_inputs = fetched.withColumn("start_url", F.lit(cfg.start_url))
        links = udfs.parse_pagination_links(page_inputs).join(
            fetched.select(F.col("url").alias("page_url"), "depth", "discovery_pos"),
            "page_url",
        )

        n_links = links.count()

        # first-wins dedup in FIFO append order (parent pos, link pos)
        wdup = Window.partitionBy("url").orderBy(F.asc("discovery_pos"), F.asc("link_pos"))
        new_links = (
            links.withColumn("_rn", F.row_number().over(wdup))
            .where(F.col("_rn") == 1)
            .select(
                "task",
                "url",
                (F.col("depth") + 1).alias("depth"),
                F.lit(rnd + 1).alias("discovered_round"),
                F.col("discovery_pos").alias("parent_pos"),
                "link_pos",
            )
        )

        # anti-join the seen sets: visited (big, bloom-prefiltered) then
        # in-flight sets (small, exact only)
        if self.visited is not None:
            if cfg.use_bloom:
                bf = bloom_mod.build_bloom(self.visited, "url", cfg.bloom_capacity, cfg.bloom_fpp)
                bc = self.spark.sparkContext.broadcast(bf.to_bytes())
                flagged = bloom_mod.prefilter_unseen(new_links, "url", bc)
                definitely_new = flagged.where(~F.col("_maybe_seen")).drop("_maybe_seen")
                maybe = flagged.where(F.col("_maybe_seen")).drop("_maybe_seen")
                survivors = maybe.join(self.visited.select("url"), "url", "left_anti")
                new_links = definitely_new.unionByName(survivors)
            else:
                new_links = new_links.join(self.visited.select("url"), "url", "left_anti")
        new_links = new_links.join(batch.select("url"), "url", "left_anti")
        if deferred is not None:
            new_links = new_links.join(deferred.select("url"), "url", "left_anti")

        # assign global FIFO append positions
        wpos = Window.orderBy(F.asc("parent_pos"), F.asc("link_pos"))
        new_frontier = new_links.select(
            "task",
            "url",
            _netloc_col(F.col("url")).alias("netloc"),
            "depth",
            "discovered_round",
            (F.row_number().over(wpos) + F.lit(self._next_pos - 1)).cast("long").alias("discovery_pos"),
        )

        # entries/documents/seen merge (the listing side of the round)
        n_entries = n_docs = 0
        if cfg.parse_entries:
            parsed = udfs.parse_listing_entries(
                fetched.withColumn("dialect", F.lit(cfg.dialect))
            ).join(
                fetched.select(F.col("url").alias("page_url"), "discovery_pos"), "page_url"
            )
            parsed = parsed.withColumn(
                "_src_pos",
                F.col("discovery_pos") * 100000 + F.col("entry_pos"),
            )
            with_ids = resolve_entry_identity(parsed, self.documents)
            n_entries = with_ids.count()
            batch_entries = with_ids.select("entry_id", "task", "serial", "title", "remark", "_src_pos")
            batch_docs = (
                with_ids.select("entry_id", "_src_pos", F.posexplode("documents").alias("_p", "_d"))
                .select(
                    "entry_id",
                    F.col("_d.url").alias("url"),
                    F.col("_d.doc_type").alias("doc_type"),
                    F.col("_d.title").alias("title"),
                    (F.col("_src_pos") * 1000 + F.col("_p")).alias("_src_pos"),
                )
            )
            n_docs = batch_docs.count()
            self.entries = merge_entries(self.entries, batch_entries)
            self.documents = merge_documents(self.documents, batch_docs)
            batch_seen = batch_docs.select(
                "url", "entry_id", "title", "doc_type",
                F.lit(False).alias("downloaded"), F.lit(None).cast("string").alias("local_path"),
                "_src_pos",
            )
            self.seen = merge_seen(self.seen, batch_seen)

        # fold into engine state
        self.visited = (
            batch_visited if self.visited is None else self.visited.unionByName(batch_visited)
        )
        self.pending = (
            new_frontier if deferred is None else deferred.unionByName(new_frontier)
        )

        # pin lineage + counts
        self.visited = self._pin(self.visited, rnd, "visited")
        self.pending = self._pin(self.pending, rnd, "pending")
        self.entries = self._pin(self.entries, rnd, "entries")
        self.documents = self._pin(self.documents, rnd, "documents")
        self.seen = self._pin(self.seen, rnd, "seen")

        n_fetched = fetched.count()
        n_missing = missing.count()
        n_new = self.pending.count() - (deferred.count() if deferred is not None else 0)
        self._next_pos += n_new

        m = RoundMetrics(
            round=rnd,
            pages_fetched=n_fetched,
            pages_missing=n_missing,
            links_discovered=n_links,
            links_new=n_new,
            entries_seen=n_entries,
            documents_seen=n_docs,
            wall_s=time.time() - t0,
        )
        self.metrics.append(m)
        if self.store is not None:
            mdf = self.spark.createDataFrame([m.as_tuple()], _METRICS_SCHEMA)
            mdf.write.mode("overwrite").parquet(f"{self.store.root}/round={rnd:06d}/metrics")
            with open(f"{self.store.root}/round={rnd:06d}/_COMMITTED", "w") as fh:
                fh.write("ok\n")
        self._round += 1
        return m

    # -- full crawl ------------------------------------------------------------

    def run(self) -> list[RoundMetrics]:
        self.resume_or_init()
        while self._round < self.cfg.max_rounds:
            if self.pending is None or self.pending.limit(1).count() == 0:
                break
            self.run_round()
        return self.metrics

    # -- results ---------------------------------------------------------------

    def crawl_order(self) -> list[str]:
        """URLs in reference-FIFO processing order (fetched + missing)."""
        if self.visited is None:
            return []
        return [
            r.url
            for r in self.visited.orderBy("round", "global_pos").select("url").collect()
        ]

    def seen_urls(self) -> set[str]:
        if self.seen is None:
            return set()
        return {r.url for r in self.seen.select("url").collect()}


def _netloc_py(url: str) -> str:
    from urllib.parse import urlparse

    return (urlparse(url).netloc or "").lower()


def _netloc_col(col):
    return F.lower(F.coalesce(F.try_parse_url(col, F.lit("HOST")), F.lit("")))
