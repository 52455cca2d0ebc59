"""Relational operator coverage (SURVEY.md §2.3-§2.7, §2.11) as oracle-checked
queries over the driver's TPC-H-ish tables.

Each query is the Spark-idiomatic form of a reference operator (ref file:line
in each docstring) — broadcast joins for small dims, window dedup/top-k,
anti-joins for the seen-set pattern, exact scaled-integer arithmetic so the
DuckDB oracle hashes identically.

Determinism: money/value doubles carry 2-decimal payloads; they are scaled to
exact BIGINT cents (``round(x*100)``) before any aggregation, summed exactly,
and divided back to double at the end — aggregation order can no longer change
a single bit.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import load


def _cents(col):
    """double with 2-decimal payload → exact integer cents (BIGINT)."""
    return F.round(col * 100).cast("long")


# --- §2.5 aggregations --------------------------------------------------------


def pricing_summary(spark, sf_dir):
    """TPC-H Q1 shape: the TaskStats/run-summary aggregate family
    (ref task_models.py:21-28, summary.py:20-56) at scale: one wide
    grouped aggregate, map-side partial agg, no join.
    """
    li = load(spark, sf_dir, "lineitem").where(F.col("l_shipdate") <= F.lit("1998-09-02"))
    qty = _cents(F.col("l_quantity"))
    price = _cents(F.col("l_extendedprice"))
    disc = _cents(F.col("l_discount"))
    tax = _cents(F.col("l_tax"))
    # charge scaled by 100*100*100 = 1e6 — exact BIGINT per row and in sums
    disc_price = price * (100 - disc)          # scale 1e4
    charge = disc_price * (100 + tax)          # scale 1e6
    out = (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sp"),
            F.sum(disc_price).alias("_sdp"),
            F.sum(charge).alias("_sc"),
            F.sum(disc).alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .select(
            "l_returnflag",
            "l_linestatus",
            (F.col("_sq") / 100.0).alias("sum_qty"),
            (F.col("_sp") / 100.0).alias("sum_base_price"),
            (F.col("_sdp") / 10000.0).alias("sum_disc_price"),
            (F.col("_sc") / 1000000.0).alias("sum_charge"),
            (F.col("_sq") / 100.0 / F.col("count_order")).alias("avg_qty"),
            (F.col("_sp") / 100.0 / F.col("count_order")).alias("avg_price"),
            (F.col("_sd") / 100.0 / F.col("count_order")).alias("avg_disc"),
            "count_order",
        )
    )
    return out


PRICING_SUMMARY_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(q) AS BIGINT) / 100.0 AS sum_qty,
       CAST(SUM(p) AS BIGINT) / 100.0 AS sum_base_price,
       CAST(SUM(p * (100 - d)) AS BIGINT) / 10000.0 AS sum_disc_price,
       CAST(SUM(p * (100 - d) * (100 + t)) AS BIGINT) / 1000000.0 AS sum_charge,
       CAST(SUM(q) AS BIGINT) / 100.0 / COUNT(*) AS avg_qty,
       CAST(SUM(p) AS BIGINT) / 100.0 / COUNT(*) AS avg_price,
       CAST(SUM(d) AS BIGINT) / 100.0 / COUNT(*) AS avg_disc,
       COUNT(*) AS count_order
FROM (
  SELECT l_returnflag, l_linestatus,
         CAST(round(l_quantity * 100) AS BIGINT) AS q,
         CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
         CAST(round(l_discount * 100) AS BIGINT) AS d,
         CAST(round(l_tax * 100) AS BIGINT) AS t
  FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
)
GROUP BY l_returnflag, l_linestatus
"""


def run_summary(spark, sf_dir):
    """Global run summary (ref summary.py:20-56): conditional counts over
    several tables collapsed to one row — crossJoin of 1-row aggregates.
    """
    o = load(spark, sf_dir, "orders").agg(
        F.count(F.lit(1)).alias("orders_total"),
        F.sum(F.when(F.col("o_orderstatus") == "F", 1).otherwise(0)).cast("long").alias("orders_finished"),
    )
    li = load(spark, sf_dir, "lineitem").agg(
        F.count(F.lit(1)).alias("lineitems_total"),
        F.sum(F.when(F.col("l_returnflag") == "R", 1).otherwise(0)).cast("long").alias("lineitems_returned"),
    )
    c = load(spark, sf_dir, "customer").agg(F.count(F.lit(1)).alias("customers_total"))
    return o.crossJoin(li).crossJoin(c)


RUN_SUMMARY_SQL = """
SELECT * FROM
  (SELECT COUNT(*) AS orders_total,
          CAST(SUM(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS orders_finished
   FROM orders),
  (SELECT COUNT(*) AS lineitems_total,
          CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT) AS lineitems_returned
   FROM lineitem),
  (SELECT COUNT(*) AS customers_total FROM customer)
"""


def type_histogram(spark, sf_dir):
    """Type histogram (ref dashboard.py:180-187): groupBy(type).count()."""
    return (
        load(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


TYPE_HISTOGRAM_SQL = "SELECT event_type, COUNT(*) AS n FROM events GROUP BY event_type"


def duplicate_counting(spark, sf_dir):
    """Duplicate-group counting (ref scripts/dedupe_state.py:41-57):
    groupBy(key).count().filter(>1)."""
    return (
        load(spark, sf_dir, "part")
        .groupBy("p_brand", "p_size")
        .agg(F.count(F.lit(1)).alias("n_dups"))
        .where(F.col("n_dups") > 1)
    )


DUPLICATE_COUNTING_SQL = """
SELECT p_brand, p_size, COUNT(*) AS n_dups
FROM part GROUP BY p_brand, p_size HAVING COUNT(*) > 1
"""


def status_rollup(spark, sf_dir):
    """Status rollup when-chain over aggregates (ref dashboard.py:190-202):
    per-user event aggregates → attention/stale/ok classification relative
    to the corpus max timestamp."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("max_ts"))
    per_user = ev.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0)).cast("long").alias("n_errors"),
        F.max("ts").alias("last_ts"),
    )
    return (
        per_user.crossJoin(F.broadcast(mx))
        .select(
            "user_id",
            "n_events",
            "n_errors",
            F.when(F.col("n_errors") * 5 > F.col("n_events"), F.lit("attention"))
            .when(F.col("last_ts") < F.expr("max_ts - INTERVAL 7 DAY"), F.lit("stale"))
            .otherwise(F.lit("ok"))
            .alias("status"),
        )
    )


STATUS_ROLLUP_SQL = """
SELECT user_id, n_events, n_errors,
       CASE WHEN n_errors * 5 > n_events THEN 'attention'
            WHEN last_ts < max_ts - INTERVAL 7 DAY THEN 'stale'
            ELSE 'ok' END AS status
FROM (
  SELECT user_id, COUNT(*) AS n_events,
         CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors,
         MAX(ts) AS last_ts
  FROM events GROUP BY user_id
), (SELECT MAX(ts) AS max_ts FROM events)
"""


def serial_assignment(spark, sf_dir):
    """next-serial assignment (ref state.py:46-54, pbc_monitor.py:990-1047):
    new serials = global max + discovery-order row_number."""
    o = load(spark, sf_dir, "orders")
    mx = o.agg(F.max("o_orderkey").alias("max_serial"))
    w = Window.orderBy("o_orderdate", "o_orderkey")
    return (
        o.where(F.col("o_orderstatus") == "O")
        .crossJoin(F.broadcast(mx))
        .select(
            "o_orderkey",
            (F.col("max_serial") + F.row_number().over(w)).alias("new_serial"),
        )
    )


SERIAL_ASSIGNMENT_SQL = """
SELECT o_orderkey,
       max_serial + ROW_NUMBER() OVER (ORDER BY o_orderdate, o_orderkey) AS new_serial
FROM (SELECT * FROM orders WHERE o_orderstatus = 'O'),
     (SELECT MAX(o_orderkey) AS max_serial FROM orders)
"""


# --- §2.4 joins ---------------------------------------------------------------


def seen_anti_join(spark, sf_dir):
    """The seen-set skip (ref state.py:361-365 used at pbc_monitor.py:652):
    left ANTI join — customers with no orders = candidates not in the seen
    set. At crawl scale this is frontier ⟂ seen; Bloom pre-filter + exact
    anti-join (see icrawler_spark.crawl)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select("c_custkey", "c_name")


SEEN_ANTI_JOIN_SQL = """
SELECT c_custkey, c_name FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def revenue_by_nation(spark, sf_dir):
    """Entry-identity style multi-join (ref state.py:59-86 shape): fact ⋈
    dims with small dims broadcast; revenue in exact cents."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.sum(rev).alias("_r"), F.count(F.lit(1)).alias("n_items"))
        .select("n_name", (F.col("_r") / 10000.0).alias("revenue"), "n_items")
    )


REVENUE_BY_NATION_SQL = """
SELECT n_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def top_customers_by_revenue(spark, sf_dir):
    """Search top-k (ref policy_finder.py:1366-1373): score-all → orderBy →
    limit k ⇒ TakeOrderedAndProject, no global sort materialized."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    rev = _cents(F.col("l_extendedprice")) * (100 - _cents(F.col("l_discount")))
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).alias("_r"))
        .select("c_custkey", "c_name", (F.col("_r") / 10000.0).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(10)
    )


TOP_CUSTOMERS_SQL = """
SELECT c_custkey, c_name,
       CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS BIGINT) / 10000.0 AS revenue
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
GROUP BY c_custkey, c_name
ORDER BY revenue DESC, c_custkey ASC
LIMIT 10
"""


# --- §2.6 windows / dedup / ranking ------------------------------------------


def latest_order_per_customer(spark, sf_dir):
    """Cross-task dedup window (ref policy_finder.py:1293-1337): keep the
    best row per identity key via row_number() = 1."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "o_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
        )
    )


LATEST_ORDER_SQL = """
SELECT o_custkey, o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_date
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1
"""


def priority_pick(spark, sf_dir):
    """Document-priority pick (ref text_pipeline.py:132-139: word>pdf>html>
    text, stable by position): per group, rank by (priority desc, pos asc),
    keep first."""
    li = load(spark, sf_dir, "lineitem")
    prio = (
        F.when(F.col("l_returnflag") == "R", 3)
        .when(F.col("l_returnflag") == "A", 2)
        .otherwise(1)
    )
    # (orderkey, linenumber) is NOT unique in this corpus — extend the sort
    # key until the pick is total, or the window choice is nondeterministic
    w = Window.partitionBy("l_orderkey").orderBy(
        F.desc("prio"), F.asc("l_linenumber"), F.asc("l_partkey"), F.asc("l_suppkey")
    )
    return (
        li.withColumn("prio", prio)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("l_orderkey", "l_partkey", "l_returnflag", "l_linenumber")
    )


PRIORITY_PICK_SQL = """
SELECT l_orderkey, l_partkey, l_returnflag, l_linenumber
FROM (
  SELECT *,
         ROW_NUMBER() OVER (
           PARTITION BY l_orderkey
           ORDER BY (CASE l_returnflag WHEN 'R' THEN 3 WHEN 'A' THEN 2 ELSE 1 END) DESC,
                    l_linenumber ASC, l_partkey ASC, l_suppkey ASC) AS rn
  FROM lineitem
) WHERE rn = 1
"""


def collision_suffixes(spark, sf_dir):
    """Unique-filename suffixing (ref pbc_monitor.py:365-374,
    export_titles.py:112-133): name, name_1, name_2… per collision group."""
    p = load(spark, sf_dir, "part")
    base = F.lower(F.regexp_replace(F.col("p_name"), r"\s+", "_"))
    w = Window.partitionBy("base").orderBy("p_partkey")
    return (
        p.withColumn("base", base)
        .withColumn("rn", F.row_number().over(w))
        .select(
            "p_partkey",
            F.when(F.col("rn") == 1, F.col("base"))
            .otherwise(F.concat_ws("_", "base", (F.col("rn") - 1).cast("string")))
            .alias("unique_name"),
        )
    )


COLLISION_SUFFIXES_SQL = """
SELECT p_partkey,
       CASE WHEN rn = 1 THEN base ELSE base || '_' || CAST(rn - 1 AS VARCHAR) END AS unique_name
FROM (
  SELECT p_partkey, base, ROW_NUMBER() OVER (PARTITION BY base ORDER BY p_partkey) AS rn
  FROM (SELECT p_partkey, lower(regexp_replace(p_name, '\\s+', '_', 'g')) AS base FROM part)
)
"""


def politeness_rank(spark, sf_dir):
    """Per-host politeness budget (ref fetcher.py:28-30 reimagined per
    BASELINE.json north_rule): window-rank per key (netloc analog: user_id),
    keep rank ≤ budget — the token-bucket emission of a crawl round."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 5)
        .select("user_id", "event_id", "rk")
    )


POLITENESS_RANK_SQL = """
SELECT user_id, event_id, rk FROM (
  SELECT user_id, event_id,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rk
  FROM events
) WHERE rk <= 5
"""


def export_order(spark, sf_dir):
    """State-export ordering (ref state.py:283-289: (serial is null, serial,
    title)) with an explicit rank so ordering survives the driver's
    order-insensitive hash."""
    p = load(spark, sf_dir, "part")
    w = Window.orderBy(F.col("p_size").isNull(), F.col("p_size"), F.col("p_name"), F.col("p_partkey"))
    return p.select("p_partkey", F.row_number().over(w).alias("export_pos"))


EXPORT_ORDER_SQL = """
SELECT p_partkey,
       ROW_NUMBER() OVER (ORDER BY (p_size IS NULL), p_size, p_name, p_partkey) AS export_pos
FROM part
"""


# --- §2.3 / §2.7 filters & set ops -------------------------------------------


def cache_freshness(spark, sf_dir):
    """Same-day cache-freshness predicate (ref pbc_monitor.py:379-389):
    to_date(ts) = corpus max date → partition-prunable at scale."""
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max(F.to_date("ts")).alias("max_d"))
    return (
        ev.crossJoin(F.broadcast(mx))
        .where(F.to_date("ts") == F.col("max_d"))
        .select("event_id", "event_type")
    )


CACHE_FRESHNESS_SQL = """
SELECT event_id, event_type FROM events, (SELECT MAX(CAST(ts AS DATE)) AS max_d FROM events)
WHERE CAST(ts AS DATE) = max_d
"""


def html_only_entries(spark, sf_dir):
    """html-only-entries predicate (ref scripts/filter_html_only_policies.py:
    64-75): groupBy(entry).agg(bool_and(cond))."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_orderkey")
        .agg(F.every(F.col("l_returnflag") == "N").alias("all_n"))
        .where(F.col("all_n"))
        .select("l_orderkey")
    )


HTML_ONLY_SQL = """
SELECT l_orderkey FROM lineitem GROUP BY l_orderkey HAVING bool_and(l_returnflag = 'N')
"""


def structure_minus_state(spark, sf_dir):
    """Set difference (ref scripts/compare_structure_state_urls.py):
    distinct keys on one side EXCEPT the other."""
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    li = load(spark, sf_dir, "lineitem").select(F.col("l_orderkey").alias("o_orderkey"))
    return o.exceptAll(li.distinct()).distinct()


STRUCTURE_MINUS_STATE_SQL = """
SELECT DISTINCT o_orderkey FROM orders
EXCEPT
SELECT DISTINCT l_orderkey AS o_orderkey FROM lineitem
"""


def union_dedup(spark, sf_dir):
    """Multi-task union + dedup (ref policy_finder.py:1352-1364):
    unionByName then identity dedup."""
    o = load(spark, sf_dir, "orders")
    a = o.where(F.col("o_totalprice") > 200000).select("o_orderkey")
    b = o.where(F.col("o_orderdate") >= F.lit("1997-06-01")).select("o_orderkey")
    return a.unionByName(b).distinct()


UNION_DEDUP_SQL = """
SELECT DISTINCT o_orderkey FROM (
  SELECT o_orderkey FROM orders WHERE o_totalprice > 200000
  UNION ALL
  SELECT o_orderkey FROM orders WHERE o_orderdate >= TIMESTAMP '1997-06-01 00:00:00'
)
"""


# --- §2.11 incremental / streaming-shaped ------------------------------------


def sessionize(spark, sf_dir):
    """Monitor-round cadence generalized to session windows: gap > 30 min
    starts a new session (lag + running sum — the standard batch
    sessionization; streaming twin in icrawler_spark.streaming)."""
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    is_new = F.when(
        F.col("prev_ts").isNull() | (F.col("ts") > F.expr("prev_ts + INTERVAL 30 MINUTE")), 1
    ).otherwise(0)
    sess = (
        ev.withColumn("prev_ts", F.lag("ts").over(w))
        .withColumn("is_new", is_new)
        .withColumn("session_seq", F.sum("is_new").over(w).cast("long"))
    )
    return sess.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        # microsecond granularity: exact in both engines (second-granularity
        # diffs disagree — DuckDB counts boundary crossings, Spark truncates)
        F.expr("timestampdiff(MICROSECOND, min(ts), max(ts))").cast("long").alias("duration_us"),
    )


# --- recrawl scheduling --------------------------------------------------------


def recrawl_schedule(spark, sf_dir):
    """Change-frequency-weighted refetch priority (the incremental-crawl
    scheduler's core computation — Cho & Garcia-Molina, "Effective page
    refresh policies for web crawlers", TODS 2003: refresh effort goes to
    pages that change often and have not been fetched recently).

    The ``events`` table is read as a fetch log: ``user_id`` = page,
    ``ts`` = fetch time, ``props`` = content fingerprint at that fetch.
    Per page: n_fetches, n_changes (distinct fingerprints), staleness in
    microseconds as of the corpus' latest fetch, and an integer priority
    ``(age_us * n_changes) DIV n_fetches`` — exact arithmetic, so the score
    is partition-order independent and value-identical in the oracle.

    Scale notes: one groupBy(user_id) shuffle with map-side partial aggs;
    the corpus max-ts is a scalar job (at 10^10 rows it's one tree-reduced
    agg), injected as a literal — no global window, no 1-row join.
    """
    ev = load(spark, sf_dir, "events")
    mx = ev.agg(F.max("ts").alias("mx")).first()["mx"]
    mx_lit = F.lit(mx).cast(ev.schema["ts"].dataType)
    per = ev.groupBy(F.col("user_id").alias("url_id")).agg(
        F.count(F.lit(1)).alias("n_fetches"),
        F.countDistinct("props").alias("n_changes"),
        F.max("ts").alias("last_ts"),
    )
    age_us = F.expr("timestampdiff(MICROSECOND, last_ts, mx)").cast("long")
    return per.withColumn("mx", mx_lit).select(
        "url_id",
        "n_fetches",
        "n_changes",
        age_us.alias("age_us"),
        F.expr(
            "CAST((timestampdiff(MICROSECOND, last_ts, mx) * n_changes)"
            " DIV n_fetches AS BIGINT)"
        ).alias("refetch_priority"),
    )


RECRAWL_SCHEDULE_SQL = """
WITH m AS (SELECT MAX(ts) AS mx FROM events),
per AS (
  SELECT user_id AS url_id, COUNT(*) AS n_fetches,
         COUNT(DISTINCT props) AS n_changes, MAX(ts) AS last_ts
  FROM events GROUP BY user_id
)
SELECT url_id, n_fetches, n_changes,
       CAST(date_diff('microsecond', last_ts, (SELECT mx FROM m)) AS BIGINT) AS age_us,
       CAST((date_diff('microsecond', last_ts, (SELECT mx FROM m)) * n_changes)
            // n_fetches AS BIGINT) AS refetch_priority
FROM per
"""


def latest_snapshot(spark, sf_dir):
    """Latest-snapshot collapse over a multi-snapshot fetch log — the query
    twin of ``crawl.sources.latest_snapshot_view`` (a Common-Crawl-style
    pages table carries one row per (url, warc_ts); consumers read one row
    per url, the newest). The ``events`` table stands in as the log:
    user_id = page, ts = snapshot time, props = content at that snapshot.

    Deterministic pick: row_number over (ts DESC, event_id DESC) — a total
    order even under timestamp ties, identical in both engines.

    Scale notes: one window shuffle on the page key; at 10^10 rows this is
    the standard MAX-timestamp-per-key pattern AQE handles with skew
    splitting (hot pages with many snapshots).
    """
    ev = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        ev.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col("user_id").alias("url_id"),
            F.col("event_id").alias("latest_event_id"),
            F.col("props").alias("latest_props"),
            F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("latest_ts"),
        )
    )


LATEST_SNAPSHOT_SQL = """
SELECT user_id AS url_id, event_id AS latest_event_id, props AS latest_props,
       strftime(ts, '%Y-%m-%d %H:%M:%S') AS latest_ts
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
WHERE rn = 1
"""


SESSIONIZE_SQL = """
SELECT user_id, session_seq, COUNT(*) AS n_events,
       CAST(date_diff('microsecond', MIN(ts), MAX(ts)) AS BIGINT) AS duration_us
FROM (
  SELECT user_id, ts,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS BIGINT) AS session_seq
  FROM (
    SELECT *, CASE WHEN prev_ts IS NULL OR ts > prev_ts + INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS is_new
    FROM (
      SELECT *, LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
      FROM events
    )
  )
)
GROUP BY user_id, session_seq
"""


def hourly_rollup(spark, sf_dir):
    """Time-window rollup (streaming-shaped, ref monitor cadence
    pbc_monitor.py:1129-1134): tumbling 1-hour windows, exact-cents sums."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count(F.lit(1)).alias("n"), F.sum(_cents(F.col("value"))).alias("_sv"))
        .select("hour", "event_type", "n", (F.col("_sv") / 100.0).alias("sum_value"))
    )


HOURLY_ROLLUP_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(round(value*100) AS BIGINT)) AS BIGINT) / 100.0 AS sum_value
FROM events GROUP BY 1, 2
"""


QUERIES = {
    "pricing_summary": (pricing_summary, PRICING_SUMMARY_SQL),
    "run_summary": (run_summary, RUN_SUMMARY_SQL),
    "type_histogram": (type_histogram, TYPE_HISTOGRAM_SQL),
    "duplicate_counting": (duplicate_counting, DUPLICATE_COUNTING_SQL),
    "status_rollup": (status_rollup, STATUS_ROLLUP_SQL),
    "serial_assignment": (serial_assignment, SERIAL_ASSIGNMENT_SQL),
    "seen_anti_join": (seen_anti_join, SEEN_ANTI_JOIN_SQL),
    "revenue_by_nation": (revenue_by_nation, REVENUE_BY_NATION_SQL),
    "top_customers_by_revenue": (top_customers_by_revenue, TOP_CUSTOMERS_SQL),
    "latest_order_per_customer": (latest_order_per_customer, LATEST_ORDER_SQL),
    "priority_pick": (priority_pick, PRIORITY_PICK_SQL),
    "collision_suffixes": (collision_suffixes, COLLISION_SUFFIXES_SQL),
    "politeness_rank": (politeness_rank, POLITENESS_RANK_SQL),
    "export_order": (export_order, EXPORT_ORDER_SQL),
    "cache_freshness": (cache_freshness, CACHE_FRESHNESS_SQL),
    "html_only_entries": (html_only_entries, HTML_ONLY_SQL),
    "structure_minus_state": (structure_minus_state, STRUCTURE_MINUS_STATE_SQL),
    "union_dedup": (union_dedup, UNION_DEDUP_SQL),
    "sessionize": (sessionize, SESSIONIZE_SQL),
    "hourly_rollup": (hourly_rollup, HOURLY_ROLLUP_SQL),
    "recrawl_schedule": (recrawl_schedule, RECRAWL_SCHEDULE_SQL),
    "latest_snapshot": (latest_snapshot, LATEST_SNAPSHOT_SQL),
}
