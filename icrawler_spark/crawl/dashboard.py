"""Dashboard/overview aggregates (ref dashboard.py:180-254).

One grouped aggregation per task over the normalized state tables — the
reference walks the whole in-memory state per request; here the overview is
a DataFrame the serving layer caches and refreshes per round commit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def task_overview(
    entries: DataFrame,
    documents: DataFrame,
    seen: DataFrame,
    cache_fresh: bool = True,
) -> DataFrame:
    """Per-task counts + status rollup (ref dashboard.py:188-254):

    documents_total, downloaded_total, pending = max(0, total − downloaded),
    entries_without_documents, tracked_files, tracked_downloaded, status ∈
    waiting/attention/stale/ok (when-chain over the aggregates)."""
    doc_counts = (
        documents.join(
            seen.select("url", F.coalesce("downloaded", F.lit(False)).alias("_dl")),
            "url",
            "left",
        )
        .groupBy("entry_id")
        .agg(
            F.count(F.lit(1)).alias("_n_docs"),
            F.sum(F.coalesce(F.col("_dl"), F.lit(False)).cast("int")).alias("_n_dl"),
        )
    )
    per_entry = entries.join(doc_counts, "entry_id", "left")
    per_task = per_entry.groupBy("task").agg(
        F.count(F.lit(1)).alias("entries_total"),
        F.sum(F.coalesce(F.col("_n_docs"), F.lit(0))).cast("long").alias("documents_total"),
        F.sum(F.coalesce(F.col("_n_dl"), F.lit(0))).cast("long").alias("downloaded_total"),
        F.sum(F.when(F.coalesce(F.col("_n_docs"), F.lit(0)) == 0, 1).otherwise(0))
        .cast("long")
        .alias("entries_without_documents"),
    )
    tracked = seen.agg(
        F.count(F.lit(1)).alias("tracked_files"),
        F.sum(F.coalesce("downloaded", F.lit(False)).cast("int")).cast("long").alias("tracked_downloaded"),
    )
    out = per_task.crossJoin(F.broadcast(tracked)).withColumn(
        "pending_total",
        F.greatest(F.lit(0).cast("long"), F.col("documents_total") - F.col("downloaded_total")),
    )
    status = (
        F.when(F.col("entries_total") == 0, "waiting")
        .when(F.col("pending_total") > 0, "attention")
        .when(F.lit(not cache_fresh), "stale")
        .otherwise("ok")
    )
    return out.withColumn("status", status)


def type_histogram(seen: DataFrame) -> DataFrame:
    """Files grouped by type (ref dashboard.py:180-187)."""
    return seen.groupBy(F.lower(F.coalesce("doc_type", F.lit("other"))).alias("doc_type")).agg(
        F.count(F.lit(1)).alias("n")
    )
