"""Auxiliary sources (SURVEY §2.1): extract summaries + downloads-dir scan."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# ref extractor/extract_policy_texts.py:196-263 summary shape
EXTRACT_SUMMARY_SCHEMA = StructType([
    StructField("task", StringType()),
    StructField("records", ArrayType(StructType([
        StructField("entry_index", IntegerType()),
        StructField("serial", IntegerType()),
        StructField("title", StringType()),
        StructField("text_path", StringType()),
        StructField("status", StringType()),
        StructField("source_type", StringType()),
        StructField("pdf_needs_ocr", BooleanType()),
    ]))),
])


def read_extract_summaries(spark: SparkSession, path: str) -> DataFrame:
    """``*_extract.json`` → one row per record (ref clause_lookup.py:94-163:
    tolerate missing/corrupt files → PERMISSIVE mode drops malformed docs
    into _corrupt_record, filtered out)."""
    raw = spark.read.schema(
        EXTRACT_SUMMARY_SCHEMA.add("_corrupt_record", StringType())
    ).option("mode", "PERMISSIVE").option("multiLine", True).json(path)
    return (
        raw.where(F.col("_corrupt_record").isNull())
        .select("task", F.explode_outer("records").alias("r"))
        .select(
            "task",
            F.col("r.entry_index").alias("entry_index"),
            F.col("r.serial").alias("serial"),
            F.col("r.title").alias("title"),
            F.col("r.text_path").alias("text_path"),
            F.col("r.status").alias("status"),
            F.col("r.source_type").alias("source_type"),
            F.col("r.pdf_needs_ocr").alias("pdf_needs_ocr"),
        )
    )


def scan_downloads_dir(spark: SparkSession, path: str) -> DataFrame:
    """binaryFile scan aggregate (ref dashboard.py:137-167): file count,
    total bytes, html count — the content column is never read (the
    binaryFile source prunes it away when only metadata is selected)."""
    files = spark.read.format("binaryFile").option("recursiveFileLookup", "true").load(path)
    return files.select("path", "length").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("length").cast("long").alias("total_bytes"),
        F.sum(F.when(F.lower(F.col("path")).rlike(r"\.html?$"), 1).otherwise(0))
        .cast("long")
        .alias("n_html"),
    )


def latest_snapshot_view(pages: DataFrame) -> DataFrame:
    """One row per url — the newest ``warc_ts`` snapshot wins.

    The input_hint pages table carries multiple (url, warc_ts) snapshot
    rows per url; on Iceberg this view IS time travel / a MERGE-maintained
    latest table, applied ONCE at read so every round parses each page
    exactly once. Without it the engine stays CORRECT (per-url distinct
    status join, first-wins link dedup, entry-id dedup) but pays S× parse
    work on an S-snapshot corpus and counts per-snapshot parses in
    links_discovered. Deterministic tie-break on identical warc_ts via the
    html hash."""
    from pyspark.sql import Window

    order = [F.desc("warc_ts")] if "warc_ts" in pages.columns else []
    order.append(F.asc(F.xxhash64(F.col("html"))))
    w = Window.partitionBy("url").orderBy(*order)
    return (
        pages.withColumn("_snap_rn", F.row_number().over(w))
        .where(F.col("_snap_rn") == 1)
        .drop("_snap_rn")
    )
