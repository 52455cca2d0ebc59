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
