"""Driver contract for the spark-graft builder (PySpark target).

``queries()``/``oracle_sql()`` are backed by the registry in
``icrawler_spark.queries`` — every entry is a SURVEY.md §2 operator (or a
training-data curation op) with an exactly-matching DuckDB oracle; the local
mirror of the driver's gate is ``tests/test_oracle_parity.py``.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from icrawler_spark.queries import all_oracles, all_queries  # noqa: E402
from icrawler_spark.session import _ship_package  # noqa: E402


def _wrap(fn):
    """The driver supplies its own SparkSession; pandas-UDF queries need the
    package importable on executor Python workers, so ship the zip first."""

    def run(spark: SparkSession, sf_dir: str) -> DataFrame:
        _ship_package(spark)
        return fn(spark, sf_dir)

    return run


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: web-corpus curation pipeline over sf0.001 ``documents`` —
    exact-dedup canonical pick joined back to per-doc quality/lang stats,
    rolled up per (lang, source)."""
    from pyspark.sql import functions as F

    from icrawler_spark.queries.textops import exact_dedup, quality_score

    _ship_package(spark)
    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    canon = exact_dedup(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id"), "n_copies"
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    return (
        docs.join(canon, "doc_id")  # keep only canonical docs
        .join(q, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_copies").cast("long").alias("n_raw_copies"),
            F.sum(F.round(F.col("quality") * 1e6).cast("long")).alias("quality_sum_micro"),
        )
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: _wrap(fn) for name, fn in all_queries().items()}


def oracle_sql() -> dict[str, str]:
    return all_oracles()
