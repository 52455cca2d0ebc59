"""Invariant tests for the round-3 pipeline operators (link_pagerank,
paragraph_dedup, url_canonicalize) — properties the order-insensitive
oracle hash cannot see on its own."""

from __future__ import annotations

from pyspark.sql import functions as F

from icrawler_spark.queries.engineops import _canonicalize_url, url_canonicalize
from icrawler_spark.queries.graphops import (
    _BASE_MICRO,
    _INIT_MICRO,
    link_pagerank,
)
from icrawler_spark.queries.textops import paragraph_dedup
from tests.conftest import SF_DIR


def test_pagerank_mass_conservation(spark):
    """Total rank stays within floor-loss of N * INIT: each node redistributes
    85% of its mass (minus ≤ outdeg integer-floor units) and keeps 15% as
    base, so the total can only leak DOWN by floor losses, never up."""
    ranks = link_pagerank(spark, SF_DIR)
    agg = ranks.agg(
        F.sum("rank_micro").alias("total"), F.count("*").alias("n")
    ).first()
    ideal = agg["n"] * _INIT_MICRO
    assert agg["total"] <= ideal
    # floor loss per node per iteration < 100 * outdeg ≤ 300 micro-units
    assert ideal - agg["total"] < agg["n"] * 8 * 300


def test_pagerank_floor_and_determinism(spark):
    ranks = link_pagerank(spark, SF_DIR)
    assert ranks.filter(F.col("rank_micro") < _BASE_MICRO).count() == 0
    a = {r["node"]: r["rank_micro"] for r in ranks.collect()}
    b = {
        r["node"]: r["rank_micro"]
        for r in link_pagerank(spark, SF_DIR).repartition(7).collect()
    }
    assert a == b  # partition-count independent (integer arithmetic)


def test_paragraph_dedup_first_wins_and_reassembly(spark):
    docs = spark.createDataFrame(
        [
            # doc 0: two identical 16-token chunks + a unique tail
            (0, " ".join(["tok%d" % i for i in range(16)] * 2 + ["tail"])),
            # doc 1: repeats doc 0's first chunk exactly — must lose it
            (1, " ".join(["tok%d" % i for i in range(16)] + ["own", "words"])),
        ],
        "doc_id long, text string",
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        docs.withColumn("lang", F.lit("en")).withColumn(
            "source", F.lit("s")
        ).withColumn("n_chars", F.length("text")).write.parquet(
            os.path.join(td, "documents.parquet")
        )
        out = {r["doc_id"]: r for r in paragraph_dedup(spark, td).collect()}
    chunk0 = " ".join("tok%d" % i for i in range(16))
    assert out[0]["n_chunks"] == 3 and out[0]["n_kept"] == 2
    assert out[0]["clean_text"] == chunk0 + " tail"
    assert out[1]["n_chunks"] == 2 and out[1]["n_kept"] == 1
    assert out[1]["clean_text"] == "own words"


def test_url_canonicalize_rules(spark):
    cases = [
        ("HTTP://Host1.EXAMPLE.com:80/a//b/?z=1&a=2#frag",
         "http://host1.example.com/a/b/?a=2&z=1"),
        ("https://h.example.com:443", "https://h.example.com/"),
        ("https://h.example.com:8443/x", "https://h.example.com:8443/x"),
        ("http://h.example.com/p?", "http://h.example.com/p"),
    ]
    df = spark.createDataFrame([(c[0],) for c in cases], "u string")
    got = [
        r["c"]
        for r in df.select(_canonicalize_url(F.col("u")).alias("c")).collect()
    ]
    assert got == [c[1] for c in cases]


def test_url_canonicalize_idempotent_and_grouped(spark):
    roll = url_canonicalize(spark, SF_DIR)
    # canonicalizing a canonical url is a no-op
    again = roll.select(
        "canonical_url", _canonicalize_url(F.col("canonical_url")).alias("c2")
    )
    assert again.filter(F.col("c2") != F.col("canonical_url")).count() == 0
    # the three deterministic variants collapse onto one key per page
    assert roll.filter(F.col("n_variants") > 3).count() == 0
    assert roll.filter(F.col("n_variants") == 3).count() > 0
