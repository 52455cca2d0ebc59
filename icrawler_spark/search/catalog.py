"""Title → catalog resolution (ref clause_lookup.py:165-183).

Three tiers, each consuming only the previous tier's misses (the reference's
short-circuit as a filtered union — cheap-predicate-first, SURVEY §4):

1. exact  — equi-join on norm_title;
2. partial — substring containment either way (theta join; the query side is
   broadcast — it is a handful of titles per request);
3. fuzzy  — difflib ratio ≥ 0.75 against the catalog, with candidates from a
   character-2-gram MinHash-LSH band join (64 perms × 32 bands of 2)
   between the miss side and the catalog — fully distributed, no
   driver-side vocabulary collect. Only candidate PAIRS pay the exact
   SequenceMatcher verify, so tier 3 scales with bucket sizes, not catalog
   size. Band shape tuned against an exhaustive-difflib oracle (ADVICE r2):
   edit-perturbed CJK titles at ratio ≈ 0.8 carry 2-gram Jaccard ≈ 0.4-0.6,
   where a 2-row band hits with p = 1−(1−j²)^32 ≥ 0.996; measured recall
   0.99 on the seeded corpus in tests/test_search.py (the r2 3-gram ×
   4-row-band family measured 0.52 — far below its documented 0.74).
"""

from __future__ import annotations

from difflib import SequenceMatcher

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import native

# char-shingle MinHash family for title similarity (short strings → more
# perms than the document family in queries.textops)
_N_PERMS = 64
_BAND_ROWS = 2
_P = 999999999999989


def _char_shingles(col):
    """Sliding character 3-grams, distinct (SQL substr accepts column pos)."""
    return F.expr(
        f"array_distinct(transform(sequence(1, greatest(char_length({col}) - 1, 1)),"
        f" i -> substr({col}, i, 2)))"
    )


def _band_keys(df: DataFrame, id_col: str, norm_col: str) -> DataFrame:
    """(id, band, band_key) rows from the norm-title's char-shingle MinHash."""
    h = F.conv(F.substring(F.md5(F.col("_sh")), 1, 12), 16, 10).cast("long")
    sh = df.select(
        F.col(id_col).alias("_id"), F.explode(_char_shingles(norm_col)).alias("_sh")
    ).select("_id", h.alias("_h"))
    aggs = [
        F.min((F.col("_h") * (2 * i + 1) + (12289 * i + 1)) % _P).alias(f"mh{i}")
        for i in range(_N_PERMS)
    ]
    wide = sh.groupBy("_id").agg(*aggs)
    bands = []
    for b in range(_N_PERMS // _BAND_ROWS):
        cols = [F.col(f"mh{b * _BAND_ROWS + r}") for r in range(_BAND_ROWS)]
        bands.append(
            F.struct(F.lit(b).alias("band"), F.md5(F.concat_ws(",", *cols)).alias("band_key"))
        )
    return wide.select("_id", F.explode(F.array(*bands)).alias("bk")).select(
        "_id", F.col("bk.band").alias("band"), F.col("bk.band_key").alias("band_key")
    )


def match_titles(queries: DataFrame, catalog: DataFrame) -> DataFrame:
    """queries(qid, title) × catalog(entry_id, norm_title) →
    (qid, entry_id, tier ∈ exact|partial|fuzzy).

    All catalog entries sharing the resolved norm_title are returned
    (the reference returns the whole bucket)."""
    q = queries.select(
        "qid", native.norm_text_ascii(F.col("title")).alias("qnorm")
    ).where(F.col("qnorm") != "")

    exact = q.join(
        catalog.select("entry_id", F.col("norm_title").alias("qnorm")), "qnorm"
    ).select("qid", "entry_id", F.lit("exact").alias("tier"))

    miss1 = q.join(exact.select("qid").distinct(), "qid", "left_anti")
    partial = (
        F.broadcast(miss1)
        .join(
            catalog.select("entry_id", "norm_title"),
            F.col("norm_title").contains(F.col("qnorm"))
            | F.col("qnorm").contains(F.col("norm_title")),
        )
        .select("qid", "entry_id", F.lit("partial").alias("tier"))
    )

    miss2 = miss1.join(partial.select("qid").distinct(), "qid", "left_anti")

    # tier 3: LSH candidate pairs (query-side bands ⋈ catalog-side bands),
    # exact difflib-ratio verify on candidates only, best title per qid
    titles = catalog.select("norm_title").where(F.col("norm_title") != "").distinct()
    qb = _band_keys(miss2, "qid", "qnorm")
    tb = _band_keys(titles, "norm_title", "norm_title")
    cand = (
        qb.join(tb.withColumnRenamed("_id", "norm_title"), ["band", "band_key"])
        .select(F.col("_id").alias("qid"), "norm_title")
        .distinct()
        .join(miss2, "qid")
    )

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    def _ratio(qnorms: pd.Series, titles_s: pd.Series) -> pd.Series:
        return pd.Series(
            [
                SequenceMatcher(None, a or "", b or "").ratio()
                for a, b in zip(qnorms, titles_s)
            ]
        )

    ratio_udf = pandas_udf(_ratio, DoubleType())
    best = Window.partitionBy("qid").orderBy(F.desc("_ratio"), F.asc("norm_title"))
    fuzzy = (
        cand.withColumn("_ratio", ratio_udf(F.col("qnorm"), F.col("norm_title")))
        .where(F.col("_ratio") >= 0.75)
        .withColumn("_rn", F.row_number().over(best))
        .where(F.col("_rn") == 1)
        .join(catalog.select("entry_id", "norm_title"), "norm_title")
        .select("qid", "entry_id", F.lit("fuzzy").alias("tier"))
    )
    return exact.unionByName(partial).unionByName(fuzzy)
