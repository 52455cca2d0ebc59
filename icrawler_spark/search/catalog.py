"""Title → catalog resolution (ref clause_lookup.py:165-183).

Three tiers, each consuming only the previous tier's misses (the reference's
short-circuit as a filtered union — cheap-predicate-first, SURVEY §4):

1. exact  — equi-join on norm_title;
2. partial — substring containment either way (theta join; the query side is
   broadcast — it is a handful of titles per request);
3. fuzzy  — difflib ``get_close_matches`` cutoff 0.75 against the distinct
   norm_title vocabulary, as a pandas UDF over the misses with the (small)
   vocabulary broadcast.

At catalog scale the vocabulary broadcast is the limit of tier 3; the scale
path replaces it with the MinHash-LSH candidate join from
``queries.textops`` — same contract, bounded fanout.
"""

from __future__ import annotations

from difflib import get_close_matches

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..functions import native


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
    vocab = [r.norm_title for r in catalog.select("norm_title").distinct().collect()]

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _closest(qnorms):
        def one(s):
            hits = get_close_matches(s or "", vocab, n=1, cutoff=0.75)
            return hits[0] if hits else None

        return qnorms.map(one)

    closest_udf = pandas_udf(_closest, StringType())
    fuzzy = (
        miss2.withColumn("norm_title", closest_udf(F.col("qnorm")))
        .where(F.col("norm_title").isNotNull())
        .join(catalog.select("entry_id", "norm_title"), "norm_title")
        .select("qid", "entry_id", F.lit("fuzzy").alias("tier"))
    )
    return exact.unionByName(partial).unionByName(fuzzy)
