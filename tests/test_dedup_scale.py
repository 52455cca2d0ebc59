"""Scale-path guarantees for the near-dup family.

Round-2 fixes (VERDICT r1 items 2 and 5): SimHash candidate generation must
be the exact 7-block pigeonhole (a top-16-bit prefix bucket silently drops
pairs whose differing bits hit the prefix), and ngram-Jaccard / cosine
near-dup candidates must come from LSH buckets, not group-bounded self-joins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icrawler_spark.queries.simsearch import cosine_dup_pairs
from icrawler_spark.queries.textops import (
    _SIMHASH_MAX_HAMMING,
    ngram_jaccard_pairs,
    simhash_pairs_from_signatures,
)
from tests.conftest import SF_DIR


def _sig_df(spark, sigs):
    return spark.createDataFrame(
        [(i, s) for i, s in enumerate(sigs)], "doc_id long, simhash long"
    )


def test_simhash_finds_pair_differing_in_old_prefix(spark):
    """A Hamming-1 pair whose differing bit lies in the top-16-bit region
    (the r1 prefix bucket) must be found — this is the r1 recall hole."""
    pairs = simhash_pairs_from_signatures(_sig_df(spark, [0, 1 << 40])).collect()
    assert [(r.doc_a, r.doc_b, r.hamming) for r in pairs] == [(0, 1, 1)]


def test_simhash_rejects_hamming_7_candidate(spark):
    """Hamming-7 pair (one whole block differs): it IS a block-join candidate
    (6 other blocks match exactly) but the verify filter must drop it."""
    pairs = simhash_pairs_from_signatures(_sig_df(spark, [0, 0b1111111])).collect()
    assert pairs == []


def test_simhash_pigeonhole_equals_brute_force(spark):
    """Exhaustive check on 120 deterministic signatures: pigeonhole candidates
    + verify == brute-force all-pairs Hamming ≤ 6 (recall must be 100%)."""
    sigs, x = [], 1
    for _ in range(120):
        x = (x * 1103515245 + 12345) % (1 << 48)
        # bias toward clustered signatures so Hamming ≤ 6 pairs actually occur
        sigs.append(x & 0b111111 | (x >> 20 & 0b11) << 40)
    expected = sorted(
        (i, j, bin(a ^ b).count("1"))
        for i, a in enumerate(sigs)
        for j, b in enumerate(sigs)
        if i < j and bin(a ^ b).count("1") <= _SIMHASH_MAX_HAMMING
    )
    got = sorted(
        (r.doc_a, r.doc_b, r.hamming)
        for r in simhash_pairs_from_signatures(_sig_df(spark, sigs)).collect()
    )
    assert got == expected


def _full_explain(df) -> str:
    return df._jdf.queryExecution().toString()


def test_ngram_jaccard_has_no_lang_bounded_self_join(spark):
    """The documents scan must not even read ``lang`` — candidates come from
    LSH bands, so the quadratic-per-language join is structurally gone."""
    plan = _full_explain(ngram_jaccard_pairs(spark, SF_DIR))
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schemas and all("lang" not in ln for ln in read_schemas)


def test_cosine_dup_has_no_label_bounded_self_join(spark):
    """The embeddings scan must not read ``label`` — candidates come from the
    LSH bucket key, so the quadratic-per-label join is structurally gone."""
    plan = _full_explain(cosine_dup_pairs(spark, SF_DIR))
    read_schemas = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schemas and all("label" not in ln for ln in read_schemas)


def test_ngram_jaccard_verified_values_are_exact(spark):
    """Every emitted pair's Jaccard must equal the exact quadratic
    computation (the LSH route changes candidates, never values)."""
    from icrawler_spark.queries.common import load
    from icrawler_spark.queries.textops import _shingles

    got = {(r.doc_a, r.doc_b): r.jaccard for r in ngram_jaccard_pairs(spark, SF_DIR).collect()}
    assert got, "sf0.001 documents contain planted near-dups; expected pairs"
    sh = load(spark, SF_DIR, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("long")
    union = (F.size("a.sh") + F.size("b.sh")).cast("long") - inter
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.8)
        .collect()
    }
    for pair, j in got.items():
        assert pair in exact and exact[pair] == j
