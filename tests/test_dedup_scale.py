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


# --- measured-recall harness (VERDICT r2 items 1-2) ---------------------------
#
# The hash-gated oracles replicate the engine's own bucketing, so they cannot
# see recall losses. These tests measure recall against brute-force ground
# truth and assert the documented contract numerically.

import numpy as np

from icrawler_spark.queries.simsearch import (
    _N_PLANES,
    _lsh_bucket,
    cosine_dup_pairs_from_vectors,
)


def _planes_np():
    """NumPy twin of the deterministic LCG hyperplanes in ``_lsh_bucket``."""
    k = np.arange(_N_PLANES * 64).reshape(_N_PLANES, 64)
    return ((1103515245 * k + 12345) % (1 << 31)) / float(1 << 31) - 0.5


def _bucket_np(v, P):
    return int(sum((1 << j) for j in range(_N_PLANES) if P[j] @ v > 0))


def _with_buckets(spark, rows):
    e = spark.createDataFrame(rows, "vec_id long, v array<double>")
    return e.withColumn("bucket", _lsh_bucket(F.col("v")))


def test_cosine_multi_probe_finds_one_bit_flip_pair(spark):
    """A cosine ≥ 0.99 pair whose 8-bit buckets differ in EXACTLY one bit:
    invisible to the exact-bucket equi-join (the r2 recall hole, measured
    0.69), found by the 1-bit-flip multi-probe."""
    P = _planes_np()
    rng = np.random.RandomState(7)
    planted = None
    for _ in range(200):
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        d = P @ v
        j = int(np.argmin(np.abs(d)))
        n = P[j]
        w = v - 2.0001 * d[j] * n / (n @ n)  # reflect across the closest plane
        b1, b2 = _bucket_np(v, P), _bucket_np(w, P)
        cos = v @ w / (np.linalg.norm(v) * np.linalg.norm(w))
        if bin(b1 ^ b2).count("1") == 1 and cos >= 0.995:
            planted = (v, w, b1, b2)
            break
    assert planted is not None
    v, w, b1, b2 = planted
    e = _with_buckets(spark, [(0, v.tolist()), (1, w.tolist())])
    # the numpy plane twin must agree with the engine's bucket function
    got_buckets = {r.vec_id: r.bucket for r in e.collect()}
    assert got_buckets == {0: b1, 1: b2}
    pairs = cosine_dup_pairs_from_vectors(e).collect()
    assert [(r.vec_a, r.vec_b) for r in pairs] == [(0, 1)]


def test_cosine_dup_measured_recall_vs_brute_force(spark):
    """300 planted pairs at cosine ∈ [0.9905, 0.9995]: multi-probe recall
    must be ≥ 0.95 vs brute-force ground truth (the analytic bound is
    p⁸ + 8p⁷(1−p) ≈ 0.95 at the 0.99 threshold itself), and every emitted
    pair must be a true pair (exact-cosine verify ⇒ perfect precision)."""
    rng = np.random.RandomState(42)
    rows, truth = [], set()
    vid = 0
    for _ in range(300):
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        g = rng.randn(64)
        g -= (g @ v) * v
        g /= np.linalg.norm(g)
        c = 0.9905 + 0.009 * rng.rand()
        w = c * v + np.sqrt(1 - c * c) * g  # exact cosine(v, w) = c
        rows.append((vid, v.tolist()))
        rows.append((vid + 1, w.tolist()))
        truth.add((vid, vid + 1))
        vid += 2
    got = {
        (r.vec_a, r.vec_b)
        for r in cosine_dup_pairs_from_vectors(_with_buckets(spark, rows)).collect()
    }
    recall = len(got & truth) / len(truth)
    assert recall >= 0.95, f"measured recall {recall:.3f} < 0.95"
    # precision: anything extra must still be a true cosine ≥ 0.99 pair
    vecs = dict(rows)
    for a, b in got - truth:
        va, vb = np.array(vecs[a]), np.array(vecs[b])
        assert va @ vb / (np.linalg.norm(va) * np.linalg.norm(vb)) >= 0.99 - 1e-9


def _exact_jaccard_pairs(spark):
    from icrawler_spark.queries.common import load
    from icrawler_spark.queries.textops import _shingles

    sh = load(spark, SF_DIR, "documents").select(
        "doc_id", _shingles(F.col("text")).alias("sh")
    )
    a, b = sh.alias("a"), sh.alias("b")
    inter = F.size(F.array_intersect(F.col("a.sh"), F.col("b.sh"))).cast("long")
    union = (F.size("a.sh") + F.size("b.sh")).cast("long") - inter
    return {
        (r.doc_a, r.doc_b)
        for r in a.join(b, F.col("a.doc_id") < F.col("b.doc_id"))
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            (inter / union).alias("jaccard"),
        )
        .where(F.col("jaccard") >= 0.8)
        .collect()
    }


def test_ngram_jaccard_measured_recall(spark):
    """LSH-candidate recall vs brute-force J ≥ 0.8 ground truth on sf0.001
    must meet the documented band contract (≥ 0.92; measured 1.0 — every
    planted near-dup found). Catches any future band/perm regression the
    oracle hash-gate cannot see."""
    exact = _exact_jaccard_pairs(spark)
    assert exact, "sf0.001 documents contain planted near-dups"
    got = {(r.doc_a, r.doc_b) for r in ngram_jaccard_pairs(spark, SF_DIR).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.92, f"measured recall {recall:.3f} < documented 0.92"


def test_ann_lsh_topk_measured_recall(spark):
    """Multi-probe ``ann_lsh_topk`` recall@10 vs brute-force ground truth,
    on both corpus classes (deterministic seeds ⇒ exact numbers):

    - planted neighbors at cosine ∈ [0.985, 0.999]: mean 0.86 over 10
      queries (single-bucket measured 0.58 on the same corpus);
    - the unstructured sf0.001 embeddings, whose "nearest" neighbors sit at
      cosine ≈ 0.4: mean 0.175 over 20 queries — the analytic
      P(Hamming ≤ 1) ≈ 0.15 value, documented as a data property
      (single-bucket: 0.045).
    """
    from icrawler_spark.queries.simsearch import _vec, ann_lsh_topk_from_vectors

    rng = np.random.RandomState(11)
    n_bg, n_q, k = 2000, 10, 10
    rows, queries, vid = [], [], 0
    bg = rng.randn(n_bg, 64)
    bg /= np.linalg.norm(bg, axis=1, keepdims=True)
    for i in range(n_bg):
        rows.append((vid, bg[i].tolist()))
        vid += 1
    for _ in range(n_q):
        v = rng.randn(64)
        v /= np.linalg.norm(v)
        qid = vid
        rows.append((qid, v.tolist()))
        vid += 1
        for _ in range(k):
            g = rng.randn(64)
            g -= (g @ v) * v
            g /= np.linalg.norm(g)
            c = 0.985 + 0.014 * rng.rand()
            w = c * v + np.sqrt(1 - c * c) * g
            rows.append((vid, w.tolist()))
            vid += 1
        queries.append(qid)

    def recall_over(e, ids, V, qids, k=10):
        Vn = V / np.linalg.norm(V, axis=1, keepdims=True)
        rec = []
        for qid in qids:
            qv = Vn[ids == qid][0]
            cos = Vn @ qv
            mask = ids != qid
            bf = {int(x) for _, x in sorted(zip(-cos[mask], ids[mask]))[:k]}
            got = {
                r.vec_id
                for r in ann_lsh_topk_from_vectors(e, query_vec_id=qid, k=k).collect()
            }
            rec.append(len(bf & got) / k)
        return sum(rec) / len(rec)

    e = _with_buckets(spark, rows).localCheckpoint(eager=True)
    mean_planted = recall_over(
        e, np.array([r[0] for r in rows]), np.array([r[1] for r in rows]), queries, k
    )
    assert mean_planted >= 0.85, f"planted recall {mean_planted:.3f} < 0.85"

    e2 = (
        spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
        .select("vec_id", _vec().alias("v"), _lsh_bucket(_vec()).alias("bucket"))
        .localCheckpoint(eager=True)
    )
    r2 = e2.select("vec_id", "v").collect()
    mean_flat = recall_over(
        e2, np.array([r.vec_id for r in r2]), np.array([r.v for r in r2]),
        list(range(20)),
    )
    # honest data-property gate: ≈ the analytic 0.15, far above the 0.045
    # the exact-bucket join measured — a probe regression would drop this
    assert mean_flat >= 0.15, f"unstructured recall {mean_flat:.3f} < 0.15"


def test_minhash_lsh_measured_recall(spark):
    """Every true J ≥ 0.8 pair must surface in minhash_lsh_pairs (band hit
    prob ≥ 0.92 at the J=0.8 threshold; measured 1.0 on sf0.001)."""
    from icrawler_spark.queries.textops import minhash_lsh_pairs

    exact = _exact_jaccard_pairs(spark)
    assert exact
    got = {(r.doc_a, r.doc_b) for r in minhash_lsh_pairs(spark, SF_DIR).collect()}
    recall = len(got & exact) / len(exact)
    assert recall >= 0.92, f"measured recall {recall:.3f} < documented 0.92"


def test_repeated_span_stats_arbitrary_offset(spark, tmp_path):
    """ExactSubstr semantics: a 30-token block embedded at a DIFFERENT
    offset inside another document must be caught window-for-window —
    this is exactly what aligned-chunk paragraph_dedup cannot see."""
    from icrawler_spark.queries.textops import _SPAN_TOKENS, repeated_span_stats

    k = _SPAN_TOKENS
    base = " ".join(f"w{i}" for i in range(30))
    uniq = " ".join(f"u{i}" for i in range(30))
    shifted = " ".join(f"x{i}" for i in range(5)) + " " + uniq + " " + " ".join(
        f"y{i}" for i in range(5)
    )
    docs = [(1, base), (2, base), (3, "too short"), (4, uniq), (5, shifted)]
    sdf = spark.createDataFrame(docs, "doc_id long, text string")
    sdf.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in repeated_span_stats(spark, str(tmp_path)).collect()}

    n30 = 30 - k + 1  # windows in a 30-token doc
    # identical docs: every window duplicated
    assert (out[1].n_spans, out[1].n_dup_spans, out[1].dup_span_fraction) == (n30, n30, 1.0)
    assert out[2].n_dup_spans == n30
    # sub-span docs emit nothing and keep a NULL fraction
    assert (out[3].n_spans, out[3].n_dup_spans, out[3].dup_span_fraction) == (0, 0, None)
    # the embedded block: all of doc 4's windows recur inside doc 5 at
    # offset +5; doc 5's duplicated windows are exactly those lying fully
    # inside the block (starts 6..26), while boundary-straddling ones stay
    # unique
    assert (out[4].n_spans, out[4].n_dup_spans) == (n30, n30)
    assert (out[5].n_spans, out[5].n_dup_spans) == (40 - k + 1, 30 - k + 1)
