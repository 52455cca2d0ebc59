"""Two-level centroid fold: scale shape + exactness (VERDICT r2 item 9).

label_centroids no longer collects one label's full vector list into a
single aggregation buffer: level 1 folds bounded ``vec_id // chunk`` groups,
level 2 folds the chunk partials in chunk order. These tests pin (a) the
numeric contract — exactly the two-level fold, verified against a numpy twin
with identical grouping, bit-for-bit — and (b) the plan shape — aggregation
keyed by (label, chunk) before the per-label aggregate, so a label holding
90% of all vectors never funnels through one group."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from icrawler_spark.queries.simsearch import _DIM, label_centroids_from_vectors


def _skewed_rows(n=1000, hot=900, seed=5):
    rng = np.random.RandomState(seed)
    return [
        (
            int(i),
            "big" if i < hot else f"s{i % 7}",
            (rng.randn(8).tolist() + [0.0] * (_DIM - 8)),
        )
        for i in range(n)
    ]


def test_two_level_fold_matches_numpy_twin_bitwise(spark):
    rows = _skewed_rows()
    e = spark.createDataFrame(rows, "vec_id long, label string, v array<double>")
    got = (
        label_centroids_from_vectors(e, chunk=64)
        .where(F.col("label") == "big")
        .orderBy("dim")
        .collect()
    )
    vecs = {i: np.array(v) for i, label, v in rows if label == "big"}
    chunks: dict = {}
    for i in sorted(vecs):
        chunks.setdefault(i // 64, []).append(vecs[i])
    psums = [np.add.reduce([np.zeros(_DIM)] + chunks[k]) for k in sorted(chunks)]
    tot = np.zeros(_DIM)
    for p in psums:
        tot = tot + p
    want = tot / len(vecs)
    assert got[0].n == len(vecs)
    assert np.array_equal(np.array([r.value for r in got]), want)  # bit-exact


def test_plan_aggregates_by_chunk_before_label(spark):
    """The physical plan must carry a (label, _ck)-keyed aggregate feeding
    the per-label aggregate — the shape that bounds every level-1 buffer at
    `chunk` vectors regardless of label skew."""
    e = spark.createDataFrame(_skewed_rows(200), "vec_id long, label string, v array<double>")
    plan = (
        label_centroids_from_vectors(e, chunk=64)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    import re

    keysets = [
        m.group(1)
        for ln in plan.splitlines()
        if "Aggregate" in ln
        for m in [re.search(r"keys=\[([^\]]*)\]", ln)]
        if m
    ]
    assert any("_ck" in k and "label" in k for k in keysets), keysets
    assert any("_ck" not in k and "label" in k for k in keysets), keysets


def test_single_chunk_label_equals_flat_fold(spark):
    """A label whose ids fit one chunk must produce the SAME doubles as the
    flat sequential fold (0.0 + x prefix is exact) — the oracle-compat
    guarantee at corpus scales below the chunk size."""
    rng = np.random.RandomState(9)
    rows = [(int(i), "l", (rng.randn(8).tolist() + [0.0] * (_DIM - 8))) for i in range(50)]
    e = spark.createDataFrame(rows, "vec_id long, label string, v array<double>")
    got = label_centroids_from_vectors(e, chunk=4096).orderBy("dim").collect()
    flat = np.zeros(_DIM)
    for i, _l, v in rows:
        flat = flat + np.array(v)
    want = flat / len(rows)
    assert np.array_equal(np.array([r.value for r in got]), want)


# --- IVF-probed ANN search (r3): recall measured where IVF's assumption holds


def _clustered_rows(n_per=60, k=8, seed=11):
    """Planted clusters whose label IS the geometric cell — the data regime
    IVF is built for (centers ~N(0,25)·√64 apart, noise σ=0.3)."""
    rng = np.random.RandomState(seed)
    centers = rng.randn(k, _DIM) * 5.0
    rows, vid = [], 0
    for c in range(k):
        for _ in range(n_per):
            v = centers[c] + rng.randn(_DIM) * 0.3
            rows.append((vid, f"c{c}", v.tolist()))
            vid += 1
    return rows


def test_ivf_topk_measured_recall_on_clusterable_data(spark):
    """recall@10 vs numpy brute force must be ≥ 0.9 on planted clusters
    (docstring contract; the unstructured-embeddings floor of ≈ nprobe/k is
    documented, not asserted — no quantizer can beat it there)."""
    from icrawler_spark.queries.simsearch import ivf_topk_df

    rows = _clustered_rows()
    e = spark.createDataFrame(rows, "vec_id long, label string, v array<double>")
    got = {r.vec_id for r in ivf_topk_df(e).collect()}

    vecs = np.array([v for _i, _l, v in rows])
    q = vecs[0]
    cos = (vecs @ q) / (np.linalg.norm(vecs, axis=1) * np.linalg.norm(q))
    order = [i for i in np.argsort(-cos) if i != 0]
    truth = set(order[:10])
    recall = len(got & truth) / 10
    assert recall >= 0.9, f"measured IVF recall {recall:.2f} < 0.9 on clusterable data"


def test_ivf_topk_nprobe_2_reaches_second_cell(spark):
    """A true neighbor in the query's SECOND-nearest cell is found (the case
    nprobe=1 structurally misses): query sits between two planted centers,
    its nearest neighbor lives in the other cell."""
    from icrawler_spark.queries.simsearch import ivf_topk_df

    rng = np.random.RandomState(3)
    c0, c1 = rng.randn(_DIM) * 5.0, rng.randn(_DIM) * 5.0
    rows = [(0, "a", (0.55 * c0 + 0.45 * c1).tolist()),  # query, lands in cell a
            (1, "b", (0.50 * c0 + 0.50 * c1).tolist())]  # its nearest, cell b
    vid = 2
    for c, lab in ((c0, "a"), (c1, "b")):
        for _ in range(30):
            rows.append((vid, lab, (c + rng.randn(_DIM) * 0.2).tolist()))
            vid += 1
    e = spark.createDataFrame(rows, "vec_id long, label string, v array<double>")
    got = [r.vec_id for r in ivf_topk_df(e).collect()]
    assert got[0] == 1, got
