"""Dup-cluster consolidation: connected components + representative pick.

The oracle gate (tests/test_oracle_parity.py covers ``dup_clusters``) checks
Spark vs DuckDB on the real corpus; these tests pin the component algorithm
itself against a brute-force union-find on adversarial graph shapes the
corpus may not contain."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from icrawler_spark.queries.clusterops import connected_components, dup_clusters
from tests.conftest import SF_DIR


def _uf_labels(edges):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {v: find(v) for v in parent}


def _cc(spark, edges):
    df = spark.createDataFrame(edges, "a long, b long")
    return {(r.doc_id, r.cluster_id) for r in connected_components(df).collect()}


def test_cc_basic_shapes(spark):
    edges = [(1, 2), (2, 3), (3, 4),          # chain
             (10, 11), (11, 12), (12, 10),     # cycle
             (20, 21), (20, 22), (20, 23),     # star
             (30, 31)]                         # pair
    want = {(v, c) for v, c in _uf_labels(edges).items()}
    assert _cc(spark, edges) == want


def test_cc_matches_union_find_on_random_graph(spark):
    """200 nodes, random sparse edges + one long shuffled chain: labels must
    equal brute-force union-find exactly (min-id canonical)."""
    rng = random.Random(11)
    ids = list(range(1000, 1200))
    rng.shuffle(ids)
    edges = [(ids[i], ids[i + 1]) for i in range(0, 180, 2)]  # pairs
    edges += [(ids[rng.randrange(200)], ids[rng.randrange(200)]) for _ in range(60)]
    edges = [(a, b) for a, b in edges if a != b]
    want = {(v, c) for v, c in _uf_labels(edges).items()}
    assert _cc(spark, edges) == want


def test_cc_duplicate_and_reversed_edges(spark):
    edges = [(5, 6), (6, 5), (5, 6), (6, 7), (7, 5)]
    assert _cc(spark, edges) == {(5, 5), (6, 5), (7, 5)}


def test_dup_clusters_invariants(spark):
    """On the real sf0.001 corpus: cluster_id is the min member, the
    representative belongs to the cluster, n_members is consistent, and
    every document appears exactly once."""
    rows = dup_clusters(spark, SF_DIR).collect()
    n_docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    )
    assert len(rows) == n_docs
    by_cluster: dict = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    assert sum(len(v) for v in by_cluster.values()) == n_docs
    multi = 0
    for cid, members in by_cluster.items():
        ids = {m.doc_id for m in members}
        assert cid == min(ids)
        reps = {m.rep_doc_id for m in members}
        assert len(reps) == 1 and reps.pop() in ids
        assert {m.n_members for m in members} == {len(members)}
        if len(members) > 1:
            multi += 1
    assert multi > 0, "sf0.001 contains planted dups; expected multi-doc clusters"


def test_dup_clusters_plan_has_no_cartesian(spark):
    plan = dup_clusters(spark, SF_DIR)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan and "BroadcastNestedLoopJoin" not in plan
