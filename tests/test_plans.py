"""Physical-plan assertions: the 100 TB scaling contract.

Correctness says WHAT each operator returns; these tests pin HOW Spark
executes it — filter pushdown to parquet, column pruning, broadcast joins
for small dims, TakeOrderedAndProject for top-k, no Python UDF in relational
scan paths. A regression here is a scale bug even when results stay right.
"""

from __future__ import annotations

import pytest

from icrawler_spark.queries.analytics import (
    pricing_summary,
    revenue_by_nation,
    seen_anti_join,
    top_customers_by_revenue,
)
from icrawler_spark.queries.textops import exact_dedup
from tests.conftest import SF_DIR


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _full_explain(df) -> str:
    return df._jdf.queryExecution().toString()


def test_pricing_summary_pushdown_and_pruning(spark):
    df = pricing_summary(spark, SF_DIR)
    plan = _full_explain(df)
    # shipdate filter reaches the parquet scan
    assert "PushedFilters: [IsNotNull(l_shipdate)" in plan or "PushedFilters: [" in plan
    # column pruning: unused columns (l_orderkey etc.) are NOT in ReadSchema
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][-1]
    assert "l_orderkey" not in read_schema
    assert "l_quantity" in read_schema


def test_revenue_by_nation_broadcasts_dims(spark):
    df = revenue_by_nation(spark, SF_DIR)
    plan = _plan(df)
    assert plan.count("BroadcastHashJoin") >= 2  # customer + nation broadcast
    # codegen spans only appear in the AQE-final plan — execute first.
    # compact form prints them as "*(N) Operator"
    df.collect()
    final = _plan(df)
    assert "isFinalPlan=true" in final and "*(" in final


def test_topk_compiles_to_take_ordered(spark):
    plan = _plan(top_customers_by_revenue(spark, SF_DIR))
    assert "TakeOrderedAndProject" in plan  # no global sort materialization


def test_anti_join_is_join_not_filterscan(spark):
    plan = _plan(seen_anti_join(spark, SF_DIR))
    assert "LeftAnti" in plan
    # only the join keys + projected columns are read from orders
    full = _full_explain(seen_anti_join(spark, SF_DIR))
    orders_reads = [
        ln for ln in full.splitlines() if "ReadSchema" in ln and "o_custkey" in ln
    ]
    assert orders_reads and all("o_totalprice" not in ln for ln in orders_reads)


def test_no_python_udf_in_relational_paths(spark):
    for q in (pricing_summary, revenue_by_nation, top_customers_by_revenue, exact_dedup):
        plan = _plan(q(spark, SF_DIR))
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan, q.__name__


def test_no_cartesian_products_in_registry(spark):
    """Suite-wide 100×-scale guard: no registry query may plan a cartesian
    product, and nested-loop joins are allowed only where a 1-row /
    k-row broadcast side is the intended design (KNN query vector, IVF
    centroid table). Catches any future join whose equi-condition Catalyst
    failed to extract."""
    from icrawler_spark.queries import all_queries

    # intentional tiny-side broadcast cross joins: 1-row query vector (KNN),
    # k-row centroid table (IVF), and 1-row global aggregates folded in as
    # scalar sides (run summary, next-serial max, per-status max)
    bnlj_ok = {
        "knn_brute_force",
        "ivf_assign",
        "ivf_topk",
        "ivf_kmeans",        # broadcast of the k=8 centroid table per Lloyd round
        "ivf_kmeans_topk",   # same + the 1-row query vector
        "run_summary",
        "serial_assignment",
        "status_rollup",
    }
    # these two EXECUTE a crawl/search inside the query fn — plan-checked
    # via their own suites instead
    skip = {"crawl_frontier_round", "search_topk"}
    offenders = []
    for name, fn in sorted(all_queries().items()):
        if name in skip:
            continue
        plan = _plan(fn(spark, SF_DIR))
        if "CartesianProduct" in plan:
            offenders.append((name, "CartesianProduct"))
        if "BroadcastNestedLoopJoin" in plan and name not in bnlj_ok:
            offenders.append((name, "BroadcastNestedLoopJoin"))
    assert not offenders, offenders


def test_aqe_enabled(spark):
    assert spark.conf.get("spark.sql.adaptive.enabled") == "true"
    assert spark.conf.get("spark.sql.adaptive.skewJoin.enabled") == "true"
