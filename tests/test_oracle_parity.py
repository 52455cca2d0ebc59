"""Mirror of the driver's correctness gate: every oracle-backed query in the
registry runs on Spark AND DuckDB over the same parquet, and the results must
match exactly — row count, column names, and values (after sorting columns by
name and rows by value, like the driver's order-insensitive hash)."""

from __future__ import annotations

import math

import duckdb
import pytest

from icrawler_spark.queries import all_oracles, all_queries
from tests.conftest import SF_DIR

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def _canon(val):
    if val is None:
        return "∅"
    if isinstance(val, float):
        if math.isnan(val):
            return "nan"
        # exact: both engines must produce bit-identical doubles
        return repr(val)
    return repr(val)


def _canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(_canon(r[i]) for i in idx) for r in rows)


ORACLES = all_oracles()
CASES = sorted(ORACLES)


@pytest.mark.parametrize("name", CASES)
def test_oracle_parity(spark, duck, name):
    q = all_queries()[name]
    sdf = q(spark, SF_DIR)
    s_cols = [c.lower() for c in sdf.columns]
    s_rows = [tuple(r) for r in sdf.collect()]

    res = duck.execute(ORACLES[name])
    d_cols = [c[0].lower() for c in res.description]
    d_rows = res.fetchall()

    assert sorted(s_cols) == sorted(d_cols), f"{name}: columns {s_cols} vs {d_cols}"
    assert len(s_rows) == len(d_rows), f"{name}: rows {len(s_rows)} vs {len(d_rows)}"
    sc = _canon_rows(s_cols, s_rows)
    dc = _canon_rows(d_cols, d_rows)
    mism = [i for i, (a, b) in enumerate(zip(sc, dc)) if a != b][:3]
    assert sc == dc, f"{name}: first mismatches {[(sc[i], dc[i]) for i in mism]}"


def test_rows_only_queries_run(spark):
    """Queries without an oracle still must run and return a stable schema."""
    oracles = ORACLES
    for name, q in sorted(all_queries().items()):
        if name in oracles:
            continue
        df = q(spark, SF_DIR)
        assert df.columns
        assert df.count() >= 0
