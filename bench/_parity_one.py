"""Dev helper: run one registry query on Spark AND its DuckDB oracle at
sf0.001 and diff exactly like the driver's order-insensitive hash.
Usage: python bench/_parity_one.py name [name ...]
"""
import math
import os
import sys

import duckdb

from icrawler_spark.queries import all_oracles, all_queries
from icrawler_spark.session import get_spark

SF = os.environ.get("PARITY_SF", "/root/testdata/sf0.001")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def canon(v):
    if v is None:
        return "∅"
    if isinstance(v, float):
        return "nan" if math.isnan(v) else repr(v)
    return repr(v)


def canon_rows(cols, rows):
    idx = sorted(range(len(cols)), key=lambda i: cols[i])
    return sorted(tuple(canon(r[i]) for i in idx) for r in rows)


def main():
    spark = get_spark(app_name="parity-one", master="local[8]")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    qs, os_ = all_queries(), all_oracles()
    bad = 0
    for name in sys.argv[1:]:
        sdf = qs[name](spark, SF)
        s_cols = [c.lower() for c in sdf.columns]
        s_rows = [tuple(r) for r in sdf.collect()]
        res = con.execute(os_[name])
        d_cols = [c[0].lower() for c in res.description]
        d_rows = res.fetchall()
        ok_cols = sorted(s_cols) == sorted(d_cols)
        s_c, d_c = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
        ok = ok_cols and s_c == d_c
        print(f"{name}: cols={ok_cols} rows {len(s_rows)}/{len(d_rows)} "
              f"match={ok}")
        if not ok:
            bad += 1
            if not ok_cols:
                print("  spark cols:", s_cols, " duck cols:", d_cols)
            for a, b in list(zip(s_c, d_c))[:2000]:
                if a != b:
                    print("  spark:", a)
                    print("  duck :", b)
                    break
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
