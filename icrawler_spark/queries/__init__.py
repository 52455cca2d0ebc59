"""Oracle-checked query registry.

Each submodule exposes ``QUERIES: dict[name, (callable, oracle_sql | None)]``
where the callable has signature ``(spark, sf_dir) -> DataFrame`` and the
oracle is equivalent ANSI SQL for DuckDB over the same parquet tables.

Determinism contract (the driver value-hashes results):
- every output column is explicitly typed long / double / string;
- money sums go through DECIMAL(18,4) (exact) and are cast to double last;
- float reductions run in a defined sequential order (F.aggregate /
  list_reduce) so Spark and DuckDB produce bit-identical doubles;
- no raw timestamps in outputs (formatted as strings);
- every aggregate/computed column is aliased identically on both sides.
"""

from __future__ import annotations

from . import analytics, clusterops, engineops, graphops, simsearch, textops

_MODULES = (analytics, textops, simsearch, clusterops, engineops, graphops)


def all_queries():
    out = {}
    for mod in _MODULES:
        for name, (fn, _sql) in mod.QUERIES.items():
            assert name not in out, f"duplicate query name {name}"
            out[name] = fn
    return out


def all_oracles():
    out = {}
    for mod in _MODULES:
        for name, (_fn, sql) in mod.QUERIES.items():
            if sql is not None:
                out[name] = sql
    return out
