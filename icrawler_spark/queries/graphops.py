"""Link-graph operators for frontier prioritization.

A production crawl scheduler ranks the frontier by link-graph importance
(OPIC / PageRank-style scores are the classic crawl-ordering signal — see
Cho, Garcia-Molina & Page, "Efficient crawling through URL ordering", WWW
1998). The reference crawler's FIFO frontier has no importance signal; this
module adds the operator a 10^10-URL frontier needs: a fixed-iteration
PageRank over the extracted link graph, usable as the priority column of
the frontier table.

Determinism contract: ranks are kept in integer micro-units (1.0 == 10^12)
and every per-edge contribution uses integer floor division, so iteration
results are bit-identical regardless of partitioning / summation order and
the DuckDB oracle reproduces them value-exactly. (Float PageRank would be
order-dependent under distributed summation.)

The graph is derived deterministically from the ``documents`` table (the
testdata has no link columns): node set = doc_id, each node links to
``(a*id + b) mod N`` for three fixed (a, b) pairs — a reproducible sparse
digraph whose size scales with the corpus, the same synthesize-from-table
pattern ``crawl_frontier_round`` uses for its site.

Scale notes (100 TB / 10^10 nodes): each iteration is ONE shuffle — a join
of ranks onto the static (src-partitioned) edge list and a groupBy(dst)
whose partial aggregation combines map-side. The edge list and out-degrees
are computed once and pinned; ranks are localCheckpoint-pinned every few
iterations so the lineage (and thus task re-execution cost under failure)
stays bounded instead of growing linearly with iteration count. On a real
cluster the edges table would be bucketed by src so the per-iteration join
never reshuffles the (much larger) edge side.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load

# rank micro-units: 1.0 == 10^12. damping 0.85 as integer 85/100.
_INIT_MICRO = 1_000_000_000_000
_BASE_MICRO = 150_000_000_000  # (1 - d) * INIT
_EDGE_PAIRS = ((7, 3), (13, 11), (31, 17))
_ITERATIONS = 8
_CHECKPOINT_EVERY = 4


def _edges(docs, n):
    """Deterministic 3-out-regular-ish digraph over doc_ids (dedup'd, so
    out-degree is 1..3 when the (a*i+b) mod N targets coincide)."""
    dsts = F.array(
        *[(F.col("doc_id") * a + b) % n for a, b in _EDGE_PAIRS]
    )
    return (
        docs.select(F.col("doc_id").alias("src"), F.explode(dsts).alias("dst"))
        .distinct()
    )


def pagerank_from_edges(nodes, edges, iterations: int = _ITERATIONS):
    """Fixed-iteration integer PageRank over an arbitrary edge list.

    ``nodes`` is a 1-column DataFrame of node ids, ``edges`` has (src, dst)
    with src/dst drawn from nodes. Returns (node, rank_micro) in exact
    integer micro-units — partition-order independent, so usable directly
    as a ``CrawlEngine(priority_df=...)`` score source after renaming.

    Scale notes: one shuffle per iteration (ranks onto the static pinned
    edge list + map-side-combined groupBy(dst)); lineage pinned every
    _CHECKPOINT_EVERY iterations.
    """
    node_col = nodes.columns[0]
    nodes = nodes.select(F.col(node_col).alias("node"))
    deg = edges.groupBy("src").agg(F.count("*").alias("outdeg"))
    # static per-iteration join side, computed once and pinned
    edges_deg = edges.join(deg, "src").localCheckpoint()

    ranks = nodes.select(
        "node", F.lit(_INIT_MICRO).cast("long").alias("rank_micro")
    )
    for it in range(iterations):
        contribs = (
            edges_deg.join(ranks, edges_deg["src"] == ranks["node"])
            .select(
                F.col("dst"),
                F.expr("(rank_micro * 85) DIV (100 * outdeg)").alias("c"),
            )
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select(
                "node",
                (F.lit(_BASE_MICRO) + F.coalesce(F.col("s"), F.lit(0)))
                .cast("long")
                .alias("rank_micro"),
            )
        )
        if (it + 1) % _CHECKPOINT_EVERY == 0 and it + 1 < iterations:
            ranks = ranks.localCheckpoint()
    return ranks


def link_pagerank(spark, sf_dir):
    """Fixed-iteration integer PageRank over the derived link graph.

    Returns (node, rank_micro): the importance score a frontier scheduler
    would ORDER BY. Exact-integer arithmetic end to end.
    """
    docs = load(spark, sf_dir, "documents").select("doc_id")
    n = docs.count()  # one scalar job; the oracle uses COUNT(*) identically
    return pagerank_from_edges(docs, _edges(docs, n))


def _pagerank_sql() -> str:
    dst_exprs = ", ".join(
        f"(node * {a} + {b}) % (SELECT n FROM nn)" for a, b in _EDGE_PAIRS
    )
    ctes = [
        "nn AS (SELECT COUNT(*) AS n FROM documents)",
        "nodes AS (SELECT doc_id AS node FROM documents)",
        f"edges AS (SELECT DISTINCT node AS src, dst FROM (SELECT node, "
        f"unnest([{dst_exprs}]) AS dst FROM nodes))",
        "deg AS (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src)",
        f"r0 AS (SELECT node, CAST({_INIT_MICRO} AS BIGINT) AS rank_micro "
        "FROM nodes)",
    ]
    for it in range(_ITERATIONS):
        ctes.append(
            f"r{it + 1} AS (SELECT nodes.node, CAST({_BASE_MICRO} + "
            "COALESCE(c.s, 0) AS BIGINT) AS rank_micro FROM nodes "
            "LEFT JOIN (SELECT e.dst AS node, "
            f"SUM((r.rank_micro * 85) // (100 * d.outdeg)) AS s "
            f"FROM r{it} r JOIN edges e ON e.src = r.node "
            "JOIN deg d ON d.src = e.src GROUP BY e.dst) c "
            "ON c.node = nodes.node)"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT node, rank_micro FROM r{_ITERATIONS}"
    )


PAGERANK_SQL = _pagerank_sql()


QUERIES = {
    "link_pagerank": (link_pagerank, PAGERANK_SQL),
}
