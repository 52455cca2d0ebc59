"""Dup-cluster consolidation: connected components over near-dup pairs.

The step every 100 TB dedup pipeline needs after pair generation: the union
of dup-pair outputs (exact md5 groups ∪ MinHash-LSH pairs ∪ SimHash pairs)
forms a graph whose connected components are the duplicate clusters; each
document maps to its cluster (canonical id = min doc_id in the component,
deterministic) and the cluster keeps a best representative by quality score.

Connected components run as alternating large-star / small-star rounds
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14):
every step is an equi-join plus a per-key min aggregation — no driver
adjacency lists, no collect — and converges in O(log n) rounds on any graph
(near-dup clusters are small-diameter, so typically 2-3 rounds). Each round
is checkpointed so the iterative loop never builds a deep lineage.

Oracle: DuckDB recursive-CTE transitive closure over the identical pair
union, then the same min-label + best-representative selection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .common import load
from .textops import (
    MINHASH_LSH_PAIRS_SQL,
    QUALITY_SCORE_SQL,
    SIMHASH_DUP_SQL,
    minhash_lsh_pairs,
    quality_score,
    simhash_dup_pairs,
)

# single source of truth: the same oracle text the quality_score gate uses —
# a formula change in textops reaches this oracle automatically
QUALITY_SUB_SQL = f"SELECT doc_id, quality FROM ({QUALITY_SCORE_SQL})"


def connected_components(edges: DataFrame, max_iter: int = 25) -> DataFrame:
    """Undirected edges ``(a, b)`` → ``(doc_id, cluster_id)`` where
    cluster_id is the minimum node id of the component (deterministic
    regardless of execution order). Nodes not in any edge are absent —
    callers coalesce singletons to their own id.

    Alternating star rounds until the edge set reaches a fixpoint (stars
    pointing at each component's minimum). Convergence is checked with a
    count + order-independent hash checksum per round."""
    from pyspark.sql import Observation

    def _pin_with_checksum(df, name):
        """Eager-pin edges and read (count, xor-hash) off the SAME action:
        the convergence check rides the checkpoint job instead of paying a
        separate per-round scan (bit_xor of xxhash64 is order-independent
        and overflow-free since edges are distinct)."""
        obs = Observation(name)
        pinned = df.observe(
            obs,
            F.count(F.lit(1)).alias("n"),
            F.coalesce(F.bit_xor(F.xxhash64("a", "b")), F.lit(0)).alias("h"),
        ).localCheckpoint(eager=True)
        m = obs.get
        return pinned, (int(m["n"]), int(m["h"]))

    e, prev = _pin_with_checksum(
        edges.select(F.col("a").cast("long"), F.col("b").cast("long"))
        .where(F.col("a") != F.col("b"))
        .distinct(),
        "cc_init",
    )
    nodes = (
        e.select(F.col("a").alias("doc_id"))
        .union(e.select(F.col("b").alias("doc_id")))
        .distinct()
        .localCheckpoint(eager=True)
    )

    def _sym(df):
        return df.union(df.select(F.col("b").alias("a"), F.col("a").alias("b")))

    for it in range(max_iter):
        # large-star: every neighbor larger than u links to u's min
        sym = _sym(e)
        mins = sym.groupBy("a").agg(F.min("b").alias("_mb"))
        m = F.least(F.col("a"), F.col("_mb"))
        large = (
            sym.join(mins, "a")
            .where(F.col("b") > F.col("a"))
            .select(F.col("b").alias("a"), m.alias("b"))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: downward edges (b ≤ a) collapse onto the local min
        sym2 = _sym(large)
        down = sym2.where(F.col("b") <= F.col("a"))
        mins2 = down.groupBy("a").agg(F.min("b").alias("_mb"))
        m2 = F.least(F.col("a"), F.col("_mb"))
        p1 = (
            down.join(mins2, "a")
            .where(F.col("b") != m2)
            .select(F.col("b").alias("a"), m2.alias("b"))
        )
        p2 = mins2.where(F.col("a") != m2).select("a", m2.alias("b"))
        e, cur = _pin_with_checksum(
            p1.union(p2).where(F.col("a") != F.col("b")).distinct(), f"cc_{it}"
        )
        if cur == prev:
            break
        prev = cur
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iter} rounds")

    # fixpoint edges are stars (non-min → component min)
    labels = e.groupBy("a").agg(F.min("b").alias("cluster_id")).select(
        F.col("a").alias("doc_id"), "cluster_id"
    )
    return (
        nodes.join(labels, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
    )


def _dup_edges(spark, sf_dir) -> DataFrame:
    """Union of the three documents-table dup-pair generators as edges.

    Each pair source is pinned once: the union feeds the CC loop's initial
    distinct + checkpoint, and without per-source pins an AQE re-plan or
    retry of that first materialization would re-derive all three generator
    pipelines (hash/band joins over the full corpus) instead of re-reading
    three small pair tables (VERDICT r3 item 5)."""
    d = load(spark, sf_dir, "documents")
    h = d.select("doc_id", F.md5("text").alias("h"))
    canon = h.groupBy("h").agg(F.min("doc_id").alias("m"))
    exact = (
        h.join(canon, "h")
        .where(F.col("doc_id") != F.col("m"))
        .select(F.col("doc_id").alias("a"), F.col("m").alias("b"))
        .localCheckpoint(eager=True)
    )
    mh = minhash_lsh_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).localCheckpoint(eager=True)
    sh = simhash_dup_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("a"), F.col("doc_b").alias("b")
    ).localCheckpoint(eager=True)
    # NOTE: running the three pins as concurrent driver-thread jobs was
    # measured SLOWER on a 32-thread local box (63.6 s vs 36.5 s interleaved
    # A/B at sf0.1) — each 32-partition stage already saturates the box, so
    # concurrency only added scheduler/GC contention. Sequential pins win.
    return exact.union(mh).union(sh)


def dup_clusters(spark, sf_dir):
    """Every document → (cluster_id, rep_doc_id, n_members): the
    consolidation map a dedup pipeline applies after pair generation.
    Representative = highest quality score in the cluster, ties broken by
    min doc_id; singletons are their own cluster and representative."""
    d = load(spark, sf_dir, "documents")
    labels = connected_components(_dup_edges(spark, sf_dir))
    lab = (
        d.select("doc_id")
        .join(labels, "doc_id", "left")
        .select("doc_id", F.coalesce("cluster_id", F.col("doc_id")).alias("cluster_id"))
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    labq = lab.join(q, "doc_id")
    w = Window.partitionBy("cluster_id").orderBy(F.desc("quality"), F.asc("doc_id"))
    rep = (
        labq.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("cluster_id", F.col("doc_id").alias("rep_doc_id"))
    )
    size = lab.groupBy("cluster_id").agg(F.count(F.lit(1)).alias("n_members"))
    return (
        lab.join(rep, "cluster_id")
        .join(size, "cluster_id")
        .select("doc_id", "cluster_id", "rep_doc_id", "n_members")
    )


DUP_CLUSTERS_SQL = f"""
WITH RECURSIVE mh AS ({MINHASH_LSH_PAIRS_SQL.strip()}),
shp AS ({SIMHASH_DUP_SQL.strip()}),
exact_e AS (
  SELECT d.doc_id AS doc_a, c.m AS doc_b
  FROM (SELECT doc_id, md5(text) AS h FROM documents) d
  JOIN (SELECT md5(text) AS h, MIN(doc_id) AS m FROM documents GROUP BY 1) c USING (h)
  WHERE d.doc_id <> c.m
),
edges0 AS (
  SELECT doc_a AS a, doc_b AS b FROM mh
  UNION SELECT doc_a, doc_b FROM shp
  UNION SELECT doc_a, doc_b FROM exact_e
),
edges AS (SELECT a, b FROM edges0 UNION SELECT b AS a, a AS b FROM edges0),
reach(u, v) AS (
  SELECT a, a FROM (SELECT DISTINCT a FROM edges)
  UNION
  SELECT r.u, e.b FROM reach r JOIN edges e ON r.v = e.a
),
labels AS (SELECT u AS doc_id, MIN(v) AS cluster_id FROM reach GROUP BY u),
lab AS (
  SELECT d.doc_id, COALESCE(l.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN labels l USING (doc_id)
),
q AS ({QUALITY_SUB_SQL}),
ranked AS (
  SELECT lab.cluster_id, lab.doc_id,
         ROW_NUMBER() OVER (PARTITION BY lab.cluster_id
                            ORDER BY q.quality DESC, lab.doc_id ASC) AS rn
  FROM lab JOIN q USING (doc_id)
),
rep AS (SELECT cluster_id, doc_id AS rep_doc_id FROM ranked WHERE rn = 1),
csize AS (SELECT cluster_id, COUNT(*) AS n_members FROM lab GROUP BY cluster_id)
SELECT lab.doc_id, lab.cluster_id, rep.rep_doc_id, csize.n_members
FROM lab JOIN rep USING (cluster_id) JOIN csize USING (cluster_id)
"""


QUERIES = {
    "dup_clusters": (dup_clusters, DUP_CLUSTERS_SQL),
}
