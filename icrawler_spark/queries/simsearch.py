"""Similarity search over the ``embeddings`` table (64-dim float vectors).

Brute-force cosine top-k as the correctness baseline, random-hyperplane LSH
bucketing as the scale path, embedding-cosine near-dup pairs, and exact
per-label centroids.

Float determinism: every reduction is a *sequential left fold* (Spark
``F.aggregate`` / DuckDB ``list_reduce``) over vectors cast to double, so both
engines execute the identical sequence of IEEE-754 ops and produce
bit-identical doubles — no tolerance needed in the oracle compare.

Scale notes (100 TB / 10^10 vectors): brute-force KNN is a broadcast of the
query side against a full scan (fine for few queries); the LSH path turns ANN
into an equi-join on an 8-bit (configurable) bucket key, and centroids are one
hash aggregation. The hyperplanes come from a deterministic LCG so executors
regenerate them locally — nothing random, nothing shipped.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from .common import load

_DIM = 64
_N_PLANES = 8
_LCG_M = 2147483648  # 2^31


def _vec(col="embedding"):
    return F.col(col).cast("array<double>")


def _fold_sum(arr):
    """Sequential left fold — the determinism primitive."""
    return F.aggregate(arr, F.lit(0.0), lambda s, x: s + x)


def _dot(a, b):
    return _fold_sum(F.zip_with(a, b, lambda x, y: x * y))


def _cosine(a, b):
    """NULL (not an ANSI DIVIDE_BY_ZERO throw) for zero-norm vectors: a NULL
    cosine sorts last under desc ordering and fails every >= threshold, so
    degenerate vectors drop out of top-k and dup-pair results instead of
    killing the job. The SQL twin mirrors with an explicit CASE (DuckDB
    would return inf, not error)."""
    return F.try_divide(_dot(a, b), F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b)))


# DuckDB twins: products via index transform (1-based), sequential list_reduce.
_DOT_SQL = (
    "list_reduce(list_prepend(0.0, list_transform(range(1, {n}), i -> {a}[i] * {b}[i])), (s, x) -> s + x)"
)


def _dot_sql(a, b):
    return _DOT_SQL.format(a=a, b=b, n=_DIM + 1)


def _cosine_sql(a, b):
    den = f"(sqrt({_dot_sql(a, a)}) * sqrt({_dot_sql(b, b)}))"
    return f"(CASE WHEN {den} = 0 THEN NULL ELSE {_dot_sql(a, b)} / {den} END)"


_VEC_SQL = "CAST({c} AS DOUBLE[])"


def knn_brute_force(spark, sf_dir):
    """Brute-force cosine top-k: query vector (vec_id=0) broadcast against
    the full table; TakeOrderedAndProject keeps only k rows per partition.
    SURVEY §2.6 top-k pattern on the embedding axis."""
    e = load(spark, sf_dir, "embeddings")
    q = e.where(F.col("vec_id") == 0).select(_vec().alias("qv"))
    return (
        e.where(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(_vec(), F.col("qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(10)
    )


KNN_BRUTE_FORCE_SQL = f"""
SELECT vec_id, {_cosine_sql('v', 'qv')} AS cosine
FROM (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings WHERE vec_id <> 0),
     (SELECT {_VEC_SQL.format(c='embedding')} AS qv FROM embeddings WHERE vec_id = 0)
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""


def _lsh_bucket(vec):
    """8 deterministic LCG hyperplanes → sign bits → bucket id ∈ [0, 256).

    plane[j][d] = lcg(j·64+d)/2^31 − 0.5 with lcg(k) = (1103515245·k+12345)
    mod 2^31 — exact BIGINT arithmetic then exact power-of-two division, so
    the plane values are bit-identical everywhere they are regenerated.
    """
    def plane_dot(j):
        prods = F.transform(
            F.sequence(F.lit(1), F.lit(_DIM)),
            lambda i: F.element_at(vec, i.cast("int"))
            * (((F.lit(1103515245).cast("long") * (j * _DIM + (i - 1)) + 12345) % _LCG_M) / float(_LCG_M) - 0.5),
        )
        return _fold_sum(prods)

    bits = F.transform(
        F.sequence(F.lit(0), F.lit(_N_PLANES - 1)),
        lambda j: F.when(plane_dot(j) > 0, F.pow(F.lit(2.0), j).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    return F.aggregate(bits, F.lit(0).cast("long"), lambda s, x: s + x)


_LSH_BUCKET_SQL = f"""
list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(range(0, {_N_PLANES}), j ->
  CASE WHEN list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}),
         i -> v[i] * (((1103515245 * (j * {_DIM} + (i - 1)) + 12345) % {_LCG_M}) / {_LCG_M}.0 - 0.5))),
       (s, x) -> s + x) > 0
  THEN (CAST(1 AS BIGINT) << j) ELSE CAST(0 AS BIGINT) END)), (s, x) -> s + x)
"""


def lsh_buckets(spark, sf_dir):
    """ANN index build: every vector → its LSH bucket (the shuffle key of
    the scale path)."""
    e = load(spark, sf_dir, "embeddings")
    return e.select("vec_id", _lsh_bucket(_vec()).alias("bucket"))


LSH_BUCKETS_SQL = f"""
SELECT vec_id, {_LSH_BUCKET_SQL} AS bucket
FROM (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings)
"""


def ann_lsh_topk_from_vectors(e, query_vec_id=0, k=10):
    """Multi-probe ANN core over ``(vec_id, v, bucket)`` rows.

    The QUERY probes its 8-bit bucket plus the 8 single-bit flips (9 keys —
    the same block-and-flip pattern the ``cosine_dup_pairs`` recall fix
    used): every vector whose sign vector differs from the query's in ≤ 1
    plane is a candidate, and only candidates pay the exact-cosine re-rank.
    The probe table is 9 rows carrying the query vector — a broadcast — so
    the scan side never shuffles and each candidate matches at most one
    probe key (probes are distinct, a vector has one bucket): no dedup pass.

    Measured recall@10 vs ``knn_brute_force`` (tests/test_dedup_scale.py,
    deterministic corpora so the numbers are exact): **0.86 mean** over 10
    queries with planted neighbors at cosine ∈ [0.985, 0.999] — matching
    the analytic P(Hamming ≤ 1) ≈ 0.93 per neighbor with per-query
    correlation — and **0.175 mean** on the unstructured sf0.001
    embeddings, where "top-10" means cosine ≈ 0.4 (θ ≈ 66°, per-bit
    agreement ≈ 0.63, P(Hamming ≤ 1) ≈ 0.15: the measured value IS the
    theory value). Like IVF, hyperplane-LSH recall is a property of the
    DATA: it finds genuinely-near neighbors; on corpora whose nearest
    neighbors are not near, use ``knn_brute_force``. The single-bucket
    variant this replaces measured 0.58 planted / 0.045 unstructured on the
    same corpora (VERDICT r3 item 8).

    ROUTING: this is NOT the default ANN operator. ``ivf_kmeans_topk``
    measures label-free recall@10 **0.945** on the same unstructured
    embeddings (learned centroids adapt to the data; fixed hyperplanes
    cannot) at comparable cost — reach for hyperplane-LSH only when an
    index must be built in one streaming pass with no training stage
    (bucketing is a stateless per-row expression) or when the corpus is
    known to contain genuinely-near targets (dedup-grade cosine ≥ 0.98,
    where this measures ≥ 0.86). The bench promotes ``ivf_kmeans_topk``
    as the headline ANN query accordingly."""
    probes = F.concat(
        F.array(F.col("bucket")),
        F.transform(
            F.sequence(F.lit(0), F.lit(_N_PLANES - 1)),
            lambda j: F.col("bucket").bitwiseXOR(F.pow(F.lit(2.0), j).cast("long")),
        ),
    )
    q = (
        e.where(F.col("vec_id") == query_vec_id)
        .select(F.col("v").alias("qv"), F.explode(probes).alias("probe"))
    )
    return (
        e.where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("probe"))
        .select("vec_id", _cosine(F.col("v"), F.col("qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ann_lsh_topk(spark, sf_dir):
    """ANN query via multi-probe LSH — see ``ann_lsh_topk_from_vectors``
    (including its ROUTING note: ``ivf_kmeans_topk`` is the default ANN
    operator; this one exists for its train-free streaming-index niche)."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _vec().alias("v"), _lsh_bucket(_vec()).alias("bucket")
    )
    return ann_lsh_topk_from_vectors(e)


ANN_LSH_TOPK_SQL = f"""
WITH withb AS (
  SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket
  FROM (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings)
),
qp AS (
  SELECT v AS qv,
         unnest(list_prepend(bucket, list_transform(range(0, {_N_PLANES}),
                j -> xor(bucket, CAST(1 AS BIGINT) << j)))) AS probe
  FROM withb WHERE vec_id = 0
)
SELECT a.vec_id, {_cosine_sql('a.v', 'q.qv')} AS cosine
FROM withb a JOIN qp q ON a.bucket = q.probe
WHERE a.vec_id <> 0
ORDER BY cosine DESC, a.vec_id ASC
LIMIT 10
"""


def cosine_dup_pairs_from_vectors(e):
    """Multi-probe LSH near-dup core over ``(vec_id, v, bucket)`` rows.

    The probe side emits its 8-bit bucket PLUS the 8 single-bit flips
    (9 keys/row — the block-and-flip pattern of
    ``textops.simhash_pairs_from_signatures``), so any pair whose sign
    vectors differ in ≤ 1 plane is a candidate. At cosine = 0.99
    (θ ≤ 8.1°) each bit agrees with p ≈ 1 − 8.1/180 ≈ 0.955, so recall is
    P(Hamming ≤ 1) = p⁸ + 8p⁷(1−p) ≈ 0.95 at the threshold and higher
    above it — vs ≈ 0.69 for the exact-bucket join this replaces
    (VERDICT r2 item 1). The probes of one row are 9 distinct values and
    the other side keeps its single bucket, so each unordered pair matches
    at most one probe key — no dedup pass needed. Still a pure equi-join
    on the bucket key (9× fanout on one side), never a self-cross; only
    candidates pay the exact-cosine verify."""
    probes = F.concat(
        F.array(F.col("bucket")),
        F.transform(
            F.sequence(F.lit(0), F.lit(_N_PLANES - 1)),
            lambda j: F.col("bucket").bitwiseXOR(F.pow(F.lit(2.0), j).cast("long")),
        ),
    )
    a = e.select("vec_id", "v", F.explode(probes).alias("probe")).alias("a")
    b = e.alias("b")
    return (
        a.join(b, (F.col("a.probe") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("vec_a"),
            F.col("b.vec_id").alias("vec_b"),
            _cosine(F.col("a.v"), F.col("b.v")).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.99)
    )


def cosine_dup_pairs(spark, sf_dir):
    """Embedding-cosine near-dup: pairs with cosine ≥ 0.99, candidates from
    multi-probe (1-bit-flip) random-hyperplane LSH — see
    ``cosine_dup_pairs_from_vectors``. The DuckDB oracle mirrors the probe
    semantics exactly; measured recall vs brute force is asserted in
    tests/test_dedup_scale.py."""
    e = load(spark, sf_dir, "embeddings").select(
        "vec_id", _vec().alias("v"), _lsh_bucket(_vec()).alias("bucket")
    )
    return cosine_dup_pairs_from_vectors(e)


COSINE_DUP_SQL = f"""
WITH e AS (
  SELECT vec_id, v, {_LSH_BUCKET_SQL} AS bucket
  FROM (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings)
),
p AS (
  SELECT vec_id, v,
         unnest(list_prepend(bucket, list_transform(range(0, {_N_PLANES}),
                j -> xor(bucket, CAST(1 AS BIGINT) << j)))) AS probe
  FROM e
)
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, {_cosine_sql('a.v', 'b.v')} AS cosine
FROM p a JOIN e b ON a.probe = b.bucket AND a.vec_id < b.vec_id
WHERE {_cosine_sql('a.v', 'b.v')} >= 0.99
"""


_CENTROID_CHUNK = 4096  # ids per level-1 fold chunk


def label_centroids_from_vectors(e, chunk: int = _CENTROID_CHUNK):
    """Exact deterministic centroids via a TWO-LEVEL fixed-fan-in fold.

    Level 1 folds each ``(label, vec_id // chunk)`` group sequentially in
    vec_id order; level 2 folds the chunk partial sums in chunk order. The
    chunk key comes from the vec_id DOMAIN — no per-label window, no
    requirement that one label's vectors colocate: level-1 buffers hold at
    most ``chunk`` vectors, and a label owning 90% of a 10^10-row table
    aggregates through ~10^10/4096 bounded partials instead of one
    executor-killing group (VERDICT r2 item 9). The fold order is pinned on
    both levels, so results are deterministic and engine-identical; a label
    that fits one chunk degenerates to ``0.0 + flat_fold`` — bit-identical
    to the single-level fold it replaces.

    e: (label, vec_id, v array<double>) rows."""
    chunked = e.withColumn("_ck", (F.col("vec_id") / chunk).cast("long"))
    lvl1 = chunked.groupBy("label", "_ck").agg(
        F.array_sort(F.collect_list(F.struct("vec_id", F.col("v")))).alias("vs"),
        F.count(F.lit(1)).alias("cn"),
    )
    psum = F.transform(
        F.sequence(F.lit(1), F.lit(_DIM)),
        lambda i: F.aggregate(
            F.col("vs"), F.lit(0.0), lambda s, x: s + F.element_at(x["v"], i.cast("int"))
        ),
    )
    lvl2 = lvl1.select("label", "_ck", "cn", psum.alias("psum")).groupBy("label").agg(
        F.array_sort(F.collect_list(F.struct("_ck", F.col("psum")))).alias("chunks"),
        F.sum("cn").cast("long").alias("n"),
    )
    centroid = F.transform(
        F.sequence(F.lit(1), F.lit(_DIM)),
        lambda i: F.aggregate(
            F.col("chunks"),
            F.lit(0.0),
            lambda s, c: s + F.element_at(c["psum"], i.cast("int")),
        )
        / F.col("n"),
    )
    return (
        lvl2.select("label", "n", F.posexplode(centroid).alias("dim0", "value"))
        .select("label", "n", (F.col("dim0") + 1).cast("long").alias("dim"), "value")
    )


def label_centroids(spark, sf_dir):
    """(label, dim, value) exact centroids — see
    ``label_centroids_from_vectors`` for the two-level fold contract."""
    e = load(spark, sf_dir, "embeddings").select("label", "vec_id", _vec().alias("v"))
    return label_centroids_from_vectors(e)


_CENTROID_SQL_TEMPLATE = f"""
  WITH ranked AS (
    SELECT label, vec_id, vec_id // {_CENTROID_CHUNK} AS ck,
           {_VEC_SQL.format(c='embedding')} AS v
    FROM embeddings
  ),
  l1 AS (
    SELECT label, ck, cn,
           list_transform(range(1, {_DIM + 1}), i ->
             list_reduce(list_prepend(0.0, list_transform(vs, x -> x[i])), (s, y) -> s + y)) AS psum
    FROM (SELECT label, ck, list(v ORDER BY vec_id) AS vs, COUNT(*) AS cn
          FROM ranked GROUP BY label, ck)
  ),
  g AS (
    SELECT label, CAST(cn AS BIGINT) AS n,
           list_transform(range(1, {_DIM + 1}), i ->
             list_reduce(list_prepend(0.0, list_transform(ps, p -> p[i])), (s, y) -> s + y)) AS tot
    FROM (SELECT label, list(psum ORDER BY ck) AS ps, SUM(cn) AS cn FROM l1 GROUP BY label)
  )
"""


LABEL_CENTROIDS_SQL = f"""{_CENTROID_SQL_TEMPLATE}
SELECT label, n, i AS dim, tot[i] / n AS value
FROM g, (SELECT unnest(range(1, {_DIM + 1})) AS i)
"""


QUERIES = {
    "knn_brute_force": (knn_brute_force, KNN_BRUTE_FORCE_SQL),
    "lsh_buckets": (lsh_buckets, LSH_BUCKETS_SQL),
    "ann_lsh_topk": (ann_lsh_topk, ANN_LSH_TOPK_SQL),
    "cosine_dup_pairs": (cosine_dup_pairs, COSINE_DUP_SQL),
    "label_centroids": (label_centroids, LABEL_CENTROIDS_SQL),
}


def _centroid_vectors_df(vecs):
    """(c_label, cvec) — exact label centroids re-assembled as vectors; the
    k-row table every IVF stage broadcasts. ``vecs``: (label, vec_id,
    v:array<double>)."""
    return (
        label_centroids_from_vectors(vecs)
        .groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "value"))).alias("cv"))
        .select(
            F.col("label").alias("c_label"),
            F.transform(F.col("cv"), lambda x: x["value"]).alias("cvec"),
        )
    )


def _embedding_vecs(spark, sf_dir):
    return load(spark, sf_dir, "embeddings").select(
        "label", "vec_id", _vec().alias("v")
    )


def ivf_assign_df(vecs):
    """DataFrame-core of ``ivf_assign`` (injectable for recall tests)."""
    cent = _centroid_vectors_df(vecs)
    pairs = vecs.select("vec_id", "v").crossJoin(F.broadcast(cent))
    d2 = _fold_sum(F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)))
    w = pairs.select("vec_id", "c_label", d2.alias("d2"))
    from pyspark.sql import Window

    pick = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("c_label"))
    return (
        w.withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select("vec_id", F.col("c_label").alias("assigned_label"), "d2")
    )


def ivf_assign(spark, sf_dir):
    """IVF coarse quantization: every vector assigned to its nearest
    (deterministic) label centroid by squared L2 — the index-build step of
    IVF-flat ANN. At scale the centroid table is broadcast (k entries) and
    assignment is one map-side join; here centroids come from the exact
    sequential-fold computation in ``label_centroids``."""
    return ivf_assign_df(_embedding_vecs(spark, sf_dir))


IVF_ASSIGN_SQL = f"""{_CENTROID_SQL_TEMPLATE},
cent AS (
  SELECT label AS c_label,
         list_transform(range(1, {_DIM + 1}), i -> tot[i] / n) AS cvec
  FROM g
),
pairs AS (
  SELECT e.vec_id, c.c_label,
         list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}),
           i -> (v[i] - cvec[i]) * (v[i] - cvec[i]))), (s, x) -> s + x) AS d2
  FROM (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings) e, cent c
)
SELECT vec_id, c_label AS assigned_label, d2 FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY d2 ASC, c_label ASC) AS rn
  FROM pairs
) WHERE rn = 1
"""

QUERIES["ivf_assign"] = (ivf_assign, IVF_ASSIGN_SQL)


_IVF_NPROBE = 2


def ivf_topk_df(vecs, query_vec_id=0, nprobe=_IVF_NPROBE, k=10):
    """DataFrame-core of ``ivf_topk``: query probes its ``nprobe`` nearest
    centroids, candidates are the vectors assigned to those centroids, and
    only the candidates pay an exact cosine re-rank."""
    cent = _centroid_vectors_df(vecs)
    q = vecs.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    qd2 = _fold_sum(F.zip_with(F.col("qv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)))
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select("c_label", qd2.alias("qd2"))
        .orderBy(F.asc("qd2"), F.asc("c_label"))
        .limit(nprobe)
        .select(F.col("c_label").alias("assigned_label"))
    )
    cand_ids = (
        ivf_assign_df(vecs)
        .where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(probes), "assigned_label", "left_semi")
        .select("vec_id")
    )
    return (
        vecs.join(cand_ids, "vec_id", "left_semi")
        .crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("v"), F.col("qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_topk(spark, sf_dir):
    """IVF-flat ANN **search** (the query-side complement of ``ivf_assign``):
    the query vector probes its ``_IVF_NPROBE`` nearest centroids, candidates
    are the vectors assigned to those centroids, and only the candidates pay
    an exact cosine re-rank (top-10, same output contract as
    ``knn_brute_force``).

    Scale shape (10^10 vectors): centroids (k rows) and the query's probe set
    (nprobe rows) are driver-small broadcasts; the candidate filter is a
    broadcast semi-join on ``assigned_label``, so the only full-table work is
    the one-off assignment — on a real deployment the vector table is
    *stored* partitioned by assigned_label (IVF list files) and the probe
    reads just those partitions, which is exactly the partition-pruning this
    equi-join expresses. The re-rank is TakeOrderedAndProject over ~n/k ×
    nprobe rows, not n.

    Recall contract — IVF recall is a property of the DATA, not just the
    index: on clusterable vectors (neighbors share coarse cells) recall@10 is
    ≥ 0.9 with nprobe=2 (measured on planted clusters,
    tests/test_centroids.py); on the synthetic ``embeddings`` table, whose
    labels carry no geometric signal (same-label avg cosine ≈ 0.004 ≈
    cross-label), no coarse quantizer can beat recall ≈ nprobe/k — measured
    0.3-0.4 here. For unstructured corpora use ``knn_brute_force`` /
    ``ann_lsh_topk``, or train centroids on the vectors (k-means) rather
    than on an unrelated label column."""
    return ivf_topk_df(_embedding_vecs(spark, sf_dir))


IVF_TOPK_SQL = f"""{_CENTROID_SQL_TEMPLATE},
cent AS (
  SELECT label AS c_label,
         list_transform(range(1, {_DIM + 1}), i -> tot[i] / n) AS cvec
  FROM g
),
ev AS (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings),
q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
probes AS (
  SELECT c_label
  FROM cent, q
  ORDER BY list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}),
    i -> (qv[i] - cvec[i]) * (qv[i] - cvec[i]))), (s, x) -> s + x) ASC, c_label ASC
  LIMIT {_IVF_NPROBE}
),
assign AS (
  SELECT vec_id, c_label AS assigned_label FROM (
    SELECT e.vec_id, c.c_label,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY
             list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}),
               i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), (s, x) -> s + x) ASC,
             c.c_label ASC) AS rn
    FROM ev e, cent c
  ) WHERE rn = 1
)
SELECT e.vec_id, {_cosine_sql('e.v', 'q.qv')} AS cosine
FROM ev e, q
WHERE e.vec_id <> 0
  AND e.vec_id IN (SELECT vec_id FROM assign
                   WHERE assigned_label IN (SELECT c_label FROM probes))
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""

QUERIES["ivf_topk"] = (ivf_topk, IVF_TOPK_SQL)


# --- deterministic k-means IVF (VERDICT r3 item 2) -----------------------------
#
# ``ivf_assign``/``ivf_topk`` quantize on the label column — which carries no
# geometric signal on this corpus, so their recall is honest-but-weak. The
# k-means quantizer below earns IVF recall from the VECTORS alone:
# fixed-iteration Lloyd's with a seeded, order-pinned init (the vector with
# min vec_id in each ``vec_id % k`` stratum), centroids recomputed each round
# via the same two-level exact fold as ``label_centroids`` — everything
# deterministic and engine-exact, so the DuckDB oracle unrolls the identical
# iterations and the hash gate is value-exact, no tolerance.

_KMEANS_K = 8
_KMEANS_ITERS = 4
_KMEANS_NPROBE = 6


def _assign_to_centroids(vecs, cent):
    """(vec_id, v) × (cluster_id, cvec) → nearest-centroid assignment by
    squared L2, ties to the smaller cluster_id. The centroid table is k rows
    — broadcast; one map-side pass over the vectors."""
    pairs = vecs.select("vec_id", "v").crossJoin(F.broadcast(cent))
    d2 = _fold_sum(F.zip_with(F.col("v"), F.col("cvec"), lambda a, b: (a - b) * (a - b)))
    pick = Window.partitionBy("vec_id").orderBy(F.asc("d2"), F.asc("cluster_id"))
    return (
        pairs.select("vec_id", "v", "cluster_id", d2.alias("d2"))
        .withColumn("_rn", F.row_number().over(pick))
        .where(F.col("_rn") == 1)
        .select("vec_id", "v", "cluster_id")
    )


def _mean_centroids(assigned):
    """Exact per-cluster means via the two-level fold (bit-identical to
    ``label_centroids_from_vectors`` with cluster_id as the label)."""
    means = label_centroids_from_vectors(
        assigned.select(F.col("cluster_id").alias("label"), "vec_id", "v")
    )
    return (
        means.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "value"))).alias("cv"))
        .select(
            F.col("label").alias("cluster_id"),
            F.transform(F.col("cv"), lambda x: x["value"]).alias("cvec"),
        )
    )


def kmeans_centroids_df(vecs, k=_KMEANS_K, iters=_KMEANS_ITERS):
    """Deterministic Lloyd's: ``iters`` fixed rounds, no convergence check
    (a data-dependent round count would make the plan nondeterministic).
    Empty-cluster rule: a cluster that loses all members keeps its previous
    centroid. Each round is one broadcast-assign pass + one two-level-fold
    aggregation, pinned — the ``link_pagerank`` iteration pattern. Returns
    (cluster_id, cvec)."""
    w = Window.partitionBy("_j").orderBy("vec_id")
    cent = (
        vecs.withColumn("_j", (F.col("vec_id") % k).cast("long"))
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(F.col("_j").alias("cluster_id"), F.col("v").alias("cvec"))
        .localCheckpoint(eager=True)
    )
    for _ in range(iters):
        assigned = _assign_to_centroids(vecs, cent)
        new = _mean_centroids(assigned)
        cent = (
            cent.select("cluster_id", F.col("cvec").alias("_prev"))
            .join(new, "cluster_id", "left")
            .select("cluster_id", F.coalesce("cvec", "_prev").alias("cvec"))
            .localCheckpoint(eager=True)
        )
    return cent


def ivf_kmeans(spark, sf_dir):
    """K-means IVF index build: the final centroids (exploded to one row per
    dimension, with final cluster sizes) after ``_KMEANS_ITERS`` Lloyd
    rounds on the raw vectors — no label column anywhere. Scale shape: each
    round broadcasts k centroid rows and makes one map-side pass + one
    fixed-fan-in aggregation over the vectors; 4 rounds = 4 bounded passes,
    never an all-pairs anything."""
    vecs = load(spark, sf_dir, "embeddings").select("vec_id", _vec().alias("v"))
    cent = kmeans_centroids_df(vecs)
    sizes = (
        _assign_to_centroids(vecs, cent)
        .groupBy("cluster_id")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    return (
        cent.join(sizes, "cluster_id", "left")
        .select(
            "cluster_id",
            F.coalesce("n", F.lit(0)).alias("n"),
            F.posexplode("cvec").alias("dim0", "value"),
        )
        .select("cluster_id", "n", (F.col("dim0") + 1).cast("long").alias("dim"), "value")
    )


def _kmeans_sql_prefix(k=_KMEANS_K, iters=_KMEANS_ITERS):
    """Unrolled-CTE oracle for the fixed-iteration Lloyd loop (the
    ``link_pagerank`` oracle pattern): it0 = order-pinned init, then per
    round an assignment CTE + a chunked two-level-fold mean CTE + an
    empty-cluster coalesce CTE — exactly the Spark semantics, value-exact."""
    d2 = (
        "list_reduce(list_prepend(0.0, list_transform(range(1, {n}), "
        "i -> (e.v[i] - c.cvec[i]) * (e.v[i] - c.cvec[i]))), (s, x) -> s + x)"
    ).format(n=_DIM + 1)
    parts = [
        f"ev AS (SELECT vec_id, {_VEC_SQL.format(c='embedding')} AS v FROM embeddings)",
        f"""it0 AS (
  SELECT cluster_id, cvec FROM (
    SELECT vec_id % {k} AS cluster_id, v AS cvec,
           ROW_NUMBER() OVER (PARTITION BY vec_id % {k} ORDER BY vec_id) AS rn
    FROM ev
  ) WHERE rn = 1
)""",
    ]
    for t in range(1, iters + 1):
        prev = f"it{t - 1}"
        parts.append(f"""a{t} AS (
  SELECT vec_id, v, cluster_id FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cluster_id ASC) AS rn
    FROM ev e, {prev} c
  ) WHERE rn = 1
)""")
        parts.append(f"""m{t} AS (
  SELECT cluster_id,
         list_transform(range(1, {_DIM + 1}), i ->
           list_reduce(list_prepend(0.0, list_transform(ps, p -> p[i])), (s, y) -> s + y) / n) AS cvec
  FROM (
    SELECT cluster_id, list(psum ORDER BY ck) AS ps, SUM(cn) AS n
    FROM (
      SELECT cluster_id, ck, cn,
             list_transform(range(1, {_DIM + 1}), i ->
               list_reduce(list_prepend(0.0, list_transform(vs, x -> x[i])), (s, y) -> s + y)) AS psum
      FROM (SELECT cluster_id, vec_id // {_CENTROID_CHUNK} AS ck,
                   list(v ORDER BY vec_id) AS vs, COUNT(*) AS cn
            FROM a{t} GROUP BY cluster_id, vec_id // {_CENTROID_CHUNK})
    ) GROUP BY cluster_id
  )
)""")
        parts.append(
            f"it{t} AS (SELECT i.cluster_id, COALESCE(m.cvec, i.cvec) AS cvec "
            f"FROM {prev} i LEFT JOIN m{t} m USING (cluster_id))"
        )
    # final assignment against the final centroids (sizes / candidate lists)
    parts.append(f"""afin AS (
  SELECT vec_id, v, cluster_id FROM (
    SELECT e.vec_id, e.v, c.cluster_id,
           ROW_NUMBER() OVER (PARTITION BY e.vec_id ORDER BY {d2} ASC, c.cluster_id ASC) AS rn
    FROM ev e, it{iters} c
  ) WHERE rn = 1
)""")
    return "WITH " + ",\n".join(parts)


IVF_KMEANS_SQL = f"""{_kmeans_sql_prefix()}
SELECT c.cluster_id, CAST(COALESCE(s.n, 0) AS BIGINT) AS n, i AS dim, c.cvec[i] AS value
FROM it{_KMEANS_ITERS} c
LEFT JOIN (SELECT cluster_id, COUNT(*) AS n FROM afin GROUP BY cluster_id) s USING (cluster_id),
     (SELECT unnest(range(1, {_DIM + 1})) AS i)
"""

QUERIES["ivf_kmeans"] = (ivf_kmeans, IVF_KMEANS_SQL)


def ivf_kmeans_topk_df(vecs, query_vec_id=0, nprobe=_KMEANS_NPROBE, k=10):
    """K-means IVF search core: probe the query's ``nprobe`` nearest
    centroids, re-rank that candidate fraction by exact cosine."""
    cent = kmeans_centroids_df(vecs)
    q = vecs.where(F.col("vec_id") == query_vec_id).select(F.col("v").alias("qv"))
    qd2 = _fold_sum(F.zip_with(F.col("qv"), F.col("cvec"), lambda a, b: (a - b) * (a - b)))
    probes = (
        cent.crossJoin(F.broadcast(q))
        .select("cluster_id", qd2.alias("qd2"))
        .orderBy(F.asc("qd2"), F.asc("cluster_id"))
        .limit(nprobe)
        .select("cluster_id")
    )
    cand = (
        _assign_to_centroids(vecs, cent)
        .where(F.col("vec_id") != query_vec_id)
        .join(F.broadcast(probes), "cluster_id", "left_semi")
    )
    return (
        cand.crossJoin(F.broadcast(q))
        .select("vec_id", _cosine(F.col("v"), F.col("qv")).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("vec_id"))
        .limit(k)
    )


def ivf_kmeans_topk(spark, sf_dir):
    """IVF-flat ANN search over LEARNED (k-means) centroids — the completion
    of the ANN story the label quantizer couldn't give (``ivf_topk``
    docstring): no label column is read anywhere.

    Recall is still a property of the data geometry: on clusterable vectors
    nprobe=2 of 8 gives recall@10 ≥ 0.9 at ~25% scan
    (tests/test_centroids.py); on THIS corpus — near-uniform on the sphere,
    k-means inertia only 0.998 → 0.927 at k=8 — hitting the same 0.9 needs
    nprobe=6 of 8 (~75% scan; measured mean recall@10 = 0.945 over 20
    queries, gated in tests/test_centroids.py). That cost curve is the
    honest IVF contract: the quantizer can only exploit structure that
    exists. Scale shape identical to ``ivf_topk``: broadcast centroids +
    probe list, candidate semi-join ≈ partition pruning over IVF list
    files, TakeOrderedAndProject re-rank."""
    vecs = load(spark, sf_dir, "embeddings").select("vec_id", _vec().alias("v"))
    return ivf_kmeans_topk_df(vecs)


IVF_KMEANS_TOPK_SQL = f"""{_kmeans_sql_prefix()},
q AS (SELECT v AS qv FROM ev WHERE vec_id = 0),
probes AS (
  SELECT cluster_id
  FROM it{_KMEANS_ITERS} c, q
  ORDER BY list_reduce(list_prepend(0.0, list_transform(range(1, {_DIM + 1}),
    i -> (qv[i] - c.cvec[i]) * (qv[i] - c.cvec[i]))), (s, x) -> s + x) ASC, cluster_id ASC
  LIMIT {_KMEANS_NPROBE}
)
SELECT e.vec_id, {_cosine_sql('e.v', 'q.qv')} AS cosine
FROM ev e, q
WHERE e.vec_id <> 0
  AND e.vec_id IN (SELECT vec_id FROM afin
                   WHERE cluster_id IN (SELECT cluster_id FROM probes))
ORDER BY cosine DESC, vec_id ASC
LIMIT 10
"""

QUERIES["ivf_kmeans_topk"] = (ivf_kmeans_topk, IVF_KMEANS_TOPK_SQL)
