"""Search index + scoring (ref policy_finder.py).

The reference scores every entry per query with a Python loop
(policy_finder.py:1366-1373, O(N) scan). Here the index is a DataFrame
projection built once (``Entry.build`` → derived columns,
policy_finder.py:515-527) and a query becomes *pure column arithmetic* over
it: the query-side constants (doc_no, years, doctype, agency, phrases,
tokens) are extracted driver-side with the same pure functions and folded in
as literals — a broadcast of the 1-row query side in relational terms.

Scale: the index is a projection of entries ⋈ documents — cacheable,
partition-prunable; top-k compiles to TakeOrderedAndProject (no global sort);
keyword search does the reference's cheap-predicate-first two-phase plan
(title hits short-circuit; only misses join the texts table —
policy_finder.py:1488-1510, SURVEY §4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import native, pure

# best_path priority: text > pdf > docx/doc/word > html (ref policy_finder.py:346-363)
_BEST_PATH_ORDER = {"text": 5, "txt": 5, "pdf": 4, "docx": 3, "doc": 3, "word": 3, "html": 2}


def build_search_index(entries: DataFrame, documents: DataFrame) -> DataFrame:
    """entries(entry_id, task, serial, title, remark) ⋈ documents(entry_id,
    url, doc_type, title) → one row per entry with the reference's derived
    columns (norm_title, doc_no, year, doctype, agency, best_path, tokens,
    is_policy, n_docs).

    ``best_path`` uses the document URL as the path key (this engine keys
    artifacts by URL, not filesystem path — ref pick_best_path used
    local_path, policy_finder.py:346-363).

    The "first document wins among equal priority" contract needs a real
    position column: ``_src_pos`` (the crawl path's discovery position) when
    present, else the URL as a deterministic total order. Never
    ``monotonically_increasing_id`` — it depends on partition layout, so an
    upstream repartition could flip the winner."""
    mapping = sorted(_BEST_PATH_ORDER.items(), key=lambda kv: -kv[1])
    expr = F.when(F.lower(F.col("doc_type")) == mapping[0][0], mapping[0][1])
    for t, p in mapping[1:]:
        expr = expr.when(F.lower(F.col("doc_type")) == t, p)
    expr = expr.otherwise(0)

    if "_src_pos" in documents.columns:
        # highest priority, then earliest discovery position
        pick = F.max_by("url", F.struct(F.col("_prio"), -F.col("_src_pos")))
    else:
        # no position available: lowest URL is the deterministic stand-in
        pick = F.min_by("url", F.struct(-F.col("_prio"), F.col("url")))
    best = (
        documents.withColumn("_prio", expr)
        .groupBy("entry_id")
        .agg(pick.alias("best_path"), F.count(F.lit(1)).alias("n_docs"))
    )
    title = F.coalesce(F.col("title"), F.lit(""))
    remark = F.coalesce(F.col("remark"), F.lit(""))
    norm_title = native.norm_text_ascii(title)
    return (
        entries.join(best, "entry_id", "left")
        .select(
            "entry_id",
            "task",
            "serial",
            "title",
            "remark",
            norm_title.alias("norm_title"),
            F.coalesce(
                native.extract_docno(title), native.extract_docno(remark)
            ).alias("doc_no"),
            # reference parity (policy_finder.py:518-519): findall with a
            # group returns the GROUP — Entry.year is the century prefix
            # ('19'/'20'), so year matching is century matching. Replicated
            # bug-for-bug; the parity test pins it.
            F.regexp_extract(
                F.concat_ws(" ", title, remark), r"(19|20)\d{2}", 1
            ).alias("year"),
            native.guess_doctype(title).alias("doctype"),
            native.guess_agency(title).alias("agency"),
            F.col("best_path"),
            F.coalesce(F.col("n_docs"), F.lit(0)).alias("n_docs"),
            native.tokenize_zh(title).alias("tokens"),
            native.is_probable_policy(title, remark).alias("is_policy"),
        )
    )


def fuzzy_score_col(query: str):
    """The additive score (ref fuzzy_score, policy_finder.py:1201-1252) as a
    Column over the search-index schema. Query-side features computed
    driver-side with the same pure functions the index columns use."""
    qn = pure.norm_text(query)
    q_doc = pure.extract_docno(qn)
    # group-capture findall, like the reference (policy_finder.py:1214):
    # query years are century prefixes too
    q_years = [m for m in __import__("re").findall(r"(19|20)\d{2}", qn)]
    q_doctype = pure.guess_doctype(qn)
    q_agency = pure.guess_agency(qn)
    import re as _re

    phrases = [p for p in _re.findall(r"[一-鿿]{2,}", qn)]
    q_tokens = pure.tokenize_zh(qn)

    score = F.lit(0.0)
    # 1) doc number hard match
    if q_doc:
        flat = q_doc.replace("[", "").replace("]", "")
        flat_doc = F.translate(F.coalesce(F.col("doc_no"), F.lit("")), "[]", "")
        score = score + (
            F.when(F.col("doc_no") == q_doc, 120.0)
            .when(flat_doc.contains(flat), 80.0)
            .otherwise(0.0)
        )
    # 2) year hint
    if q_years:
        score = score + (
            F.when(F.col("year").isin(*q_years), 30.0)
            .when(F.col("year") != "", -5.0)
            .otherwise(0.0)
        )
    # 3) doctype hint
    if q_doctype:
        score = score + F.when(F.col("doctype") == q_doctype, 15.0).otherwise(0.0)
    # 4) agency hint (substring containment either way)
    if q_agency:
        ag = F.coalesce(F.col("agency"), F.lit(""))
        score = score + F.when(
            (ag != "") & (ag.contains(q_agency) | F.lit(q_agency).contains(ag)), 10.0
        ).otherwise(0.0)
    # 5) CJK phrase presence in title
    for ph in phrases:
        score = score + F.when(
            F.col("norm_title").contains(ph), min(8.0, 2.0 + len(ph) * 0.8)
        ).otherwise(0.0)
    # 6) token Jaccard × 40
    if q_tokens:
        qarr = F.array(*[F.lit(t) for t in dict.fromkeys(q_tokens)])
        score = score + 40.0 * native.token_jaccard(F.array_distinct(F.col("tokens")), qarr)
    # 7) exact substring boosts
    score = score + F.when(
        F.col("doc_no").isNotNull() & F.lit(qn).contains(F.col("doc_no")), 30.0
    ).otherwise(0.0)
    score = score + F.when(
        F.col("doctype").isNotNull()
        & F.lit(qn).contains(F.col("doctype"))
        & F.col("title").contains(F.col("doctype")),
        10.0,
    ).otherwise(0.0)
    # 8) pdf best_path preference
    score = score + F.when(
        F.lower(F.coalesce(F.col("best_path"), F.lit(""))).endswith(".pdf"), 3.0
    ).otherwise(0.0)
    return score


def search(index: DataFrame, query: str, topk: int = 10) -> DataFrame:
    """score-all → top-k (ref policy_finder.py:1366-1373) as
    TakeOrderedAndProject."""
    return (
        index.withColumn("score", fuzzy_score_col(query))
        .orderBy(F.desc("score"), F.asc("entry_id"))
        .limit(topk)
    )


def dedupe_search_index(index: DataFrame) -> DataFrame:
    """Cross-task dedup (ref _dedupe_entries policy_finder.py:1310-1337):
    rank by (is_policy, task_priority≈0, doctype∉{通知,公告}, pdf best_path,
    n_docs, entry_id) desc; keep first per doc_no (else norm_title), then
    drop repeated best_path."""
    doctype_score = F.when(
        F.col("doctype").isNotNull() & ~F.col("doctype").isin("通知", "公告"), 1
    ).otherwise(0)
    pdf_score = F.when(
        F.lower(F.coalesce(F.col("best_path"), F.lit(""))).endswith(".pdf"), 1
    ).otherwise(0)
    rank_key = F.struct(
        F.col("is_policy").cast("int").alias("p"),
        doctype_score.alias("d"),
        pdf_score.alias("f"),
        F.col("n_docs").alias("n"),
        F.col("entry_id").alias("i"),
    )
    identity = F.lower(
        F.coalesce(F.nullif(F.trim(F.coalesce(F.col("doc_no"), F.lit(""))), F.lit("")), F.col("norm_title"))
    )
    w1 = Window.partitionBy("_identity").orderBy(F.desc("_rank"))
    w2 = Window.partitionBy("_path_key").orderBy(F.desc("_rank"))
    out = (
        index.withColumn("_identity", identity)
        .withColumn("_rank", rank_key)
        .withColumn("_rn1", F.row_number().over(w1))
        .where(F.col("_rn1") == 1)
        .withColumn("_path_key", F.lower(F.coalesce(F.col("best_path"), F.concat(F.lit("∅"), F.col("entry_id")))))
        .withColumn("_rn2", F.row_number().over(w2))
        .where(F.col("_rn2") == 1)
    )
    return out.drop("_identity", "_rank", "_rn1", "_rn2", "_path_key")


def keyword_search(index: DataFrame, texts: DataFrame | None, query: str) -> DataFrame:
    """Two-phase keyword search (ref policy_finder.py:1473-1516): title
    hits computed cheaply for all entries; only title-miss entries join the
    ``texts`` table for content hits (cheap-predicate-first, SURVEY §4)."""
    qn = pure.norm_text(query)
    tokens = list(dict.fromkeys(pure.tokenize_zh(qn)))
    if not qn and not tokens:
        return index.limit(0).select(
            "entry_id", "title",
            F.lit(0).alias("title_exact"), F.lit(0).alias("title_hits"),
            F.lit(0).alias("content_hits"),
        )
    tok_arr = F.array(*[F.lit(t) for t in tokens]) if tokens else F.array().cast("array<string>")
    title_exact = (
        F.when(F.lit(qn != "") & F.col("norm_title").contains(qn), 1).otherwise(0)
        if qn
        else F.lit(0)
    )
    title_hits = F.size(F.filter(tok_arr, lambda t: F.col("norm_title").contains(t)))
    base = index.select(
        "entry_id", "title", "norm_title",
        title_exact.alias("title_exact"), title_hits.alias("title_hits"),
    )
    hits = base.where((F.col("title_exact") == 1) | (F.col("title_hits") > 0)).withColumn(
        "content_hits",
        F.when(F.lit(len(tokens) > 0), F.col("title_hits"))
        .otherwise(F.col("title_exact")),
    )
    misses = base.where((F.col("title_exact") == 0) & (F.col("title_hits") == 0))
    if texts is not None:
        joined = misses.join(texts.select("entry_id", "text"), "entry_id", "left")
        content_hits = (
            F.when(
                F.lit(len(tokens) > 0),
                F.size(F.filter(tok_arr, lambda t: F.coalesce(F.col("text"), F.lit("")).contains(t))),
            )
            .otherwise(
                F.when(F.coalesce(F.col("text"), F.lit("")).contains(qn), 1).otherwise(0)
            )
        )
        misses = joined.withColumn("content_hits", content_hits).drop("text")
    else:
        misses = misses.withColumn("content_hits", F.lit(0))
    out = hits.unionByName(misses).where(
        (F.col("title_exact") == 1) | (F.col("title_hits") > 0) | (F.col("content_hits") > 0)
    )
    return out.select(
        "entry_id", "title", "title_exact", "title_hits", "content_hits"
    ).orderBy(
        F.desc("title_exact"), F.desc("title_hits"), F.desc("content_hits"), F.asc("title")
    )
