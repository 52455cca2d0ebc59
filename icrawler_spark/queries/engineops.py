"""Engine-path queries for the correctness gate.

These drive the non-relational surfaces (pandas-UDF extraction, the frontier
loop, the search scorer) through the driver's queries() harness:

- ``html_text_extraction`` HAS a DuckDB oracle: wrapping a plain one-line
  text in ``<p>`` and running the full html→text pipeline must return the
  text unchanged (none of the boilerplate/drop rules fire on it), so the
  oracle is the identity projection — any normalization regression breaks
  the hash.
- ``crawl_frontier_round`` / ``search_topk`` are rows-only (non-SQL ops):
  the driver records schema + row count; full semantics are pinned by the
  pytest oracles (tests/test_crawl.py, tests/test_search.py).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import load


def html_text_extraction(spark, sf_dir):
    """documents.text → synthetic html page → textpipe extraction → text.

    Exercises decode_bytes + DOM walk + normalize_html_text inside the
    Arrow-batched applyInPandas path under the driver's value-hash."""
    from ..textpipe.udfs import extract_entry_texts

    d = load(spark, sf_dir, "documents")
    fetched = d.select(
        F.col("doc_id").cast("string").alias("entry_id"),
        F.concat(F.lit("http://docs.test/"), F.col("doc_id").cast("string"), F.lit(".html")).alias("url"),
        F.lit("html").alias("doc_type"),
        F.encode(
            F.concat(F.lit("<html><body><p>"), F.col("text"), F.lit("</p></body></html>")),
            "utf-8",
        ).alias("content"),
        F.lit(0).alias("pos"),
    )
    return extract_entry_texts(fetched).select(
        F.col("entry_id").cast("long").alias("doc_id"),
        F.col("text").alias("extracted"),
        "status",
    )


HTML_TEXT_EXTRACTION_SQL = """
SELECT doc_id, text AS extracted, 'success' AS status FROM documents
"""


def crawl_frontier_round(spark, sf_dir):
    """One full mini-crawl (3 listing pages, 2 entries each): returns the
    visited table in FIFO order — the crawl-order surface as a DataFrame.
    Ignores sf_dir (the site is synthesized deterministically)."""
    from ..crawl import CrawlConfig, CrawlEngine, build_site, site_pages_df

    site = build_site(n_pages=3, entries_per_page=2)
    pages = site_pages_df(spark, site)
    eng = CrawlEngine(
        spark,
        pages,
        CrawlConfig(
            start_url="https://www.example.test/list/index.html",
            max_rounds=10,
            use_bloom=False,
        ),
    )
    eng.run()
    return eng.visited.select("url", "round", "global_pos", "status")


def search_topk(spark, sf_dir):
    """Fuzzy top-k over a deterministic inline policy catalog — the scoring
    expression end-to-end (ref policy_finder.py:1201-1252, 1366-1373)."""
    from ..search import build_search_index, search

    entries = spark.createDataFrame(
        [
            ("e1", "t1", 1, "中国人民银行关于加强支付管理的通知 银发〔2023〕12号", ""),
            ("e2", "t1", 2, "中国人民银行公告〔2021〕第3号 存款利率管理办法", ""),
            ("e3", "t1", 3, "国务院关于金融监管的意见", ""),
            ("e4", "t1", 4, "已废止的旧规定", "已废止"),
        ],
        "entry_id string, task string, serial int, title string, remark string",
    )
    documents = spark.createDataFrame(
        [
            ("e1", "http://x/a.pdf", "pdf", "a"),
            ("e2", "http://x/b.html", "html", "b"),
            ("e3", "http://x/c.docx", "word", "c"),
            ("e4", "http://x/d.pdf", "pdf", "d"),
        ],
        "entry_id string, url string, doc_type string, title string",
    )
    idx = build_search_index(entries, documents)
    return search(idx, "2023年支付管理通知", topk=3).select("entry_id", "title", "score")


QUERIES = {
    "html_text_extraction": (html_text_extraction, HTML_TEXT_EXTRACTION_SQL),
    "crawl_frontier_round": (crawl_frontier_round, None),
    "search_topk": (search_topk, None),
}


def curation_pipeline(spark, sf_dir):
    """The flagship corpus-curation pipeline as an oracle-checked query:
    exact-dedup canonical docs ⋈ per-doc quality → per-(lang, source)
    rollup. Same dataflow as ``__spark_entry__.entry``."""
    from pyspark.sql import functions as F

    from .textops import exact_dedup, quality_score

    docs = load(spark, sf_dir, "documents")
    canon = exact_dedup(spark, sf_dir).select(
        F.col("canonical_doc_id").alias("doc_id"), "n_copies"
    )
    q = quality_score(spark, sf_dir).select("doc_id", "quality")
    return (
        docs.join(canon, "doc_id")
        .join(q, "doc_id")
        .groupBy("lang", "source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_copies").cast("long").alias("n_raw_copies"),
            F.sum(F.round(F.col("quality") * 1e6).cast("long")).alias("quality_sum_micro"),
        )
    )


CURATION_PIPELINE_SQL = """
WITH canon AS (
  SELECT MIN(doc_id) AS doc_id, COUNT(*) AS n_copies
  FROM documents GROUP BY md5(text)
),
q AS (
  SELECT doc_id,
         (n_dist / n_tok) * 2.0 + n_stop / n_tok AS quality
  FROM (
    SELECT doc_id,
           CAST(length(t) AS BIGINT) AS n_tok,
           CAST(length(list_distinct(t)) AS BIGINT) AS n_dist,
           CAST(length(list_filter(t, x -> x IN ('the','a','of','and'))) AS BIGINT) AS n_stop
    FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t FROM documents)
  )
)
SELECT d.lang, d.source, COUNT(*) AS n_docs,
       CAST(SUM(c.n_copies) AS BIGINT) AS n_raw_copies,
       CAST(SUM(CAST(round(q.quality * 1000000) AS BIGINT)) AS BIGINT) AS quality_sum_micro
FROM documents d JOIN canon c USING (doc_id) JOIN q USING (doc_id)
GROUP BY d.lang, d.source
"""

QUERIES["curation_pipeline"] = (curation_pipeline, CURATION_PIPELINE_SQL)
