"""Partition-layout independence of tie-breaks (VERDICT r1 item 9).

The reference's "stable by position" contracts (pick_best_path
policy_finder.py:346-363, state upsert order state.py:134-228) must hold as
*data*, not as accidental partition order: repartitioning an input N ways
must never change which equal-priority document or which same-key row wins.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from icrawler_spark.crawl.state import merge_seen, resolve_entry_identity
from icrawler_spark.search import build_search_index

_PARTS = (1, 3, 7)


def _entries(spark):
    return spark.createDataFrame(
        [("e1", "t", 1, "标题一", ""), ("e2", "t", 2, "标题二", "")],
        "entry_id string, task string, serial int, title string, remark string",
    )


def test_best_path_stable_under_repartition(spark):
    """Two equal-priority (pdf) docs per entry: the one with the smaller
    discovery position must win in every partition layout."""
    docs = spark.createDataFrame(
        [
            ("e1", "http://x/z-late.pdf", "pdf", "a", 7),
            ("e1", "http://x/a-early.pdf", "pdf", "b", 3),
            ("e2", "http://x/m2.pdf", "pdf", "c", 20),
            ("e2", "http://x/a1.pdf", "pdf", "d", 10),
        ],
        "entry_id string, url string, doc_type string, title string, _src_pos long",
    )
    results = []
    for n in _PARTS:
        idx = build_search_index(_entries(spark), docs.repartition(n))
        results.append(sorted((r.entry_id, r.best_path) for r in idx.collect()))
    assert results[0] == [("e1", "http://x/a-early.pdf"), ("e2", "http://x/a1.pdf")]
    assert all(r == results[0] for r in results)


def test_best_path_fallback_without_pos_is_deterministic(spark):
    """No _src_pos column: lowest URL among the top priority tier wins —
    a pure function of row content, identical in every layout."""
    docs = spark.createDataFrame(
        [("e1", "http://x/b.pdf", "pdf", "a"), ("e1", "http://x/a.pdf", "pdf", "b")],
        "entry_id string, url string, doc_type string, title string",
    )
    picks = {
        build_search_index(_entries(spark), docs.repartition(n))
        .where(F.col("entry_id") == "e1")
        .collect()[0]
        .best_path
        for n in _PARTS
    }
    assert picks == {"http://x/a.pdf"}


def test_merge_seen_without_pos_stable_under_repartition(spark):
    """A batch lacking _src_pos twice-mentions one url with different titles:
    the winner must be the same in every partition layout."""
    batch = spark.createDataFrame(
        [
            ("http://x/1", "e1", "title-A", "pdf", False, None),
            ("http://x/1", "e2", "title-B", "pdf", False, None),
            ("http://x/2", "e3", "only", "html", True, "p"),
        ],
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string",
    )
    outs = [
        sorted(tuple(r) for r in merge_seen(None, batch.repartition(n)).collect())
        for n in _PARTS
    ]
    assert all(o == outs[0] for o in outs)
    assert len(outs[0]) == 2


def test_resolve_entry_identity_stable_under_repartition(spark):
    """The explode→join-back key is content-derived, so identity assignment
    survives any repartition of either input."""
    new = spark.createDataFrame(
        [
            ("t", "http://x/p1", 0, 1, "甲", "", [("html", "http://x/d1.html", "a")]),
            ("t", "http://x/p1", 1, 2, "乙", "", [("pdf", "http://x/d2.pdf", "b")]),
            ("t", "http://x/p2", 0, 3, "丙", "", []),
        ],
        "task string, page_url string, entry_pos int, serial int, title string, "
        "remark string, documents array<struct<doc_type:string,url:string,title:string>>",
    )
    existing = spark.createDataFrame(
        [("prior-entry", "http://x/d2.pdf")], "entry_id string, url string"
    )
    outs = []
    for n in _PARTS:
        got = resolve_entry_identity(new.repartition(n), existing.repartition(n))
        outs.append(sorted((r.page_url, r.entry_pos, r.entry_id) for r in got.collect()))
    assert all(o == outs[0] for o in outs)
    by_key = {(p, i): e for p, i, e in outs[0]}
    assert by_key[("http://x/p1", 1)] == "prior-entry"  # adopted identity
    assert by_key[("http://x/p1", 0)] == "http://x/d1.html"  # derived from html doc
    assert by_key[("http://x/p2", 0)] == "丙::"  # title::remark fallback
