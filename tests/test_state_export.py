"""State JSON export/import parity — golden ported from the reference's
state-roundtrip test (ref tests/test_pbc_monitor.py:562-640)."""

from __future__ import annotations

import json

import pytest

from icrawler_spark.crawl.export import (
    legacy_state_to_entries,
    state_export_df,
    state_export_json,
)
from icrawler_spark.crawl.state import merge_seen


@pytest.fixture()
def state_tables(spark):
    entries = spark.createDataFrame(
        [
            ("eA", "task", 1, "公告A", ""),
            ("eB", "task", 2, "公告B", "备注"),
        ],
        "entry_id string, task string, serial int, title string, remark string",
    )
    documents = spark.createDataFrame(
        [
            ("eA", "http://example.com/a.pdf", "pdf", "公告A"),
            ("eB", "http://example.com/b.pdf", "pdf", "公告B"),
        ],
        "entry_id string, url string, doc_type string, title string",
    )
    seen = spark.createDataFrame(
        [
            ("http://example.com/a.pdf", "eA", "公告A", "pdf", True, "downloads/a.pdf"),
            ("http://example.com/b.pdf", "eB", "公告B", "pdf", True, None),
        ],
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string",
    )
    return entries, documents, seen


def test_state_export_matches_reference_golden(spark, state_tables):
    entries, documents, seen = state_tables
    got = json.loads(state_export_json(entries, documents, seen))
    # exact golden from ref tests/test_pbc_monitor.py:605-635
    assert got == {
        "entries": [
            {
                "serial": 1,
                "title": "公告A",
                "remark": "",
                "documents": [
                    {
                        "type": "pdf",
                        "url": "http://example.com/a.pdf",
                        "title": "公告A",
                        "downloaded": True,
                        "local_path": "downloads/a.pdf",
                    }
                ],
            },
            {
                "serial": 2,
                "title": "公告B",
                "remark": "备注",
                "documents": [
                    {
                        "type": "pdf",
                        "url": "http://example.com/b.pdf",
                        "title": "公告B",
                        "downloaded": True,
                    }
                ],
            },
        ]
    }


def test_export_order_null_serials_last(spark):
    entries = spark.createDataFrame(
        [("e1", "t", None, "乙", ""), ("e2", "t", 5, "甲", ""), ("e3", "t", None, "甲", "")],
        "entry_id string, task string, serial int, title string, remark string",
    )
    documents = spark.createDataFrame(
        [], "entry_id string, url string, doc_type string, title string"
    )
    rows = state_export_df(entries, documents).collect()
    # nulls last; within nulls, title code-point order (乙 U+4E59 < 甲 U+7532)
    assert [(r.serial, r.title) for r in rows] == [(5, "甲"), (None, "乙"), (None, "甲")]


def test_legacy_dict_migration(spark):
    df = legacy_state_to_entries(spark, {
        "http://x/a.pdf": "文件A",
        "http://x/b": "",
    })
    rows = {r.url: r for r in df.collect()}
    assert rows["http://x/a.pdf"].doc_type == "pdf"
    assert rows["http://x/a.pdf"].title == "文件A"
    assert rows["http://x/a.pdf"].downloaded is True
    assert rows["http://x/b"].doc_type == "html"     # no extension → html
    assert rows["http://x/b"].doc_title == "http://x/b"  # empty name → url


def test_legacy_list_migration(spark):
    df = legacy_state_to_entries(spark, ["http://x/c.docx", {"url": "http://x/d.zip", "name": "压缩包"}])
    rows = {r.url: r for r in df.collect()}
    assert rows["http://x/c.docx"].doc_type == "word"
    assert rows["http://x/d.zip"].doc_type == "archive"
    assert rows["http://x/d.zip"].title == "压缩包"


def test_merge_seen_never_unsets_downloaded(spark):
    seen = spark.createDataFrame(
        [("u1", "e1", "t", "pdf", True, "p1")],
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string",
    )
    batch = spark.createDataFrame(
        [("u1", "e1", "t2", "pdf", False, None, 0)],
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string, _src_pos long",
    )
    out = merge_seen(seen, batch).collect()
    assert len(out) == 1
    assert out[0].downloaded is True  # ref state.py:164-172


def test_compact_tables_collapses_shared_urls(spark):
    from icrawler_spark.crawl.state import compact_tables

    entries = spark.createDataFrame(
        [("eA", "t", 1, "甲", ""), ("eB", "t", 2, "甲副本", ""), ("eC", "t", 3, "乙", "")],
        "entry_id string, task string, serial int, title string, remark string",
    )
    documents = spark.createDataFrame(
        [
            ("eA", "http://x/shared.pdf", "pdf", "a"),
            ("eB", "http://x/shared.pdf", "pdf", "a-dup"),   # same url → collapse
            ("eB", "http://x/b.html", "html", "b"),
            ("eC", "http://x/c.pdf", "pdf", "c"),
        ],
        "entry_id string, url string, doc_type string, title string",
    )
    ent2, docs2, m = compact_tables(entries, documents)
    assert m["entries_before"] == 3 and m["entries_after"] == 2
    ids = {r.entry_id for r in ent2.collect()}
    assert ids == {"eA", "eC"}
    docs = {(r.entry_id, r.url) for r in docs2.collect()}
    # eB's documents moved under eA; duplicate (entry,url) collapsed
    assert ("eA", "http://x/shared.pdf") in docs
    assert ("eA", "http://x/b.html") in docs
    assert len([d for d in docs if d[1] == "http://x/shared.pdf"]) == 1


def test_normalize_filenames_maintenance(spark, tmp_path):
    """ref scripts/normalize_filenames.py parity: downloaded files are
    renamed to the canonical structured filename, local_path is updated in
    the entry documents, collisions and missing files are skipped, a .bak
    is written, and dry-run changes nothing."""
    import json
    import os

    from icrawler_spark.crawl.maintenance import apply_normalize_filenames
    from icrawler_spark.functions.pure import structured_filename

    dl = tmp_path / "downloads"
    dl.mkdir()
    # doc 1: wrong name on disk → rename
    (dl / "messy-name.pdf").write_bytes(b"pdf-bytes")
    # docs 2+3: DIFFERENT urls that normalize to the SAME target → second skips
    (dl / "old_b1.doc").write_bytes(b"b1")
    (dl / "old_b2.doc").write_bytes(b"b2")
    # doc 4: already canonical → untouched
    canon4 = structured_filename("https://h.test/ok/file4.html", "html")
    (dl / canon4).write_bytes(b"ok")

    state = {
        "entries": [
            {"title": "甲", "remark": "", "serial": 1, "documents": [
                {"url": "https://h.test/a/doc%201.pdf", "type": "pdf",
                 "downloaded": True, "local_path": "downloads/messy-name.pdf"},
            ]},
            {"title": "乙", "remark": "", "serial": 2, "documents": [
                {"url": "https://h.test/b?x=1", "type": "doc",
                 "downloaded": True, "local_path": "downloads/old_b1.doc"},
                {"url": "https://h.test/b/?x=1", "type": "doc",
                 "downloaded": True, "local_path": "downloads/old_b2.doc"},
            ]},
            {"title": "丙", "remark": "", "serial": 3, "documents": [
                {"url": "https://h.test/ok/file4.html", "type": "html",
                 "downloaded": True, "local_path": f"downloads/{canon4}"},
                {"url": "https://h.test/never.pdf", "type": "pdf",
                 "downloaded": False, "local_path": None},
                {"url": "https://h.test/gone.pdf", "type": "pdf",
                 "downloaded": True, "local_path": "downloads/vanished.pdf"},
            ]},
        ]
    }
    sp = tmp_path / "state.json"
    sp.write_text(json.dumps(state, ensure_ascii=False))

    # dry-run: nothing moves, state unchanged
    before = sp.read_text()
    counters = apply_normalize_filenames(spark, str(sp), dry_run=True)
    assert counters["renamed"] >= 1
    assert sp.read_text() == before
    assert (dl / "messy-name.pdf").exists()

    counters = apply_normalize_filenames(spark, str(sp))
    exp1 = structured_filename("https://h.test/a/doc%201.pdf", "pdf")
    assert (dl / exp1).exists() and not (dl / "messy-name.pdf").exists()
    assert counters["already_ok"] == 1
    assert counters["skipped"] == 2  # the collision loser + the missing file
    assert os.path.exists(str(sp) + ".bak")

    after = json.loads(sp.read_text())
    docs = {d["url"]: d for e in after["entries"] for d in e["documents"]}
    assert docs["https://h.test/a/doc%201.pdf"]["local_path"] == f"downloads/{exp1}"
    # exactly one of the colliding pair got the canonical target
    tgt = structured_filename("https://h.test/b?x=1", "doc")
    winners = [u for u in ("https://h.test/b?x=1", "https://h.test/b/?x=1")
               if docs[u]["local_path"] == f"downloads/{tgt}"]
    assert len(winners) == 1
    # missing file's record untouched
    assert docs["https://h.test/gone.pdf"]["local_path"] == "downloads/vanished.pdf"
