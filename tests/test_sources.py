"""Auxiliary sources: extract summaries (corrupt-tolerant) + binaryFile scan."""

from __future__ import annotations

import json

from icrawler_spark.crawl.sources import read_extract_summaries, scan_downloads_dir


def test_read_extract_summaries_tolerates_corrupt(spark, tmp_path):
    good = {
        "task": "t1",
        "records": [
            {"entry_index": 0, "serial": 1, "title": "甲", "text_path": "a.txt",
             "status": "success", "source_type": "docx", "pdf_needs_ocr": False},
            {"entry_index": 1, "serial": 2, "title": "乙", "text_path": "b.txt",
             "status": "needs_ocr", "source_type": "pdf", "pdf_needs_ocr": True},
        ],
    }
    (tmp_path / "t1_extract.json").write_text(json.dumps(good, ensure_ascii=False))
    (tmp_path / "t2_extract.json").write_text("{ this is not json !!")
    rows = read_extract_summaries(spark, str(tmp_path)).collect()
    by_title = {r.title: r for r in rows if r.title}
    assert by_title["甲"].status == "success"
    assert by_title["乙"].pdf_needs_ocr is True
    assert len(by_title) == 2  # corrupt file contributed nothing


def test_scan_downloads_dir(spark, tmp_path):
    d = tmp_path / "downloads"
    d.mkdir()
    (d / "a.html").write_bytes(b"<html>x</html>")
    (d / "b.pdf").write_bytes(b"%PDF" + b"0" * 100)
    (d / "sub").mkdir()
    (d / "sub" / "c.HTM").write_bytes(b"<html>y</html>")
    row = scan_downloads_dir(spark, str(d)).collect()[0]
    assert row.n_files == 3
    assert row.n_html == 2
    assert row.total_bytes == 14 + 104 + 14
