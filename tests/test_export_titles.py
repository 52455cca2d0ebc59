"""Copy-by-title export parity (ref export_titles.py:112-200, goldens from
ref tests/test_export_titles.py) — the reference function runs side-by-side
on the same state and the filename sets must be equal."""

from __future__ import annotations

import pytest

from icrawler_spark.crawl.export_titles import copy_documents_by_title
from tests._ref_stubs import install_reference_stubs, reference_available

if not reference_available():
    pytest.skip("reference checkout not present", allow_module_level=True)
install_reference_stubs()

from pbc_regulations.icrawler.export_titles import (  # noqa: E402
    copy_documents_by_title as ref_copy,
)
from pbc_regulations.icrawler.state import PBCState, save_state  # noqa: E402


@pytest.fixture
def corpus(tmp_path):
    downloads = tmp_path / "downloads"
    downloads.mkdir()
    f1 = downloads / "source1.pdf"
    f1.write_bytes(b"file-one")
    f2 = downloads / "source2.doc"
    f2.write_bytes(b"file-two")
    f3 = downloads / "source3.pdf"
    f3.write_bytes(b"file-three")
    missing = downloads / "missing.pdf"
    # (serial, entry_title, url, doc_title, type, local_path)
    rows = [
        (1, "第一份文件", "http://example.com/doc1.pdf", "第一份文件", "pdf", str(f1)),
        (2, "年度报告", "http://example.com/doc2.doc", "", "doc", str(f2)),
        (3, "重复标题", "http://example.com/doc3.pdf", "第一份文件", "pdf", str(f3)),
        (4, "缺失文件", "http://example.com/missing.pdf", "缺失文件", "pdf", str(missing)),
    ]
    return rows


def _ref_plan_names(rows, tmp_path):
    state = PBCState()
    for serial, etitle, url, dtitle, dtype, path in rows:
        eid = state.ensure_entry({"serial": serial, "title": etitle, "remark": ""})
        state.mark_downloaded(eid, url, dtitle, dtype, path)
    state_file = tmp_path / "state.json"
    save_state(str(state_file), state)
    report, plans = ref_copy(state_file, tmp_path / "ref_out", dry_run=True)
    return report, {p.destination.name for p in plans}


def _spark_frames(spark, rows):
    entries = spark.createDataFrame(
        [(u, "t", s, t, "", i) for i, (s, t, u, _dt, _ty, _p) in enumerate(rows)],
        "entry_id string, task string, serial int, title string, remark string, _src_pos long",
    )
    documents = spark.createDataFrame(
        [(u, u, ty, dt, i) for i, (_s, _t, u, dt, ty, _p) in enumerate(rows)],
        "entry_id string, url string, doc_type string, title string, _src_pos long",
    )
    seen = spark.createDataFrame(
        [(u, u, dt, ty, True, p) for (_s, _t, u, dt, ty, p) in rows],
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string",
    )
    return entries, documents, seen


def test_copy_by_title_matches_reference_goldens(spark, corpus, tmp_path):
    ref_report, ref_names = _ref_plan_names(corpus, tmp_path)
    entries, documents, seen = _spark_frames(spark, corpus)
    report, plans = copy_documents_by_title(
        entries, documents, seen, str(tmp_path / "out")
    )
    got_names = {dest.rsplit("/", 1)[-1] for _src, dest in plans}
    assert got_names == ref_names == {"第一份文件.pdf", "年度报告.doc", "第一份文件_1.pdf"}
    assert (report.copied, report.skipped_missing_source, report.skipped_without_path) == (
        ref_report.copied,
        ref_report.skipped_missing_source,
        ref_report.skipped_without_path,
    ) == (3, 1, 0)
    import os

    for src, dest in plans:
        assert os.path.exists(dest)
        with open(src, "rb") as a, open(dest, "rb") as b:
            assert a.read() == b.read()


def test_copy_by_title_dry_run(spark, corpus, tmp_path):
    entries, documents, seen = _spark_frames(spark, corpus[:1])
    report, plans = copy_documents_by_title(
        entries, documents, seen, str(tmp_path / "dry"), dry_run=True
    )
    assert report.copied == 1 and len(plans) == 1
    import os

    assert not os.path.exists(str(tmp_path / "dry"))


def test_copy_by_title_fallback_names(spark, tmp_path):
    """No usable titles anywhere → sanitized URL, then document_{serial}."""
    downloads = tmp_path / "dl"
    downloads.mkdir()
    f = downloads / "x.bin"
    f.write_bytes(b"x")
    rows = [(9, "", "http://e.com/x1.bin", "", "other", str(f))]
    entries, documents, seen = _spark_frames(spark, rows)
    _report, plans = copy_documents_by_title(
        entries, documents, seen, str(tmp_path / "o"), dry_run=True
    )
    ref_report, ref_names = _ref_plan_names(rows, tmp_path)
    assert {d.rsplit("/", 1)[-1] for _s, d in plans} == ref_names
