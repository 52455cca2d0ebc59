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


def test_multi_dot_and_dotfile_stems_match_reference(spark, tmp_path):
    """Path.stem/Path.suffixes parity (ADVICE r2): last-dot stem with
    all-suffixes extension ('report.v2.pdf' → 'report.v2' + '.v2.pdf'),
    and a dotfile has no extension at all."""
    downloads = tmp_path / "dl2"
    downloads.mkdir()
    f1 = downloads / "report.v2.pdf"
    f1.write_bytes(b"a")
    f2 = downloads / ".bashrc"
    f2.write_bytes(b"b")
    rows = [
        (1, "", "http://e.com/a∕b", "", "pdf", str(f1)),   # titles+url unsanitizable? url is usable
        (2, "", "http://e.com/c∕d", "", "other", str(f2)),
    ]
    # blank titles but sanitizable URLs would win before the stem — blank the
    # url path too is not possible, so force the stem tier by blanking titles
    # and using URLs whose sanitization is '_' is impractical; instead rely on
    # ref running the identical candidate cascade side-by-side.
    ref_report, ref_names = _ref_plan_names(rows, tmp_path)
    entries, documents, seen = _spark_frames(spark, rows)
    _report, plans = copy_documents_by_title(
        entries, documents, seen, str(tmp_path / "o2"), dry_run=True
    )
    assert {d.rsplit("/", 1)[-1] for _s, d in plans} == ref_names


def test_stem_tier_uses_last_dot_semantics(spark, tmp_path):
    """When the stem IS the winning candidate (titles blank, url blank-ish),
    'report.v2.pdf' must export via Path.stem + joined suffixes exactly as
    the reference does (stem 'report.v2' → sanitized 'report_v2', extension
    '.v2.pdf' → 'report_v2.v2.pdf')."""
    downloads = tmp_path / "dl3"
    downloads.mkdir()
    f1 = downloads / "report.v2.pdf"
    f1.write_bytes(b"a")
    url = "http://e.com/∕"  # sanitizes to '_' → stem tier wins
    state = PBCState()
    eid = state.ensure_entry({"serial": 7, "title": "", "remark": ""})
    state.mark_downloaded(eid, url, "", "pdf", str(f1))
    state_file = tmp_path / "state3.json"
    save_state(str(state_file), state)
    _ref_report, ref_plans = ref_copy(state_file, tmp_path / "r3", dry_run=True)
    ref_names = {p.destination.name for p in ref_plans}
    assert ref_names == {"report_v2.v2.pdf"}  # safe_filename maps dots to _

    entries = spark.createDataFrame(
        [("e", "t", 7, "", "", 0)],
        "entry_id string, task string, serial int, title string, remark string, _src_pos long",
    )
    documents = spark.createDataFrame(
        [("e", url, "pdf", "", 0)],
        "entry_id string, url string, doc_type string, title string, _src_pos long",
    )
    seen = spark.createDataFrame(
        [(url, "e", "", "pdf", True, str(f1))],
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string",
    )
    _report, plans = copy_documents_by_title(
        entries, documents, seen, str(tmp_path / "o3"), dry_run=True
    )
    assert {d.rsplit("/", 1)[-1] for _s, d in plans} == ref_names


def test_nonempty_destination_is_not_overwritten(spark, tmp_path):
    """ref _unique_filename checks files already in destination_dir
    (ref :127): exporting into a dir that already holds the target name
    must suffix, not overwrite — and overwrite=True must take the name."""
    downloads = tmp_path / "dl4"
    downloads.mkdir()
    f1 = downloads / "src.pdf"
    f1.write_bytes(b"new-content")
    rows = [(1, "标题", "http://e.com/1.pdf", "标题", "pdf", str(f1))]

    dest = tmp_path / "occupied"
    dest.mkdir()
    (dest / "标题.pdf").write_bytes(b"pre-existing")

    # reference behavior on the same pre-populated destination
    state = PBCState()
    eid = state.ensure_entry({"serial": 1, "title": "标题", "remark": ""})
    state.mark_downloaded(eid, "http://e.com/1.pdf", "标题", "pdf", str(f1))
    state_file = tmp_path / "state4.json"
    save_state(str(state_file), state)
    _r, ref_plans = ref_copy(state_file, dest, dry_run=True)
    assert {p.destination.name for p in ref_plans} == {"标题_1.pdf"}

    entries, documents, seen = _spark_frames(spark, rows)
    _report, plans = copy_documents_by_title(entries, documents, seen, str(dest))
    assert {d.rsplit("/", 1)[-1] for _s, d in plans} == {"标题_1.pdf"}
    assert (dest / "标题.pdf").read_bytes() == b"pre-existing"
    assert (dest / "标题_1.pdf").read_bytes() == b"new-content"

    # overwrite=True takes the bare name (ref :121-123)
    _report2, plans2 = copy_documents_by_title(
        entries, documents, seen, str(dest), overwrite=True
    )
    assert {d.rsplit("/", 1)[-1] for _s, d in plans2} == {"标题.pdf"}
    assert (dest / "标题.pdf").read_bytes() == b"new-content"


def test_collision_order_follows_insertion_not_serial(spark, tmp_path):
    """ref iterates entries in insertion order; a later-inserted entry with a
    SMALLER serial must get the _1 suffix (ADVICE r2 window-order item)."""
    downloads = tmp_path / "dl5"
    downloads.mkdir()
    fa = downloads / "a.pdf"
    fa.write_bytes(b"a")
    fb = downloads / "b.pdf"
    fb.write_bytes(b"b")
    # inserted first with serial 9, second with serial 2 — same title
    rows = [
        (9, "同名", "http://e.com/first.pdf", "同名", "pdf", str(fa)),
        (2, "同名", "http://e.com/second.pdf", "同名", "pdf", str(fb)),
    ]
    ref_report, ref_names = _ref_plan_names(rows, tmp_path)
    state = PBCState()
    for serial, etitle, url, dtitle, dtype, path in rows:
        eid = state.ensure_entry({"serial": serial, "title": etitle, "remark": ""})
        state.mark_downloaded(eid, url, dtitle, dtype, path)
    state_file = tmp_path / "state5.json"
    save_state(str(state_file), state)
    _r, ref_plans = ref_copy(state_file, tmp_path / "r5", dry_run=True)
    by_source = {p.source.name: p.destination.name for p in ref_plans}
    assert by_source == {"a.pdf": "同名.pdf", "b.pdf": "同名_1.pdf"}

    entries, documents, seen = _spark_frames(spark, rows)
    _report, plans = copy_documents_by_title(
        entries, documents, seen, str(tmp_path / "o5"), dry_run=True
    )
    got = {s.rsplit("/", 1)[-1]: d.rsplit("/", 1)[-1] for s, d in plans}
    assert got == by_source
