"""Golden tests for the text pipeline — ported from the reference's oracle
(ref tests/test_text_pipeline.py): exact string equality is the contract."""

from __future__ import annotations

import io
from zipfile import ZipFile

from pyspark.sql import functions as F

from icrawler_spark.textpipe import (
    attempt_extract,
    extract_best,
    normalize_html_text,
    normalize_pdf_text,
)
from icrawler_spark.textpipe.udfs import extract_entry_texts


def _docx_bytes(text: str) -> bytes:
    xml = (
        "<?xml version='1.0' encoding='UTF-8' standalone='yes'?>\n"
        "<w:document xmlns:w='http://schemas.openxmlformats.org/wordprocessingml/2006/main'>"
        f"<w:body><w:p><w:r><w:t>{text}</w:t></w:r></w:p></w:body></w:document>"
    )
    buf = io.BytesIO()
    with ZipFile(buf, "w") as zf:
        zf.writestr("word/document.xml", xml)
    return buf.getvalue()


LAYOUT_PDF_TEXT = (
    "Page Header\n\n"
    "Paragraph line one\n"
    "line two\n\n"
    "Page Footer\n"
    "- 1 -\n"
    "\fPage Header\n\n"
    "第二段第一行\n"
    "继续内容\n\n"
    "Page Footer\n"
)


def fake_pdf_extractor(data: bytes) -> str:
    marker = data.decode("utf-8", errors="ignore")
    if "with_text" in marker:
        return "PDF 正文内容"
    if "needs_ocr" in marker:
        return ""
    if "layout" in marker:
        return LAYOUT_PDF_TEXT
    raise AssertionError(f"unexpected pdf payload: {marker!r}")


# --- wps/docx sniffing (ref test_extract_entry_supports_wps_docx) -------------


def test_wps_docx_sniffing():
    att = attempt_extract(_docx_bytes("WPS 文本内容"), "doc", ".wps")
    assert att.normalized_type == "docx"
    assert att.text == "WPS 文本内容"


def test_binary_wps_flagged():
    att = attempt_extract(b"\xd0\xcf\x11\xe0" + b"\x00" * 128, "doc", ".wps")
    assert att.error == "doc_binary_unsupported"
    res = extract_best([(b"\xd0\xcf\x11\xe0" + b"\x00" * 128, "doc", ".wps")])
    assert res.status == "error"


# --- pdf layout normalization (ref test_extract_entry_normalizes_pdf_text) ----


def test_pdf_layout_normalization():
    res = extract_best([(b"layout", "pdf", ".pdf")], pdf_extractor=fake_pdf_extractor)
    assert res.text == "Paragraph line one line two\n第二段第一行继续内容"
    assert res.status == "success"


def test_pdf_support_unavailable():
    att = attempt_extract(b"%PDF-1.4", "pdf", ".pdf", pdf_extractor=None)
    assert att.error == "pdf_support_unavailable"


# --- html boilerplate stripping (ref test_extract_entry_normalizes_html_text) -


HTML_DOC = """
<html>
  <body>
    <div>中国人民银行规章</div>
    <div>所在位置 ：</div>
    <div>政府信息公开</div>
    <div>政　　策</div>
    <div>行政规范性文件</div>
    <div>下载word版</div>
    <div>下载pdf版</div>
    <h1>制度标题</h1>
    <p>第一段内容。</p>
    <p>法律声明</p>
    <p>中国人民银行发布</p>
  </body>
</html>
"""


def test_html_boilerplate_stripping():
    res = extract_best([(HTML_DOC.encode("utf-8"), "html", ".html")])
    text = res.text
    assert text.splitlines()[0] == "制度标题"
    assert "下载word版" not in text
    assert "中国人民银行规章" not in text
    assert "所在位置" not in text
    assert "法律声明" not in text
    assert not text.endswith("中国人民银行发布")


def test_conclusion_blank_line_rule():
    html = (
        "<html><body><p>八、外国银行境内分行参照本通知执行。</p>"
        "<p>本通知自2023年12月20日起实施。</p></body></html>"
    )
    res = extract_best([(html.encode("utf-8"), "html", ".html")])
    lines = res.text.splitlines()
    assert lines[0] == "八、外国银行境内分行参照本通知执行。"
    assert lines[1] == ""
    assert lines[2] == "本通知自2023年12月20日起实施。"


# --- candidate priority + status taxonomy (ref test_process_state_data…) ------


def test_needs_ocr_fallback_to_html():
    docs = [
        (b"needs_ocr", "pdf", ".pdf"),
        ("<html><body><p>HTML 正文</p></body></html>".encode(), "html", ".html"),
    ]
    res = extract_best(docs, pdf_extractor=fake_pdf_extractor)
    assert res.source_type == "html"
    assert res.status == "success"
    assert res.needs_ocr  # pdf attempt flagged
    assert res.text == "HTML 正文"
    assert len(res.attempts) == 2


def test_priority_docx_over_pdf_over_html():
    docs = [
        ("<html><body><p>H</p></body></html>".encode(), "html", ".html"),
        (b"with_text", "pdf", ".pdf"),
        (_docx_bytes("Word 文本内容"), "doc", ".docx"),
    ]
    res = extract_best(docs, pdf_extractor=fake_pdf_extractor)
    assert res.source_type == "docx"
    assert res.text == "Word 文本内容"


def test_no_source_status():
    res = extract_best([])
    assert res.status == "no_source"
    assert res.text == ""


def test_needs_ocr_status_when_only_scan():
    res = extract_best([(b"needs_ocr", "pdf", ".pdf")], pdf_extractor=fake_pdf_extractor)
    assert res.status == "needs_ocr"
    assert res.text == ""


# --- normalization unit goldens ----------------------------------------------


def test_normalize_pdf_text_headers_footers():
    assert (
        normalize_pdf_text(LAYOUT_PDF_TEXT)
        == "Paragraph line one line two\n第二段第一行继续内容"
    )


def test_normalize_html_duplicate_collapse():
    assert normalize_html_text("a\na\nb") == "a\nb"
    assert normalize_html_text("\n\nx\n\n") == "x"
    assert normalize_html_text("report.pdf\nbody") == "body"


# --- Spark lifting ------------------------------------------------------------


def test_extract_entry_texts_spark(spark):
    # local def: cloudpickle serializes it by value, so executors don't need
    # the test module on their import path
    def local_pdf_extractor(data: bytes) -> str:
        return "" if b"needs_ocr" in data else "PDF 正文内容"

    rows = [
        ("e1", "http://x/doc.docx", "doc", _docx_bytes("Word 文本内容"), 0),
        ("e2", "http://x/needs_ocr.pdf", "pdf", b"needs_ocr", 0),
        ("e2", "http://x/page.html", "html",
         "<html><body><p>HTML 正文</p></body></html>".encode(), 1),
        ("e3", "http://x/missing.bin", "other", None, 0),
    ]
    df = spark.createDataFrame(
        rows, "entry_id string, url string, doc_type string, content binary, pos int"
    )
    out = {
        r.entry_id: r
        for r in extract_entry_texts(df, pdf_extractor=local_pdf_extractor).collect()
    }
    assert out["e1"].text == "Word 文本内容"
    assert out["e1"].source_type == "docx"
    assert out["e1"].status == "success"
    assert out["e2"].text == "HTML 正文"
    assert out["e2"].needs_ocr is True
    assert out["e3"].status == "error"
    assert out["e3"].char_count == 0
