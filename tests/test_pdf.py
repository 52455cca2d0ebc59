"""From-scratch PDF text extraction: the reference's pdf golden
(ref tests/test_text_pipeline.py:119 — layout.pdf → header/footer stripped,
wrapped lines merged) must pass WITHOUT any injected extractor, on a real
synthetic PDF exercising Flate streams, simple fonts, a Type0 font with a
ToUnicode CMap (bfchar + array bfrange), Td/TD/T*/TL/Tm/Tj/TJ operators,
and the \\f page separator."""

from __future__ import annotations

import zlib

import pytest

from icrawler_spark.textpipe.extract import attempt_extract, extract_best
from icrawler_spark.textpipe.normalize import normalize_pdf_text
from icrawler_spark.textpipe.pdf import (
    PdfParseError,
    _Parser,
    extract_pdf_text,
    parse_tounicode,
)

# the reference golden (ref tests/test_text_pipeline.py:119)
GOLDEN = "Paragraph line one line two\n第二段第一行继续内容"


def _stream_obj(num: int, payload: bytes, flate: bool = True) -> bytes:
    data = zlib.compress(payload) if flate else payload
    filt = " /Filter /FlateDecode" if flate else ""
    return (
        f"{num} 0 obj\n<< /Length {len(data)}{filt} >>\nstream\n".encode()
        + data
        + b"\nendstream\nendobj\n"
    )


_CMAP = b"""/CIDInit /ProcSet findresource begin
12 dict begin
begincmap
/CMapName /Adobe-Identity-UCS def
/CMapType 2 def
1 begincodespacerange
<0000> <FFFF>
endcodespacerange
7 beginbfchar
<0001> <7B2C>
<0002> <4E8C>
<0003> <6BB5>
<0004> <4E00>
<0005> <884C>
<0006> <7EE7>
<0007> <7EED>
endbfchar
1 beginbfrange
<0008> <0009> [<5185> <5BB9>]
endbfrange
endcmap
CMapName currentdict /CMap defineresource pop
end
end
"""

# page 1: simple font, Flate-compressed content
_CONTENT1 = b"""BT
/F1 12 Tf
72 720 Td
(Page Header) Tj
0 -30 Td
(Paragraph line one) Tj
0 -14 Td
(line two) Tj
0 -40 Td
(Page Footer) Tj
0 -14 Td
(- 1 -) Tj
ET
"""

# page 2: CID text via ToUnicode (0001..0009 = 第二段一行继续内容),
# T*/TL line advance, TJ with kerning, uncompressed stream
_CONTENT2 = b"""BT
/F1 12 Tf
72 720 Td
(Page Header) Tj
/F2 12 Tf
0 -30 Td
<000100020003000100040005> Tj
14 TL
T*
<0006000700080009> Tj
/F1 12 Tf
0 -40 Td
[(Page ) -120 (Footer)] TJ
ET
"""


def build_layout_pdf() -> bytes:
    """Two-page PDF reproducing the reference layout.pdf fixture's raw text."""
    parts = [b"%PDF-1.4\n%\xe2\xe3\xcf\xd3\n"]
    parts.append(b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    parts.append(b"2 0 obj\n<< /Type /Pages /Kids [3 0 R 4 0 R] /Count 2 >>\nendobj\n")
    parts.append(
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R >> >> /Contents 6 0 R >>\nendobj\n"
    )
    parts.append(
        b"4 0 obj\n<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 5 0 R /F2 7 0 R >> >> /Contents 8 0 R >>\nendobj\n"
    )
    parts.append(
        b"5 0 obj\n<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica "
        b"/Encoding /WinAnsiEncoding >>\nendobj\n"
    )
    parts.append(_stream_obj(6, _CONTENT1, flate=True))
    parts.append(
        b"7 0 obj\n<< /Type /Font /Subtype /Type0 /BaseFont /Synthetic-CJK "
        b"/Encoding /Identity-H /ToUnicode 9 0 R >>\nendobj\n"
    )
    parts.append(_stream_obj(8, _CONTENT2, flate=False))
    parts.append(_stream_obj(9, _CMAP, flate=True))
    parts.append(b"trailer\n<< /Root 1 0 R /Size 10 >>\nstartxref\n0\n%%EOF\n")
    return b"".join(parts)


def test_raw_extraction_layout():
    raw = extract_pdf_text(build_layout_pdf())
    pages = raw.split("\f")
    assert len(pages) == 2
    assert pages[0].splitlines() == [
        "Page Header", "", "Paragraph line one", "line two", "", "Page Footer", "- 1 -",
    ]
    assert pages[1].splitlines() == [
        "Page Header", "", "第二段第一行", "继续内容", "", "Page Footer",
    ]


def test_reference_pdf_golden_without_injected_extractor():
    """The exact assertion of the reference's layout test, driven end-to-end
    through the DEFAULT pipeline — no injected extractor anywhere."""
    pdf = build_layout_pdf()
    assert normalize_pdf_text(extract_pdf_text(pdf)) == GOLDEN

    att = attempt_extract(pdf, "pdf", ".pdf")  # default = built-in extractor
    assert att.error is None and not att.needs_ocr
    assert att.text == GOLDEN

    res = extract_best([(pdf, "pdf", ".pdf")])
    assert res.status == "success" and res.source_type == "pdf"
    assert res.text == GOLDEN


def test_explicit_none_still_means_unavailable():
    att = attempt_extract(build_layout_pdf(), "pdf", ".pdf", pdf_extractor=None)
    assert att.error == "pdf_support_unavailable"


def test_garbage_pdf_is_parse_error_and_textless_pdf_needs_ocr():
    att = attempt_extract(b"%PDF-1.4 garbage without objects", "pdf", ".pdf")
    assert att.error == "pdf_parse_error"
    att2 = attempt_extract(b"not a pdf at all", "pdf", ".pdf")
    assert att2.error == "pdf_parse_error"

    # well-formed PDF whose only page draws no text → empty → needs_ocr
    scanned = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n"
        + _stream_obj(4, b"q 612 0 0 792 0 0 cm Q\n", flate=False)
        + b"%%EOF\n"
    )
    res = extract_best([(scanned, "pdf", ".pdf")])
    assert res.status == "needs_ocr" and res.needs_ocr


def test_parser_primitives():
    p = _Parser(rb"<< /A 1 /B [2 3.5 (lit\)ps) <414243>] /C 7 0 R /D /N#41me >>")
    d = p.parse()
    assert d["A"] == 1
    assert d["B"][0] == 2 and d["B"][1] == 3.5
    assert d["B"][2] == b"lit)ps" and d["B"][3] == b"ABC"
    assert d["C"].num == 7
    assert d["D"] == "NAme"
    # literal-string escapes: octal, newline escapes, nested parens
    assert _Parser(rb"(a\101\n(x)b)").parse() == b"aA\n(x)b"


def test_tounicode_bfrange_scalar_form():
    width, table = parse_tounicode(
        b"1 begincodespacerange <00> <FF> endcodespacerange\n"
        b"1 beginbfrange <41> <43> <0061> endbfrange"
    )
    assert width == 1
    assert table[0x41] == "a" and table[0x42] == "b" and table[0x43] == "c"


def test_spark_extract_entry_texts_defaults_to_builtin_pdf(spark):
    """The Arrow-batched lifting extracts PDF text with NO injected extractor
    — proving the executor-side closure resolves the built-in correctly."""
    from icrawler_spark.textpipe.udfs import extract_entry_texts

    pdf = build_layout_pdf()
    df = spark.createDataFrame(
        [("e1", "https://t.test/doc.pdf", "pdf", bytearray(pdf), 0),
         ("e2", "https://t.test/page.html", "html",
          bytearray("<html><body><p>网页正文。</p></body></html>".encode()), 0)],
        "entry_id string, url string, doc_type string, content binary, pos long",
    )
    out = {r.entry_id: r for r in extract_entry_texts(df).collect()}
    assert out["e1"].status == "success"
    assert out["e1"].source_type == "pdf"
    assert out["e1"].text == GOLDEN
    assert out["e2"].status == "success"


def test_corrupt_flate_stream_is_parse_error():
    pdf = build_layout_pdf().replace(b"stream\n", b"stream\n\x00\x01", 1)
    with pytest.raises(PdfParseError):
        extract_pdf_text(pdf)
