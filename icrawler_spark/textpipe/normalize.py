"""Text normalization rules — behavior-matched to the reference text pipeline.

Byte-exactness is the contract (SURVEY §2.9): every rule below replicates the
reference's observable output (ref text_pipeline.py:182-324) and is pinned by
the ported golden tests in tests/test_textpipe.py. Pure ``str → str``
functions: no Spark, no I/O — they ride inside Arrow-batched UDFs.

Rule inventory (ref file:line):
- PDF (text_pipeline.py:230-277): page split on \\f; repeated header/footer
  detection (first/last 3 short lines per page, seen ≥2 pages, len ≤60);
  drop page numbers ``-? N -?``; paragraph break only at a blank line AND
  (prev line ends with end-punctuation OR looks like a ≤20-char heading);
  wrapped-line merge with hyphen joins and CJK-aware spacing (182-207).
- HTML (text_pipeline.py:280-324): drop exact boilerplate lines and
  contains-token lines; drop "下载…word/pdf" lines and lines ending .pdf;
  blank-line paragraph separation; forced blank before conclusion patterns;
  collapse consecutive duplicate lines; trim edge blanks.
- DOCX (text_pipeline.py:327-356): word/document.xml → w:p/w:t runs.
"""

from __future__ import annotations

import io
import re
import xml.etree.ElementTree as ET
from collections import Counter
from zipfile import ZipFile

from ..parsers.dom import Element, TextNode, parse_html

# --- character classes (ref text_pipeline.py:40-88) ---------------------------

PAGE_NUMBER_RE = re.compile(r"^-?\s*\d+\s*-?$")
HEADER_MAX_LEN = 60

OPENING_PUNCT = set("([{“‘（")
CLOSING_PUNCT = set(")]},.;:?!”’、。，．：！？；）》」』】")
PARA_END_CHARS = set(".?!;:。？！；：…)）》」』】")

_CJK_RANGES = (
    (0x3400, 0x4DBF), (0x4E00, 0x9FFF), (0xF900, 0xFAFF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0x2CEB0, 0x2EBEF), (0x30000, 0x3134F),
)


def is_cjk(ch: str) -> bool:
    code = ord(ch)
    return any(lo <= code <= hi for lo, hi in _CJK_RANGES)


def _needs_space(left: str, right: str) -> bool:
    """Space only between alnum ASCII-ish runs, never around CJK or paired
    punctuation (ref text_pipeline.py:168-179)."""
    if not left or not right:
        return False
    lc, rc = left[-1], right[0]
    if is_cjk(lc) or is_cjk(rc):
        return False
    if lc in OPENING_PUNCT or rc in CLOSING_PUNCT:
        return False
    return lc.isalnum() and rc.isalnum()


def merge_wrapped_lines(lines: list[str]) -> str:
    """Join hard-wrapped lines into one paragraph (ref 182-198):
    hyphen-ending + alpha-start → strip hyphen and glue; else CJK-aware
    space insertion."""
    if not lines:
        return ""
    acc = lines[0]
    for ln in lines[1:]:
        if not acc:
            acc = ln
        elif acc.endswith("-") and ln and ln[0].isalpha():
            acc = acc.rstrip("-") + ln
        elif _needs_space(acc, ln):
            acc = acc + " " + ln
        else:
            acc = acc + ln
    return acc


def _heading_like(line: str) -> bool:
    s = line.strip()
    if not s or len(s) > 20:
        return False
    return not any(c in ",.?!；：，。！？:;、" for c in s)


def normalize_pdf_text(text: str) -> str:
    """ref _normalize_pdf_text (text_pipeline.py:230-277)."""
    if not text:
        return ""
    pages = text.split("\f")

    headers: Counter[str] = Counter()
    footers: Counter[str] = Counter()
    for page in pages:
        lines = [ln.strip() for ln in page.splitlines() if ln.strip()]
        if not lines:
            continue
        for ln in lines[:3]:
            if len(ln) <= HEADER_MAX_LEN:
                headers[ln] += 1
        for ln in lines[-3:]:
            if len(ln) <= HEADER_MAX_LEN:
                footers[ln] += 1
    repeated = {ln for ln, n in headers.items() if n >= 2} | {
        ln for ln, n in footers.items() if n >= 2
    }

    out: list[str] = []
    para: list[str] = []
    blank_seen = False

    def flush():
        nonlocal para
        if para:
            merged = merge_wrapped_lines(para)
            if merged:
                out.append(merged)
            para = []

    for page in pages:
        for raw in page.splitlines():
            line = raw.strip()
            if not line:
                if para:
                    blank_seen = True
                continue
            if PAGE_NUMBER_RE.match(line):
                continue
            if line in repeated:
                continue
            if blank_seen:
                prev = para[-1] if para else ""
                if prev and (prev[-1] in PARA_END_CHARS or _heading_like(prev)):
                    flush()
                blank_seen = False
            para.append(line)
        # paragraphs may span page boundaries — no forced flush here
    flush()
    return "\n".join(out)


# --- HTML ---------------------------------------------------------------------

HTML_DROP_EXACT = frozenset({"中国人民银行规章", "中国人民银行发布", "打印本页", ">", "|"})
HTML_DROP_CONTAINS = (
    "所在位置", "政府信息公开", "政　　策", "行政规范性文件", "法律声明", "联系我们",
    "加入收藏", "网站地图", "最佳分辨率", "京公网安备", "京ICP备", "网站标识码", "网站主办单位",
)
CONCLUSION_RES = (
    re.compile(r"^(本通知|本办法|本规定|本细则|本规则|本意见|本通告)自.+(实施|施行|执行)"),
    re.compile(r"^特此通知"),
)


def normalize_html_text(text: str) -> str:
    """ref _normalize_html_text (text_pipeline.py:280-324)."""
    if not text:
        return ""
    out: list[str] = []
    blank_pending = False

    def append_blank():
        if out and out[-1] != "":
            out.append("")

    for raw in text.splitlines():
        line = raw.strip()
        if not line:
            blank_pending = True
            continue
        lower = line.lower()
        if line in HTML_DROP_EXACT:
            continue
        if "下载" in line and ("word" in lower or "pdf" in lower):
            continue
        if any(tok in line for tok in HTML_DROP_CONTAINS):
            continue
        if line.endswith(".pdf"):
            continue
        if out and out[-1] and any(p.match(line) for p in CONCLUSION_RES):
            append_blank()
        if blank_pending:
            append_blank()
            blank_pending = False
        if out and out[-1] == line:
            continue
        out.append(line)

    while out and out[0] == "":
        out.pop(0)
    while out and out[-1] == "":
        out.pop()
    return "\n".join(out)


def html_dom_text(html: str) -> str:
    """script/style-stripped DOM text, one text node per line — the
    equivalent of BeautifulSoup ``get_text('\\n', strip=True)`` on the
    stdlib DOM (ref text_pipeline.py:517-523)."""
    root = parse_html(html)
    parts: list[str] = []

    def walk(node):
        if isinstance(node, TextNode):
            s = node.data.strip()
            if s:
                parts.append(s)
            return
        if isinstance(node, Element):
            if node.name in ("script", "style"):
                return
            for child in node.children:
                walk(child)

    walk(root)
    return "\n".join(parts)


# --- DOCX ---------------------------------------------------------------------

_W_NS = {"w": "http://schemas.openxmlformats.org/wordprocessingml/2006/main"}


def extract_docx_text(data: bytes) -> tuple[str | None, str | None]:
    """(text, error): error taxonomy docx_document_missing / docx_read_error /
    docx_parse_error / docx_empty (ref text_pipeline.py:327-356)."""
    try:
        with ZipFile(io.BytesIO(data)) as zf:
            xml_data = zf.read("word/document.xml")
    except KeyError:
        return None, "docx_document_missing"
    except Exception:
        return None, "docx_read_error"
    try:
        root = ET.fromstring(xml_data)
    except ET.ParseError:
        return None, "docx_parse_error"
    paragraphs = []
    for p in root.findall(".//w:p", _W_NS):
        runs = [t.text for t in p.findall(".//w:t", _W_NS) if t.text]
        if runs:
            paragraphs.append("".join(runs))
    text = "\n".join(paragraphs).strip()
    return (text, None) if text else (None, "docx_empty")
