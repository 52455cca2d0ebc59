"""Per-document extraction + per-entry selection (content-based).

The reference resolves filesystem paths and reads files one at a time
(ref text_pipeline.py:379-547); here content arrives as a ``binary`` column
(the fetches table), so the unit is ``(data, declared_type, suffix)``.
Semantics are behavior-matched and golden-tested:

- type normalization: extension wins over declared type
  (ref text_pipeline.py:358-377)
- PK zip sniffing upgrades doc/wps payloads to docx; the OLE2 magic
  D0 CF 11 E0 is doc_binary_unsupported (ref text_pipeline.py:495-516)
- priority word/doc/docx=3 > pdf=2 > html=1 > text=0, stable by document
  position (ref text_pipeline.py:132-139, 482)
- first non-empty text wins; fallback = first attempt; status ∈
  success / error / empty / needs_ocr / no_source (ref text_pipeline.py:550-595)

PDF extraction defaults to the from-scratch stdlib extractor
(:func:`icrawler_spark.textpipe.pdf.extract_pdf_text` — Flate streams, text
operators, ToUnicode CMaps; see that module's honest scope notes) and stays
injectable (``pdf_extractor: bytes -> str``) so a pdfminer-class extractor
can be swapped in where available; passing ``None`` explicitly disables PDF
support (→ ``pdf_support_unavailable``), mirroring the reference's
pdfminer-absent branch (ref text_pipeline.py:528-529).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Callable

from ..functions.pure import decode_bytes
from .normalize import extract_docx_text, html_dom_text, normalize_html_text, normalize_pdf_text
from .pdf import extract_pdf_text

DOCUMENT_PRIORITIES = {"docx": 3, "doc": 3, "word": 3, "pdf": 2, "html": 1, "text": 0}

PdfExtractor = Callable[[bytes], str]

# sentinel: "caller didn't choose" → use the built-in from-scratch extractor;
# None stays meaningful as "no PDF support" (the reference's pdfminer-absent
# status path, still exercised by tests). A class instance (not object())
# so the check survives pickling into Spark executors.
class _DefaultPdf:
    pass


_DEFAULT_PDF = _DefaultPdf()


def _resolve_pdf(pdf_extractor) -> PdfExtractor | None:
    return extract_pdf_text if isinstance(pdf_extractor, _DefaultPdf) else pdf_extractor


def normalize_doc_type(declared: str | None, suffix: str) -> str | None:
    """ref _normalize_type (text_pipeline.py:358-377): extension first."""
    value = (declared or "").lower().strip() or None
    ext = suffix.lower()
    if ext == ".pdf":
        return "pdf"
    if ext == ".docx":
        return "docx"
    if ext == ".doc":
        return "doc"
    if ext in {".htm", ".html"}:
        return "html"
    if ext in {".txt", ".text", ".md"}:
        return "text"
    if value in {"doc", "docx", "word"}:
        return "docx" if value == "docx" else "doc"
    if value in {"pdf", "html", "text"}:
        return value
    return value


@dataclass
class Attempt:
    text: str | None
    error: str | None
    needs_ocr: bool
    normalized_type: str | None


def _sniff_docx(data: bytes, normalized: str | None) -> str | None:
    """PK magic + word/document.xml present → treat as docx regardless of the
    declared type (ref text_pipeline.py:495-505)."""
    if normalized == "docx" or data[:2] != b"PK":
        return normalized
    import io
    from zipfile import ZipFile

    try:
        with ZipFile(io.BytesIO(data)) as zf:
            if "word/document.xml" in zf.namelist():
                return "docx"
    except Exception:
        pass
    return normalized


def attempt_extract(
    data: bytes | None,
    declared_type: str | None,
    suffix: str = "",
    pdf_extractor: PdfExtractor | None = _DEFAULT_PDF,
) -> Attempt:
    """One document → (text, error, needs_ocr) (ref text_pipeline.py:486-547)."""
    pdf_extractor = _resolve_pdf(pdf_extractor)
    if data is None:
        return Attempt(None, "file_missing", False, normalize_doc_type(declared_type, suffix))
    normalized = normalize_doc_type(declared_type, suffix) or (suffix.lower().lstrip(".") or None)
    normalized = _sniff_docx(data, normalized)

    if normalized == "docx":
        text, error = extract_docx_text(data)
        return Attempt(text, error, False, "docx")
    if normalized in {"doc", "word"}:
        if data.startswith(b"\xd0\xcf\x11\xe0"):
            return Attempt(None, "doc_binary_unsupported", False, normalized)
        text = decode_bytes(data)
        if not text.strip():
            return Attempt(None, "doc_empty", False, normalized)
        return Attempt(text, None, False, normalized)
    if normalized == "html":
        text = normalize_html_text(html_dom_text(decode_bytes(data)))
        if not text.strip():
            return Attempt(None, "html_empty", False, normalized)
        return Attempt(text, None, False, normalized)
    if normalized == "pdf":
        if pdf_extractor is None:
            return Attempt(None, "pdf_support_unavailable", False, normalized)
        try:
            raw = pdf_extractor(data) or ""
        except Exception:
            return Attempt(None, "pdf_parse_error", False, normalized)
        if not raw.strip():
            return Attempt(raw, None, True, normalized)
        return Attempt(normalize_pdf_text(raw), None, False, normalized)
    # plain text fallback
    text = decode_bytes(data)
    if not text.strip():
        return Attempt(None, "text_empty", False, normalized)
    return Attempt(text, None, False, normalized)


@dataclass
class EntryResult:
    text: str
    status: str
    source_type: str | None
    needs_ocr: bool
    attempts: list[Attempt]


def extract_best(
    docs: list[tuple[bytes | None, str | None, str]],
    pdf_extractor: PdfExtractor | None = _DEFAULT_PDF,
) -> EntryResult:
    """Per-entry candidate walk (ref text_pipeline.py:550-595): candidates in
    (priority desc, position asc) order; stop at first non-empty text."""
    order = sorted(
        range(len(docs)),
        key=lambda i: (
            -DOCUMENT_PRIORITIES.get(normalize_doc_type(docs[i][1], docs[i][2]) or "", -1),
            i,
        ),
    )
    attempts: list[Attempt] = []
    selected: Attempt | None = None
    fallback: Attempt | None = None
    pdf_needs_ocr = False
    for i in order:
        data, declared, suffix = docs[i]
        att = attempt_extract(data, declared, suffix, pdf_extractor)
        attempts.append(att)
        if att.normalized_type == "pdf" and att.needs_ocr:
            pdf_needs_ocr = True
        if (att.text or "").strip():
            selected = att
            break
        if fallback is None:
            fallback = att

    if not docs:
        return EntryResult("", "no_source", None, False, [])
    if selected is None:
        selected = fallback if fallback is not None else attempts[0]

    text = selected.text if selected.text is not None else ""
    stripped = text.strip()
    if selected.error:
        status = "error"
    elif stripped:
        status = "success"
    elif selected.needs_ocr and (selected.normalized_type == "pdf" or pdf_needs_ocr):
        status = "needs_ocr"
    else:
        status = "empty"
    return EntryResult(text, status, selected.normalized_type, pdf_needs_ocr, attempts)
