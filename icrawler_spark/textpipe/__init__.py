"""Text extraction pipeline: bytes → normalized plain text.

Carries the byte-identical per-URL invariant (BASELINE.json input_hint):
per-document extraction runs as pure functions lifted into Arrow-batched
pandas UDFs; per-entry candidate selection (priority word>pdf>html>text,
first non-empty wins) is Spark-side window logic.
"""

from .extract import attempt_extract, extract_best, normalize_doc_type
from .normalize import (
    extract_docx_text,
    html_dom_text,
    merge_wrapped_lines,
    normalize_html_text,
    normalize_pdf_text,
)

__all__ = [
    "attempt_extract",
    "extract_best",
    "normalize_doc_type",
    "extract_docx_text",
    "html_dom_text",
    "merge_wrapped_lines",
    "normalize_html_text",
    "normalize_pdf_text",
]
