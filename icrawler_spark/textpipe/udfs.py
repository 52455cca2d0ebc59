"""Spark lifting of the text pipeline (the extract ETL of SURVEY §3.3).

``documents ⋈ fetches(content)`` → grouped per entry → candidate walk inside
an Arrow-batched ``applyInPandas`` → one row per entry in the ``texts`` table
``(entry_id, url, text, source_type, status, needs_ocr, char_count)``.

Embarrassingly parallel: the shuffle key is entry_id (bounded groups — an
entry has a handful of documents), the candidate walk is doc-local Python on
Arrow batches, and everything downstream (search indexing, clause slicing)
reads the columnar result.
"""

from __future__ import annotations

import os
from urllib.parse import urlparse

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    BooleanType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .extract import _DEFAULT_PDF, PdfExtractor, _resolve_pdf, extract_best

TEXTS_SCHEMA = StructType([
    StructField("entry_id", StringType()),
    StructField("url", StringType()),
    StructField("text", StringType()),
    StructField("source_type", StringType()),
    StructField("status", StringType()),
    StructField("needs_ocr", BooleanType()),
    StructField("char_count", LongType()),
])


def url_suffix(url: str) -> str:
    path = urlparse(url or "").path
    return os.path.splitext(path)[1]


def extract_entry_texts(
    fetched_docs: DataFrame, pdf_extractor: PdfExtractor | None = _DEFAULT_PDF
) -> DataFrame:
    """fetched_docs(entry_id, url, doc_type, content, pos) → texts table.

    ``pos`` is the document position within the entry (discovery order) —
    carried as data so the priority walk is deterministic under partitioning.
    PDF candidates go through the built-in from-scratch extractor by default
    (``textpipe.pdf``); pass ``None`` to disable or a callable to override.
    """
    required = {"entry_id", "url", "doc_type", "content", "pos"}
    missing = required - set(fetched_docs.columns)
    if missing:
        raise ValueError(f"extract_entry_texts: missing columns {sorted(missing)}")
    # resolve the default driver-side so the executor closure captures a
    # plain module-level callable (pickled by reference)
    pdf_extractor = _resolve_pdf(pdf_extractor)

    def run(key, pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("pos")
        docs = [
            (
                bytes(r.content) if r.content is not None else None,
                r.doc_type,
                url_suffix(r.url),
            )
            for r in pdf.itertuples(index=False)
        ]
        res = extract_best(docs, pdf_extractor)
        first_url = pdf["url"].iloc[0] if len(pdf) else None
        return pd.DataFrame(
            {
                "entry_id": [key[0]],
                "url": [first_url],
                "text": [res.text],
                "source_type": [res.source_type],
                "status": [res.status],
                "needs_ocr": [bool(res.needs_ocr)],
                "char_count": [len(res.text)],
            }
        )

    return fetched_docs.groupBy("entry_id").applyInPandas(run, TEXTS_SCHEMA)
