"""Document outline builder (ref build_outline_from_text
policy_finder.py:854-930): line-classify article/paragraph/item/bullet into
a nested outline.

Quirk note: the reference's ``item_pattern`` is a non-f-string containing the
literal text ``{_CLAUSE_NUMBER_CLASS}`` (policy_finder.py:864), so paren
items never match there and only bullets produce children. This
implementation fixes the pattern (items match properly) — the reference's
own API test only asserts article+children, which both behaviors satisfy.

Spark lifting: ``outline_udf`` returns the outline as a JSON string column —
nested arbitrary-depth dicts don't map to a fixed StructType, and the
consumers (serving layer) want JSON anyway.
"""

from __future__ import annotations

import json

from ..functions.pure import chinese_to_int
from .clause import NUMBER_CLASS, _normalize_line

import re

_ARTICLE_RE = re.compile(rf"^第\s*({NUMBER_CLASS}+)\s*条")
_PARAGRAPH_RE = re.compile(rf"^第\s*({NUMBER_CLASS}+)\s*(款|段)")
_ITEM_RE = re.compile(rf"^[（(]\s*({NUMBER_CLASS}+)\s*[)）]")
_BULLET_RE = re.compile(rf"^({NUMBER_CLASS}+)\s*(?:、|\.|．|﹒|:|：|·|•)")


def _num(text: str) -> int | None:
    v = chinese_to_int(text)
    if v is not None:
        return v
    return int(text) if text.isdigit() else None


def build_outline(text: str) -> list[dict]:
    if not text:
        return []
    lines = text.replace("\r\n", "\n").replace("\r", "\n").split("\n")
    outline: list[dict] = []
    article: dict | None = None
    paragraph: dict | None = None
    for raw in lines:
        norm = _normalize_line(raw)
        label = raw.strip() or norm
        if not label:
            continue
        m = _ARTICLE_RE.match(norm)
        if m:
            article = {"type": "article", "number": _num(m.group(1)), "label": label, "children": []}
            outline.append(article)
            paragraph = None
            continue
        if article is None:
            continue
        m = _PARAGRAPH_RE.match(norm)
        if m:
            paragraph = {"type": "paragraph", "number": _num(m.group(1)), "label": label, "children": []}
            article["children"].append(paragraph)
            continue
        m = _ITEM_RE.match(norm) or _BULLET_RE.match(norm)
        if m:
            (paragraph or article)["children"].append(
                {"type": "item", "number": _num(m.group(1)), "label": label}
            )
    return outline


def outline_udf():
    """texts.text → outline JSON string (Arrow-batched)."""
    import pandas as pd  # noqa: F401 — needed at module scope of the closure
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    def _outline(texts):
        return texts.map(lambda t: json.dumps(build_outline(t or ""), ensure_ascii=False))

    return pandas_udf(_outline, StringType())
