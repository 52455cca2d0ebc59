"""State JSON export/import — the state.json-compatible artifact surface.

The reference persists everything as one pretty-printed JSON file
(ref state.py:258-381). Here the nested shape is *recovered* from the
normalized tables when an artifact is needed:

- ``state_export_df``  — entries ⋈ documents → one struct row per entry with
  the reference's serialization rules (ref to_jsonable state.py:258-290):
  documents keep (type, url, title) and only carry ``downloaded``/
  ``local_path`` when set; entry order = (serial is null, serial, title).
- ``state_export_json`` — the full {"entries":[...]} document (driver-side
  json.dumps with ensure_ascii=False + indent 2, matching save_state
  state.py:368-381). Collecting is fine: the artifact itself is a single
  file by definition.
- ``legacy_state_to_entries`` — migration of the pre-entries formats
  ({url: name} dict or url list — ref from_jsonable state.py:328-359) into
  (entry, document) rows with downloaded=True.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.pure import classify_document_type


def state_export_df(entries: DataFrame, documents: DataFrame) -> DataFrame:
    """One row per entry: (serial, title, remark, documents array, sort rank)."""
    # document array order = discovery order, carried as data (_src_pos from
    # merge_documents); content-struct order is the deterministic fallback
    # for tables that never went through a merge.
    if "_src_pos" in documents.columns:
        docs = documents.withColumn("_pos", F.struct(F.col("_src_pos")))
    else:
        docs = documents.withColumn(
            "_pos", F.struct(F.col("doc_type"), F.col("url"), F.col("title"))
        )
    nested = docs.groupBy("entry_id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("_pos").alias("pos"),
                    F.struct(
                        F.col("doc_type").alias("type"),
                        F.col("url").alias("url"),
                        F.coalesce(F.col("title"), F.lit("")).alias("title"),
                    ).alias("doc"),
                )
            )
        ).alias("_docs")
    ).select(
        "entry_id", F.transform(F.col("_docs"), lambda x: x["doc"]).alias("documents")
    )
    out = entries.join(nested, "entry_id", "left").select(
        "serial",
        F.coalesce(F.col("title"), F.lit("")).alias("title"),
        F.coalesce(F.col("remark"), F.lit("")).alias("remark"),
        F.coalesce(F.col("documents"), F.array().cast(
            "array<struct<type:string,url:string,title:string>>")).alias("documents"),
    )
    # reference export order (state.py:283-289)
    return out.orderBy(F.col("serial").isNull(), F.coalesce("serial", F.lit(0)), "title")


def state_export_json(entries: DataFrame, documents: DataFrame, seen: DataFrame | None = None) -> str:
    """The state.json document text (pretty, ensure_ascii=False)."""
    rows = state_export_df(entries, documents).collect()
    seen_map: dict[str, tuple[bool, str | None]] = {}
    if seen is not None:
        seen_map = {
            r.url: (bool(r.downloaded), r.local_path)
            for r in seen.select("url", "downloaded", "local_path").collect()
        }
    entries_list = []
    for r in rows:
        docs = []
        for d in r.documents or []:
            doc = {"type": d.type, "url": d.url, "title": d.title or ""}
            downloaded, local_path = seen_map.get(d.url, (False, None))
            if downloaded:
                doc["downloaded"] = True
            if isinstance(local_path, str) and local_path:
                doc["local_path"] = local_path
            docs.append(doc)
        entries_list.append(
            {"serial": r.serial, "title": r.title, "remark": r.remark, "documents": docs}
        )
    return json.dumps({"entries": entries_list}, ensure_ascii=False, indent=2)


def state_json_to_tables(
    spark: SparkSession, data: object, task: str = "task"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """state.json document → (entries, documents, seen) tables — the inverse
    of ``state_export_json`` (ref from_jsonable state.py:300-359). entry_id
    derivation mirrors ``resolve_entry_identity``: first html doc url →
    first doc url → title::remark → serial::N. Driver-side by definition
    (the artifact is one JSON file); the tables come out merge-shaped
    (``_src_pos`` carries document discovery order)."""
    ents = data.get("entries", []) if isinstance(data, dict) else []
    e_rows, d_rows, s_rows = [], [], []
    for pos, ent in enumerate(ents):
        if not isinstance(ent, dict):
            continue
        docs = [d for d in (ent.get("documents") or []) if isinstance(d, dict)]
        title = str(ent.get("title") or "")
        remark = str(ent.get("remark") or "")
        serial = ent.get("serial")
        eid = next((d.get("url") for d in docs if d.get("type") == "html" and d.get("url")), None)
        if eid is None:
            eid = next((d.get("url") for d in docs if d.get("url")), None)
        if eid is None and (title or remark):
            eid = f"{title}::{remark}"
        if eid is None:
            eid = f"serial::{serial}"
        e_rows.append((str(eid), task, serial, title, remark, pos))
        for i, d in enumerate(docs):
            url = d.get("url")
            if not isinstance(url, str):
                continue
            dtitle = str(d.get("title") or "")
            dtype = str(d.get("type") or "") or None
            sp = pos * 1000 + i
            d_rows.append((str(eid), url, dtype, dtitle, sp))
            s_rows.append(
                (url, str(eid), dtitle, dtype, bool(d.get("downloaded")),
                 d.get("local_path") if isinstance(d.get("local_path"), str) else None, sp)
            )
    entries = spark.createDataFrame(
        e_rows,
        "entry_id string, task string, serial int, title string, remark string, _src_pos long",
    )
    documents = spark.createDataFrame(
        d_rows, "entry_id string, url string, doc_type string, title string, _src_pos long"
    )
    seen = spark.createDataFrame(
        s_rows,
        "url string, entry_id string, title string, doc_type string, "
        "downloaded boolean, local_path string, _src_pos long",
    )
    return entries, documents, seen


def legacy_state_to_entries(spark: SparkSession, data: object, task: str = "task") -> DataFrame:
    """Legacy formats → (task, entry_id, serial, title, remark, url,
    doc_type, doc_title, downloaded) rows (ref state.py:328-359):

    - dict {url: name}: one entry per url, title=name, downloaded=True
    - list of urls / {url, name} dicts: same with name='' for bare urls
    """
    items: list[tuple[str, str]] = []
    if isinstance(data, dict):
        items = [(u, str(n) if n is not None else "") for u, n in data.items() if isinstance(u, str)]
    elif isinstance(data, list):
        for it in data:
            if isinstance(it, str):
                items.append((it, ""))
            elif isinstance(it, dict) and isinstance(it.get("url"), str):
                items.append((it["url"], str(it.get("name", "") or "")))
    rows = [
        (task, url, None, title, "", url, classify_document_type(url), title or url, True)
        for url, title in items
    ]
    return spark.createDataFrame(
        rows,
        "task string, entry_id string, serial int, title string, remark string, "
        "url string, doc_type string, doc_title string, downloaded boolean",
    )
