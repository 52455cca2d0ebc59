"""Copy-by-title export: downloaded files renamed to display titles.

DataFrame re-expression of ref export_titles.py:112-200 (tests
ref tests/test_export_titles.py): pick each downloaded document's best
display title (document title → entry title → file-record title →
local_path stem → url → document_{serial}), sanitize with safe_filename,
append the source extension, and uniquify collisions with ``_N`` suffixes in
state-iteration order.

Plan shape: one join (documents ⋈ entries), a pandas-UDF sanitize, and one
window per (basename, extension) group for the collision suffix — the same
window the oracle-checked ``collision_suffixes`` query pins. The executable
path (``copy_documents_by_title``) replays the reference's sequential
``_unique_filename`` walk over the ordered plan rows, so destination-dir
collisions and the ``a_1.pdf`` suffix-domain edge resolve exactly as the
reference; only the pure-DataFrame ``destination_name`` preview keeps the
window approximation (identical on an empty destination).

The copy itself is a driver loop over the plan for local filesystems; on a
cluster the plan DataFrame feeds a distributed copy (foreachPartition with
the object-store client).
"""

from __future__ import annotations

import os
import shutil
from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.pandas_udfs import safe_filename as safe_filename_udf


@dataclass
class ExportReport:
    copied: int = 0
    skipped_missing_source: int = 0
    skipped_without_path: int = 0

    def total_processed(self) -> int:
        return self.copied + self.skipped_missing_source + self.skipped_without_path


def export_titles_plan(entries: DataFrame, documents: DataFrame, seen: DataFrame) -> DataFrame:
    """(source, destination_name) plan rows for every downloaded document.

    entries:   (entry_id, task, serial, title, remark)
    documents: (entry_id, url, doc_type, title[, _src_pos])
    seen:      (url, entry_id, title, doc_type, downloaded, local_path)
    """
    pos = F.col("_src_pos") if "_src_pos" in documents.columns else F.lit(0)
    docs = documents.select(
        "entry_id", "url",
        F.col("title").alias("_doc_title"),
        pos.alias("_pos"),
    )
    dl = seen.where(F.col("downloaded")).select(
        "url",
        F.col("title").alias("_rec_title"),
        F.col("local_path").alias("local_path"),
    )
    ent = entries.select("entry_id", F.col("title").alias("_entry_title"), "serial")
    joined = docs.join(dl, "url").join(F.broadcast(ent), "entry_id", "left")

    # Path.stem: strip only the LAST suffix, and a leading-dot-only name
    # ('.bashrc') keeps itself (ref export_titles.py:84 Path(...).stem)
    fname = F.element_at(F.split(F.col("local_path"), "/"), -1)
    last_stem = F.regexp_extract(fname, r"^(.+)\.[^.]+$", 1)
    stem = F.when(last_stem != "", last_stem).otherwise(fname)
    # ''.join(Path.suffixes): everything after the first dot of the
    # leading-dot-stripped name (ref :183; '.bashrc' → none, 'a.v2.pdf' →
    # '.v2.pdf', 'a..b' → '..b'); a name ENDING in '.' has no suffixes at
    # all on py3.11 (PurePath('a.b.').suffixes == []), verified empirically
    lstripped = F.expr("trim(LEADING '.' FROM element_at(split(local_path, '/'), -1))")
    ext_body = F.regexp_extract(lstripped, r"^[^.]*\.(.+)$", 1)
    ext = F.when(
        F.col("local_path").isNotNull()
        & (ext_body != "")
        & ~lstripped.endswith("."),
        F.concat(F.lit("."), ext_body),
    ).otherwise(F.lit(""))

    def nonblank(c):
        return F.nullif(F.trim(F.coalesce(c, F.lit(""))), F.lit(""))

    candidates = [
        nonblank(F.col("_doc_title")),
        nonblank(F.col("_entry_title")),
        nonblank(F.col("_rec_title")),
        nonblank(stem),
        nonblank(F.col("url")),
        F.when(F.col("serial").isNotNull(), F.concat(F.lit("document_"), F.col("serial"))),
    ]
    # sanitize each candidate, take the first that survives (≠ '_' / empty)
    plan = joined.withColumn("_ext", ext)
    for i, c in enumerate(candidates):
        plan = plan.withColumn(f"_cand{i}", safe_filename_udf(c))
    sanitized = F.coalesce(
        *[
            F.when(
                (F.col(f"_cand{i}") != "_") & (F.col(f"_cand{i}") != ""),
                F.col(f"_cand{i}"),
            )
            for i in range(len(candidates))
        ]
    )
    plan = plan.withColumn("_base", sanitized)
    # the reference iterates state.entries in INSERTION order, then each
    # entry's documents in list order (ref _iter_documents:46-64) — NOT by
    # serial. Entry insertion order = the entry's first document position.
    w_entry = Window.partitionBy("entry_id")
    plan = plan.withColumn("_entry_pos", F.min("_pos").over(w_entry))
    iter_order = [F.asc("_entry_pos"), F.asc("_pos"), F.asc("url")]
    # all-candidates-failed rows: document_{counter} in iteration order
    w_unnamed = Window.orderBy(*iter_order)
    plan = plan.withColumn(
        "_base",
        F.coalesce(
            F.col("_base"),
            F.concat(
                F.lit("document_"),
                F.sum(F.col("_base").isNull().cast("int")).over(
                    w_unnamed.rowsBetween(Window.unboundedPreceding, 0)
                ),
            ),
        ),
    )
    # collision suffixes: first keeps the bare name, later ones get _N —
    # same semantics as the oracle-checked collision_suffixes query
    w_coll = Window.partitionBy("_base", "_ext").orderBy(*iter_order)
    plan = plan.withColumn("_k", F.row_number().over(w_coll) - 1)
    dest = F.when(F.col("_k") == 0, F.concat("_base", "_ext")).otherwise(
        F.concat("_base", F.lit("_"), F.col("_k").cast("string"), "_ext")
    )
    return plan.select(
        F.col("local_path").alias("source"),
        dest.alias("destination_name"),
        F.col("_base").alias("base_name"),
        F.col("_ext").alias("extension"),
        "url",
        "entry_id",
        F.col("serial"),
        F.col("_entry_pos").alias("entry_pos"),
        F.col("_pos").alias("doc_pos"),
    )


def copy_documents_by_title(
    entries: DataFrame,
    documents: DataFrame,
    seen: DataFrame,
    destination_dir: str,
    *,
    dry_run: bool = False,
    overwrite: bool = False,
) -> tuple[ExportReport, list[tuple[str, str]]]:
    """Execute the plan against a local filesystem (ref 129-199 semantics:
    count skips for path-less and missing-source documents; copy the rest).

    Final name uniquification replays the reference's sequential
    ``_unique_filename`` walk (ref :111-132) over the ordered plan rows:
    the collision test covers names used earlier in this export AND files
    already present in ``destination_dir`` (so a non-empty destination is
    never silently overwritten), iterating ``base_N.ext`` until free;
    ``overwrite=True`` takes the bare candidate unconditionally. On an
    empty destination this equals the plan's window-assigned
    ``destination_name`` exactly."""
    report = ExportReport()
    # path-less downloaded docs are counted, not planned
    pathless = (
        documents.select("entry_id", "url")
        .join(
            seen.where(
                F.col("downloaded")
                & (F.coalesce(F.trim(F.col("local_path")), F.lit("")) == "")
            ).select("url"),
            "url",
        )
        .count()
    )
    report.skipped_without_path = int(pathless)

    # reference order: existence is checked BEFORE a name is assigned, so a
    # missing source never consumes a filename (ref 165-172). Resolve
    # existence on the distinct path set first, count misses per document
    # row, and run the naming window only over copyable rows.
    with_path = seen.where(F.coalesce(F.trim(F.col("local_path")), F.lit("")) != "")
    paths = [r.local_path for r in with_path.select("local_path").distinct().collect()]
    existing = {p for p in paths if os.path.exists(p)}
    missing_docs = (
        documents.select("url")
        .join(
            with_path.where(
                F.col("downloaded") & ~F.col("local_path").isin(list(existing) or [""])
            ).select("url"),
            "url",
        )
        .count()
    )
    report.skipped_missing_source = int(missing_docs)

    plan_rows = (
        export_titles_plan(
            entries,
            documents,
            with_path.where(F.col("local_path").isin(list(existing) or [""])),
        )
        .orderBy("entry_pos", "doc_pos", "url")
        .collect()
    )
    plans: list[tuple[str, str]] = []
    if not dry_run:
        os.makedirs(destination_dir, exist_ok=True)
    used_names: set[str] = set()
    for r in plan_rows:
        candidate = f"{r.base_name}{r.extension}"
        if not overwrite:
            n = 1
            while candidate in used_names or os.path.exists(
                os.path.join(destination_dir, candidate)
            ):
                candidate = f"{r.base_name}_{n}{r.extension}"
                n += 1
        used_names.add(candidate)
        dest = os.path.join(destination_dir, candidate)
        plans.append((r.source, dest))
        if not dry_run:
            shutil.copy2(r.source, dest)
        report.copied += 1
    return report, plans
