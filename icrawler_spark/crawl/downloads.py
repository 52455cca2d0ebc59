"""Document download stage (ref pbc_monitor.py:572-813 work-queue, batch form).

The reference walks each entry's document queue serially: scheme filter →
allowed-types filter → seen-set skip → verify-local → reuse-existing →
download → (html only) detail-attachment expansion re-queued one level.
The batch dataflow runs the same rules as set operations per round:

    candidates = seen WHERE NOT downloaded
      ⟂ scheme/type filters                      (pbc_monitor.py:525-529, 588-590)
      → verify_local: downloaded ∧ file missing → cleared   (263-300)
      → reuse: structured filename ∈ listing → mark reused  (444-464)
      → fetch join pages → mark downloaded, local_path      (665-725)
      → html fetches → parse_detail_attachments UDF         (532-569, 734-761)
        → allowed filter → merge docs/seen → SECOND fetch pass (non-html by
          construction, so the recursion terminates at depth 1)

Downloads are idempotent per URL, so the batch outcome (downloaded set,
document tree) equals the reference's serial walk outcome — pinned by
tests/test_downloads.py against the extended pure-Python model.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import native
from ..functions.pandas_udfs import structured_filename as structured_filename_udf
from ..parsers import udfs
from .state import merge_documents, merge_seen


def _allowed(col, allowed_types: list[str] | None):
    if allowed_types is None:
        return F.lit(True)
    return F.lower(col).isin([t.lower() for t in allowed_types])


def _norm_type():
    return F.lower(
        F.coalesce(F.col("doc_type"), native.classify_document_type(F.col("url")))
    )


def run_download_stage(
    spark: SparkSession,
    pages: DataFrame,
    seen: DataFrame,
    documents: DataFrame,
    allowed_types: list[str] | None = None,
    existing_files: DataFrame | None = None,
    verify_local: bool = False,
) -> tuple[DataFrame, DataFrame, dict]:
    """One download round. Returns (seen', documents', metrics).

    ``pages`` doubles as the network: a URL "downloads" iff present there.
    ``existing_files(local_path)`` is the output-dir listing for the
    reuse-existing and verify-local joins."""
    metrics = {"files_downloaded": 0, "files_reused": 0, "attachments_discovered": 0}

    # verify_local: downloaded rows whose local file vanished lose the flag
    if verify_local and existing_files is not None:
        listing = existing_files.select(F.col("local_path").alias("_lp")).distinct()
        seen = (
            seen.join(listing, seen.local_path == F.col("_lp"), "left")
            .withColumn(
                "downloaded",
                F.when(
                    F.col("downloaded") & F.col("local_path").isNotNull() & F.col("_lp").isNull(),
                    F.lit(False),
                ).otherwise(F.col("downloaded")),
            )
            .drop("_lp")
        )

    cand = (
        seen.where(~F.coalesce("downloaded", F.lit(False)))
        .withColumn("_ntype", _norm_type())
        .where(native.is_supported_scheme(F.col("url")))
        .where(_allowed(F.col("_ntype"), allowed_types))
        .withColumn("_fname", structured_filename_udf(F.col("url"), F.col("_ntype")))
    )

    # reuse-existing: expected structured filename already on disk
    if existing_files is not None:
        listing = existing_files.select(F.col("local_path").alias("_fname")).distinct()
        reused = cand.join(F.broadcast(listing), "_fname", "left_semi")
        metrics["files_reused"] = reused.count()
        cand = cand.join(F.broadcast(listing), "_fname", "left_anti")
    else:
        reused = None

    def fetch_and_mark(c: DataFrame) -> DataFrame:
        """candidates ⋈ pages → downloaded rows (url, entry_id, _ntype, _fname, html)."""
        return c.join(pages.select("url", "html"), "url", "inner")

    first = fetch_and_mark(cand).persist()
    n_first = first.count()

    # html fetches → one level of detail-attachment expansion
    html_pages = first.where(F.col("_ntype") == "html").select(
        F.col("entry_id"), F.col("url"), F.col("html")
    )
    atts = udfs.parse_detail_attachments(
        html_pages.select(F.lit("task").alias("task"), "url", "html")
    ).join(
        html_pages.select(F.col("url").alias("page_url"), "entry_id"), "page_url"
    ).withColumn("_ntype", _norm_type()).where(
        native.is_supported_scheme(F.col("url")) & _allowed(F.col("_ntype"), allowed_types)
    ).select(
        "entry_id", "url", F.col("_ntype").alias("doc_type"), "title",
        (F.col("att_pos")).cast("long").alias("_src_pos"),
    ).persist()
    n_atts = atts.count()
    metrics["attachments_discovered"] = n_atts

    second = None
    if n_atts:
        documents = merge_documents(documents, atts)
        att_cand = (
            atts.join(seen.select("url"), "url", "left_anti")
            .withColumn("_ntype", _norm_type())
            .withColumn("_fname", structured_filename_udf(F.col("url"), F.col("_ntype")))
            .select("entry_id", "url", "title", "_ntype", "_fname")
        )
        second = fetch_and_mark(att_cand).persist()

    def downloaded_rows(df: DataFrame) -> DataFrame:
        # marks are per-url unique; the hash is only a deterministic
        # (repartition-stable) tie-break for merge_seen's newest-wins window
        return df.select(
            "url",
            "entry_id",
            F.col("title"),
            F.col("_ntype").alias("doc_type"),
            F.lit(True).alias("downloaded"),
            F.col("_fname").alias("local_path"),
            F.xxhash64("url").alias("_src_pos"),
        )

    marks = downloaded_rows(first)
    n_second = 0
    if second is not None:
        n_second = second.count()
        marks = marks.unionByName(downloaded_rows(second))
        att_seen = atts.select(
            "url", "entry_id", "title", "doc_type",
            F.lit(False).alias("downloaded"),
            F.lit(None).cast("string").alias("local_path"),
            "_src_pos",
        )
        seen = merge_seen(seen, att_seen)
    if reused is not None:
        marks = marks.unionByName(
            reused.select(
                "url", "entry_id", "title",
                F.col("_ntype").alias("doc_type"),
                F.lit(True).alias("downloaded"),
                F.col("_fname").alias("local_path"),
                F.xxhash64("url").alias("_src_pos"),
            )
        )

    metrics["files_downloaded"] = n_first + n_second
    seen = merge_seen(seen, marks)
    first.unpersist()
    atts.unpersist()
    if second is not None:
        second.unpersist()
    return seen, documents, metrics
