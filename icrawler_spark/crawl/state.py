"""Crawl state tables + snapshot checkpointing (Iceberg stand-in).

The reference keeps all state in one JSON file rewritten after every download
(ref state.py:368-381 — the 10^10-scale bottleneck). Here state lives in
parquet snapshot tables committed once per round with an atomic marker, which
gives the two properties the north_rule demands:

- *resumability*: a killed job resumes from the last committed round — the
  commit marker is written only after every table of the round is fully on
  disk (write-ahead ordering, rename-free because parquet dirs are written
  once and never mutated);
- *per-partition lineage/metrics*: each round commits a metrics table keyed
  by (round, stage) with row counts per stage.

On a real cluster these tables are Iceberg ``MERGE INTO`` targets; the merge
functions below implement the same upsert semantics as deterministic
DataFrame batch operations (one merge per table per round — SURVEY §4 hard
part (d)).

Merge semantics replicated from the reference:
- ``merge_seen``     — per-URL upsert; ``downloaded`` is never un-set
                       (ref state.py:164-172, 186-228)
- ``resolve_entry_identity`` — incoming entries adopt the entry_id of any
                       existing entry sharing a document URL; otherwise a
                       derived id: first html doc url → first doc url →
                       title::remark → serial::N (ref state.py:17-44, 56-132)
- ``merge_documents`` — per-(entry,url) dedup, first-wins in discovery order
                       (ref state.py:134-184)
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

SEEN_SCHEMA = (
    "url string, entry_id string, title string, doc_type string, "
    "downloaded boolean, local_path string"
)

FRONTIER_SCHEMA = (
    "task string, url string, netloc string, depth int, discovered_round int, "
    "discovery_pos bigint, status string"
)


class SnapshotStore:
    """Per-round parquet snapshots with atomic commit markers."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def _round_dir(self, rnd: int) -> str:
        return os.path.join(self.root, f"round={rnd:06d}")

    def _marker(self, rnd: int) -> str:
        return os.path.join(self._round_dir(rnd), "_COMMITTED")

    def latest_committed_round(self) -> int | None:
        rounds = []
        if not os.path.isdir(self.root):
            return None
        for name in os.listdir(self.root):
            if name.startswith("round=") and os.path.exists(
                os.path.join(self.root, name, "_COMMITTED")
            ):
                rounds.append(int(name.split("=")[1]))
        return max(rounds) if rounds else None

    def write_round(self, rnd: int, tables: dict[str, DataFrame]) -> None:
        rdir = self._round_dir(rnd)
        for name, df in tables.items():
            df.write.mode("overwrite").parquet(os.path.join(rdir, name))
        with open(self._marker(rnd), "w") as fh:
            fh.write("ok\n")  # marker last — commit point

    def read(self, rnd: int, name: str) -> DataFrame:
        return self.spark.read.parquet(os.path.join(self._round_dir(rnd), name))

    def has_table(self, rnd: int, name: str) -> bool:
        return os.path.isdir(os.path.join(self._round_dir(rnd), name))


# --- merge semantics ----------------------------------------------------------


def merge_seen(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """MERGE INTO seen USING batch ON url (ref state.py:173-228).

    - new URLs are inserted;
    - matched URLs take the NEWEST provided (non-null) title/type/path —
      ``mark_downloaded`` overwrites these fields in the reference
      (state.py:186-228) — while ``downloaded`` only ever upgrades
      false→true (state.py:164-172);
    - batch order is discovery order (``_src_pos``), newest = greatest.

    Batches without ``_src_pos`` get a deterministic content-hash
    pseudo-order (repartition-stable) — never
    ``monotonically_increasing_id``, whose partition-layout dependence
    would make the winner flip under an upstream repartition.
    """
    b = batch
    if "_src_pos" not in b.columns:
        b = b.withColumn("_src_pos", F.xxhash64(*[F.col(c) for c in b.columns]))
    b = b.withColumn("_is_new", F.lit(1))
    if existing is not None:
        e = existing.withColumn("_src_pos", F.lit(-1).cast("long")).withColumn("_is_new", F.lit(0))
        b = e.unionByName(b.select(*e.columns))
    newest = Window.partitionBy("url").orderBy(F.desc("_is_new"), F.desc("_src_pos")).rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    pick = Window.partitionBy("url").orderBy(F.desc("_is_new"), F.desc("_src_pos"))
    # truthy-wins like the reference file records (state.py:173-184): an
    # empty-string title/type/path never overwrites a real value
    return (
        b.withColumn("_rn", F.row_number().over(pick))
        .withColumn("_dl", F.max(F.coalesce(F.col("downloaded"), F.lit(False)).cast("int")).over(newest))
        .withColumn("_entry", F.first("entry_id", ignorenulls=True).over(newest))
        .withColumn("_title", F.first(F.nullif(F.col("title"), F.lit("")), ignorenulls=True).over(newest))
        .withColumn("_type", F.first(F.nullif(F.col("doc_type"), F.lit("")), ignorenulls=True).over(newest))
        .withColumn("_path", F.first(F.nullif(F.col("local_path"), F.lit("")), ignorenulls=True).over(newest))
        .where(F.col("_rn") == 1)
        .select(
            "url",
            F.col("_entry").alias("entry_id"),
            F.col("_title").alias("title"),
            F.col("_type").alias("doc_type"),
            (F.col("_dl") == 1).alias("downloaded"),
            F.col("_path").alias("local_path"),
        )
    )


def resolve_entry_identity(new_entries: DataFrame, existing_documents: DataFrame | None) -> DataFrame:
    """Assign entry_id to incoming parsed entries (ref state.py:17-44, 59-86).

    new_entries: (task, page_url, entry_pos, serial, title, remark,
    documents:array<struct{doc_type,url,title}>).

    Identity resolution = explode incoming doc URLs, left-join existing
    ``documents(entry_id, url)``, adopt the first matching entry_id (by doc
    position); otherwise derive: first html doc url → first doc url →
    'title::remark' → 'serial::N'.
    """
    # per-row key for the explode→join-back identity resolution. MUST be a
    # pure function of row content: the plan branches (ne + exploded), and a
    # monotonically_increasing_id recomputed per-branch under different
    # partition layouts would break the self-join. (page_url, entry_pos) is
    # unique per parsed entry by construction.
    ne = new_entries.withColumn(
        "_eid",
        F.concat_ws("\u001f", F.col("page_url"), F.col("entry_pos").cast("string")),
    )
    # F.get (not [0]): ANSI mode throws on out-of-bounds for entries whose
    # documents array is empty — get() returns NULL and coalesce moves on
    derived = (
        F.coalesce(
            F.get(F.filter(F.col("documents"), lambda d: d["doc_type"] == "html"), 0)["url"],
            F.get(F.col("documents"), 0)["url"],
            F.when(
                (F.coalesce(F.col("title"), F.lit("")) != "")
                | (F.coalesce(F.col("remark"), F.lit("")) != ""),
                F.concat_ws("::", F.coalesce(F.col("title"), F.lit("")), F.coalesce(F.col("remark"), F.lit(""))),
            ),
            F.concat(F.lit("serial::"), F.col("serial").cast("string")),
            # degenerate row (no docs/title/remark/serial): position key so
            # the id is never NULL
            F.concat(F.lit("pos::"), F.col("_eid")),
        )
    )
    ne = ne.withColumn("_derived_id", derived)
    if existing_documents is None:
        return ne.withColumn("entry_id", F.col("_derived_id")).drop("_eid", "_derived_id")

    exploded = ne.select(
        "_eid", F.posexplode_outer("documents").alias("_pos", "_doc")
    ).select("_eid", "_pos", F.col("_doc.url").alias("_durl"))
    match = (
        exploded.join(
            existing_documents.select(F.col("url").alias("_durl"), F.col("entry_id").alias("_matched")),
            "_durl",
        )
        .groupBy("_eid")
        .agg(F.min_by("_matched", "_pos").alias("_matched"))
    )
    return (
        ne.join(match, "_eid", "left")
        .withColumn("entry_id", F.coalesce(F.col("_matched"), F.col("_derived_id")))
        .drop("_eid", "_derived_id", "_matched")
    )


def merge_documents(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Per-(entry_id, url) dedup, existing rows win, then first-in-batch
    (ref state.py:134-184). batch: (entry_id, url, doc_type, title, _src_pos).

    The output RETAINS ``_src_pos`` (each row's original discovery
    position): downstream consumers — the state-export document arrays and
    the search index's best_path pick — need the insertion order the
    reference preserves, and it must survive merges as data."""
    b = batch
    if "_src_pos" not in b.columns:
        b = b.withColumn("_src_pos", F.xxhash64(*[F.col(c) for c in b.columns]))
    b = b.withColumn("_is_new", F.lit(1))
    if existing is not None:
        e = existing.withColumn("_is_new", F.lit(0))
        if "_src_pos" not in e.columns:
            e = e.withColumn("_src_pos", F.lit(-1).cast("long"))
        b = e.select(*b.columns).unionByName(b)
    w = Window.partitionBy("entry_id", "url").orderBy("_is_new", "_src_pos")
    return (
        b.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("entry_id", "url", "doc_type", "title", "_src_pos")
    )


def merge_entries(existing: DataFrame | None, batch: DataFrame) -> DataFrame:
    """Entry metadata upsert (ref state.py:56-132): matched entries update
    title/remark in place but KEEP their existing serial; new entries keep a
    valid unconflicted serial, otherwise get the reference's sequential
    ``next_serial`` (current max + 1 at their processing position).

    The reference processes entries one at a time, and ``serial_in_use``
    (ref state.py:110-118) includes serials kept/ASSIGNED by earlier entries
    of the same batch — so a literal serial equal to a value the walk just
    assigned must itself be reassigned. Cleanliness is therefore
    data-dependent on earlier assignments: a forward recurrence no fixed
    window expression can close over (a window formula misses the
    literal-equals-earlier-assigned collision, e.g. batch
    [(A, None), (B, 1)] must yield A=1, B=2). The conflict path runs as one
    Arrow group walk PER TASK over the fresh rows — serial uniqueness in the
    reference is per state file, i.e. per task (ref state.py:368-381), so
    tasks are independent serial spaces and walk in parallel; entries per
    task per round are listing rows (10^3-10^4), the same cost class as the
    global window it replaces — never the URL frontier. Static facts
    (membership in the task's existing serials, the task's existing max) are
    still computed relationally and fed in as columns.

    batch: (entry_id, task, serial, title, remark, _src_pos)."""
    b = batch
    if "_src_pos" not in b.columns:
        b = b.withColumn("_src_pos", F.xxhash64(*[F.col(c) for c in b.columns]))
    first_w = Window.partitionBy("entry_id").orderBy("_src_pos")
    b = b.withColumn("_rn", F.row_number().over(first_w)).where(F.col("_rn") == 1).drop("_rn")

    if existing is None:
        e_max = F.lit(0).cast("int")
        fresh = b
        updated = None
    else:
        e = existing
        updated = (
            e.alias("e")
            .join(b.alias("b"), "entry_id", "left")
            .select(
                "entry_id",
                F.col("e.task").alias("task"),
                F.col("e.serial").alias("serial"),  # keep existing serial
                F.coalesce(F.col("b.title"), F.col("e.title")).alias("title"),
                F.coalesce(F.col("b.remark"), F.col("e.remark")).alias("remark"),
            )
        )
        fresh = b.join(e.select("entry_id"), "entry_id", "left_anti")
        # serial uniqueness is PER STATE FILE in the reference — one file per
        # task (ref state.py:368-381) — so both the taken-set and the running
        # max are task-scoped, not global
        taken = e.select("task", "serial").where(F.col("serial").isNotNull()).distinct()
        fresh = fresh.join(
            taken.withColumn("_taken", F.lit(True)), ["task", "serial"], "left"
        )
        e_max = None  # joined below

    if existing is not None:
        max_serial = existing.groupBy("task").agg(
            F.coalesce(F.max("serial"), F.lit(0)).alias("_emax")
        )
        fresh = fresh.join(F.broadcast(max_serial), "task", "left").withColumn(
            "_emax", F.coalesce(F.col("_emax"), F.lit(0))
        )
    else:
        fresh = fresh.withColumn("_taken", F.lit(None).cast("boolean")).withColumn(
            "_emax", F.lit(0)
        )

    # Exact sequential walk (ref state.py:124-132): a serial is kept iff
    # valid (>0), unused by existing entries (_taken), and unused by earlier
    # kept/ASSIGNED serials of the same batch; otherwise next_serial =
    # running max + 1. Assigned values always exceed every existing serial
    # (max+1), so only batch-internal collisions need the dynamic set.
    def _serial_walk(pdf):
        import pandas as pd

        pdf = pdf.sort_values("_src_pos", kind="mergesort").reset_index(drop=True)
        mx = int(pdf["_emax"].iloc[0]) if len(pdf) else 0
        used: set = set()
        out = []
        for s, taken in zip(pdf["serial"], pdf["_taken"]):
            keep = (
                s is not None
                and not pd.isna(s)
                and int(s) > 0
                and not (taken == True)  # noqa: E712 — handles np.bool_/NaN/None
                and int(s) not in used
            )
            v = int(s) if keep else mx + 1
            used.add(v)
            if v > mx:
                mx = v
            out.append(v)
        pdf = pdf.assign(serial=pd.Series(out, dtype="int32"))
        return pdf[["entry_id", "task", "serial", "title", "remark"]]

    # one Arrow group PER TASK (the reference's serial space is the state
    # file = the task): tasks walk in parallel, and no single executor ever
    # holds more than one task's listing rows (10^3-10^4 each)
    inserted = fresh.groupBy("task").applyInPandas(
        _serial_walk,
        "entry_id string, task string, serial int, title string, remark string",
    )
    if updated is None:
        return inserted
    return updated.unionByName(inserted)


def compact_tables(entries: DataFrame, documents: DataFrame) -> tuple[DataFrame, DataFrame, dict]:
    """Dedupe-maintenance pass (ref scripts/dedupe_state.py:60-97): collapse
    entries that share any document URL into one canonical entry (the
    re-canonicalization ``from_jsonable``→``ensure_entry`` performs), and
    drop duplicate (entry, url) document rows.

    One-step collapse: url → min(entry_id) → entry remap; the reference's
    incremental ensure_entry is also single-step per entry. Returns
    (entries', documents', metrics)."""
    canon_by_url = documents.groupBy("url").agg(F.min("entry_id").alias("_canon"))
    entry_map = (
        documents.join(canon_by_url, "url")
        .groupBy("entry_id")
        .agg(F.min("_canon").alias("_target"))
    )
    remapped_docs = (
        documents.join(entry_map, "entry_id", "left")
        .withColumn("entry_id", F.coalesce(F.col("_target"), F.col("entry_id")))
        .drop("_target")
    )
    # remapped_docs keeps its _src_pos (merge_documents retains it), so
    # first-wins after the remap is still discovery order
    docs2 = merge_documents(None, remapped_docs)
    ent2 = (
        entries.join(entry_map, "entry_id", "left")
        .withColumn("_target", F.coalesce(F.col("_target"), F.col("entry_id")))
        .where(F.col("entry_id") == F.col("_target"))
        .drop("_target")
    )
    metrics = {
        "entries_before": entries.count(),
        "entries_after": ent2.count(),
        "documents_before": documents.count(),
        "documents_after": docs2.count(),
    }
    return ent2, docs2, metrics
