"""Upload-pipeline filter/sort/lookback rules (SURVEY §2.2 P3/P5, §2.5 W2,
§2.6 O1/O2).

Reference: TimelineCommitInstantsUploader.java —
- shouldIncludeFile (:835-874): not a directory; last_modified >=
  checkpoint_ts (when the flag is on); filename matches an instant
  pattern; not already uploaded; not hoodie.properties; not blank
- already-uploaded (:850-874): active timeline compares commit ids as
  BigDecimal <= last uploaded (skipped entirely in CONTINUE mode);
  archived compares the numeric token from `.archive.(\\d+)_`
- sort (:812-819): active lexicographic by filename; archived numeric
- batch_id==0 prepends hoodie.properties (:830-834)
- getLastUploadedFileFromBatch (:982-1026): archived -> last file;
  savepoint tail -> 2nd-to-last; rollback tail -> 1/2/3-file lookback;
  otherwise 3rd-to-last

All filters are single-pass columnar predicates (Catalyst pushes them to
the scan); only the per-batch lookback is Python, and it runs on the tiny
per-batch tail, driver- or task-side.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from lakeview_spark.constants import (
    ACTIVE_COMMIT_INSTANT_PATTERN,
    ARCHIVED_COMMIT_INSTANT_PATTERN,
    ARCHIVED_COMMIT_INSTANT_PATTERN_V2,
    HOODIE_PROPERTIES_FILE,
    SAVEPOINT_ACTION,
    ROLLBACK_ACTION,
    V1_ARCHIVED_NUMERIC_PATTERN,
    full_match,
)
from lakeview_spark.operators.batcher import (
    CONTINUE,
    _are_related,
    _are_related_sp_rb,
    parse_instant,
)

ACTIVE = "active"
ARCHIVED = "archived"


def is_instant_file(filename: Column) -> Column:
    """isInstantFile (:876-880): any of the three full-match patterns."""
    return (
        filename.rlike(full_match(ACTIVE_COMMIT_INSTANT_PATTERN))
        | filename.rlike(full_match(ARCHIVED_COMMIT_INSTANT_PATTERN))
        | filename.rlike(full_match(ARCHIVED_COMMIT_INSTANT_PATTERN_V2))
    )


def commit_id_col(filename: Column) -> Column:
    """Active-timeline commit id as DECIMAL(38,0) (:940-946)."""
    tok0 = F.split(filename, r"\.", 2)[0]
    return F.split(tok0, "_", 2)[0].try_cast("decimal(38,0)")


def archived_numeric_col(filename: Column) -> Column:
    """Numeric token of a V1 archived name (:948-956)."""
    return F.regexp_extract(filename, V1_ARCHIVED_NUMERIC_PATTERN, 1).try_cast("long")


def files_to_upload(
    files_df: DataFrame,
    checkpoints_df: DataFrame,
    timeline_type: str = ACTIVE,
    strategy: str = "BLOCK_ON_INCOMPLETE_COMMIT",
    apply_last_modified_filter: bool = False,
) -> DataFrame:
    """getFilesToUploadBasedOnPreviousCheckpoint (:796-838) as one columnar
    filter over (files ⋈broadcast checkpoints).

    Emits a `sort_key` column; ordering/batching happens downstream (the
    batcher re-sorts per table). hoodie.properties prepending for
    batch_id==0 is represented by KEEPING the properties row when
    batch_id==0 (the batcher pins it first via its sort rule).

    apply_last_modified_filter defaults to False: both reference call
    sites (:190, :485) pass false — incrementality comes from startAfter
    listing pushdown + the already-uploaded commit-id compare.
    """
    ckpt = checkpoints_df.select(
        "table_id",
        F.col("batch_id").alias("_ckpt_batch_id"),
        F.col("checkpoint_ts").alias("_ckpt_ts"),
        F.col("last_uploaded_file").alias("_last_uploaded"),
    )
    df = files_df.join(F.broadcast(ckpt), "table_id", "left")
    fn = F.col("filename")

    keep = (
        (~F.col("is_directory"))
        & is_instant_file(fn)
        & (fn != F.lit(HOODIE_PROPERTIES_FILE))
        & (F.trim(fn) != "")
    )
    if apply_last_modified_filter:
        keep = keep & (
            F.col("_ckpt_ts").isNull() | (F.col("last_modified") >= F.col("_ckpt_ts"))
        )

    # already-uploaded filter (:850-874)
    has_ckpt_file = (
        F.col("_ckpt_batch_id").isNotNull()
        & (F.col("_ckpt_batch_id") != 0)
        & F.coalesce(
            F.col("_last_uploaded").rlike(full_match(ACTIVE_COMMIT_INSTANT_PATTERN))
            | F.col("_last_uploaded").rlike(full_match(ARCHIVED_COMMIT_INSTANT_PATTERN))
            | F.col("_last_uploaded").rlike(full_match(ARCHIVED_COMMIT_INSTANT_PATTERN_V2)),
            F.lit(False),
        )
    )
    if timeline_type == ACTIVE:
        if strategy != CONTINUE:
            already = has_ckpt_file & (
                commit_id_col(fn) <= commit_id_col(F.col("_last_uploaded"))
            )
            keep = keep & ~F.coalesce(already, F.lit(False))
        # CONTINUE mode never skips by commit id (:856-861)
        sort_key = fn
    else:
        already = has_ckpt_file & (
            archived_numeric_col(fn) <= archived_numeric_col(F.col("_last_uploaded"))
        )
        keep = keep & ~F.coalesce(already, F.lit(False))
        sort_key = archived_numeric_col(fn)

    # batch_id==0 => synthesize the hoodie.properties row with EPOCH
    # last_modified, exactly like HOODIE_PROPERTIES_FILE_OBJ
    # (MetadataExtractorConstants.java:71-77) — the archived dir listing
    # never contains it, so it cannot come from files_df
    tables_in_scope = files_df.select("table_id").distinct()
    props = (
        tables_in_scope.join(F.broadcast(ckpt), "table_id", "left")
        .filter(F.coalesce(F.col("_ckpt_batch_id"), F.lit(0)) == 0)
        .select(
            "table_id",
            F.lit(timeline_type).alias("timeline"),
            F.lit(HOODIE_PROPERTIES_FILE).alias("filename"),
            F.to_timestamp(F.lit("1970-01-01 00:00:00")).alias("last_modified"),
            F.lit(False).alias("is_directory"),
            F.lit(0).cast("long").alias("size"),
            F.col("_ckpt_batch_id"),
            F.col("_ckpt_ts"),
            F.col("_last_uploaded"),
        )
    )
    kept = df.filter(keep).unionByName(props.select(*df.columns))
    return kept.withColumn("sort_key", sort_key).drop(
        "_ckpt_batch_id", "_ckpt_ts", "_last_uploaded"
    )


def last_uploaded_file_from_batch(batch: list[str], timeline_type: str = ACTIVE) -> str:
    """getLastUploadedFileFromBatch (:982-1026) on one ordered batch."""
    if timeline_type == ARCHIVED:
        return batch[-1]
    if len(batch) == 1 and batch[0] == HOODIE_PROPERTIES_FILE:
        return batch[0]

    last = parse_instant(batch[-1])
    if last.action == SAVEPOINT_ACTION:
        return batch[-2]
    if last.action == ROLLBACK_ACTION:
        i = len(batch) - 1
        if i >= 2 and _are_related(
            last, parse_instant(batch[i - 1]), parse_instant(batch[i - 2])
        ):
            return batch[i - 2]
        if i >= 1 and _are_related_sp_rb(last, parse_instant(batch[i - 1])):
            return batch[i - 1]
        return batch[i]
    return batch[-3]


def start_after(checkpoint: dict, strategy: str, is_first_fetch: bool = True) -> str | None:
    """getStartAfterString (:958-980): listing resume point pushed to the
    object store (predicate pushdown into ListObjectsV2/startOffset)."""
    last = checkpoint.get("last_uploaded_file") or ""
    if last == HOODIE_PROPERTIES_FILE or not last.strip():
        return None
    if strategy != CONTINUE or not is_first_fetch:
        return last
    first_incomplete = checkpoint.get("first_incomplete_commit_file") or ""
    return first_incomplete if first_incomplete.strip() else last
