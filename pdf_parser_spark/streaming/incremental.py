"""S1-S3 — cursor-checkpointed incremental ingestion (the Plaid-sync shape).

Reference semantics (routes/plaid.py:213-346): pull pages of
added/modified/removed records from a cursored source, upsert/delete into the
store with deterministic ids, and persist the cursor only after the whole
item is applied — crash ⇒ re-pull ⇒ idempotent.

Two equivalent Spark realizations:

1. `IncrementalSync` — incremental *batch*: the source is a directory that
   accumulates change files (`changes-<seq>.parquet`, each row carries
   ``op ∈ {upsert, remove}`` and a monotonically increasing ``seq``); the
   cursor is the last fully-applied seq, persisted in
   ``<target>/_cursor.json`` AFTER the merged table commit (commit-last,
   plaid.py:345). The merge itself is D3's keep-latest window — on an Iceberg
   cluster this is `MERGE INTO target USING batch ON target.id = batch.id
   WHEN MATCHED ... WHEN NOT MATCHED ...`, same dataframe, one snapshot.

2. `stream_sync` — Structured Streaming over the same directory with
   ``Trigger.availableNow`` + ``foreachBatch``: Spark's own checkpoint
   directory replaces the hand-rolled cursor (exactly-once file-source
   progress tracking), and each micro-batch applies the same merge.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window as W

CHANGE_RE = re.compile(r"changes-(\d+)\.parquet$")


def apply_changes(target: DataFrame | None, batch: DataFrame, key: str = "id") -> DataFrame:
    """MERGE semantics on DataFrames: upsert keep-latest, then apply removes.

    `batch` columns: key, op ('upsert'|'remove'), seq (monotone), payload...
    D3/E2 keep-latest: one survivor per key, ordered by seq desc — late or
    duplicated change rows (S3) collapse to the newest state.
    """
    if target is not None:
        # existing rows participate with seq = -1 so any change row wins
        existing = target.withColumn("op", F.lit("upsert")).withColumn(
            "seq", F.lit(-1).cast("long")
        )
        allrows = existing.unionByName(batch.select(*existing.columns))
    else:
        allrows = batch
    w = W.partitionBy(key).orderBy(F.col("seq").desc())
    latest = (
        allrows.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    return latest.filter(F.col("op") != "remove").drop("op", "seq")


class IncrementalSync:
    """Cursor-checkpointed incremental batch sync into a parquet target."""

    def __init__(self, spark: SparkSession, source_dir: str, target_dir: str, key: str = "id"):
        self.spark = spark
        self.source_dir = source_dir
        self.target_dir = target_dir
        self.key = key
        self.cursor_path = os.path.join(target_dir, "_cursor.json")

    def cursor(self) -> int:
        if os.path.exists(self.cursor_path):
            with open(self.cursor_path) as fh:
                return int(json.load(fh)["seq"])
        return -1

    def _persist_cursor(self, seq: int) -> None:
        os.makedirs(self.target_dir, exist_ok=True)
        tmp = self.cursor_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"seq": seq}, fh)
            fh.flush()
            os.fsync(fh.fileno())
        os.replace(tmp, self.cursor_path)

    def pending_files(self) -> list[tuple[int, str]]:
        cur = self.cursor()
        out = []
        if not os.path.isdir(self.source_dir):
            return out
        for f in os.listdir(self.source_dir):
            m = CHANGE_RE.search(f)
            if m and int(m.group(1)) > cur:
                out.append((int(m.group(1)), os.path.join(self.source_dir, f)))
        return sorted(out)

    def _read_target(self) -> DataFrame | None:
        data = os.path.join(self.target_dir, "data")
        old = data + ".old"
        # crash recovery: a crash between `replace(data, data.old)` and
        # `replace(tmp, data)` in sync() leaves only data.old — restore it so
        # the accumulated table is never silently lost (the cursor was not
        # advanced, so the pending files simply re-apply on top: idempotent).
        if not os.path.isdir(data) and os.path.isdir(old):
            os.replace(old, data)
        if os.path.isdir(data) and os.listdir(data):
            return self.spark.read.parquet(data)
        return None

    def sync(self) -> dict:
        """Apply all pending change files in seq order; commit-last cursor.

        All pending files are applied as ONE merge (they are already ordered
        by seq, and keep-latest makes the composition associative), then one
        table rewrite, then the cursor advance — minimal commits, idempotent
        re-run after any crash point.
        """
        pending = self.pending_files()
        if not pending:
            return {"applied_files": 0, "cursor": self.cursor()}
        batch = self.spark.read.parquet(*[p for _, p in pending])
        merged = apply_changes(self._read_target(), batch, self.key)
        data = os.path.join(self.target_dir, "data")
        tmp = data + ".tmp"
        merged.write.mode("overwrite").parquet(tmp)
        # atomic swap (Iceberg snapshot-commit analog for plain parquet).
        # A stale .old from a crash after the tmp→data rename must be cleared
        # first: renaming onto a non-empty directory raises ENOTEMPTY.
        old = data + ".old"
        if os.path.isdir(old) and os.path.isdir(data):
            import shutil

            shutil.rmtree(old, ignore_errors=True)
        if os.path.isdir(data):
            os.replace(data, old)
        os.replace(tmp, data)
        if os.path.isdir(old):
            import shutil

            shutil.rmtree(old, ignore_errors=True)
        self._persist_cursor(max(seq for seq, _ in pending))
        return {"applied_files": len(pending), "cursor": self.cursor()}

    def table(self) -> DataFrame | None:
        return self._read_target()


def stream_sync(
    spark: SparkSession,
    source_dir: str,
    target_dir: str,
    checkpoint_dir: str,
    schema: str,
    key: str = "id",
) -> None:
    """Structured Streaming variant: availableNow + foreachBatch merge.

    The file source's checkpoint (`checkpoint_dir`) is the cursor — restarts
    resume from the last committed micro-batch with exactly-once file
    accounting; the merge inside foreachBatch is idempotent per key.
    """
    sync = IncrementalSync(spark, source_dir, target_dir, key)

    def merge_batch(batch_df: DataFrame, batch_id: int) -> None:
        merged = apply_changes(sync._read_target(), batch_df, key)
        data = os.path.join(target_dir, "data")
        tmp = data + f".b{batch_id}"
        merged.write.mode("overwrite").parquet(tmp)
        # rename-then-delete (never delete-then-rename): a crash here leaves
        # data.old, which _read_target restores on the next start — the
        # window where no table version exists on disk is a single rename.
        old = data + ".old"
        if os.path.isdir(old) and os.path.isdir(data):
            import shutil

            shutil.rmtree(old, ignore_errors=True)  # stale .old from a crash
        if os.path.isdir(data):
            os.replace(data, old)
        os.replace(tmp, data)
        if os.path.isdir(old):
            import shutil

            shutil.rmtree(old, ignore_errors=True)

    (
        spark.readStream.schema(schema)
        .parquet(source_dir)
        .writeStream.trigger(availableNow=True)
        .option("checkpointLocation", checkpoint_dir)
        .foreachBatch(merge_batch)
        .start()
        .awaitTermination()
    )
