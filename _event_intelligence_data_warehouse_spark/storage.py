"""Parquet table storage with atomic overwrite-swap and watermark metadata.

The reference mutates Postgres tables in place (``ON CONFLICT DO UPDATE``,
``UPDATE ... SET is_processed``). Parquet is immutable, so mutation becomes
*rewrite + atomic swap*: write the new table image to ``<table>.__tmp__``,
then ``rename`` over the live directory. On a real deployment this slots
behind Delta/Iceberg ``MERGE``; the interface here is format-agnostic.

Incremental state (the reference's ``is_processed`` flag) is replaced by a
high-watermark on ``ingested_at`` persisted in ``_meta/watermarks.json`` —
a pure predicate that turns into parquet min/max + partition pruning at
scale instead of a full-table rewrite per batch (SURVEY.md §2.5 U7).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class Warehouse:
    """A directory of named parquet tables + tiny JSON metadata."""

    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)

    # -- paths -------------------------------------------------------------
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        p = self.path(table)
        if not os.path.isdir(p):
            return False
        for entry in os.listdir(p):
            if entry.endswith(".parquet") or entry == "_SUCCESS":
                return True
            # Partitioned layout: dynamic partition overwrite leaves no
            # root _SUCCESS marker; data lives under <col>=<value>/ dirs.
            sub = os.path.join(p, entry)
            if "=" in entry and os.path.isdir(sub) and any(
                f.endswith(".parquet") for f in os.listdir(sub)
            ):
                return True
        return False

    # -- read --------------------------------------------------------------
    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        if self.exists(table):
            return self.spark.read.parquet(self.path(table))
        if schema is None:
            raise FileNotFoundError(f"table {table!r} missing and no schema given")
        return self.spark.createDataFrame([], schema)

    # -- write -------------------------------------------------------------
    def append(self, table: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self.path(table))

    def overwrite(self, table: str, df: DataFrame) -> None:
        """Atomic-enough replace: stage to a temp dir, swap directories.

        The swap is two renames on one filesystem — the window where the
        table is missing is microseconds, and a crash leaves either the old
        or the new image plus a leftover temp dir (cleaned on next write).
        """
        live = self.path(table)
        tmp = live + ".__tmp__" + uuid.uuid4().hex[:8]
        # Writing from the live dir to tmp first makes self-referential
        # rewrites (read table -> transform -> overwrite table) safe.
        df.write.mode("overwrite").parquet(tmp)
        self._swap(live, tmp)

    def overwrite_partitions(
        self, table: str, df: DataFrame, partition_col: str
    ) -> None:
        """Dynamic partition overwrite: replace ONLY the partitions present
        in ``df``, leave every other partition's files untouched on disk.

        This is the parquet-native analog of a partition-pruned MERGE: at
        100 TB an incremental batch touches a handful of buckets, so the
        rewrite cost is proportional to the increment, not the table
        (contrast ``overwrite``, which rewrites the full image). Not
        atomic across partitions (a crash can leave a partition mix) —
        the table-format MERGE closes that gap; semantics here are
        already partition-MERGE-shaped.
        """
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(self.path(table))
        )

    @staticmethod
    def _swap(live: str, staged: str) -> None:
        """Two-rename promotion of a fully-written dir over the live one;
        a crash leaves either image intact plus a cleanable leftover."""
        old = live + ".__old__" + uuid.uuid4().hex[:8]
        if os.path.isdir(live):
            os.rename(live, old)
        os.rename(staged, live)
        if os.path.isdir(old):
            shutil.rmtree(old, ignore_errors=True)

    def replace_with(self, table: str, staged: str) -> None:
        """Promote a staged table directory over the live one. For
        rewrites whose input is the live table itself, where an in-place
        overwrite would truncate its own scan."""
        self._swap(self.path(table), self.path(staged))

    # -- watermarks --------------------------------------------------------
    @property
    def _wm_path(self) -> str:
        return os.path.join(self.root, "_meta", "watermarks.json")

    def _load_wm(self) -> dict:
        if os.path.isfile(self._wm_path):
            with open(self._wm_path) as f:
                return json.load(f)
        return {}

    def get_watermark(self, name: str) -> str | None:
        return self._load_wm().get(name)

    def set_watermark(self, name: str, value: str) -> None:
        wm = self._load_wm()
        wm[name] = value
        tmp = self._wm_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump(wm, f, indent=2, sort_keys=True)
        os.replace(tmp, self._wm_path)

    def drop(self, table: str) -> None:
        shutil.rmtree(self.path(table), ignore_errors=True)

    # -- compaction --------------------------------------------------------
    def file_stats(self, table: str) -> tuple[int, int]:
        """(n_part_files, total_bytes) for a table directory (recursive,
        partitioned layouts included)."""
        n = 0
        total = 0
        for root, _dirs, files in os.walk(self.path(table)):
            for f in files:
                if f.endswith(".parquet"):
                    n += 1
                    total += os.path.getsize(os.path.join(root, f))
        return n, total

    def compact(
        self, table: str, target_file_bytes: int = 128 * 1024 * 1024
    ) -> dict:
        """Small-file compaction for an UNPARTITIONED table: rewrite its
        part files into ~target-size files and atomically swap. The
        chronic cost of incremental appends — every micro-batch leaves a
        file, and at 100 TB a scan then pays per-file footer reads and
        task-scheduling overhead linear in file count, not data. The
        rewrite is a coalesce (no shuffle: tasks just concatenate
        inputs) into ceil(bytes/target) files. Returns
        {files_before, files_after, bytes} for the run log."""
        files_before, total = self.file_stats(table)
        n_out = max(1, -(-total // max(1, target_file_bytes)))
        df = self.spark.read.parquet(self.path(table))
        live = self.path(table)
        tmp = live + ".__tmp__" + uuid.uuid4().hex[:8]
        df.coalesce(n_out).write.mode("overwrite").parquet(tmp)
        self._swap(live, tmp)
        files_after, _ = self.file_stats(table)
        return {
            "files_before": files_before,
            "files_after": files_after,
            "bytes": total,
        }

    def compact_partitions(
        self, table: str, partition_col: str
    ) -> dict:
        """Compaction for a PARTITIONED table: rewrite every partition's
        files into one file per partition via dynamic partition
        overwrite (each partition's data repartitions to its own single
        task — the partition column is the shuffle key, so partition
        boundaries are preserved exactly and readers keep pruning).
        Incremental variant at scale: filter the frame to the partitions
        a freshness probe flags before calling — dynamic overwrite
        leaves the rest untouched on disk."""
        files_before, total = self.file_stats(table)
        df = self.spark.read.parquet(self.path(table))
        (
            df.repartition(F.col(partition_col))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(self.path(table))
        )
        files_after, _ = self.file_stats(table)
        return {
            "files_before": files_before,
            "files_after": files_after,
            "bytes": total,
        }
