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

**Manifest mode** (``Warehouse(spark, root, manifest=True)``) is the
object-store-safe commit protocol the rename-swap cannot provide: data
files are only ever ADDED under immutable snapshot directories
(``<table>/data/s<id>/``), and what constitutes the table is a versioned
manifest (``<table>/_manifests/v%08d.json``, an explicit live-file list)
published by atomically replacing ONE small pointer file
(``_manifests/CURRENT``). A single-key replace is atomic on POSIX
(``os.replace``) and on object stores (single-object PUT), so readers
resolve CURRENT -> manifest -> files and observe either the whole old
image or the whole new one — never a partition mix, regardless of where
a writer crashed. This is the same commit shape as Iceberg/Delta
(snapshot isolation via metadata pointer), scaled down to a JSON file.
Multi-partition operations (dynamic-overwrite-style upsert, compaction)
become atomic for free: the new manifest swaps in replaced partitions'
files and keeps untouched partitions' entries, in one publish.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


class ConcurrentWriteError(RuntimeError):
    """Another writer committed the version this writer raced for."""


class Warehouse:
    """A directory of named parquet tables + tiny JSON metadata."""

    def __init__(self, spark: SparkSession, root: str, *,
                 manifest: bool = False):
        self.spark = spark
        self.root = root
        self.manifest = manifest
        os.makedirs(root, exist_ok=True)
        os.makedirs(os.path.join(root, "_meta"), exist_ok=True)

    # -- paths -------------------------------------------------------------
    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def exists(self, table: str) -> bool:
        if self.manifest and self._current_version(table) > 0:
            return bool(self._manifest(table)["files"])
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
        if self.manifest:
            return self._m_read(table, schema)
        if self.exists(table):
            return self.spark.read.parquet(self.path(table))
        if schema is None:
            raise FileNotFoundError(f"table {table!r} missing and no schema given")
        return self.spark.createDataFrame([], schema)

    # -- write -------------------------------------------------------------
    def append(self, table: str, df: DataFrame) -> None:
        if self.manifest:
            m = self._adopt_if_legacy(table)
            pcol = m.get("partition_col")
            new = self._write_snapshot(
                table, df, pcol if pcol and pcol in df.columns else None
            )
            self._publish(table, m["files"] + new, pcol)
            return
        df.write.mode("append").parquet(self.path(table))

    def overwrite(
        self, table: str, df: DataFrame, partition_col: str | None = None
    ) -> None:
        """Full-image replace (optionally written partitioned so readers
        keep pruning). Legacy mode: stage to a temp dir, swap directories
        — two renames on one filesystem; a crash leaves either the old or
        the new image plus a leftover temp dir. Manifest mode: write a
        fresh snapshot and publish a manifest listing only it — atomic on
        object stores too (single pointer-file replace)."""
        if self.manifest:
            files = self._write_snapshot(table, df, partition_col)
            self._publish(table, files, partition_col)
            return
        live = self.path(table)
        tmp = live + ".__tmp__" + uuid.uuid4().hex[:8]
        # Writing from the live dir to tmp first makes self-referential
        # rewrites (read table -> transform -> overwrite table) safe.
        w = df.write.mode("overwrite")
        if partition_col is not None:
            w = w.partitionBy(partition_col)
        w.parquet(tmp)
        self._swap(live, tmp)

    def overwrite_partitions(
        self, table: str, df: DataFrame, partition_col: str
    ) -> None:
        """Dynamic partition overwrite: replace ONLY the partitions present
        in ``df``, leave every other partition's files untouched on disk.

        This is the parquet-native analog of a partition-pruned MERGE: at
        100 TB an incremental batch touches a handful of buckets, so the
        rewrite cost is proportional to the increment, not the table
        (contrast ``overwrite``, which rewrites the full image).

        Legacy mode is not atomic across partitions (a crash can leave a
        partition mix). Manifest mode IS: the new partitions' files land
        in a fresh snapshot dir, and one manifest publish atomically swaps
        the replaced partitions' entries while keeping every untouched
        partition's — readers resolve the pointer and never observe a mix.
        """
        if self.manifest:
            m = self._adopt_if_legacy(table)
            bad = [
                f for f in m["files"]
                if self._partition_of(f, partition_col) is None
            ]
            if bad:
                raise ValueError(
                    f"table {table!r} has files outside the "
                    f"{partition_col}= layout (e.g. {bad[0]!r}); "
                    "migrate with overwrite(df, partition_col) first"
                )
            new = self._write_snapshot(table, df, partition_col)
            touched = {self._partition_of(f, partition_col) for f in new}
            kept = [
                f for f in m["files"]
                if self._partition_of(f, partition_col) not in touched
            ]
            self._publish(table, kept + new, partition_col)
            return
        (
            df.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(partition_col)
            .parquet(self.path(table))
        )

    # -- manifest commit protocol ------------------------------------------
    # Layout: <table>/data/s<id>/... immutable snapshot dirs (only ever
    # added); <table>/_manifests/v%08d.json immutable live-file lists;
    # <table>/_manifests/CURRENT the single atomically-replaced pointer.
    def _mdir(self, table: str) -> str:
        return os.path.join(self.path(table), "_manifests")

    def _pointer(self, table: str) -> str:
        return os.path.join(self._mdir(table), "CURRENT")

    def _current_version(self, table: str) -> int:
        try:
            with open(self._pointer(table)) as f:
                return int(json.load(f)["version"])
        except (FileNotFoundError, json.JSONDecodeError, KeyError):
            return 0

    def _manifest(self, table: str) -> dict:
        v = self._current_version(table)
        if v == 0:
            return {"version": 0, "files": [], "partition_col": None}
        with open(os.path.join(self._mdir(table), f"v{v:08d}.json")) as f:
            return json.load(f)

    def _adopt_if_legacy(self, table: str) -> dict:
        """Current manifest; if none exists but the directory holds a
        legacy (pre-manifest) parquet layout, synthesize and publish v1
        from its file listing so manifest ops compose with old tables."""
        m = self._manifest(table)
        if m["version"] > 0:
            return m
        base = self.path(table)
        files: list[str] = []
        pcol = None
        for root, dirs, fs in os.walk(base):
            dirs[:] = [d for d in dirs if d != "_manifests"]
            for f in fs:
                if f.endswith(".parquet"):
                    rel = os.path.relpath(os.path.join(root, f), base)
                    files.append(rel)
                    head = rel.split(os.sep)[0]
                    if "=" in head:
                        pcol = head.split("=", 1)[0]
        if not files:
            return m
        return self._publish(table, files, pcol)

    def _publish(
        self, table: str, files: list[str], partition_col: str | None
    ) -> dict:
        """Commit a new table version: write the immutable manifest file
        (O_EXCL — the optimistic lock), then atomically replace the
        CURRENT pointer. A crash before the pointer replace leaves an
        orphan manifest/snapshot that no reader resolves; a concurrent
        committed writer surfaces as ConcurrentWriteError, never as a
        silently merged or torn image."""
        os.makedirs(self._mdir(table), exist_ok=True)
        base_v = self._current_version(table)
        v = base_v + 1
        while True:
            mpath = os.path.join(self._mdir(table), f"v{v:08d}.json")
            try:
                fd = os.open(mpath, os.O_CREAT | os.O_EXCL | os.O_WRONLY)
                break
            except FileExistsError:
                if self._current_version(table) > base_v:
                    raise ConcurrentWriteError(
                        f"table {table!r}: version advanced past "
                        f"{base_v} while this write was in flight"
                    ) from None
                v += 1  # orphan from a crashed writer: skip its number
        manifest = {
            "version": v,
            "partition_col": partition_col,
            "files": sorted(files),
        }
        with os.fdopen(fd, "w") as f:
            json.dump(manifest, f, indent=1)
            f.flush()
            os.fsync(f.fileno())
        tmp = self._pointer(table) + f".tmp{uuid.uuid4().hex[:8]}"
        with open(tmp, "w") as f:
            json.dump({"version": v}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self._pointer(table))
        return manifest

    def _write_snapshot(
        self, table: str, df: DataFrame, partition_col: str | None = None
    ) -> list[str]:
        """Write ``df`` into a fresh immutable snapshot dir; return the
        written parquet files' table-relative paths (not yet visible to
        readers — only a subsequent ``_publish`` makes them live)."""
        base = self.path(table)
        sdir = os.path.join(base, "data", "s" + uuid.uuid4().hex[:12])
        w = df.write.mode("overwrite")
        if partition_col is not None:
            w = w.partitionBy(partition_col)
        w.parquet(sdir)
        rels = []
        for root, _dirs, fs in os.walk(sdir):
            for f in fs:
                if f.endswith(".parquet"):
                    rels.append(
                        os.path.relpath(os.path.join(root, f), base)
                    )
        return rels

    @staticmethod
    def _partition_of(rel: str, partition_col: str) -> str | None:
        for comp in rel.split(os.sep):
            if comp.startswith(partition_col + "="):
                return comp[len(partition_col) + 1:]
        return None

    def _m_read(
        self, table: str, schema: T.StructType | None = None
    ) -> DataFrame:
        m = self._adopt_if_legacy(table)
        if not m["files"]:
            if schema is None:
                raise FileNotFoundError(
                    f"table {table!r} missing and no schema given"
                )
            return self.spark.createDataFrame([], schema)
        base = self.path(table)
        # Group by snapshot root so partition values recover from the
        # <col>=<val>/ path components under each basePath; compaction
        # collapses the table to one group, bounding the union width.
        groups: dict[str, list[str]] = {}
        for rel in m["files"]:
            parts = rel.split(os.sep)
            root = os.path.join(base, *parts[:2]) if parts[0] == "data" else base
            groups.setdefault(root, []).append(os.path.join(base, rel))
        dfs = [
            self.spark.read.option("basePath", root).parquet(*sorted(fs))
            for root, fs in sorted(groups.items())
        ]
        out = dfs[0]
        for d in dfs[1:]:
            out = out.unionByName(d)
        return out

    def vacuum(self, table: str) -> int:
        """Delete files no longer referenced by the CURRENT manifest —
        crashed writers' orphan snapshots, replaced partitions,
        pre-compaction images. Safe by construction: every reader
        resolves CURRENT, so unreferenced files are unreachable. Returns
        the number of files removed."""
        m = self._manifest(table)
        if m["version"] == 0:
            return 0
        base = self.path(table)
        live = {os.path.normpath(f) for f in m["files"]}
        removed = 0
        for root, dirs, fs in os.walk(base):
            dirs[:] = [d for d in dirs if d != "_manifests"]
            for f in fs:
                p = os.path.join(root, f)
                rel = os.path.normpath(os.path.relpath(p, base))
                if rel not in live:
                    os.remove(p)
                    removed += 1
        data_dir = os.path.join(base, "data")
        if os.path.isdir(data_dir):
            for root, dirs, fs in os.walk(data_dir, topdown=False):
                if not os.listdir(root):
                    os.rmdir(root)
        return removed

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
        """(n_part_files, total_bytes) for a table — the LIVE image: in
        manifest mode only CURRENT-referenced files count (stale
        snapshots awaiting vacuum don't), else the directory walk."""
        if self.manifest and self._current_version(table) > 0:
            base = self.path(table)
            files = self._manifest(table)["files"]
            return len(files), sum(
                os.path.getsize(os.path.join(base, f)) for f in files
            )
        n = 0
        total = 0
        for root, dirs, files in os.walk(self.path(table)):
            dirs[:] = [d for d in dirs if d != "_manifests"]
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
        df = self.read(table)
        if self.manifest:
            files = self._write_snapshot(table, df.coalesce(n_out))
            self._publish(table, files, None)
            self.vacuum(table)
        else:
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
        files into one file per partition (each partition's data
        repartitions to its own single task — the partition column is
        the shuffle key, so partition boundaries are preserved exactly
        and readers keep pruning).

        Crash safety: legacy mode stages the compacted image to a temp
        dir and promotes it with the same two-rename swap every other
        full rewrite uses — an intact fallback image exists at every
        instant (an in-place dynamic overwrite of the table's own scan
        would not have one). Manifest mode publishes the compacted
        snapshot as one new version, then vacuums the replaced files."""
        files_before, total = self.file_stats(table)
        df = self.read(table)
        compacted = df.repartition(F.col(partition_col))
        if self.manifest:
            files = self._write_snapshot(table, compacted, partition_col)
            self._publish(table, files, partition_col)
            self.vacuum(table)
        else:
            live = self.path(table)
            tmp = live + ".__tmp__" + uuid.uuid4().hex[:8]
            compacted.write.mode("overwrite").partitionBy(
                partition_col
            ).parquet(tmp)
            self._swap(live, tmp)
        files_after, _ = self.file_stats(table)
        return {
            "files_before": files_before,
            "files_after": files_after,
            "bytes": total,
        }
