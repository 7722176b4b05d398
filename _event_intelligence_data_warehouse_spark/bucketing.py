"""Bucketed table layout: Spark-native hash bucketing for shuffle-free
co-located joins and aggregations.

At 100 TB the dominant cost of a fact-to-fact join (events x orders on a
shared key, fact x large-dim) is the shuffle of both sides. Spark's
catalog bucketing removes it structurally: both tables are written
pre-hash-partitioned into the same number of buckets on the join key, the
scan reports that distribution via ``HashClusteredDistribution``, and the
sort-merge join runs with ZERO Exchange on either side — paid once at
write time, amortized over every subsequent join/groupBy on that key.
This is declared layout, not hand-scheduling: Catalyst still picks the
physical join; bucketing only changes what the scan promises.

Bucketing metadata lives in the session catalog (``saveAsTable``), not in
parquet footers, so this module pairs every write with an idempotent
``register`` that re-creates the catalog entry over an existing path —
the local analog of what a Hive metastore / Glue catalog does durably in
production. Writes are routed through a per-table location so the data
itself is plain parquet, readable (as an unbucketed table) by any engine.

Complements storage.py's manifest tables: manifest mode gives atomic
commits / time travel / skipping for incrementally-maintained tables;
bucketing gives co-located layout for the big immutable join fabrics
(rebuilt wholesale, joined constantly). A production deployment layers
both (Iceberg/Delta bucket transforms); locally they are separate
write paths with the same reader API.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def _q(name: str) -> str:
    return "`" + name.replace("`", "``") + "`"


class BucketedCatalog:
    """Thin manager for bucketed parquet tables under one root dir."""

    def __init__(self, spark: SparkSession, root: str) -> None:
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(
        self,
        table: str,
        df: DataFrame,
        *,
        bucket_col: str | list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
        mode: str = "overwrite",
    ) -> None:
        """Write ``df`` hash-bucketed on ``bucket_col`` into ``n_buckets``
        files per write task, registered in the session catalog.

        ``sort_cols`` (default: the bucket columns) additionally sorts
        within each bucket file, which lets the sort-merge join skip its
        per-partition sort too. Choose ``n_buckets`` so one bucket of the
        TARGET scale fits an executor core's working set (e.g. 100 TB /
        4096 buckets ~ 25 GB per bucket across files); both sides of a
        co-located join must use the SAME count and key.
        """
        cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
        if n_buckets < 1:
            raise ValueError("n_buckets must be >= 1")
        if mode != "overwrite":
            # append/ignore/error would silently interact with the
            # unconditional DROP below (mixed bucket layouts under one
            # declaration = wrong shuffle-free joins); incremental
            # maintenance belongs to the manifest warehouse, bucketing
            # to rebuild-wholesale join fabrics.
            raise ValueError(
                "BucketedCatalog.write supports mode='overwrite' only"
            )
        self.spark.sql(f"DROP TABLE IF EXISTS {_q(table)}")
        w = (
            df.write.mode(mode)
            .format("parquet")
            .option("path", self.path(table))
            .bucketBy(n_buckets, cols[0], *cols[1:])
            .sortBy(*(sort_cols or cols))
        )
        w.saveAsTable(table)

    def register(
        self,
        table: str,
        *,
        schema_ddl: str,
        bucket_col: str | list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Re-create the catalog entry for an existing bucketed path —
        the recovery step after a new session (the local in-memory
        catalog does not persist; a metastore would). The DDL must match
        the layout the files were written with: Spark trusts the
        declaration, so a wrong bucket spec here silently yields wrong
        joins — production catalogs own this metadata durably."""
        cols = [bucket_col] if isinstance(bucket_col, str) else list(bucket_col)
        sort = sort_cols or cols
        self.spark.sql(f"DROP TABLE IF EXISTS {_q(table)}")
        self.spark.sql(
            f"CREATE TABLE {_q(table)} ({schema_ddl}) USING PARQUET "
            f"CLUSTERED BY ({', '.join(_q(c) for c in cols)}) "
            f"SORTED BY ({', '.join(_q(c) for c in sort)}) "
            f"INTO {n_buckets} BUCKETS "
            f"LOCATION '{self.path(table)}'"
        )

    def read(self, table: str) -> DataFrame:
        """Catalog-aware read: the scan carries the bucket distribution,
        so joins/groupBys on the bucket key plan without an Exchange."""
        return self.spark.table(table)

    def drop(self, table: str) -> None:
        self.spark.sql(f"DROP TABLE IF EXISTS {_q(table)}")
