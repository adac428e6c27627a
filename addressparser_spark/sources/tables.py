"""Table IO layer: catalog-style access with an Iceberg slot and parquet fallback.

The engine's durable tables (transcripts input, entity registry, cluster
output, checkpoints) are defined here behind one interface so the storage
backend is a deployment choice:

- **Iceberg** (production): snapshot isolation replaces the reference's
  ``with (nolock)`` dirty reads (`Db/DataContextBase_AddrObject.cs:182-183`),
  MERGE INTO replaces the T-SQL MERGE (`Db/DataContextBase_Address.cs:396-440`),
  and per-iteration table snapshots give the clustering loop its resume points.
  Activated when the runtime has the Iceberg Spark extension on the classpath.
- **Parquet directories** (sandbox/tests): same layout, overwrite-by-staging
  for atomic-enough replacement, `_SUCCESS` markers as completeness signals.

Nothing else in the engine imports a storage library directly.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession


def read_parallel(spark: SparkSession, path: str) -> DataFrame:
    """Parquet read with a tiny-input parallelism guard.

    A single small file yields ONE scan partition, serializing all
    downstream per-row expression work onto a single core (measured 3x on
    the sf0.1 profile build). When the scan's file-level parallelism is
    below the cluster's default parallelism, repartition up; the check is
    driver-side metadata only (``inputFiles`` — no job, no Python->JVM RDD
    conversion), and at production scale the file count exceeds the core
    count so the branch never fires — no shuffle is added where the scan
    already parallelizes. (Files larger than ``maxPartitionBytes`` split
    into more scan partitions than files, so the file count is a lower
    bound — under-counting can only add the repartition, never skip a
    needed one.) Filters still push to the scan (Catalyst pushes
    predicates through Repartition).
    """
    df = spark.read.parquet(path)
    target = spark.sparkContext.defaultParallelism
    if len(df.inputFiles()) < target:
        df = df.repartition(target)
    return df


def iceberg_available(spark: SparkSession) -> bool:
    """True when the Iceberg Spark extensions are on the JVM classpath."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName("org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


class TableStore:
    """Minimal catalog: name -> durable table, parquet-dir backed here.

    On an Iceberg deployment, ``base`` becomes a catalog namespace and each
    method body is the corresponding ``writeTo``/``MERGE INTO`` call; method
    signatures (and therefore every call site) stay unchanged.
    """

    def __init__(self, spark: SparkSession, base: str):
        self.spark = spark
        self.base = base

    def _path(self, name: str) -> str:
        return os.path.join(self.base, name)

    def exists(self, name: str) -> bool:
        p = self._path(name)
        return os.path.isdir(p) and os.path.exists(os.path.join(p, "_SUCCESS"))

    def read(self, name: str) -> DataFrame:
        return self.spark.read.parquet(self._path(name))

    def read_or_empty(self, name: str, schema: str) -> DataFrame:
        if self.exists(name):
            return self.read(name)
        return self.spark.createDataFrame([], schema)

    def write(self, name: str, df: DataFrame, partition_by: list[str] | None = None) -> None:
        w = df.write.mode("overwrite")
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(self._path(name))

    def append(self, name: str, df: DataFrame) -> None:
        df.write.mode("append").parquet(self._path(name))

    def write_bucketed(
        self, name: str, df: DataFrame, key: str, n_buckets: int = 16
    ) -> None:
        """Persist ``df`` hash-bucketed (and per-bucket sorted) by ``key``.

        The co-located-join lever: two tables bucketed the same way join
        WITHOUT an Exchange on either side (the scan itself satisfies the
        join's partitioning requirement), and the per-bucket sort feeds
        SortMergeJoin without a Sort. The production shape for the entity
        registry: resolve's registry-lookup join on ``sig`` becomes
        shuffle-free for the registry side no matter how large it grows —
        the analog of the reference's clustered index on the Addresses
        search key (``Db/DataContextBase_Address.cs``). Registered in the
        session catalog as an external table at this store's path
        (bucket metadata lives in the catalog; on a production Hive/Iceberg
        metastore it is durable across sessions).
        """
        (
            df.write.mode("overwrite")
            .bucketBy(n_buckets, key)
            .sortBy(key)
            .option("path", self._path(name))
            .format("parquet")
            .saveAsTable(name)
        )

    def read_bucketed(self, name: str) -> DataFrame:
        """Read a bucketed table WITH its bucket spec (via the catalog —
        ``spark.read.parquet`` on the same path would drop the bucketing
        metadata and re-shuffle on join)."""
        return self.spark.table(name)

    def replace(self, name: str, df: DataFrame) -> None:
        """Overwrite a table that ``df`` may itself read from (stage + swap)."""
        staged = self._path(name) + ".staging"
        df.write.mode("overwrite").parquet(staged)
        self.spark.read.parquet(staged).write.mode("overwrite").parquet(self._path(name))
        import shutil

        shutil.rmtree(staged, ignore_errors=True)
