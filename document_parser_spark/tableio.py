"""TableIO seam (SURVEY §4.4): Iceberg when the runtime jar is on the
classpath, partitioned parquet otherwise — same schema, same
semantics, so pipelines, lineage, and tests run identically either
way. This sandbox ships no Iceberg jar (verified: none under
pyspark/jars), so the parquet branch is the tested one; the Iceberg
branch is the same three call sites routed through the catalog.

Usage:

    io = TableIO.for_session(spark)        # autodetects
    io.write(df, "out_tbl_or_dir")         # overwrite
    io.write(df, target, partition_by=["part_bucket"])
    df = io.read(spark, target)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is loadable in this JVM."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.java.lang.Class.forName(
            "org.apache.iceberg.spark.SparkCatalog")
        return True
    except Exception:
        return False


@dataclass(frozen=True)
class TableIO:
    """Format-agnostic table reader/writer."""

    use_iceberg: bool

    @classmethod
    def for_session(cls, spark: SparkSession,
                    force_parquet: bool = False) -> "TableIO":
        return cls(use_iceberg=(not force_parquet)
                   and iceberg_available(spark))

    # -- write ------------------------------------------------------------

    def write(self, df: DataFrame, target: str,
              partition_by: list[str] | None = None,
              mode: str = "overwrite") -> None:
        if self.use_iceberg:
            w = df.writeTo(target)
            if partition_by:
                from pyspark.sql import functions as F
                w = w.partitionedBy(*[F.col(c) for c in partition_by])
            if mode == "overwrite":
                w.createOrReplace()
            else:
                w.append()
            return
        w = df.write.mode(mode)
        if partition_by:
            w = w.partitionBy(*partition_by)
        w.parquet(target)

    def overwrite_partitions(self, df: DataFrame, target: str,
                             partition_by: list[str] | None = None) -> None:
        """Idempotent partition-scoped overwrite — the lineage commit
        primitive. Iceberg: one atomic transaction (partition spec
        lives in the table); parquet: dynamic partition overwrite
        (only the partitions present in ``df`` are replaced, so
        ``partition_by`` is required)."""
        if self.use_iceberg:
            df.writeTo(target).overwritePartitions()
            return
        if not partition_by:
            raise ValueError("parquet overwrite_partitions needs "
                             "partition_by")
        (df.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy(*partition_by)
         .parquet(target))

    # -- read -------------------------------------------------------------

    def read(self, spark: SparkSession, target: str) -> DataFrame:
        if self.use_iceberg:
            return spark.read.format("iceberg").load(target)
        return spark.read.parquet(target)
