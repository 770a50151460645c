"""TableIO seam tests — the parquet degradation branch (no Iceberg jar
in this sandbox; detection must say so and the parquet semantics must
hold, including dynamic partition overwrite idempotence)."""

from __future__ import annotations

from pyspark.sql import functions as F

from document_parser_spark.tableio import TableIO, iceberg_available


def test_detection_no_jar_here(spark):
    assert iceberg_available(spark) is False
    io = TableIO.for_session(spark)
    assert io.use_iceberg is False


def test_roundtrip_partitioned(spark, tmp_path):
    io = TableIO.for_session(spark)
    df = spark.range(100).select(
        F.col("id"), F.pmod("id", F.lit(4)).alias("bucket"))
    tgt = str(tmp_path / "t")
    io.write(df, tgt, partition_by=["bucket"])
    back = io.read(spark, tgt)
    assert back.count() == 100
    assert sorted(r.bucket for r in
                  back.select("bucket").distinct().collect()) == [0, 1, 2, 3]


def test_overwrite_partitions_touches_only_written(spark, tmp_path):
    io = TableIO.for_session(spark)
    tgt = str(tmp_path / "t")
    base = spark.range(100).select(
        F.col("id"), F.pmod("id", F.lit(4)).alias("bucket"))
    io.write(base, tgt, partition_by=["bucket"])

    # rewrite ONLY bucket 1 with new values
    patch = spark.range(1000, 1010).select(
        F.col("id"), F.lit(1).alias("bucket"))
    io.overwrite_partitions(patch.repartition(1), tgt,
                            partition_by=["bucket"])

    back = io.read(spark, tgt)
    assert back.filter(F.col("bucket") == 1).count() == 10     # replaced
    assert back.filter(F.col("bucket") == 0).count() == 25     # untouched
    assert back.filter(F.col("bucket") == 2).count() == 25
    # idempotent: same patch again -> same result
    io.overwrite_partitions(patch.repartition(1), tgt,
                            partition_by=["bucket"])
    assert io.read(spark, tgt).filter(F.col("bucket") == 1).count() == 10
