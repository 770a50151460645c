"""Per-partition lineage + idempotent checkpoint restart (SURVEY §2.11,
north_rule: "resumable from checkpoint with per-partition lineage +
metrics").

Model
-----
Output is bucketed into ``n_partitions`` stable buckets by
``pmod(xxhash64(doc_id), n)`` — a pure function of doc_id, so the
bucket assignment is identical across runs and cluster sizes. Each
bucket commits independently:

    out_dir/part_bucket=<b>/*.parquet     (data, atomic via write-then-rename)
    out_dir/_lineage/bucket=<b>.parquet   (one lineage row per bucket)

A lineage row carries the same status vocabulary as the reference's
webhook task store (webhook_manager/schemas.py:7-13): READY means the
bucket's data files are fully written. Restart = anti-join the bucket
list against READY lineage rows and process only the remainder; a
bucket is re-written wholesale (idempotent — doc->bucket mapping is
deterministic), never appended.

This replaces the reference's crash-unsafe task store (a crashed task
stays PROCESSING forever, translator/v2/service.py:50-167) with a
restartable equivalent.

Iceberg note: with an Iceberg runtime jar present, data+lineage
become a single transactional ``writeTo().overwritePartitions()`` —
this module is the no-jar degradation (SURVEY §4.4) with the same
schema and semantics.
"""

from __future__ import annotations

import json
import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession, functions as F

from document_parser_spark.config import (
    DEFAULT_OUTPUT_PARTITIONS,
    LINEAGE_READY,
    STATUS_PARSE_FAILURE,
)

BUCKET_COL = "part_bucket"


def with_bucket(df: DataFrame, n_partitions: int = DEFAULT_OUTPUT_PARTITIONS,
                key: str = "doc_id") -> DataFrame:
    """Stable bucket id: pure function of the doc key (restart-safe)."""
    return df.withColumn(
        BUCKET_COL, F.pmod(F.xxhash64(key), F.lit(n_partitions)).cast("int"))


def _lineage_dir(out_dir: str) -> str:
    return os.path.join(out_dir, "_lineage")


def read_lineage(spark: SparkSession, out_dir: str) -> DataFrame | None:
    d = _lineage_dir(out_dir)
    files = [f for f in (os.listdir(d) if os.path.isdir(d) else [])
             if f.endswith(".json")]
    if not files:
        return None
    rows = []
    for f in sorted(files):
        with open(os.path.join(d, f), encoding="utf-8") as fh:
            rows.append(json.load(fh))
    return spark.createDataFrame(
        rows, schema=("partition_id int, status string, "
                      "input_files array<string>, span_count long, "
                      "parse_failures long, updated_at double"))


def ready_buckets(spark: SparkSession, out_dir: str) -> set[int]:
    lin = read_lineage(spark, out_dir)
    if lin is None:
        return set()
    return {r.partition_id for r in
            lin.filter(F.col("status") == LINEAGE_READY)
               .select("partition_id").collect()}


def remaining_buckets(spark: SparkSession, out_dir: str,
                      n_partitions: int) -> list[int]:
    """All buckets LEFT ANTI JOIN lineage READY rows (SURVEY §2.3)."""
    all_b = spark.range(n_partitions).select(
        F.col("id").cast("int").alias("partition_id"))
    lin = read_lineage(spark, out_dir)
    if lin is None:
        rem = all_b
    else:
        rem = all_b.join(
            lin.filter(F.col("status") == LINEAGE_READY)
               .select("partition_id"),
            "partition_id", "left_anti")
    return sorted(r.partition_id for r in rem.collect())


def _commit_bucket(spark: SparkSession, bucket_df: DataFrame, out_dir: str,
                   bucket: int, input_files: list[str]) -> dict:
    """Write one bucket's data then its lineage row. Crash between the
    two leaves the bucket non-READY -> rewritten on restart (idempotent:
    the data write is an overwrite of the bucket directory).

    The in-progress write lands under ``out_dir/_tmp`` — deliberately
    OUTSIDE the ``part_bucket=*`` glob namespace ``read_output`` scans,
    so a crash between the data write and the rename can never leak
    partial/duplicate rows into a post-crash read (and can never turn
    the inferred partition column into a string via a
    ``part_bucket=<b>.inprogress`` directory name)."""
    data_dir = os.path.join(out_dir, f"{BUCKET_COL}={bucket}")
    tmp_dir = os.path.join(out_dir, "_tmp", f"bucket={bucket}")
    shutil.rmtree(tmp_dir, ignore_errors=True)
    os.makedirs(os.path.dirname(tmp_dir), exist_ok=True)

    # extraction output carries (spans, status); other relations (e.g.
    # the curation pipeline's curated-corpus rows) commit through the
    # same machinery with zeroed span/failure tallies
    span_count = (F.coalesce(F.sum(F.size("spans")), F.lit(0))
                  if "spans" in bucket_df.columns else F.lit(0))
    failures = (F.coalesce(
        F.sum((F.col("status") == STATUS_PARSE_FAILURE).cast("long")),
        F.lit(0)) if "status" in bucket_df.columns else F.lit(0))
    stats = bucket_df.select(
        span_count.cast("long").alias("span_count"),
        failures.cast("long").alias("parse_failures"),
        F.count("*").alias("n_docs"),
    )
    bucket_df.write.mode("overwrite").parquet(tmp_dir)
    row = stats.collect()[0]
    shutil.rmtree(data_dir, ignore_errors=True)
    os.replace(tmp_dir, data_dir)  # atomic on POSIX

    lineage_row = {
        "partition_id": bucket,
        "status": LINEAGE_READY,
        "input_files": input_files,
        "span_count": int(row.span_count),
        "parse_failures": int(row.parse_failures),
        "updated_at": time.time(),
    }
    os.makedirs(_lineage_dir(out_dir), exist_ok=True)
    lpath = os.path.join(_lineage_dir(out_dir), f"bucket={bucket}.json")
    with open(lpath + ".tmp", "w", encoding="utf-8") as fh:
        json.dump(lineage_row, fh)
    os.replace(lpath + ".tmp", lpath)
    return lineage_row


def run_with_lineage(spark: SparkSession, result: DataFrame, out_dir: str,
                     n_partitions: int = DEFAULT_OUTPUT_PARTITIONS,
                     input_files: list[str] | None = None,
                     group_size: int = 8) -> list[dict]:
    """Write ``result`` (must carry doc_id, spans, status) bucketed with
    per-bucket lineage, skipping READY buckets from a previous run.

    Buckets are committed in groups of ``group_size`` (one Spark job
    per group, predicate-pushdown on the bucket column) — a middle
    ground between one-job-per-bucket (restart granularity 1, high
    scheduling overhead) and all-at-once (no checkpoints). At cluster
    scale group_size ~ executors*cores/bucket-cost.
    """
    os.makedirs(out_dir, exist_ok=True)
    bucketed = with_bucket(result, n_partitions).persist()
    try:
        todo = remaining_buckets(spark, out_dir, n_partitions)
        done: list[dict] = []
        for i in range(0, len(todo), group_size):
            group = todo[i:i + group_size]
            group_df = bucketed.filter(F.col(BUCKET_COL).isin(group))
            for b in group:
                done.append(_commit_bucket(
                    spark, group_df.filter(F.col(BUCKET_COL) == b)
                    .drop(BUCKET_COL),
                    out_dir, b, input_files or []))
        return done
    finally:
        bucketed.unpersist()


def read_output(spark: SparkSession, out_dir: str) -> DataFrame:
    """Read back the committed output (all READY buckets)."""
    return spark.read.option("basePath", out_dir).parquet(
        os.path.join(out_dir, f"{BUCKET_COL}=*"))
