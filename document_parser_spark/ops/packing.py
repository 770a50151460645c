"""Token-budget sharding for training-data export.

Assign every document to a fixed-token-budget shard in a DETERMINISTIC
global order, without ever materializing a global sort or a global
running sum on one node. The order is the 60-bit portable hash of
``doc_id`` (stable, uniform, reproducible on any engine); the global
prefix sum decomposes as a distributed two-level scan:

  1. range-bucket the hash space: ``bucket = h // ceil(2^60 / B)`` —
     buckets are CONTIGUOUS hash ranges, so within-bucket order + the
     bucket index reconstructs the exact global order;
  2. within-bucket running sum via a window (per-partition sort — B
     bounds every sort's width);
  3. per-bucket totals (B rows) are collected to the driver, turned
     into exclusive prefix offsets, and joined back as a broadcast
     LocalRelation — the only driver-side state is O(B).

``shard_id = global_start_token // shard_tokens``: shards are
contiguous token ranges of the hash-ordered corpus, so downstream
writers can emit one file per shard and any engine can recompute the
assignment bit-for-bit (the DuckDB oracle does).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from document_parser_spark.ops.hashing import hash_col

SHARD_TOKENS_DEFAULT = 1 << 20          # ~1M tokens per shard
SHARD_BUCKETS_DEFAULT = 1024            # driver state is O(buckets)
_HASH_SPACE = 1 << 60                   # hash_col is a 60-bit value


def shard_assign(docs: DataFrame, tokens_col: str = "n_tokens",
                 shard_tokens: int = SHARD_TOKENS_DEFAULT,
                 buckets: int = SHARD_BUCKETS_DEFAULT) -> DataFrame:
    """-> (doc_id, h, shard_id, shard_pos) — ``shard_pos`` is the
    document's global start-token offset within its shard.

    ``docs`` must carry ``tokens_col`` (per-doc token count). Skew
    note: a single document larger than ``shard_tokens`` spills over
    shard boundaries by construction (shards are token RANGES, not
    bins), so giant docs lengthen one shard rather than stalling the
    packer."""
    width = -(-_HASH_SPACE // buckets)          # ceil div
    h = hash_col(F.col("doc_id").cast("string"))
    d = docs.select(F.col("doc_id"),
                    F.col(tokens_col).cast("long").alias("_tok"),
                    h.alias("h"))
    # integer `div`, NOT `/`: long/long is double division in Spark and
    # a 60-bit hash exceeds the 53-bit mantissa — boundary docs would
    # land in the wrong bucket and break the global order
    d = d.withColumn("bucket", F.expr(f"h div {width}"))
    w = (Window.partitionBy("bucket")
         .orderBy("h", "doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_cum", F.sum("_tok").over(w))

    totals = (d.groupBy("bucket").agg(F.sum("_tok").alias("_btot"))
              .orderBy("bucket").collect())
    offsets, running = [], 0
    for r in totals:
        offsets.append((r["bucket"], running))
        running += r["_btot"]
    off = d.sparkSession.createDataFrame(
        offsets, "bucket long, _boff long")

    return (
        d.join(F.broadcast(off), "bucket")
        .withColumn("_start", F.col("_boff") + F.col("_cum")
                    - F.col("_tok"))
        .select(
            "doc_id", "h",
            F.expr(f"_start div {int(shard_tokens)}").alias("shard_id"),
            F.pmod("_start", F.lit(shard_tokens)).cast("long")
            .alias("shard_pos"),
        )
    )


def shuffle_order(docs: DataFrame, seed: str = "epoch-0",
                  buckets: int = SHARD_BUCKETS_DEFAULT,
                  id_col: str = "doc_id") -> DataFrame:
    """Deterministic global training-order shuffle: every document gets
    a 0-based position in the order of a SEEDED portable hash — a new
    seed is a new epoch permutation, reproducible on any engine and on
    any re-run (no ``rand()``, no ``zipWithIndex`` RDD round-trip).

    -> (id_col, h, pos: long)

    Scale shape: the same two-level scan as ``shard_assign`` — the
    hash space is cut into ``buckets`` CONTIGUOUS ranges, each bucket
    counts its rows under a bounded window sort, and only the O(B)
    per-bucket totals visit the driver to become exclusive offsets
    (broadcast back). No global sort, no single-partition window, no
    barrier beyond one small collect. Ties (identical 60-bit hashes)
    break on ``id_col``, making the order total; the DuckDB oracle is
    ONE global ``row_number()`` over the same keys — proving the
    decomposition equals the global scan.
    """
    width = -(-_HASH_SPACE // buckets)
    h = hash_col(F.concat(F.lit(seed + ":"),
                          F.col(id_col).cast("string")))
    d = docs.select(F.col(id_col), h.alias("h"))
    d = d.withColumn("bucket", F.expr(f"h div {width}"))
    w = (Window.partitionBy("bucket")
         .orderBy("h", id_col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    d = d.withColumn("_cum", F.count(F.lit(1)).over(w))

    totals = (d.groupBy("bucket").agg(F.count("*").alias("_btot"))
              .orderBy("bucket").collect())
    offsets, running = [], 0
    for r in totals:
        offsets.append((r["bucket"], running))
        running += r["_btot"]
    off = d.sparkSession.createDataFrame(
        offsets, "bucket long, _boff long")

    return (
        d.join(F.broadcast(off), "bucket")
        .select(id_col, "h",
                (F.col("_boff") + F.col("_cum") - 1).cast("long")
                .alias("pos"))
    )
