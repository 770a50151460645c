"""Structured Streaming front-end (SURVEY §2.11).

The reference is request/response; its streaming-adjacent semantics
(task lifecycle, progress, resumability) map to the lineage table.
When a continuously-arriving span table is wanted instead, this
module wraps the IDENTICAL batch pipeline in ``readStream`` →
``foreachBatch`` — no new operators, the batch plan is the streaming
plan. Checkpointing makes each input file belong to exactly one
epoch; the per-epoch dynamic-partition overwrite inside the batch
writer makes epoch replays idempotent (foreachBatch alone is only
at-least-once), so the OUTPUT is exactly-once.

``sessionize_events`` is the stateful-streaming example (event-time
window + watermark): the W3 boundary-detection semantics expressed
with built-in streaming operators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F
from pyspark.sql.streaming import StreamingQuery

from document_parser_spark.config import IMAGE_MODE_PLACEHOLDER
from document_parser_spark.plans.pipeline import extract
from document_parser_spark.schema import DOCUMENTS_IN_SCHEMA


def stream_extract(spark: SparkSession, input_dir: str, output_dir: str,
                   checkpoint_dir: str,
                   image_mode: str = IMAGE_MODE_PLACEHOLDER,
                   available_now: bool = True,
                   max_files_per_trigger: int | None = None,
                   **extract_kwargs) -> StreamingQuery:
    """File-source streaming extraction: each micro-batch runs the
    full batch ``extract`` and appends to the output table.

    ``available_now=True`` drains everything currently present and
    stops (the batch-catch-up mode); with ``max_files_per_trigger`` it
    becomes a rate-limited continuous ingest.
    """
    reader = (spark.readStream
              .schema(DOCUMENTS_IN_SCHEMA)
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.load(input_dir)

    def run_batch(batch_df: DataFrame, epoch_id: int) -> None:
        # Idempotent per-epoch commit: foreachBatch is at-least-once,
        # so a retried epoch must replace (not re-append) its own
        # output. Partitioning by epoch_id + dynamic partition
        # overwrite rewrites exactly the retried epoch's directory and
        # leaves every other epoch untouched -> exactly-once output.
        (extract(batch_df, image_mode=image_mode, **extract_kwargs)
         .withColumn("epoch_id", F.lit(epoch_id))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("epoch_id")
         .parquet(output_dir))

    writer = (stream.writeStream
              .foreachBatch(run_batch)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def stream_dedup_first_seen(spark: SparkSession, input_dir: str,
                            output_dir: str, checkpoint_dir: str,
                            available_now: bool = True,
                            max_files_per_trigger: int | None = None
                            ) -> StreamingQuery:
    """Custom STATEFUL streaming operator (``applyInPandasWithState``):
    cross-micro-batch exact dedup. Keyed by the content fingerprint,
    per-key state remembers whether the key was ever seen and how many
    copies arrived; only the FIRST occurrence (min doc_id within its
    batch) is emitted, duplicates in later batches update the state and
    emit nothing. This is the streaming form of
    ``ops.dedup.exact_duplicates`` — built-in ``dropDuplicates`` can't
    express the tallying, and ``session_window`` can't express
    keep-first-forever, which is why this one is a custom state fn.

    State size = one (long, string) per distinct fingerprint — the
    canonical keyed-state layout RocksDB state stores are built for;
    the fingerprint key also makes state sharding uniform (md5 output
    is unskewed by construction).
    """
    import pandas as pd
    from pyspark.sql.streaming.state import (
        GroupState,
        GroupStateTimeout,
    )

    reader = (spark.readStream
              .schema("doc_id string, text string")
              .format("parquet"))
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger",
                               str(max_files_per_trigger))
    stream = reader.load(input_dir)
    fp = F.md5(F.lower(F.regexp_replace(F.trim(F.col("text")),
                                        r"\s+", " ")))
    keyed = stream.select(F.col("doc_id"), fp.alias("fp"))

    def first_seen(key, pdfs, state: GroupState):
        rows = pd.concat(list(pdfs), ignore_index=True)
        n_new = len(rows)
        if state.exists:
            (n_prev,) = state.get
            state.update((n_prev + n_new,))
            return iter(())          # duplicate key: emit nothing
        state.update((n_new,))
        keep = rows["doc_id"].min()  # deterministic within the batch
        return iter([pd.DataFrame({"fp": [key[0]], "keep_id": [keep],
                                   "n_copies_first_batch": [n_new]})])

    deduped = keyed.groupBy("fp").applyInPandasWithState(
        first_seen,
        outputStructType="fp string, keep_id string, "
                         "n_copies_first_batch bigint",
        stateStructType="n_seen bigint",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )

    writer = (deduped.writeStream
              .outputMode("append")
              .format("parquet")
              .option("path", output_dir)
              .option("checkpointLocation", checkpoint_dir))
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def windowed_event_counts(events: DataFrame, window_minutes: int = 10,
                          watermark_minutes: int = 5) -> DataFrame:
    """Tumbling event-time window counts with a watermark — the
    canonical late-data-tolerant streaming aggregation. In append mode
    a window row is emitted exactly once, when the watermark passes
    the window end; events arriving later than the watermark are
    DROPPED by the state store (never double-counted, never reopening
    a finalized window). Works identically on a static frame (minus
    the late-drop, which only exists in a stream).

    -> (user_id, window_start, window_end, n_events)
    """
    return (
        events
        .withWatermark("ts", f"{watermark_minutes} minutes")
        .groupBy("user_id", F.window("ts", f"{window_minutes} minutes"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select("user_id",
                F.col("window.start").alias("window_start"),
                F.col("window.end").alias("window_end"),
                "n_events")
    )


def sessionize_events(events: DataFrame, gap_minutes: int = 30) -> DataFrame:
    """Event-time session windows with a watermark — the streaming
    form of the W3 lag-boundary query (works on a static frame too:
    session_window is supported in batch).

    -> (user_id, session_start, session_end, n_events)
    """
    return (
        events
        .withWatermark("ts", f"{gap_minutes * 2} minutes")
        .groupBy("user_id", F.session_window("ts", f"{gap_minutes} minutes"))
        .agg(F.count("*").cast("long").alias("n_events"))
        .select("user_id",
                F.col("session_window.start").alias("session_start"),
                F.col("session_window.end").alias("session_end"),
                "n_events")
    )
