"""Streaming front-end tests: foreachBatch extraction equals the batch
run; checkpoint prevents reprocessing; session windows match the
lag-based W3 query."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from document_parser_spark.plans.pipeline import extract
from document_parser_spark.sources.synth import fixtures_dataframe
from document_parser_spark.streaming.stream import (
    sessionize_events,
    stream_extract,
    windowed_event_counts,
)


def test_watermark_drops_late_events(spark, tmp_path):
    """Append-mode tumbling-window agg over a two-micro-batch file
    stream: batch 1 advances the watermark past window W1's end (W1 is
    finalized and emitted once); batch 2 delivers an event inside W1
    but behind the watermark — it must be DROPPED, not re-open the
    window."""
    import time as _time

    src = tmp_path / "events_in"
    src.mkdir()
    schema = "user_id string, ts timestamp"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1) \
            .write.mode("overwrite").parquet(str(tmp_path / name))
        # move the single part file into the source dir with ordered
        # mtimes (file source processes oldest-first)
        import glob
        import shutil
        part = glob.glob(str(tmp_path / name / "part-*.parquet"))[0]
        shutil.copy(part, str(src / f"{name}.parquet"))

    from datetime import datetime
    t = lambda m: datetime(2026, 1, 1, 10, m)

    def drain():
        events = spark.readStream.schema(schema).parquet(str(src))
        out = windowed_event_counts(events, window_minutes=10,
                                    watermark_minutes=5)
        q = (out.writeStream.outputMode("append").format("parquet")
             .option("path", str(tmp_path / "events_out"))
             .option("checkpointLocation", str(tmp_path / "ckpt"))
             .trigger(availableNow=True).start())
        q.awaitTermination(120)

    # batch 1: three W1 events + one at 10:59 -> watermark 10:54,
    # past W1's end (10:10) -> W1 finalized and emitted
    write_file("a", [("u", t(0)), ("u", t(3)), ("u", t(5)),
                     ("u", t(59))])
    drain()
    # batch 2 (same checkpoint — watermark persisted): an event inside
    # W1 but behind the watermark
    write_file("b", [("u", t(3))])
    drain()

    got = {(r.window_start.minute, r.n_events)
           for r in spark.read.parquet(
               str(tmp_path / "events_out")).collect()}
    # W1 (10:00-10:10) emitted once with batch-1's three events; the
    # late batch-2 event neither re-emits nor inflates it. The 10:50
    # window stays open (watermark never passes 11:00) -> absent.
    assert got == {(0, 3)}


def test_stream_extract_matches_batch(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    fixtures = fixtures_dataframe(spark)
    fixtures.write.parquet(in_dir)

    q = stream_extract(spark, in_dir, out_dir, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out_dir)
    want = extract(spark.read.parquet(in_dir))
    key = lambda df: sorted(
        (r.doc_id, r.status, r.markdown,
         tuple((s.kind, s.text, s.media_ref, s.offset) for s in r.spans))
        for r in df.collect())
    assert key(got) == key(want)

    # restart with same checkpoint: nothing new -> no duplicate rows
    q2 = stream_extract(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == want.count()


def test_stream_incremental_files(spark, tmp_path):
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    fx = fixtures_dataframe(spark).cache()
    first = fx.limit(4)
    first.coalesce(1).write.mode("append").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 == 4

    fx.subtract(first).coalesce(1).write.mode("append").parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ckpt).awaitTermination(120)
    out = spark.read.parquet(out_dir)
    assert out.count() == fx.count()
    # second epoch processed only the new files
    assert out.select("epoch_id").distinct().count() >= 2


def test_session_window_matches_lag_form(spark):
    events = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00"), (1, "2024-01-01 00:10:00"),
         (1, "2024-01-01 01:10:00"),                      # gap > 30m
         (2, "2024-01-01 05:00:00")],
        "user_id long, ts_s string",
    ).select("user_id", F.col("ts_s").cast("timestamp").alias("ts"))
    sess = sessionize_events(events, gap_minutes=30)
    per_user = {r.user_id: r.n for r in
                sess.groupBy("user_id")
                .agg(F.count("*").cast("long").alias("n")).collect()}
    assert per_user == {1: 2, 2: 1}
    n_events = dict((r.user_id, r.total) for r in
                    sess.groupBy("user_id")
                    .agg(F.sum("n_events").alias("total")).collect())
    assert n_events == {1: 3, 2: 1}


def test_epoch_replay_is_idempotent(spark, tmp_path):
    """foreachBatch is at-least-once; the per-epoch dynamic partition
    overwrite must make a replayed epoch rewrite (not duplicate) its
    own output."""
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    fixtures = fixtures_dataframe(spark)
    fixtures.write.parquet(in_dir)
    stream_extract(spark, in_dir, out_dir, ckpt).awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    # simulate a retry of epoch 0: re-run the same batch writer body
    epoch0 = spark.read.parquet(out_dir).filter(
        F.col("epoch_id") == 0).count()
    (extract(spark.read.parquet(in_dir))
     .withColumn("epoch_id", F.lit(0))
     .write.mode("overwrite")
     .option("partitionOverwriteMode", "dynamic")
     .partitionBy("epoch_id")
     .parquet(out_dir))
    out = spark.read.parquet(out_dir)
    assert out.count() == n1                          # no duplicates
    assert out.filter(F.col("epoch_id") == 0).count() == epoch0


def _hostile_docs(seed: int, n: int) -> list:
    """Deterministic hostile corpus as streaming input rows: tag-soup
    html (the test_html_arm_parity generator), hostile pdf coordinate
    grammar, NULL payloads/kinds, mojibake and invisible text,
    embedded table separators, negative sparse offsets — the
    adversarial families the batch fuzz hammers, here aimed at the
    streaming front-end."""
    import random

    from document_parser_spark.config import CELL_SEP, ROW_SEP
    from test_html_arm_parity import _rand_doc

    rng = random.Random(seed)
    pdfs = ["1;10;100;10;100|line one", " 1;2;3;4;5|ws-pad",
            "1;;3;4;5|empty", "1;9007199254740993;3;4;5|overflow",
            "2;20;50;30;60|second", "oops", ""]
    texts = ["plain", "Ã© mojibake", "/uni0041 esc", "x​y", "",
             None, "`tick`", "‮trick", "   "]
    tables = [f"a{CELL_SEP}b{ROW_SEP}c{CELL_SEP}d", "",
              f"cell|pipe{ROW_SEP}semi;colon", None]
    docs = []
    for i in range(n):
        n_spans = rng.randint(1, 6)
        offs = rng.sample(range(-50, 100), n_spans)
        spans = []
        for j in range(n_spans):
            r = rng.random()
            if r < 0.30:
                spans.append({"kind": "html", "text": _rand_doc(rng),
                              "media_ref": "", "offset": offs[j]})
            elif r < 0.50:
                spans.append({"kind": "pdf_line",
                              "text": rng.choice(pdfs),
                              "media_ref": "", "offset": offs[j]})
            elif r < 0.65:
                spans.append({"kind": "text", "text": rng.choice(texts),
                              "media_ref": "", "offset": offs[j]})
            elif r < 0.75:
                spans.append({"kind": rng.choice(["table", "docx_table"]),
                              "text": rng.choice(tables),
                              "media_ref": "", "offset": offs[j]})
            elif r < 0.85:
                spans.append({"kind": "image", "text": "",
                              "media_ref": rng.choice(
                                  ["img://x", "", None]),
                              "offset": offs[j]})
            else:
                # kind is non-nullable in DOCUMENTS_IN_SCHEMA (the
                # streaming contract); unknown kinds exercise the
                # failure-tally path instead
                spans.append({"kind": rng.choice(["blob", "mp4", "docx"]),
                              "text": rng.choice(texts),
                              "media_ref": "", "offset": offs[j]})
        docs.append((f"h{i}", spans, "host.example", "s"))
    return docs


def test_stream_extract_hostile_multibatch(spark, tmp_path):
    """Hostile corpus through the STREAMING front-end, split across
    micro-batches (maxFilesPerTrigger=1): per-doc output must equal
    the pure-Python oracle — serialization, failure tallies and span
    order must not depend on which micro-batch a doc arrived in —
    and a checkpointed restart must add zero rows (exactly-once)."""
    from document_parser_spark.refparser.parse import parse_document
    from document_parser_spark.schema import DOCUMENTS_IN_SCHEMA

    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    docs = _hostile_docs(20260821, 60)
    for k in range(3):                       # 3 files -> 3 micro-batches
        spark.createDataFrame(docs[k * 20:(k + 1) * 20],
                              DOCUMENTS_IN_SCHEMA) \
            .coalesce(1).write.mode("append").parquet(in_dir)

    stream_extract(spark, in_dir, out_dir, ckpt,
                   max_files_per_trigger=1).awaitTermination(240)
    out = spark.read.parquet(out_dir)
    assert out.select("epoch_id").distinct().count() >= 3
    got = {
        r.doc_id: (
            [(s.kind, s.text, s.media_ref, s.offset) for s in r.spans],
            r.markdown, r.status, r.n_failures)
        for r in out.collect()
    }
    assert len(got) == len(docs)
    for doc_id, spans, _, _ in docs:
        want = parse_document(
            doc_id, [(s["kind"], s["text"], s["media_ref"], s["offset"])
                     for s in spans])
        assert got[doc_id] == (want.spans, want.markdown, want.status,
                               want.n_failures), doc_id

    # restart on the same checkpoint: nothing new -> no duplicates
    stream_extract(spark, in_dir, out_dir, ckpt).awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(docs)


def test_stateful_stream_dedup_across_batches(spark, tmp_path):
    """applyInPandasWithState keep-first dedup: a duplicate arriving in
    a LATER micro-batch must be suppressed by keyed state (and a
    restart with the same checkpoint must not re-emit anything)."""
    from document_parser_spark.streaming.stream import (
        stream_dedup_first_seen,
    )
    in_dir = str(tmp_path / "in")
    out_dir = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    batch1 = [("a1", "alpha content"), ("b1", "beta content"),
              ("a2", "alpha content")]          # in-batch duplicate
    batch2 = [("a3", "ALPHA   content "),        # cross-batch duplicate
              ("c1", "gamma content")]
    spark.createDataFrame(batch1, "doc_id string, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)
    spark.createDataFrame(batch2, "doc_id string, text string") \
        .coalesce(1).write.mode("append").parquet(in_dir)

    q = stream_dedup_first_seen(spark, in_dir, out_dir, ckpt,
                                max_files_per_trigger=1)
    q.awaitTermination(120)
    out = spark.read.parquet(out_dir).collect()
    by_keep = {r.keep_id: r for r in out}
    assert set(by_keep) == {"a1", "b1", "c1"}   # one row per content
    assert by_keep["a1"].n_copies_first_batch == 2  # a1+a2 same batch
    assert by_keep["c1"].n_copies_first_batch == 1

    # drain again with the same checkpoint: nothing new
    q2 = stream_dedup_first_seen(spark, in_dir, out_dir, ckpt)
    q2.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == 3
