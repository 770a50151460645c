"""Interleaved-document ops: media-density gate semantics and
image-caption pair mining (nearest text span, preceding-on-tie,
gap cap, candidate length floor) against brute-force Python."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops.interleave import (
    image_caption_pairs,
    image_doc_frequency,
    interleave_stats,
    strip_boilerplate_images,
)

SPAN_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")


def _doc(doc_id, kinds_texts):
    return (doc_id, [(k, t, f"m://{doc_id}/{i}" if k == "image" else "",
                      i) for i, (k, t) in enumerate(kinds_texts)])


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        # text-only doc, plenty of chars
        _doc("t1", [("text", "x" * 100), ("text", "y" * 100)]),
        # balanced interleaved doc: caption before and after the image
        _doc("mix", [("text", "a" * 30), ("image", ""),
                     ("text", "b" * 30)]),
        # image-led doc (caption only after)
        _doc("after", [("image", ""), ("text", "c" * 40)]),
        # image farm: 3 images, thin text -> gate drops it
        _doc("farm", [("image", ""), ("image", ""), ("image", ""),
                      ("text", "d" * 10)]),
        # caption too far away (gap 4 > max_gap 3)
        _doc("far", [("text", "e" * 50), ("text", "s"), ("text", "s"),
                     ("text", "s"), ("image", "")]),
        # no text at all
        _doc("imgonly", [("image", "")]),
        # short candidates skipped, long one further away wins
        _doc("skip", [("text", "f" * 50), ("text", "tiny"),
                      ("image", "")]),
    ]
    return rows


@pytest.fixture(scope="module")
def sdf(spark, docs):
    return spark.createDataFrame(docs, SPAN_SCHEMA)


def _brute_pairs(docs, max_gap, min_chars):
    out = []
    for doc_id, spans in docs:
        cands = [(i, t) for i, (k, t, _, _) in enumerate(spans)
                 if k == "text" and t is not None and len(t) >= min_chars]
        for i, (k, _, m, _) in enumerate(spans):
            if k != "image":
                continue
            best = None
            for (j, t) in cands:
                d = abs(j - i)
                if best is None or d < best[0]:
                    best = (d, j, t)
            if best and best[0] <= max_gap:
                side = "before" if best[1] < i else "after"
                out.append((doc_id, m, i, best[1], best[0], side, best[2]))
    return sorted(out)


def test_pairs_match_brute_force(sdf, docs):
    got = sorted(tuple(r) for r in
                 image_caption_pairs(sdf, max_gap=3,
                                     min_caption_chars=20).collect())
    assert got == _brute_pairs(docs, 3, 20)


def test_tie_prefers_preceding(sdf):
    rows = {r.doc_id: r for r in
            image_caption_pairs(sdf, max_gap=3,
                                min_caption_chars=20).collect()}
    assert rows["mix"].side == "before" and rows["mix"].cap_pos == 0
    assert rows["after"].side == "after"


def test_gap_cap_and_candidate_floor(sdf):
    ids = {r.doc_id for r in
           image_caption_pairs(sdf, max_gap=3,
                               min_caption_chars=20).collect()}
    assert "far" not in ids          # nearest candidate at gap 4
    assert "imgonly" not in ids      # no candidates at all
    # 'skip': tiny (gap 1) is below the floor; f*50 at gap 2 wins
    got = {r.doc_id: r for r in
           image_caption_pairs(sdf, max_gap=3,
                               min_caption_chars=20).collect()}
    assert got["skip"].cap_pos == 0 and got["skip"].gap == 2


def test_stats_gate(sdf):
    st = {r.doc_id: r for r in
          interleave_stats(sdf, max_images=2,
                           min_chars_per_image=25).collect()}
    assert st["t1"].keep == 1 and st["t1"].n_images == 0
    assert st["t1"].text_chars == 200
    assert st["farm"].keep == 0      # 3 images > max 2 AND thin text
    assert st["imgonly"].keep == 0   # no text spans
    assert st["mix"].keep == 1       # 60 chars >= 25 * 1 image
    # chars-per-image rule alone: 1 image but only 10*4=40... farm has
    # 10 chars, 3 images -> needs 75
    assert st["farm"].text_chars == 10


def test_image_doc_frequency_distinct_per_doc(spark):
    """Within-doc repeats (galleries) count once; doc_freq is the
    number of distinct documents carrying the ref."""
    rows = [
        ("g1", [("image", "", "logo", 0), ("image", "", "logo", 1),
                ("image", "", "unique1", 2)]),
        ("g2", [("image", "", "logo", 0), ("text", "body text", "", 1)]),
        ("g3", [("image", "", None, 0), ("image", "", "", 1)]),  # ignored
    ]
    sdf = spark.createDataFrame(rows, SPAN_SCHEMA)
    freq = {r.media_ref: r.doc_freq
            for r in image_doc_frequency(sdf).collect()}
    assert freq == {"logo": 2, "unique1": 1}


def test_strip_boilerplate_images(spark):
    """Refs above the doc-frequency cap are removed in-row; unique
    refs, text spans, and offsets survive untouched; NULL media_ref
    never matches the boilerplate set."""
    rows = ([(f"d{i}", [("image", "", "banner", 0),
                        ("text", "content %d" % i, "", 1)])
             for i in range(4)]
            + [("solo", [("image", "", "rare", 0),
                         ("image", "", None, 1),
                         ("text", "kept text", "", 2)])])
    sdf = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = {r.doc_id: r.spans
           for r in strip_boilerplate_images(sdf, max_doc_freq=2)
           .collect()}
    # banner appears in 4 docs > 2 -> stripped everywhere
    for i in range(4):
        assert [(s.kind, s.offset) for s in out[f"d{i}"]] == [("text", 1)]
    # rare ref (freq 1) + NULL-ref image + text all survive
    assert [(s.kind, s.media_ref) for s in out["solo"]] == [
        ("image", "rare"), ("image", None), ("text", "")]


def test_stats_null_spans_explicit_drop(spark):
    """r3 ADVICE: a NULL spans array must yield keep=0 (explicit drop)
    and zeroed counts, not NULL keep that leaks through keep == 0
    filters downstream."""
    sdf = spark.createDataFrame([("nullspans", None),
                                 ("ok", [("text", "x" * 5000, "", 0)])],
                                SPAN_SCHEMA)
    st = {r.doc_id: r for r in interleave_stats(sdf).collect()}
    r = st["nullspans"]
    assert (r.n_spans, r.n_text, r.n_images, r.text_chars) == (0, 0, 0, 0)
    assert r.keep == 0
    assert st["ok"].keep == 1


def test_strip_boilerplate_no_doc_keyed_shuffle(spark, sdf):
    """The strip's only exchanges belong to the bounded frequency
    aggregation (media_ref-keyed groupBy + the 1-row fold); the corpus
    relation itself is never shuffled on a doc key — the frequent set
    arrives by broadcast and the filter is in-row."""
    plan = strip_boilerplate_images(sdf)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
    assert "hashpartitioning(doc_id" not in plan
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan


def test_stats_no_shuffle(spark, sdf):
    plan = interleave_stats(sdf)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    pairs_plan = image_caption_pairs(sdf)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in pairs_plan
    assert "BatchEvalPython" not in pairs_plan
    assert "ArrowEvalPython" not in pairs_plan
