"""Text-analysis operator tests on crafted strings."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops import textstats as ts


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat is on the mat and the dog is in a hat"),
        (2, "der hund ist ein guter hund und der ist da mit der"),
        (3, "zzz qqq www eee rrr ttt yyy uuu iii ooo"),
        (4, "Hello, world! x9 = 3.14"),
        (5, "one two three"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_token_stats(docs):
    r = {x.doc_id: x for x in ts.token_stats(docs).collect()}
    assert r[5].n_ws_tokens == 3
    # Hello , world ! x9 = 3 . 14  -> 9 BPE-ish tokens
    assert r[4].n_bpe_tokens == 9
    assert r[5].n_chars == len("one two three")


def test_lang_id(docs):
    r = {x.doc_id: x for x in ts.lang_id(docs).collect()}
    assert r[1].lang_guess == "en"
    assert r[2].lang_guess == "de"
    assert r[3].lang_guess == "unk"
    assert r[1].lang_score > 0.3


def test_quality(docs):
    r = {x.doc_id: x for x in ts.quality_scores(docs).collect()}
    assert r[1].quality_ok == 1
    assert r[5].quality_ok == 0        # < 8 tokens
    assert r[1].stop_ratio > 0.4


def test_fingerprint_normalization(spark):
    rows = [(1, "Some  Text   here"), (2, "some text here"),
            (3, " SOME TEXT HERE ")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fp for r in ts.fingerprint(docs).collect()}
    assert fps[1] == fps[2] == fps[3]


def test_rolling_fingerprints_shift_invariant(spark):
    body = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(1, body), (2, "prefix words here " + body)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    fps = {r.doc_id: r.fps for r in
           ts.rolling_fingerprints(docs, window=4).collect()}
    # every window fully inside the shared suffix must hash identically
    assert set(fps[1]) <= set(fps[2])
    assert len(fps[1]) == 10 - 4 + 1
