"""Chunk-dedup / bigram-LM / BM25 operator tests on crafted docs."""

from __future__ import annotations

import math

import pytest

from document_parser_spark.ops import lm, retrieval
from document_parser_spark.ops.dedup import chunk_dedup


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, "the cat sat on the mat"),
        (2, "the cat sat on the hat"),
        (3, "a completely different document about spark"),
        (4, "the cat sat on the mat"),          # exact dup of 1
        (5, "x"),                               # single word: no bigram
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


# --- chunk_dedup ---------------------------------------------------

def test_chunk_dedup_word_windows(spark):
    rows = [
        (1, "a b c d e f"),          # chunks (k=3): "a b c", "d e f"
        (2, "a b c x y z"),          # "a b c" repeats -> dropped
        (3, "d e f"),                # whole doc is a repeat
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in chunk_dedup(docs, k=3).collect()}
    assert (out[1].n_chunks, out[1].n_kept) == (2, 2)
    assert out[1].text_dedup == "a b c d e f"
    assert (out[2].n_chunks, out[2].n_kept) == (2, 1)
    assert out[2].text_dedup == "x y z"
    assert (out[3].n_chunks, out[3].n_kept) == (1, 0)
    assert out[3].text_dedup == ""


def test_chunk_dedup_earliest_wins_and_order(spark):
    # duplicate chunk within ONE doc: second occurrence dropped,
    # surviving chunks keep original order
    rows = [(7, "p q r s t u p q r v w x")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_dedup(docs, k=3).collect()[0]
    assert out.n_chunks == 4
    assert out.n_kept == 3
    assert out.text_dedup == "p q r s t u v w x"


def test_chunk_dedup_paragraph_mode(spark):
    rows = [
        (1, "alpha beta\n\ngamma delta"),
        (2, "gamma delta\n\nnew paragraph"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in
           chunk_dedup(docs, split_re=r"\n{2,}",
                       join_sep="\n\n").collect()}
    assert out[1].text_dedup == "alpha beta\n\ngamma delta"
    assert out[2].text_dedup == "new paragraph"


def test_chunk_dedup_string_doc_ids(spark):
    # the canonical corpus schema is doc_id:string (BASELINE.json
    # input_hint) — the operator must not assume a numeric id (the old
    # winner key packed doc_id*2^20+pos and threw on strings,
    # r3 VERDICT #2). Earliest occurrence = lexicographically smallest
    # (doc_id, pos) struct.
    rows = [
        ("web/b#2", "a b c x y z"),   # "a b c" loses to web/a#1
        ("web/a#1", "a b c d e f"),
        ("s3://bucket/doc-9", "d e f"),  # wins "d e f": "s3..." < "web..."
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string")
    out = {r.doc_id: r for r in chunk_dedup(docs, k=3).collect()}
    assert out["web/a#1"].text_dedup == "a b c"
    assert (out["web/a#1"].n_chunks, out["web/a#1"].n_kept) == (2, 1)
    assert out["web/b#2"].text_dedup == "x y z"
    assert out["s3://bucket/doc-9"].text_dedup == "d e f"


def test_chunk_dedup_short_tail_chunk(spark):
    # 4 words at k=3 -> chunks "a b c" + "d" (tail shorter than k)
    rows = [(1, "a b c d")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_dedup(docs, k=3).collect()[0]
    assert out.n_chunks == 2
    assert out.text_dedup == "a b c d"


# --- bigram LM -----------------------------------------------------

def test_bigram_lm_scores_exact(docs):
    out = {r.doc_id: r for r in lm.bigram_lm_scores(docs).collect()}
    # doc 5 has a single word -> excluded
    assert 5 not in out
    assert out[1].n_bigrams == 5
    # docs 1 and 4 are identical -> identical scores
    assert out[1].mean_nll == out[4].mean_nll
    # the unique-vocab doc 3 must be less probable than the dup pair
    assert out[3].mean_nll > out[1].mean_nll
    # hand-check one bigram's probability end-to-end: corpus has
    # V distinct words; c("the","cat")=3, context c("the")=6.
    v = len({w for _, t in [
        (1, "the cat sat on the mat"), (2, "the cat sat on the hat"),
        (3, "a completely different document about spark"),
        (4, "the cat sat on the mat"), (5, "x")]
        for w in t.split()})
    p = (3 + lm.LM_ADD_K) / (6 + lm.LM_ADD_K * v)
    assert p > 0
    # all scores are finite, positive, rounded to 3
    for r in out.values():
        assert r.mean_nll > 0
        assert round(r.mean_nll, 3) == r.mean_nll
        assert r.lm_ok in (0, 1)


def test_bigram_lm_identical_docs_probable(spark):
    # a corpus of many identical docs: their bigrams are near-certain
    rows = [(i, "w1 w2 w3 w4") for i in range(20)] + \
        [(99, "rare tokens entirely unseen elsewhere")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r.doc_id: r for r in lm.bigram_lm_scores(docs).collect()}
    assert out[0].mean_nll < out[99].mean_nll
    assert out[0].lm_ok == 1


# --- BM25 ----------------------------------------------------------

def test_bm25_scores_exact(docs):
    out = {r.doc_id: r for r in
           retrieval.bm25_scores(docs, ["cat", "spark"]).collect()}
    # docs 1/2/4 contain "cat"; doc 3 contains "spark"; doc 5 nothing
    assert set(out) == {1, 2, 3, 4}
    assert out[1].n_hits == 1 and out[3].n_hits == 1
    # hand-computed BM25 for doc 3 / term "spark":
    # N=5, df=1, dl=6, avgdl=(6+6+6+6+1)/5=5.0, tf=1
    idf = math.log(1.0 + (5 - 1 + 0.5) / (1 + 0.5))
    tfp = (1 * 2.2) / (1 + 1.2 * (1 - 0.75 + 0.75 * 6 / 5.0))
    assert out[3].score == round(idf * tfp, 3)
    # identical docs score identically
    assert out[1].score == out[4].score


def test_bm25_multi_term_sum(spark):
    rows = [(1, "apple banana apple"), (2, "banana"), (3, "cherry")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    both = {r.doc_id: r.score for r in
            retrieval.bm25_scores(docs, ["apple", "banana"]).collect()}
    only_a = {r.doc_id: r.score for r in
              retrieval.bm25_scores(docs, ["apple"]).collect()}
    only_b = {r.doc_id: r.score for r in
              retrieval.bm25_scores(docs, ["banana"]).collect()}
    # additivity across terms (up to the 3-decimal rounding)
    assert abs(both[1] - (only_a[1] + only_b[1])) <= 0.002
    assert 3 not in both
