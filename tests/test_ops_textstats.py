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


def test_redact_pii(spark):
    rows = [
        (1, "mail bob.smith+x@corp.example.org now"),
        (2, "call +1 555-010-0042 or (02) 9999 8888 today"),
        (3, "server at 10.0.123.7 responded"),
        (4, "clean text with no identifiers at all"),
        (5, "a@b.co and 192.168.1.100 and +44 20 7946 0958"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in ts.redact_pii(docs).collect()}
    assert got[1].redacted == "mail <EMAIL> now"
    assert got[1].n_email == 1 and got[1].n_phone == 0
    assert got[2].redacted == "call <PHONE> or <PHONE> today"
    assert got[2].n_phone == 2
    # ip runs before phone: the dotted quad must NOT become <PHONE>
    assert got[3].redacted == "server at <IP> responded"
    assert got[3].n_ip == 1 and got[3].n_phone >= 1  # raw-count overlap ok
    assert got[4].redacted == rows[3][1]
    assert got[4].n_email == got[4].n_ip == got[4].n_phone == 0
    assert got[5].redacted == "<EMAIL> and <IP> and <PHONE>"


def test_repetition_stats(spark):
    rows = [
        (1, "spam spam spam spam spam spam"),         # one repeated word
        (2, "a b c d e f g h"),                       # all distinct
        (3, "go stop go stop go stop go"),            # dominant bigrams
        (4, "solo"),                                  # no bigrams
        (5, "x y z x y w q r s t u v"),               # mild repetition
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    r = {x.doc_id: x for x in ts.repetition_stats(docs).collect()}
    # doc 1: 6 words 1 uniq -> dup 1-1/6=0.833; bigrams all 'spam spam'
    assert r[1].n_words == 6
    assert r[1].dup_word_frac == 0.833
    assert r[1].top_bigram_frac == 1.0
    assert r[1].rep_ok == 0
    # doc 2: fully distinct words, 7 distinct bigrams of 7
    assert r[2].dup_word_frac == 0.0
    assert r[2].top_bigram_frac == round(1 / 7, 3)
    assert r[2].rep_ok == 1
    # doc 3: 'go stop' x3 + 'stop go' x3 of 6 bigrams -> top 0.5
    assert r[3].top_bigram_frac == 0.5
    assert r[3].rep_ok == 0
    # doc 4: single word -> no bigrams, top frac 0 by definition
    assert r[4].n_words == 1
    assert r[4].top_bigram_frac == 0.0
    assert r[4].dup_word_frac == 0.0
    assert r[4].rep_ok == 1
    # doc 5: 12 words, 10 uniq -> 0.167 dup; every bigram unique except
    # 'x y' twice -> 2/11
    assert r[5].dup_word_frac == round(1 - 10 / 12, 3)
    assert r[5].top_bigram_frac == round(2 / 11, 3)


def test_vocab_topk(spark):
    rows = [
        (1, "b b b a a c"),
        (2, "a b  d"),
        (3, ""),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    out = ts.vocab_topk(docs, k=3).collect()
    # b: tf 4 df 2; a: tf 3 df 2; c/d tie tf 1 -> 'c' wins the word
    # tiebreak; '' (from the double space + empty doc) never counted
    assert [(r.word, r.tf, r.df) for r in out] == [
        ("b", 4, 2), ("a", 3, 2), ("c", 1, 1)]
    # global top-k must plan as TakeOrderedAndProject (per-partition
    # heap + driver merge of k rows), not a full sort
    plan = ts.vocab_topk(docs, k=3)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "TakeOrderedAndProject" in plan


# ---------------------------------------------------------------------------
# blocklist / entropy / winnowing
# ---------------------------------------------------------------------------

class TestBlocklist:
    def test_counts_and_gate(self, spark):
        d = spark.createDataFrame(
            [(1, "fast slow fast slow dup"), (2, "fast scan join"),
             (3, "")],
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in ts.blocklist_stats(d).collect()}
        assert rows[1]["n_banned"] == 3
        assert rows[1]["n_banned_distinct"] == 2
        assert rows[1]["block_ok"] == 0
        assert rows[2]["n_banned"] == 0 and rows[2]["block_ok"] == 1
        assert rows[3]["n_banned"] == 0 and rows[3]["block_ok"] == 1

    def test_join_path_equals_codegen(self, spark):
        d = spark.createDataFrame(
            [(i, f"w{i % 7} slow dup spam" if i % 3 == 0
              else f"w{i % 7} scan") for i in range(60)],
            "doc_id long, text string")
        terms = spark.createDataFrame(
            [(t,) for t in ts.BLOCKLIST_DEFAULT], "term string")
        a = sorted(map(tuple, ts.blocklist_stats(d).collect()))
        b = sorted(map(tuple, ts.blocklist_stats_join(d, terms).collect()))
        assert a == b


class TestEntropy:
    def test_values_and_gate(self, spark):
        import math
        d = spark.createDataFrame(
            [(1, "a a a a a a a a"),            # H = 0 -> dropped
             (2, "a b c d e f g h"),            # H = ln 8 -> kept
             (3, "a a b b")],                   # H = ln 2 < 1.5 -> dropped
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in ts.entropy_stats(d).collect()}
        assert rows[1]["entropy"] == 0.0 and rows[1]["ent_ok"] == 0
        assert rows[2]["entropy"] == round(math.log(8), 3)
        assert rows[2]["ent_ok"] == 1
        assert rows[3]["entropy"] == round(math.log(2), 3)
        assert rows[3]["ent_ok"] == 0
        assert rows[2]["n_words"] == 8 and rows[2]["n_distinct"] == 8

    def test_empty_docs_excluded(self, spark):
        d = spark.createDataFrame(
            [(1, ""), (2, "a b")], "doc_id long, text string")
        assert [r["doc_id"] for r in ts.entropy_stats(d).collect()] == [2]


class TestWinnow:
    def test_selected_subset_and_density(self, spark):
        words = " ".join(f"w{(i * 13) % 31}" for i in range(40))
        d = spark.createDataFrame([(1, words)], "doc_id long, text string")
        fps = ts.rolling_fingerprints(d, window=8).collect()[0]["fps"]
        row = ts.winnow_fingerprints(d, kgram=8, winnow=4).collect()[0]
        assert row["n_windows"] == len(fps) == 40 - 8 + 1
        assert set(row["selected"]) <= set(fps)
        # winnowing guarantee: >= 1 selection per window of 4
        assert row["n_selected"] >= 1
        assert row["selected"] == sorted(set(row["selected"]))

    def test_shared_span_shares_fingerprints(self, spark):
        shared = " ".join(f"s{i}" for i in range(16))
        d = spark.createDataFrame(
            [(1, "a b c " + shared + " x y z"),
             (2, "p q r t u " + shared + " m n")],
            "doc_id long, text string")
        rows = {r["doc_id"]: set(r["selected"])
                for r in ts.winnow_fingerprints(d).collect()}
        # a shared run of length >= kgram+winnow-1 (=11) words must
        # produce at least one common selected fingerprint
        assert rows[1] & rows[2]

    def test_short_docs(self, spark):
        d = spark.createDataFrame(
            [(1, "a b c"),                        # no 8-gram: empty
             (2, " ".join(f"w{i}" for i in range(9)))],  # 2 windows < 4
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in ts.winnow_fingerprints(d).collect()}
        assert rows[1]["n_windows"] == 0 and rows[1]["n_selected"] == 0
        assert rows[2]["n_windows"] == 2 and rows[2]["n_selected"] == 1


class TestDupNgrams:
    def test_pasted_paragraph_fires(self, spark):
        para = " ".join(f"p{i}" for i in range(20))
        d = spark.createDataFrame(
            [(1, para + " " + para),              # doc pasted twice
             (2, " ".join(f"u{i}" for i in range(40))),  # all unique
             (3, "a b c")],                       # < n words
            "doc_id long, text string")
        rows = {r["doc_id"]: r for r in ts.dup_ngram_stats(d).collect()}
        assert rows[1]["dupn_ok"] == 0
        assert rows[1]["dup_ngram_char_frac"] > 0.5
        assert rows[2]["dup_ngram_char_frac"] == 0.0
        assert rows[2]["dupn_ok"] == 1
        assert rows[3]["n_grams"] == 0 and rows[3]["dupn_ok"] == 1

    def test_exact_fraction(self, spark):
        # 6 words, one repeated 5-gram: "a b c d e a b c d e" has
        # 6 5-grams; "a b c d e" occurs twice (len 9), others once
        d = spark.createDataFrame(
            [(1, "a b c d e a b c d e")], "doc_id long, text string")
        r = ts.dup_ngram_stats(d).collect()[0]
        assert r["n_grams"] == 6
        tot = 2 * 9 + 9 + 9 + 9 + 9     # dup gram 2x9 + 4 unique x9
        assert r["dup_ngram_char_frac"] == round(18 / tot, 3)
