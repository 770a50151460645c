"""Semantics of the composed curation funnel (ops/curation.py):
cascaded gates, earliest-survivor dedup among alive docs only,
monotone per-source attrition, and bit-determinism."""

from __future__ import annotations

import pytest

from document_parser_spark.ops import curation as cur

GOOD_EN = ("the quick brown fox jumps over the lazy dog and then "
           "it runs back home to rest for a while")
GOOD_EN2 = ("a different but equally fine english sentence with the "
            "usual mix of common words and some longer ones too")
NON_EN = ("der schnelle braune fuchs springt und die katze schlaeft "
          "auf dem warmen dach der alten scheune im winter")
# stopword-bearing so both still pass the LANG gate and fail only
# their own gate (the lang heuristic needs >=5% en stopwords)
SHORT = "the of and it"
REPETITIVE = " ".join(["the"] * 80)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, GOOD_EN, "src0"),
        (1, GOOD_EN, "src0"),          # exact dup of 0 -> loses
        (2, GOOD_EN2, "src0"),
        (3, NON_EN, "src1"),           # fails lang gate
        (4, SHORT, "src1"),            # fails quality gate
        (5, REPETITIVE, "src1"),       # fails repetition gate
        (6, GOOD_EN.upper(), "src1"),  # case-normalized dup of 0
    ]
    return spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")


def _flag_map(docs_df):
    out = cur.curation_flags(docs_df, sample_fraction=1.0).collect()
    return {r["doc_id"]: r.asDict() for r in out}


def test_gates_cascade_and_dedup(docs):
    f = _flag_map(docs)
    assert f[3]["f_lang"] == 0 and f[3]["f_quality"] == 0
    assert f[4]["f_lang"] == 1 and f[4]["f_quality"] == 0
    assert f[5]["f_quality"] == 1 and f[5]["f_rep"] == 0
    # doc 0 survives; 1 and 6 are its (case-folded) duplicates
    assert f[0]["f_dedup"] == 1
    assert f[1]["f_dedup"] == 0 and f[6]["f_dedup"] == 0
    assert f[2]["f_dedup"] == 1
    # cascade: every flag implies its predecessor
    for r in f.values():
        seq = [r["f_lang"], r["f_quality"], r["f_rep"], r["f_dedup"],
               r["f_sampled"]]
        assert all(a >= b for a, b in zip(seq, seq[1:]))


def test_all_dead_fp_group_has_no_survivor(spark):
    """A fingerprint group whose every member failed an earlier gate
    yields NO survivor (the window min over alive docs is NULL and
    must resolve to flag 0, not null/crash)."""
    rows = [(0, GOOD_EN, "s"),    # alive, unique -> survives
            (7, NON_EN, "s"),     # dead (lang)
            (8, NON_EN, "s")]     # dup of a dead doc -> also dead
    df = spark.createDataFrame(
        [(i, t, "en", s, len(t)) for i, t, s in rows],
        "doc_id long, text string, lang string, source string, "
        "n_chars long")
    f = _flag_map(df)
    assert f[0]["f_dedup"] == 1
    assert f[7]["f_dedup"] == 0 and f[8]["f_dedup"] == 0
    assert all(r["f_dedup"] is not None for r in f.values())


def test_funnel_counts_monotone(docs):
    rows = {r["source"]: r.asDict()
            for r in cur.curation_funnel(docs).collect()}
    for r in rows.values():
        seq = [r["n_input"], r["n_lang"], r["n_quality"], r["n_rep"],
               r["n_dedup"], r["n_sampled"]]
        assert all(a >= b for a, b in zip(seq, seq[1:]))
    assert rows["src0"]["n_input"] == 3
    assert rows["src0"]["n_dedup"] == 2        # doc 1 deduped away
    # src1: 3 fails lang, 4 fails quality, 5 fails repetition, 6 is a
    # case-folded dup of doc 0 (other source) -> alive until dedup
    assert rows["src1"]["n_rep"] == 1
    assert rows["src1"]["n_dedup"] == 0


def test_funnel_deterministic(docs):
    a = sorted(map(tuple, cur.curation_funnel(docs).collect()))
    b = sorted(map(tuple, cur.curation_funnel(docs).collect()))
    assert a == b


class TestGroupQualityGate:
    def test_whole_groups_kept_or_dropped(self, spark):
        rich = "the a of and to in is it for on word"      # stop-heavy
        poor = "alpha beta gamma delta epsilon zeta eta"   # stop-free
        rows = ([(i, rich, "en", "good", len(rich))
                 for i in range(10)]
                + [(100 + i, poor, "en", "bad", len(poor))
                   for i in range(10)])
        d = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        kept = cur.group_quality_gate(d, key="source").collect()
        assert {r["source"] for r in kept} == {"good"}
        assert len(kept) == 10                   # the whole group
        assert set(kept[0].asDict()) == {        # all columns survive
            "doc_id", "text", "lang", "source", "n_chars"}

    def test_threshold_is_group_level_not_doc_level(self, spark):
        # one stop-free doc inside a rich group must be kept anyway
        rich = "the a of and to in is it for on"
        rows = ([(i, rich, "en", "g", 1) for i in range(9)]
                + [(99, "xx yy zz", "en", "g", 1)])
        d = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, "
                  "source string, n_chars long")
        kept = {r["doc_id"]
                for r in cur.group_quality_gate(d, "source").collect()}
        assert 99 in kept and len(kept) == 10
