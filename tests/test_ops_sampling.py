"""Sampling + decontamination operator tests: determinism, quota
bounds, per-stratum fractions, planted-overlap flagging."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops import decontam as dc
from document_parser_spark.ops import sampling as smp


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, f"src{i % 4}") for i in range(400)]
    return spark.createDataFrame(rows, "doc_id long, source string")


def test_hash_sample_deterministic_and_close(docs):
    a = sorted(r.doc_id for r in smp.hash_sample(docs, 0.3).collect())
    b = sorted(r.doc_id for r in smp.hash_sample(docs, 0.3).collect())
    assert a == b                      # pure function of (doc_id, seed)
    assert 0.2 < len(a) / 400 < 0.4    # close to the target fraction
    c = sorted(r.doc_id for r in
               smp.hash_sample(docs, 0.3, seed="other").collect())
    assert a != c                      # seed changes the draw


def test_hash_sample_nested(docs):
    """A smaller sample with the same seed is a subset of a larger one
    (threshold semantics — lets pipelines grow a sample in place)."""
    small = {r.doc_id for r in smp.hash_sample(docs, 0.1).collect()}
    big = {r.doc_id for r in smp.hash_sample(docs, 0.5).collect()}
    assert small <= big


def test_stratified_quota_bounds_and_determinism(docs):
    kept = smp.stratified_quota(docs, "source", 25).collect()
    per = {}
    for r in kept:
        per.setdefault(r.source, []).append(r.doc_id)
    assert set(per) == {"src0", "src1", "src2", "src3"}
    assert all(len(v) == 25 for v in per.values())
    again = smp.stratified_quota(docs, "source", 25).collect()
    assert sorted((r.source, r.doc_id) for r in kept) == \
        sorted((r.source, r.doc_id) for r in again)


def test_stratified_quota_prefilter_agrees(docs):
    exact = sorted((r.source, r.doc_id) for r in
                   smp.stratified_quota(docs, "source", 10).collect())
    approx = sorted((r.source, r.doc_id) for r in
                    smp.stratified_quota(docs, "source", 10,
                                         prefilter_factor=6.0).collect())
    assert exact == approx


def test_stratified_fractions(docs):
    kept = smp.stratified_fractions(
        docs, "source", {"src0": 1.0, "src1": 0.5}, default=0.0).collect()
    per = {}
    for r in kept:
        per.setdefault(r.source, 0)
        per[r.source] += 1
    assert per.get("src0") == 100          # fraction 1.0 keeps all
    assert 30 <= per.get("src1", 0) <= 70  # ~half
    assert "src2" not in per               # default 0.0 drops


BENCH_TEXT = ("the quick brown fox jumps over the lazy dog while "
              "numbers keep flowing through the benchmark passage")


@pytest.fixture(scope="module")
def contam(spark):
    corpus = spark.createDataFrame(
        [(1, "intro text then the quick brown fox jumps over the "
             "lazy dog verbatim inside a longer document body"),
         (2, "completely unrelated content about markdown span "
             "reassembly and ordered aggregation phases here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, BENCH_TEXT)],
                                  "doc_id long, text string")
    return corpus, bench


def test_contamination_hits_flags_overlap(contam):
    corpus, bench = contam
    hits = {r.doc_id: r.n_hits
            for r in dc.contamination_hits(corpus, bench).collect()}
    assert 1 in hits and hits[1] >= 1   # shares 5-grams with benchmark
    assert 2 not in hits                # clean doc absent


def test_decontaminate_removes_flagged(contam):
    corpus, bench = contam
    left = {r.doc_id for r in dc.decontaminate(corpus, bench).collect()}
    assert left == {2}


def test_fuzzy_contamination_finds_neardup_of_benchmark(spark):
    base = ("the quick brown fox jumps over the lazy dog and then "
            "runs far away into the quiet green forest tonight")
    near = base.replace("tonight", "today")        # one word differs
    corpus = spark.createDataFrame(
        [(1, near), (2, "completely unrelated words describing other "
                        "things entirely with no shared phrases here")],
        "doc_id long, text string")
    bench = spark.createDataFrame([(100, base)], "doc_id long, text string")
    got = {(r.doc_id, r.bench_id): r.jaccard
           for r in dc.fuzzy_contamination(corpus, bench).collect()}
    # expected exact jaccard of distinct word-3-gram sets
    def sh3(t):
        w = t.split(" ")
        return {" ".join(w[i:i+3]) for i in range(len(w) - 2)}
    a, b = sh3(near), sh3(base)
    want = round(len(a & b) / len(a | b), 3)
    assert got == {(1, 100): want}
    # verification is exact: identical docs give jaccard 1.0
    got2 = dc.fuzzy_contamination(
        spark.createDataFrame([(3, base)], "doc_id long, text string"),
        bench).collect()
    assert [(r.doc_id, r.bench_id, r.jaccard) for r in got2] == [(3, 100, 1.0)]


# ---------------------------------------------------------------------------
# split_assign / exact_k_sample
# ---------------------------------------------------------------------------

class TestSplitAssign:
    def test_total_and_deterministic(self, spark):
        d = spark.createDataFrame(
            [(i,) for i in range(2000)], "doc_id long")
        a = {r["doc_id"]: r["split"]
             for r in smp.split_assign(d).collect()}
        b = {r["doc_id"]: r["split"]
             for r in smp.split_assign(d.repartition(7)).collect()}
        assert a == b and len(a) == 2000
        from collections import Counter
        c = Counter(a.values())
        assert set(c) == {"train", "val", "test"}
        assert 0.85 < c["train"] / 2000 < 0.95
        assert c["val"] / 2000 < 0.10 and c["test"] / 2000 < 0.10

    def test_residue_goes_to_last_split(self, spark):
        d = spark.createDataFrame([(i,) for i in range(500)],
                                  "doc_id long")
        out = smp.split_assign(
            d, weights=(("a", 0.5), ("b", 0.1)), seed="r")
        from collections import Counter
        c = Counter(r["split"] for r in out.collect())
        # b takes its 10% band PLUS the 40% residue
        assert c["b"] > c["a"] * 0.6

    def test_disjoint_from_seeded_resplit(self, spark):
        d = spark.createDataFrame([(i,) for i in range(500)],
                                  "doc_id long")
        a = {r["doc_id"]: r["split"]
             for r in smp.split_assign(d, seed="s1").collect()}
        b = {r["doc_id"]: r["split"]
             for r in smp.split_assign(d, seed="s2").collect()}
        assert a != b


class TestExactKSample:
    def test_exactly_k_and_prefix_property(self, spark):
        d = spark.createDataFrame(
            [(i, f"src{i % 3}") for i in range(300)],
            "doc_id long, source string")
        k10 = [r["doc_id"]
               for r in smp.exact_k_sample(d, 10, "e").collect()]
        k50 = [r["doc_id"]
               for r in smp.exact_k_sample(d, 50, "e").collect()]
        assert len(k10) == 10 and len(k50) == 50
        assert set(k10) <= set(k50)      # hash-order prefix property

    def test_partitioning_invariance(self, spark):
        d = spark.createDataFrame([(i, "x") for i in range(300)],
                                  "doc_id long, source string")
        a = sorted(r["doc_id"]
                   for r in smp.exact_k_sample(d, 20, "p").collect())
        b = sorted(r["doc_id"] for r in smp.exact_k_sample(
            d.repartition(11), 20, "p").collect())
        assert a == b
