"""Tests for corpus-statistics (exact quantiles / top-k) and temporal
(as-of join / rollup) operators: brute-force parity, skew-variant
equivalence, and null-edge semantics."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops import stats as st
from document_parser_spark.ops import temporal as tmp


def _quantile_cont(values, p):
    """ANSI quantile_cont reference: linear interpolation at p*(N-1)."""
    s = sorted(values)
    pos = p * (len(s) - 1)
    lo = int(pos)
    hi = -(-pos // 1)
    return s[lo] + (s[int(hi)] - s[lo]) * (pos - lo)


@pytest.fixture(scope="module")
def lengths(spark):
    rng = random.Random(7)
    rows = [(i, f"g{i % 3}", rng.randrange(0, 500)) for i in range(600)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, n long")
    return df, rows


def test_exact_quantiles_match_bruteforce(lengths):
    df, rows = lengths
    vals = [n for _, _, n in rows]
    got = st.exact_quantiles(df, "n", (0.0, 0.25, 0.5, 0.9, 1.0))
    want = [_quantile_cont(vals, p) for p in (0.0, 0.25, 0.5, 0.9, 1.0)]
    assert got == pytest.approx(want)


def test_quantile_tiers_partition_rows(lengths):
    df, rows = lengths
    out = st.quantile_tiers(df, "n").collect()
    assert len(out) == len(rows)
    counts = {}
    for r in out:
        counts[r.tier] = counts.get(r.tier, 0) + 1
    # exact quartiles -> near-equal tier sizes (ties may move a few)
    assert set(counts) == {0, 1, 2, 3}
    for c in counts.values():
        assert abs(c - 150) <= 25


def test_group_quantiles_match_bruteforce(lengths):
    df, rows = lengths
    out = {r.grp: (r.n_rows, r.q50) for r in
           st.group_quantiles(df, "grp", "n", probs=(0.5,)).collect()}
    for g in ("g0", "g1", "g2"):
        vals = [n for _, grp, n in rows if grp == g]
        assert out[g][0] == len(vals)
        assert out[g][1] == pytest.approx(
            round(_quantile_cont(vals, 0.5), 3))


def test_topk_per_group_exact_and_skew_safe(spark):
    rng = random.Random(3)
    # one hot group with 500 rows, two cold groups
    rows = [(i, "hot" if i < 500 else f"c{i % 2}", rng.randrange(1000))
            for i in range(560)]
    df = spark.createDataFrame(rows, "doc_id long, grp string, v long")
    out = st.topk_per_group(df, "grp", "v", 5).collect()
    by_grp = {}
    for r in out:
        by_grp.setdefault(r.grp, []).append((r.rank, r.v, r.doc_id))
    for g, members in by_grp.items():
        want = sorted(((v, i) for i, gg, v in rows if gg == g),
                      key=lambda t: (-t[0], t[1]))[:5]
        got = [(v, i) for _, v, i in sorted(members)]
        assert got == want, g
        assert [r for r, _, _ in sorted(members)] == list(
            range(1, len(want) + 1))


# ---- temporal --------------------------------------------------------


def _mk_events(spark, seed=11, n=400, users=6):
    rng = random.Random(seed)
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(n):
        rows.append((i, rng.randrange(users),
                     base + dt.timedelta(seconds=rng.randrange(0, 3_000_000)),
                     rng.choice(["click", "view", "view"]),
                     round(rng.uniform(0, 100), 2)))
    return rows, spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, "
              "event_type string, value double")


def _brute_asof(rows):
    """Reference: latest click with ts <= view.ts per user; ties at
    equal (user, ts) resolved to the max-event_id click's value."""
    clicks = {}
    for i, u, ts, et, v in rows:
        if et == "click":
            cur = clicks.setdefault(u, {})
            if ts not in cur or i > cur[ts][0]:
                cur[ts] = (i, v)
    out = {}
    for i, u, ts, et, v in rows:
        if et != "view":
            continue
        best = None
        for cts, (_, cv) in clicks.get(u, {}).items():
            if cts <= ts and (best is None or cts > best[0]):
                best = (cts, cv)
        out[i] = best
    return out


def test_asof_join_matches_bruteforce(spark):
    rows, ev = _mk_events(spark)
    probes = ev.filter(F.col("event_type") == "view") \
               .select("event_id", "user_id", "ts")
    refs = ev.filter(F.col("event_type") == "click")
    got = {r.event_id: (r.ref_ts, r.ref_value)
           for r in tmp.asof_join(probes, refs).collect()}
    want = _brute_asof(rows)
    assert set(got) == set(want)
    for k, w in want.items():
        if w is None:
            assert got[k] == (None, None), k
        else:
            assert got[k][0] == w[0] and got[k][1] == pytest.approx(w[1]), k


def test_asof_bucketed_identical_to_plain(spark):
    rows, ev = _mk_events(spark, seed=23, n=700, users=4)
    probes = ev.filter(F.col("event_type") == "view") \
               .select("event_id", "user_id", "ts")
    refs = ev.filter(F.col("event_type") == "click")
    plain = {r.event_id: (r.ref_ts, r.ref_value)
             for r in tmp.asof_join(probes, refs).collect()}
    for bucket_s in (3600, 86400, 10_000_000):  # incl. one-bucket case
        bk = {r.event_id: (r.ref_ts, r.ref_value)
              for r in tmp.asof_join_bucketed(
                  probes, refs, bucket_s=bucket_s).collect()}
        assert bk == plain, bucket_s


def test_event_rollup_levels(spark):
    rows, ev = _mk_events(spark, seed=5, n=300)
    out = tmp.event_rollup(ev).collect()
    total = [r for r in out if r.gid == 3]
    assert len(total) == 1 and total[0].n_events == 300
    by_type = {r.event_type: r.n_events for r in out if r.gid == 1}
    assert sum(by_type.values()) == 300
    fine = [r for r in out if r.gid == 0]
    assert sum(r.n_events for r in fine) == 300
    # sum_value consistency at every level
    assert total[0].sum_value == pytest.approx(
        round(sum(v for *_, v in rows), 2), abs=0.05)


def test_length_outlier_trim_matches_bruteforce(spark):
    rng = random.Random(11)
    rows = [(i, f"l{i % 4}", rng.randrange(1, 200)) for i in range(800)]
    # exercise the tie-heavy path too: one lang with few distinct values
    rows += [(1000 + i, "tied", 50 + (i % 3)) for i in range(90)]
    df = spark.createDataFrame(rows, "doc_id long, lang string, n_chars long")
    got = {r.lang: r for r in st.length_outlier_trim(df).collect()}
    langs = {g for _, g, _ in rows}
    assert set(got) == langs
    for g in langs:
        vals = sorted(n for _, lg, n in rows if lg == g)
        tot = len(vals)
        cum, lo_cut, hi_cut = 0, None, None
        hist = sorted({v: vals.count(v) for v in vals}.items())
        for v, c in hist:
            cum += c
            if lo_cut is None and cum * 100 >= 5 * tot:
                lo_cut = v
            if hi_cut is None and cum * 100 >= 95 * tot:
                hi_cut = v
        kept = [v for v in vals if lo_cut <= v <= hi_cut]
        r = got[g]
        assert (r.lo_cut, r.hi_cut) == (lo_cut, hi_cut), g
        assert r.kept_docs == len(kept) and r.dropped_docs == tot - len(kept)
        assert r.kept_chars == sum(kept)


class TestDistributionDivergence:
    def test_exact_small_case_and_drift_flag(self, spark):
        import math
        # group A: uniform over {a,b}; group B: all {a}; corpus: a=3,b=1
        d = spark.createDataFrame(
            [(1, "a b", "A"), (2, "a a", "B")],
            "doc_id long, text string, source string")
        from document_parser_spark.ops.stats import (
            distribution_divergence)
        rows = {r["source"]: r
                for r in distribution_divergence(d).collect()}
        n = 4.0
        kl_a = 0.5 * math.log((1 * n) / (2 * 3)) \
            + 0.5 * math.log((1 * n) / (2 * 1))
        kl_b = 1.0 * math.log((2 * n) / (2 * 3))
        assert rows["A"]["kl"] == round(kl_a, 3)
        assert rows["B"]["kl"] == round(kl_b, 3)
        assert rows["A"]["n_words"] == 2 and rows["A"]["n_distinct"] == 2

    def test_templated_source_fires(self, spark):
        import random
        rng = random.Random(3)
        vocab = [f"w{i}" for i in range(30)]
        rows = []
        for i in range(40):
            rows.append((i, " ".join(rng.choice(vocab)
                                     for _ in range(50)), "organic"))
        for i in range(40, 60):
            rows.append((i, "click here buy now " * 12, "spam"))
        d = spark.createDataFrame(
            rows, "doc_id long, text string, source string")
        from document_parser_spark.ops.stats import (
            distribution_divergence)
        out = {r["source"]: r
               for r in distribution_divergence(d).collect()}
        assert out["spam"]["drift_ok"] == 0
        assert out["organic"]["drift_ok"] == 1
        assert out["spam"]["kl"] > out["organic"]["kl"]
