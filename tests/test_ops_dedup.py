"""Dedup operator tests: exact, n-gram Jaccard, MinHash+LSH, SimHash,
embedding near-dup — planted duplicates must be found, approximate
paths must agree with their exact counterparts."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops import dedup as dd

BASE = ("the quick brown fox jumps over the lazy dog while the spark "
        "engine shuffles partitions across the cluster ring")
NEAR = BASE.replace("lazy", "sleepy")  # 1-word edit -> high jaccard
OTHER = ("completely different content about markdown serialization "
         "and ordered span reassembly with salted aggregation phases")


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, BASE), (2, BASE),          # exact dups
        (3, NEAR),                      # near-dup of 1/2
        (4, OTHER),
        (5, "tiny doc"),                # < shingle size
        (6, "  " + BASE.upper() + "  ")  # exact dup after normalization
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_exact_duplicates(docs):
    groups = dd.exact_duplicates(docs).collect()
    assert len(groups) == 1
    g = groups[0]
    assert g.n_copies == 3          # 1, 2 and case/space-normalized 6
    assert g.keep_id == 1


def test_shingles_small_doc_safe(docs):
    sh = dd.shingles(docs).filter(F.col("doc_id") == 5).count()
    assert sh == 0  # 2 words < n=3 -> no shingles, no error


def test_ngram_jaccard_finds_near_dup(docs):
    pairs = {(r.ida, r.idb): r.jaccard
             for r in dd.ngram_jaccard_pairs(docs, threshold=0.25).collect()}
    assert pairs[(1, 2)] == 1.0
    assert (1, 3) in pairs and 0.5 < pairs[(1, 3)] < 1.0
    assert not any(4 in p for p in pairs)


def test_ngram_max_df_cap_semantics(spark):
    """With the skew cap binding, pairs sharing ONLY over-cap shingles
    disappear while pairs that also share a rare shingle survive with
    their FULL-set Jaccard (verification is uncapped)."""
    common = "alpha beta gamma"                   # shingle in every doc
    rows = [(1, common + " one extra words here"),
            (2, common + " one extra words there"),
            (3, common + " totally different tail text"),
            (4, common + " nothing shared beyond stopword run")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    unbounded = {(r.ida, r.idb): r.jaccard for r in dd.ngram_jaccard_pairs(
        docs, threshold=0.01, max_df=None).collect()}
    capped = {(r.ida, r.idb): r.jaccard for r in dd.ngram_jaccard_pairs(
        docs, threshold=0.01, max_df=3).collect()}
    # 'alpha beta gamma' has df=4 > 3 -> pruned from candidate gen;
    # docs sharing only it lose their pair
    assert (3, 4) in unbounded and (3, 4) not in capped
    # 1-2 share rare shingles too -> pair survives, jaccard computed on
    # the FULL shingle sets (identical to the unbounded value)
    assert capped[(1, 2)] == unbounded[(1, 2)]
    stats = dd.ngram_pruned_stats(docs, max_df=3).collect()[0]
    assert stats.n_pruned == 1 and stats.pruned_occurrences == 4
    assert stats.max_df_seen == 4


def test_shingle_cache_released_by_clearcache(spark, docs):
    """The shingle persists are session-bounded: one cache entry per
    canonical plan while a query family runs, and clearCache (bench.py
    applies it between measurement phases) must release every block."""
    sc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    dd.ngram_jaccard_pairs(docs).count()
    assert sc.getPersistentRDDs().size() >= 1
    spark.catalog.clearCache()
    assert sc.getPersistentRDDs().size() == 0


def test_shingle_caches_do_not_stack_across_calls(spark, docs):
    """r3 VERDICT #3: a session looping over dedup operators must NOT
    accumulate one persisted shingle relation per call. The pool is
    LRU-bounded at MAX_LIVE; a SAME-plan re-invocation (warm bench
    rounds) reuses the live cache without growing the pool; an
    explicit release leaves the catalog empty."""
    from document_parser_spark.ops import cachereg

    sc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    cachereg.release_session_caches()
    # simulate the driver/bench loop: materialize, then next operator
    dd.ngram_jaccard_pairs(docs).count()
    first_live = cachereg.live_count()
    first_rdds = sc.getPersistentRDDs().size()
    assert first_live >= 1
    # warm path: the identical call reuses the cache — nothing new
    # persisted, nothing evicted (the thrash the one-slot policy had)
    dd.ngram_jaccard_pairs(docs).count()
    assert cachereg.live_count() == first_live
    assert sc.getPersistentRDDs().size() == first_rdds
    # alternating operators and re-runs never exceed the pool cap
    for _ in range(2):
        dd.minhash_lsh_pairs(docs).count()
        dd.ngram_jaccard_pairs(docs).count()
    assert cachereg.live_count() <= cachereg.MAX_LIVE
    # distinct corpora evict oldest-first instead of stacking
    for lo in range(0, 4):
        dd.ngram_jaccard_pairs(docs.filter(f"doc_id > {lo}")).count()
    assert cachereg.live_count() <= cachereg.MAX_LIVE
    # explicit release: nothing persisted remains anywhere
    cachereg.release_session_caches()
    assert cachereg.live_count() == 0
    assert sc.getPersistentRDDs().size() == 0


def test_stale_pool_twin_never_evicts_fresh_cache(spark, docs):
    """An external spark.catalog.clearCache() orphans pool entries
    without emptying the pool. Re-running the same operator must NOT
    leave a stale same-plan twin behind: unpersist() is plan-keyed, so
    evicting the stale twin later would silently free the FRESH cache.
    The pool therefore holds at most one entry per canonical plan, and
    filling it to the cap around a re-persisted plan leaves that
    plan's cache alive."""
    from document_parser_spark.ops import cachereg

    sc = spark.sparkContext._jsc.sc()
    spark.catalog.clearCache()
    cachereg.release_session_caches()
    dd.ngram_jaccard_pairs(docs).count()
    assert cachereg.live_count() == 1
    # external cache wipe (what bench.py does between queries) — the
    # pool entry is now an orphan
    spark.catalog.clearCache()
    # same operator again: must REPLACE the orphan, not sit beside it
    dd.ngram_jaccard_pairs(docs).count()
    assert cachereg.live_count() == 1
    cached_rdds = sc.getPersistentRDDs().size()
    assert cached_rdds >= 1
    # fill the pool EXACTLY to the cap with distinct plans: with the
    # stale twin gone the pool holds cap entries and nothing is
    # evicted, so the re-persisted relation's cache survives (before
    # the fix the twin's eviction at cap+1 freed it via the shared
    # canonical plan while the fresh entry still sat in the pool)
    for lo in range(cachereg.MAX_LIVE - 1):
        dd.ngram_jaccard_pairs(docs.filter(f"doc_id > {lo + 1}")).count()
    assert cachereg.live_count() <= cachereg.MAX_LIVE
    assert dd._jaccard_probe_cached(docs)
    spark.catalog.clearCache()
    cachereg.release_session_caches()


def test_pool_is_lru_not_fifo(spark, docs):
    """A warm same-plan hit refreshes the entry's pool position, so the
    hottest relation is evicted LAST. Insert A, warm-hit A after
    inserting B..: once the pool overflows, A must still be live."""
    from document_parser_spark.ops import cachereg

    spark.catalog.clearCache()
    cachereg.release_session_caches()
    dd.ngram_jaccard_pairs(docs).count()          # A enters slot 0
    # age A with MAX_LIVE - 1 other plans, warm-hitting A in between
    for lo in range(cachereg.MAX_LIVE - 1):
        dd.ngram_jaccard_pairs(docs.filter(f"doc_id > {lo + 1}")).count()
        dd.ngram_jaccard_pairs(docs).count()      # warm hit refreshes A
    # one more distinct plan overflows the pool; FIFO would evict A
    dd.ngram_jaccard_pairs(docs.filter("doc_id > 99")).count()
    assert dd._jaccard_probe_cached(docs)
    spark.catalog.clearCache()
    cachereg.release_session_caches()


def test_minhash_lsh_subset_of_exact(docs):
    exact = {(r.ida, r.idb) for r in
             dd.ngram_jaccard_pairs(docs, threshold=0.25).collect()}
    lsh = {(r.ida, r.idb) for r in
           dd.minhash_lsh_pairs(docs, threshold=0.25).collect()}
    assert lsh <= exact
    # identical docs collide in every band -> always caught
    assert (1, 2) in lsh


def test_minhash_signature_shape_and_range(docs):
    sig = dd.minhash_signatures(docs).collect()
    assert len(sig) == 5  # doc 5 has no shingles (2 words < n)
    for r in sig:
        for k in range(dd.MINHASH_HASHERS):
            assert 0 <= r[f"m{k}"] < dd.MINHASH_PRIME
    by_id = {r.doc_id: [r[f"m{k}"] for k in range(dd.MINHASH_HASHERS)]
             for r in sig}
    assert by_id[1] == by_id[2]          # identical docs
    assert by_id[1] != by_id[4]          # different docs


def test_simhash_fast_matches_portable(docs):
    slow = {r.doc_id: r.simhash for r in dd.simhash(docs).collect()}
    fast = {r.doc_id: r.simhash for r in dd.simhash_fast(docs).collect()}
    assert slow == fast


def test_simhash_identical_docs_distance_zero(docs):
    sig = {r.doc_id: r.simhash for r in dd.simhash_fast(docs).collect()}
    assert sig[1] == sig[2]
    pairs = {(r.ida, r.idb): r.hamming
             for r in dd.simhash_pairs(docs, max_hamming=30).collect()}
    assert pairs[(1, 2)] == 0
    assert 0 < pairs[(1, 3)] <= 30


def test_simhash_fast_tier_pair_recall_agrees(docs):
    """xxhash64 production tier and md5 oracle tier use different hash
    families, so fingerprints differ — but the *pair decisions* on the
    fixture (exact dup at distance 0, near-dup close, unrelated far)
    must agree."""
    md5_pairs = {(r.ida, r.idb): r.hamming
                 for r in dd.simhash_pairs(docs, max_hamming=10,
                                           fast_hash=False).collect()}
    xx_pairs = {(r.ida, r.idb): r.hamming
                for r in dd.simhash_pairs(docs, max_hamming=10,
                                          fast_hash=True).collect()}
    for pairs in (md5_pairs, xx_pairs):
        assert pairs[(1, 2)] == 0               # identical docs
        assert 0 < pairs[(1, 3)] <= 10          # near-dup: close
        assert not any(4 in p for p in pairs)   # unrelated: far


def test_embedding_neardup_prefilter_subset(spark):
    import numpy as np
    rng = np.random.RandomState(7)
    base = rng.randn(64)
    rows = []
    for i in range(40):
        v = rng.randn(64)
        rows.append((i, [float(x) for x in v]))
    # plant a near-dup pair (ids 100, 101)
    rows.append((100, [float(x) for x in base]))
    rows.append((101, [float(x) for x in base + rng.randn(64) * 0.05]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    full = {(r.ia, r.ib) for r in
            dd.embedding_neardup_pairs(emb, threshold=0.9,
                                       prefilter=False).collect()}
    pre = {(r.ia, r.ib) for r in
           dd.embedding_neardup_pairs(emb, threshold=0.9).collect()}
    assert (100, 101) in full
    assert pre <= full
    # a 0.95-cosine pair flips a sign bit with low prob; planted pair
    # must survive the 8-bit prefilter here (deterministic seed)
    assert (100, 101) in pre


def test_connected_components_chain_and_islands(spark):
    """A 4-node chain (pairwise links only between neighbors) must
    collapse to one cluster labeled by its min id; a separate pair and
    an isolated pair keep their own reps."""
    pairs = spark.createDataFrame(
        [(2, 3), (3, 4), (4, 5),      # chain 2-3-4-5
         (10, 11),                    # island pair
         (20, 21), (21, 20)],         # duplicate/symmetric input edges
        "ida long, idb long")
    comp = {r.doc_id: r.rep
            for r in dd.connected_components(pairs).collect()}
    assert comp == {2: 2, 3: 2, 4: 2, 5: 2,
                    10: 10, 11: 10, 20: 20, 21: 20}


def test_dedup_survivors_keeps_min_and_unpaired(docs):
    pairs = dd.ngram_jaccard_pairs(docs, threshold=0.25)
    left = {r.doc_id for r in dd.dedup_survivors(docs, pairs).collect()}
    # docs 1,2,3 cluster (near-dups) -> keep 1; 4,5,6 untouched...
    # except 6 is an exact dup of 1 after normalization but NOT an
    # ngram near-dup (uppercase shingles differ), so it survives here
    assert 1 in left and 2 not in left and 3 not in left
    assert {4, 5, 6} <= left


class TestIncrementalDedup:
    def test_drops_seen_and_within_batch_dups(self, spark):
        from document_parser_spark.ops.dedup import incremental_new_docs
        old = spark.createDataFrame(
            [(1, "alpha beta gamma"), (2, "delta epsilon")],
            "doc_id long, text string")
        from document_parser_spark.ops.textstats import fingerprint
        seen = fingerprint(old).select("fp")
        batch = spark.createDataFrame(
            [(10, "ALPHA  beta gamma"),     # dup of old #1 (normalized)
             (11, "zeta eta"),              # new
             (12, "zeta eta"),              # within-batch dup of 11
             (13, "theta iota")],           # new
            "doc_id long, text string")
        kept = sorted(r["doc_id"] for r in
                      incremental_new_docs(batch, seen).collect())
        assert kept == [11, 13]

    def test_empty_seen_keeps_batch_firsts(self, spark):
        from document_parser_spark.ops.dedup import incremental_new_docs
        batch = spark.createDataFrame(
            [(5, "x y"), (6, "x y"), (7, "z")],
            "doc_id long, text string")
        seen = spark.createDataFrame([], "fp string")
        kept = sorted(r["doc_id"] for r in
                      incremental_new_docs(batch, seen).collect())
        assert kept == [5, 7]
