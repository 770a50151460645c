"""Token-budget sharding: the two-level distributed prefix sum must
equal a single global scan, be invariant to input partitioning, and
produce contiguous token ranges per shard."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops.packing import shard_assign


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(f"doc-{i:04d}", 10 + (i * 37) % 400) for i in range(500)]
    return spark.createDataFrame(rows, "doc_id string, n_tokens long")


def _expected(rows, shard_tokens):
    ordered = sorted(rows, key=lambda r: (_h60(r[0]), r[0]))
    out, start = {}, 0
    for doc_id, tok in ordered:
        out[doc_id] = (start // shard_tokens, start % shard_tokens)
        start += tok
    return out


def test_matches_global_scan(docs):
    got = {r.doc_id: (r.shard_id, r.shard_pos)
           for r in shard_assign(docs, shard_tokens=2048,
                                 buckets=32).collect()}
    rows = [(r.doc_id, r.n_tokens) for r in docs.collect()]
    assert got == _expected(rows, 2048)


def test_partitioning_invariant(docs):
    a = {r.doc_id: (r.shard_id, r.shard_pos)
         for r in shard_assign(docs.repartition(1), shard_tokens=2048,
                               buckets=32).collect()}
    b = {r.doc_id: (r.shard_id, r.shard_pos)
         for r in shard_assign(docs.repartition(17), shard_tokens=2048,
                               buckets=8).collect()}
    assert a == b   # neither partitioning nor bucket count matters


def test_shards_are_contiguous_token_ranges(docs):
    out = shard_assign(docs, shard_tokens=2048, buckets=32)
    joined = out.join(docs, "doc_id")
    per_shard = (joined.groupBy("shard_id")
                 .agg(F.sum("n_tokens").alias("tot"),
                      F.min("shard_pos").alias("first_pos"))
                 .orderBy("shard_id").collect())
    # every shard except possibly the last covers >= the budget once a
    # doc spills in, and each starts where the previous doc left off
    # (first_pos < budget by construction)
    assert all(r.first_pos < 2048 for r in per_shard)
    total = sum(r.tot for r in per_shard)
    assert total == sum(r.n_tokens for r in docs.collect())


# ---------------------------------------------------------------------------
# shuffle_order
# ---------------------------------------------------------------------------

from document_parser_spark.ops.packing import shuffle_order  # noqa: E402


class TestShuffleOrder:
    def test_is_exact_hash_order_permutation(self, spark, docs):
        out = {r["doc_id"]: (r["h"], r["pos"])
               for r in shuffle_order(docs, seed="s1", buckets=32)
               .collect()}
        ids = [r[0] for r in docs.collect()]
        expect = sorted(ids, key=lambda d: (_h60("s1:" + d), d))
        assert sorted(p for _, p in out.values()) == list(range(len(ids)))
        for want_pos, doc_id in enumerate(expect):
            assert out[doc_id][1] == want_pos

    def test_bucket_count_invariance(self, spark, docs):
        a = {r["doc_id"]: r["pos"]
             for r in shuffle_order(docs, buckets=4).collect()}
        b = {r["doc_id"]: r["pos"]
             for r in shuffle_order(
                 docs.repartition(13), buckets=256).collect()}
        assert a == b

    def test_seed_changes_permutation(self, spark, docs):
        a = {r["doc_id"]: r["pos"]
             for r in shuffle_order(docs, seed="epoch-0").collect()}
        b = {r["doc_id"]: r["pos"]
             for r in shuffle_order(docs, seed="epoch-1").collect()}
        assert a != b
        assert sorted(a.values()) == sorted(b.values())
