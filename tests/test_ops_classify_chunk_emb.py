"""Tests for the hashed linear classifier, sliding-window chunking,
and distributed embedding moments/PCA: brute-force parity against
pure-Python/numpy references, path equivalence (derived weights vs
broadcast weight table), and edge semantics (empty docs, short docs,
exact window boundaries)."""

from __future__ import annotations

import hashlib
import math
import random

import numpy as np
import pytest
from pyspark.sql import functions as F

from document_parser_spark.ops import chunking as ck
from document_parser_spark.ops import classify as clf
from document_parser_spark.ops import embstats as es


def _h60(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_units(word: str, dim: int, seed: str) -> int:
    b = _h60(word) % dim
    return _h60(f"{seed}:{b}") % (2 * clf.WEIGHT_UNITS + 1) \
        - clf.WEIGHT_UNITS


@pytest.fixture(scope="module")
def docs(spark):
    rng = random.Random(11)
    vocab = ["the", "data", "spark", "xyzzy", "qq", "model", "a"]
    rows = [(i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randrange(0, 30))))
            for i in range(80)]
    rows += [(1000, ""), (1001, "   "), (1002, "one")]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestClassifier:
    def test_matches_python_reference(self, spark, docs):
        got = {r["doc_id"]: r for r in
               clf.hashed_linear_scores(docs).collect()}
        for row in docs.collect():
            words = [w for w in row["text"].split(" ") if w]
            if not words:
                assert row["doc_id"] not in got
                continue
            su = sum(_py_units(w, clf.HASH_DIM, clf.CLS_SEED)
                     for w in words)
            r = got[row["doc_id"]]
            assert r["n_words"] == len(words)
            assert r["sum_units"] == su
            logit = (clf.CLS_SCALE * su
                     + clf.CLS_BIAS_MILLI * len(words)) \
                / (clf.WEIGHT_UNITS * len(words))
            assert r["score"] == pytest.approx(
                round(1 / (1 + math.exp(-logit)), 4), abs=1e-9)
            assert r["keep"] == (clf.CLS_SCALE * su
                                 + clf.CLS_BIAS_MILLI * len(words) >= 0)

    def test_trained_path_equals_derived(self, spark, docs):
        """scores_with_weights with the derived weight table loaded
        explicitly must reproduce hashed_linear_scores' sums."""
        w_rows = [(b, _py_units_by_bucket(b)) for b in range(clf.HASH_DIM)]
        weights = spark.createDataFrame(w_rows,
                                        "bucket long, w_units long")
        joined = {r["doc_id"]: r for r in clf.scores_with_weights(
            docs, weights, fast=False).collect()}
        derived = clf.hashed_linear_scores(docs).collect()
        assert joined  # non-empty
        for r in derived:
            assert joined[r["doc_id"]]["sum_units"] == r["sum_units"]
            assert joined[r["doc_id"]]["n_words"] == r["n_words"]

    def test_fast_tier_same_shape(self, docs):
        out = clf.hashed_linear_scores(docs, fast=True)
        rows = out.collect()
        assert all(0.0 <= r["score"] <= 1.0 for r in rows)
        assert len(rows) == out.filter(F.col("n_words") > 0).count()


def _py_units_by_bucket(b: int) -> int:
    return _h60(f"{clf.CLS_SEED}:{b}") % (2 * clf.WEIGHT_UNITS + 1) \
        - clf.WEIGHT_UNITS


class TestChunking:
    def _reference(self, text, chunk, stride):
        words = [w for w in text.split(" ") if w]
        if not words:
            return []
        n = len(words)
        nc = 1 if n <= chunk else 1 + -(-(n - chunk) // stride)
        return [(i, words[i * stride:i * stride + chunk])
                for i in range(nc)]

    @pytest.mark.parametrize("chunk,stride", [(8, 8), (8, 5), (64, 48)])
    def test_matches_reference(self, spark, docs, chunk, stride):
        got = {}
        for r in ck.sliding_chunks(docs, chunk=chunk,
                                   stride=stride).collect():
            got.setdefault(r["doc_id"], {})[r["chunk_id"]] = r
        for row in docs.collect():
            ref = self._reference(row["text"], chunk, stride)
            mine = got.get(row["doc_id"], {})
            assert len(mine) == len(ref)
            for i, words in ref:
                assert mine[i]["chunk_text"] == " ".join(words)
                assert mine[i]["n_tokens"] == len(words)

    def test_exact_boundary_no_empty_tail(self, spark):
        """n a multiple of stride beyond chunk: the final window must
        still contain words (never an empty chunk)."""
        df = spark.createDataFrame(
            [(1, " ".join(f"w{i}" for i in range(16)))],
            "doc_id long, text string")
        rows = ck.sliding_chunks(df, chunk=8, stride=4).collect()
        assert all(r["n_tokens"] > 0 for r in rows)
        assert len(rows) == 3  # windows at 0, 4, 8 cover 16 words
        assert rows[-1]["n_tokens"] == 8

    def test_rejects_bad_stride(self, spark, docs):
        with pytest.raises(ValueError):
            ck.sliding_chunks(docs, chunk=4, stride=5)


class TestEmbeddingMoments:
    @pytest.fixture(scope="class")
    def emb(self, spark):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(200, 16)).astype(np.float32)
        x[:, 3] = x[:, 0] * 2 + 0.1  # a genuinely correlated pair
        rows = [(i, [float(v) for v in x[i]]) for i in range(len(x))]
        df = spark.createDataFrame(rows,
                                   "vec_id long, embedding array<float>")
        return df.repartition(7), np.asarray(x, dtype=np.float64)

    def test_covariance_matches_numpy(self, emb):
        df, x = emb
        cov = np.cov(x, rowvar=False)
        got = {(r["i"], r["j"]): r["cov"]
               for r in es.covariance_entries(df, ndigits=9).collect()}
        assert len(got) == 16 * 16
        for i in range(16):
            for j in range(16):
                assert got[(i, j)] == pytest.approx(cov[i, j], abs=1e-8)

    def test_pca_recovers_dominant_direction(self, emb):
        df, x = emb
        comp, var = es.pca_components(df, k=2)
        c = x - x.mean(axis=0)
        _, _, vt = np.linalg.svd(c, full_matrices=False)
        top = vt[0] if vt[0][np.argmax(np.abs(vt[0]))] > 0 else -vt[0]
        assert np.abs(comp[0] @ top) > 0.999
        assert var[0] > var[1] > 0

    def test_projection_matches_numpy(self, emb):
        df, x = emb
        comp, _ = es.pca_components(df, k=3)
        got = {r["vec_id"]: np.array(r["projected"])
               for r in es.pca_project(df, comp).collect()}
        want = x @ comp.T
        for i in range(len(x)):
            assert np.allclose(got[i], want[i], atol=1e-9)


# ---------------------------------------------------------------------------
# int8 quantization
# ---------------------------------------------------------------------------

class TestQuantizeInt8:
    def test_matches_numpy_and_bounds_error(self, spark):
        import numpy as np
        from document_parser_spark.ops.embstats import (
            INT8_QMAX, quantize_int8)
        rng = np.random.default_rng(7)
        vecs = [rng.standard_normal(16).astype(np.float32)
                for _ in range(50)]
        emb = spark.createDataFrame(
            [(i, v.tolist()) for i, v in enumerate(vecs)],
            "vec_id long, embedding array<float>")
        rows = {r["vec_id"]: r for r in quantize_int8(emb).collect()}
        for i, v in enumerate(vecs):
            x = v.astype(np.float64)
            scale = np.abs(x).max() / INT8_QMAX
            q = np.floor(x / scale + 0.5).astype(np.int64)
            r = rows[i]
            assert r["qvec"] == q.tolist()
            assert abs(r["scale"] - scale) < 1e-15
            assert max(abs(q)) <= INT8_QMAX
            # half-a-level reconstruction bound
            assert r["max_abs_err"] <= scale / 2 + 1e-12
            # dequantized vector stays close in cosine
            deq = q * scale
            cos = float(deq @ x / (np.linalg.norm(deq)
                                   * np.linalg.norm(x)))
            assert cos > 0.995

    def test_zero_vector(self, spark):
        from document_parser_spark.ops.embstats import quantize_int8
        emb = spark.createDataFrame(
            [(0, [0.0, 0.0, 0.0])], "vec_id long, embedding array<float>")
        r = quantize_int8(emb).collect()[0]
        assert r["scale"] == 0.0
        assert r["qvec"] == [0, 0, 0]
        assert r["max_abs_err"] == 0.0
