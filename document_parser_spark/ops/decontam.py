"""Benchmark decontamination: flag corpus documents sharing word
n-grams with a held-out benchmark/eval set — the standard
training-data hygiene pass (e.g. strip eval-set passages from
pretraining corpora).

Shape (scale-first): benchmark shingles are DISTINCT short strings —
for any realistic eval suite they are millions of rows at most, so
the membership join BROADCASTS the benchmark side and the corpus-side
shingle relation never shuffles at all (narrow explode -> broadcast
hash join -> partial-aggregated count per doc). A corpus x benchmark
shuffle join only becomes necessary if the benchmark side outgrows
the broadcast threshold — same operator, Spark picks the strategy.

Reuses the dedup shingle kernel (``ops.dedup.shingles``: array
built-ins, per-doc array_distinct before the explode).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from document_parser_spark.ops import cachereg
from document_parser_spark.ops.dedup import (
    JACCARD_THRESHOLD, MINHASH_BANDS, MINHASH_HASHERS, SHINGLE_N,
    _band_signatures, _signatures_from_hashed, hashed_shingles, shingles)

DECONTAM_NGRAM = 5


def contamination_hits(corpus: DataFrame, benchmark: DataFrame,
                       n: int = DECONTAM_NGRAM) -> DataFrame:
    """-> (doc_id, n_hits): distinct benchmark n-grams each corpus doc
    contains (docs with zero hits are absent)."""
    bench_sh = shingles(benchmark, n).select("sh").distinct()
    corpus_sh = shingles(corpus, n)
    return (corpus_sh.join(F.broadcast(bench_sh), "sh")
            .groupBy("doc_id")
            .agg(F.count("*").cast("long").alias("n_hits")))


def fuzzy_contamination(corpus: DataFrame, benchmark: DataFrame,
                        n: int = SHINGLE_N,
                        hashers: int = MINHASH_HASHERS,
                        bands: int = MINHASH_BANDS,
                        threshold: float = JACCARD_THRESHOLD,
                        reuse_shingles: bool = True) -> DataFrame:
    """Fuzzy decontamination: corpus documents whose shingle-set
    Jaccard against SOME benchmark document reaches ``threshold``,
    with candidates from banded MinHash LSH — the scale path when
    exact n-gram membership (:func:`contamination_hits`) is too
    brittle (eval passages get reformatted/paraphrased-lightly, so no
    exact n-gram survives but the shingle sets still overlap).

    -> (doc_id, bench_id, jaccard), verified exact (LSH only gates
    candidate generation; every emitted pair's Jaccard is computed on
    the full shingle sets).

    Shape at 100 TB: the benchmark side is an eval suite — bounded —
    so its bands AND its shingles broadcast; the corpus side pays one
    wide exchange (the signature groupBy) plus one doc_id exchange for
    verification, and never self-joins. Reuses the dedup MinHash
    kernel verbatim (same 60-bit shingle hash, same affine maps, same
    band digest), so the SQL oracle replicates it literally.
    """
    c_sh = hashed_shingles(shingles(corpus, n))
    if reuse_shingles:
        # eager materialization — see ngram_jaccard_pairs for why a
        # lazy persist is recomputed by every concurrent consumer;
        # released by the NEXT cached-operator call / explicit
        # cachereg.release_session_caches() (r3 VERDICT #3).
        c_sh = cachereg.track_persist(c_sh)
    b_sh = hashed_shingles(shingles(benchmark, n)) \
        .withColumnRenamed("doc_id", "bench_id")
    c_bands = _band_signatures(
        _signatures_from_hashed(c_sh, hashers), hashers, bands)
    b_bands = _band_signatures(
        _signatures_from_hashed(
            b_sh.withColumnRenamed("bench_id", "doc_id"), hashers),
        hashers, bands).withColumnRenamed("doc_id", "bench_id")
    cand = (c_bands.join(F.broadcast(b_bands), ["band", "sig"])
            .select("doc_id", "bench_id").distinct())
    inter = (cand.join(c_sh, "doc_id")
             .join(F.broadcast(b_sh), ["bench_id", "sh"])
             .groupBy("doc_id", "bench_id")
             .agg(F.count("*").cast("long").alias("i")))
    # size only the candidate docs — contamination is rare, so the
    # full-corpus count aggregate would be almost entirely wasted
    na = (c_sh.join(cand.select("doc_id").distinct(), "doc_id", "semi")
          .groupBy("doc_id").agg(F.count("*").cast("long").alias("na")))
    nb = b_sh.groupBy("bench_id").agg(F.count("*").cast("long").alias("nb"))
    return (inter.join(na, "doc_id").join(F.broadcast(nb), "bench_id")
            .select("doc_id", "bench_id",
                    F.round(F.col("i").cast("double")
                            / (F.col("na") + F.col("nb") - F.col("i"))
                            .cast("double"), 3).alias("jaccard"))
            .filter(F.col("jaccard") >= threshold))


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  n: int = DECONTAM_NGRAM,
                  min_hits: int = 1) -> DataFrame:
    """Corpus minus documents with >= min_hits benchmark n-grams
    (left anti join on the flagged set)."""
    flagged = (contamination_hits(corpus, benchmark, n)
               .filter(F.col("n_hits") >= min_hits)
               .select("doc_id"))
    return corpus.join(flagged, "doc_id", "left_anti")
