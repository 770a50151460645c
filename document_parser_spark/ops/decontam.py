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

from document_parser_spark.ops.dedup import shingles

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


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  n: int = DECONTAM_NGRAM,
                  min_hits: int = 1) -> DataFrame:
    """Corpus minus documents with >= min_hits benchmark n-grams
    (left anti join on the flagged set)."""
    flagged = (contamination_hits(corpus, benchmark, n)
               .filter(F.col("n_hits") >= min_hits)
               .select("doc_id"))
    return corpus.join(flagged, "doc_id", "left_anti")
