"""Full-text BM25 retrieval over the documents table.

The lexical-search capability of the engine: score every document
against a bag-of-terms query with BM25 (Robertson/Sparck Jones;
the Lucene-style idf = ln(1 + (N - df + 0.5)/(df + 0.5)) variant,
which is non-negative for any df). Pure built-in functions; all
constants are quoted verbatim by the DuckDB oracle.

Scale shape: the query-term filter lands BEFORE the first shuffle, so
the per-(doc, term) tf aggregation touches only matching tokens; df
is an aggregate over that same tiny relation and joins back as a
broadcast; N and avgdl are fitted by one bounded driver job (two
doubles collected) and scored as literals, the way a search engine
computes index stats at build time. Nothing about this plan changes
between 60k
docs and 10^12 — the only corpus-sized exchange is the doc-keyed
length join, and that carries one long per document.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

BM25_K1 = 1.2
BM25_B = 0.75


def bm25_scores(docs: DataFrame, terms: Sequence[str],
                k1: float = BM25_K1, b: float = BM25_B) -> DataFrame:
    """-> (doc_id, n_hits, score) for every document containing at
    least one query term; ``score`` rounded to 3 (oracle convention),
    ``n_hits`` = number of distinct query terms present.

    Compose with an ``ORDER BY score DESC LIMIT k`` for top-k — that
    plans as TakeOrderedAndProject (per-partition heap, k rows to the
    driver), same as ``textstats.vocab_topk``.
    """
    terms = list(dict.fromkeys(terms))
    ws = F.split(F.col("text"), " ")
    lengths = docs.select("doc_id", F.size(ws).cast("long").alias("dl"))
    # Index-stat FIT is a separate bounded job: (N, avgdl) collect to
    # the driver (two doubles) and enter the scoring plan as
    # literals — as a search engine computes them at index build. A
    # lazy one-row scalar join would plan as the globally-banned
    # BroadcastNestedLoopJoin (Catalyst folds any deterministic
    # constant-key equi-join back into it); the literals keep scoring
    # in one codegen chain.
    n_docs, avgdl = lengths.agg(
        F.count("*").cast("double"), F.avg("dl")).first()
    avgdl = avgdl or 1.0
    tok = (docs.select("doc_id", F.explode(ws).alias("w"))
           .filter(F.col("w").isin(terms)))
    tf = tok.groupBy("doc_id", "w").agg(
        F.count("*").cast("long").alias("tf"))
    df = tf.groupBy("w").agg(
        F.count("*").cast("double").alias("df"))
    idf = F.log(F.lit(1.0) + (F.lit(n_docs) - F.col("df") + 0.5)
                / (F.col("df") + 0.5))
    tf_part = (F.col("tf") * (k1 + 1.0)) / (
        F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
    return (
        tf.join(F.broadcast(df), "w")
        .join(lengths, "doc_id")
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_hits"),
             F.round(F.sum(idf * tf_part), 3).alias("score"))
    )
