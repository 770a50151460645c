"""Corpus bigram language-model perplexity scoring.

The LM-quality axis of a curation pipeline (CCNet, Wenzek et al.
2020, trains a KenLM and buckets documents by perplexity; Gopher and
most open curation recipes keep a variant of it): documents whose
text is improbable under a language model trained on the corpus
itself are boilerplate, menus, or noise. Here the model IS the
corpus's own add-k-smoothed bigram model — the whole thing is three
aggregations and two joins, no Python anywhere, and every constant is
quoted by the DuckDB oracle.

Model:  P(w2 | w1) = (c(w1,w2) + k) / (c(w1) + k * V)
where ``c(w1)`` counts w1 as a bigram CONTEXT (= sum over w2 of
``c(w1,w2)``, so the distribution normalizes exactly), ``V`` is the
corpus vocabulary size, and ``k`` is the add-k pseudo-count.
Per-document score = mean negative log-likelihood over its bigrams.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

LM_ADD_K = 0.5
# keep threshold on the per-doc mean NLL: e^7 ≈ 1100 effective
# perplexity — far above normal prose under its own corpus model,
# the bucket CCNet labels "tail" and drops.
LM_NLL_MAX = 7.0


def _bigrams(docs: DataFrame) -> DataFrame:
    """(doc_id, w1, w2, cnt) — distinct bigram counts per document.

    Counting per (doc, gram) FIRST means the model joins below touch
    one row per distinct gram per doc, not one per token, and the
    groupBy does map-side partial aggregation before its shuffle.
    """
    ws = F.split(F.col("text"), " ")
    pair = F.transform(
        F.sequence(F.lit(1), F.size(ws) - 1),
        lambda i: F.struct(
            F.element_at(ws, i.cast("int")).alias("w1"),
            F.element_at(ws, (i + 1).cast("int")).alias("w2")))
    return (
        docs.filter(F.size(F.split(F.col("text"), " ")) >= 2)
        .select("doc_id", F.explode(pair).alias("p"))
        .select("doc_id", F.col("p.w1").alias("w1"),
                F.col("p.w2").alias("w2"))
        .filter((F.col("w1") != "") & (F.col("w2") != ""))
        .groupBy("doc_id", "w1", "w2")
        .agg(F.count("*").cast("long").alias("cnt"))
    )


def bigram_lm_scores(docs: DataFrame,
                     add_k: float = LM_ADD_K,
                     nll_max: float = LM_NLL_MAX) -> DataFrame:
    """Score every document under the corpus's own bigram model.

    -> (doc_id, n_bigrams, mean_nll, lm_ok) for every document with at
    least one bigram (sub-2-word docs carry no LM evidence and are the
    length filter's job, not this one's).

    Scale shape: three aggregations (doc-gram counts, context counts,
    gram counts) all map-side combined; the model attaches via two
    gram-keyed equi-joins — value payloads are single longs, so even a
    stopword-context hot key ships counts, not text, and AQE's skew
    split covers the residue. V is fitted by one bounded driver job
    (a single double collected) and scored as a literal — the fit /
    score split every LM-quality pipeline already has. With a capped
    vocabulary (compose with
    ``textstats.vocab_topk``) the whole model fits in a broadcast; at
    full 100 TB vocab the shuffle join here is the right default.
    """
    grams = _bigrams(docs)
    context = grams.groupBy("w1").agg(
        F.sum("cnt").cast("long").alias("c1"))
    model = grams.groupBy("w1", "w2").agg(
        F.sum("cnt").cast("long").alias("c2"))
    # Model FIT is a separate bounded job: V is collected to the
    # driver (one double) and burned into the scoring plan as a
    # literal — exactly how CCNet trains its KenLM before scoring.
    # The lazy alternative (a one-row scalar join) plans as a
    # BroadcastNestedLoopJoin — the plan suite bans that node
    # globally, and Catalyst constant-folds every deterministic
    # constant-key equi-join back into it — while the literal keeps
    # the whole scoring stage inside one codegen chain.
    v = (docs.select(F.explode(F.split(F.col("text"), " ")).alias("w"))
         .filter(F.col("w") != "")
         .agg(F.count_distinct("w").cast("double")).first()[0]) or 0.0
    nll = (-F.log(
        (F.col("c2") + F.lit(float(add_k)))
        / (F.col("c1") + F.lit(float(add_k) * v))))
    return (
        grams.join(model, ["w1", "w2"])
        .join(context, "w1")
        .groupBy("doc_id")
        .agg(F.sum("cnt").cast("long").alias("n_bigrams"),
             F.round(F.sum(F.col("cnt") * nll) / F.sum("cnt"), 3)
             .alias("mean_nll"))
        .select("doc_id", "n_bigrams", "mean_nll",
                (F.col("mean_nll") <= F.lit(float(nll_max)))
                .cast("int").cast("long").alias("lm_ok"))
    )
