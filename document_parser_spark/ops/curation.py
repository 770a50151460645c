"""Composed corpus-curation funnel — the end-to-end recipe a
training-data pipeline actually runs, wired from the individually
verified operators:

    input -> language gate -> quality gate -> repetition gate
          -> exact-dedup survivors -> deterministic sample

Reference role: this is the Spark-side generalization of the
reference's "drop junk before serialization" posture (P3/P4 empty
skips, A4 failure tallies — ``parser/v1/abc/abc.py`` empty-markdown
guard) scaled to corpus curation; each gate reuses a kernel that is
already oracle-verified on its own (``textstats.lang_id``,
``textstats.quality_scores``, ``textstats.repetition_stats``,
``cleaning.norm_ws_lower_column``, ``sampling.sample_key``).

Scale design (the part that matters at 100 TB):

* All flag relations are keyed by ``doc_id`` — every join in the
  funnel hashes on the same key, so one Exchange partitioning is
  reused across stages (Spark's ReusedExchange / AQE coalesce), not
  one shuffle per gate.
* Gates CASCADE (each flag ANDs the previous) so the funnel counts
  are monotone by construction and a downstream consumer can read
  attrition per stage directly.
* The dedup stage must pick the corpus-earliest survivor *among docs
  that passed the previous gates*; that is one window ``min`` over
  the fingerprint partition of a conditional — no self-join, no
  second shuffle beyond the fp hash.
* Sampling is a pure function of (doc_id, seed) — no RNG state, so
  the funnel is bit-reproducible across runs, restarts, and cluster
  sizes.
* Output is one row per source (bounded by the domain count, not the
  corpus) — the funnel aggregation is a classic partial-agg shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from document_parser_spark.functions.cleaning import norm_ws_lower_column
from document_parser_spark.ops import textstats as ts
from document_parser_spark.ops.sampling import SAMPLE_MOD, sample_key

CURATION_LANG = "en"
CURATION_SAMPLE_FRACTION = 0.5
CURATION_SEED = "cur"


def curation_funnel(docs: DataFrame,
                    lang: str = CURATION_LANG,
                    sample_fraction: float = CURATION_SAMPLE_FRACTION,
                    seed: str = CURATION_SEED) -> DataFrame:
    """Per-source attrition through the full curation recipe.

    -> (source, n_input, n_lang, n_quality, n_rep, n_dedup,
        n_sampled) — each count is the number of documents from that
    source still alive after the corresponding cascaded gate.
    """
    flags = curation_flags(docs, lang=lang,
                           sample_fraction=sample_fraction, seed=seed)

    def n(col: str) -> F.Column:
        return F.sum(F.col(col).cast("long")).cast("long").alias(f"n_{col[2:]}")

    return flags.groupBy("source").agg(
        F.count("*").cast("long").alias("n_input"),
        n("f_lang"), n("f_quality"), n("f_rep"),
        n("f_dedup"), n("f_sampled"))


def curation_flags(docs: DataFrame,
                   lang: str = CURATION_LANG,
                   sample_fraction: float = CURATION_SAMPLE_FRACTION,
                   seed: str = CURATION_SEED) -> DataFrame:
    """Per-document cascaded gate flags (the curated corpus itself is
    ``flags.filter("f_sampled = 1")`` joined back to the text).

    -> (doc_id, source, f_lang, f_quality, f_rep, f_dedup, f_sampled)
    with every flag an int (0/1) and each implying its predecessor.
    """
    base = docs.select(
        "doc_id", "source",
        F.md5(norm_ws_lower_column(F.col("text"))).alias("fp"))
    lang_rel = ts.lang_id(docs).select("doc_id", "lang_guess")
    qual_rel = ts.quality_scores(docs).select("doc_id", "quality_ok")
    rep_rel = ts.repetition_stats(docs).select("doc_id", "rep_ok")

    j = (base.join(lang_rel, "doc_id")
             .join(qual_rel, "doc_id")
             .join(rep_rel, "doc_id"))

    f_lang = (F.col("lang_guess") == lang).cast("int")
    f_quality = (f_lang == 1) & (F.col("quality_ok") == 1)
    f_rep = f_quality & (F.col("rep_ok") == 1)
    j = j.select("doc_id", "source", "fp",
                 f_lang.alias("f_lang"),
                 f_quality.cast("int").alias("f_quality"),
                 f_rep.cast("int").alias("f_rep"))

    # survivor = earliest doc_id among same-fingerprint docs that are
    # still alive; one window min over the fp hash partition (no
    # ordering, no self-join). Docs that fail earlier gates never
    # claim survivorship — a duplicate of a rejected doc survives.
    alive_min = F.min(
        F.when(F.col("f_rep") == 1, F.col("doc_id"))
    ).over(Window.partitionBy("fp"))
    f_dedup = ((F.col("f_rep") == 1)
               & (F.col("doc_id") == alive_min)).cast("int")
    thresh = int(sample_fraction * SAMPLE_MOD)
    f_sampled = ((f_dedup == 1)
                 & (sample_key(F.col("doc_id"), seed)
                    < F.lit(thresh))).cast("int")
    return j.select("doc_id", "source", "f_lang", "f_quality", "f_rep",
                    f_dedup.alias("f_dedup"),
                    f_sampled.alias("f_sampled"))


# Domain-level gate: corpus-level stopword mass per group. 0.06 sits
# in the natural-prose band for the synthetic corpus; real recipes fit
# it on a held-out sample.
GROUP_STOP_RATIO_MIN = 0.06


def group_quality_gate(docs: DataFrame, key: str = "source",
                       min_ratio: float = GROUP_STOP_RATIO_MIN
                       ) -> DataFrame:
    """Group-level (domain-level) filtering — the RefinedWeb posture of
    dropping entire domains whose AGGREGATE quality is low, instead of
    (or before) per-document gating.

    Keeps every document whose ``key`` group passes the corpus-level
    stopword-mass cut ``sum(n_stop) / sum(n_tokens) >= min_ratio``.
    The group statistic is a ratio of two INTEGER sums, so the gate is
    bit-deterministic on any engine (no mean-of-rounded-per-doc-ratios
    ambiguity at the threshold).

    -> the kept rows of ``docs`` (all columns).

    Scale shape: one map-side-combined ``groupBy(key)`` over two long
    counters (the group relation is bounded by the number of domains,
    not the corpus), then a LEFT SEMI join back on ``key`` — AQE
    broadcasts the group relation when it is small and falls back to a
    hash semi join when not; the corpus side hashes once on ``key``
    either way and its rows are never duplicated.
    """
    stats = docs.groupBy(key).agg(
        F.sum(ts.stopword_count_column(F.col("text")).cast("long"))
        .alias("_stop"),
        F.sum(F.size(F.split(F.col("text"), " ")).cast("long"))
        .alias("_tok"))
    keep = stats.filter(
        F.col("_stop").cast("double") / F.col("_tok").cast("double")
        >= F.lit(float(min_ratio))).select(key)
    return docs.join(keep, key, "left_semi")
