"""Corpus sampling / down-sampling operators for training-data
pipelines: deterministic hash sampling and per-stratum quotas.

Every decision is a pure function of (doc_id, seed) — no RNG state,
so a sample is reproducible across runs, cluster sizes, and restarts
(the same property the lineage/restart machinery relies on), and the
DuckDB oracles can recompute membership exactly.

Scale notes: hash sampling is a narrow filter (no shuffle, fully
pushed into the scan stage); stratified quotas use one window per
stratum — a single hash shuffle on the stratum key. A stratum whose
row count dwarfs the rest is the classic window skew; for quota <<
stratum size, pre-filtering with a generous hash-sample bound (e.g.
keep hash < 4x expected fraction) caps the window input first —
exposed as ``prefilter_factor``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from document_parser_spark.ops.hashing import h60

SAMPLE_MOD = 1_000_000


def sample_key(doc_id: F.Column, seed: str) -> F.Column:
    """Deterministic per-doc draw in [0, SAMPLE_MOD): portable 60-bit
    md5 hash of seed||doc_id reduced mod 1e6 (same in the oracle)."""
    return F.pmod(h60(F.concat(F.lit(seed), doc_id.cast("string"))),
                  F.lit(SAMPLE_MOD))


def hash_sample(docs: DataFrame, fraction: float,
                seed: str = "s0") -> DataFrame:
    """Keep ~``fraction`` of docs, deterministically."""
    thresh = int(fraction * SAMPLE_MOD)
    return docs.filter(sample_key(F.col("doc_id"), seed) < thresh)


def stratified_fractions(docs: DataFrame, key: str,
                         fractions: dict[str, float],
                         default: float = 0.0,
                         seed: str = "s0") -> DataFrame:
    """Per-stratum keep fractions (the domain-rebalancing op: e.g.
    downsample a crawl source to 10% while keeping books at 100%)."""
    thresh: F.Column = F.lit(int(default * SAMPLE_MOD))
    for val, frac in sorted(fractions.items()):
        thresh = F.when(F.col(key) == val,
                        F.lit(int(frac * SAMPLE_MOD))).otherwise(thresh)
    return docs.filter(sample_key(F.col("doc_id"), seed) < thresh)


def stratified_quota(docs: DataFrame, key: str, quota: int,
                     seed: str = "s0",
                     prefilter_factor: float | None = None) -> DataFrame:
    """At most ``quota`` docs per stratum, chosen by hash order (ties
    broken by doc_id -> fully deterministic).

    ``prefilter_factor``: when set, rows are first cut per stratum to
    a hash bound of ~quota*prefilter_factor candidates (computed from
    a cheap count pre-aggregation, broadcast back) before the exact
    window — bounds the window's input on strata that dwarf the
    quota. With factor >= 4 the probability of underflowing the quota
    is negligible but nonzero: an APPROXIMATE tier; omit the factor
    for the exact guarantee."""
    ranked = docs
    if prefilter_factor is not None:
        sizes = docs.groupBy(key).agg(F.count("*").alias("_n"))
        bound = F.least(
            F.lit(SAMPLE_MOD),
            F.ceil(F.lit(float(SAMPLE_MOD) * quota * prefilter_factor)
                   / F.col("_n")).cast("long"))
        ranked = (docs.join(F.broadcast(sizes), key)
                  .filter(sample_key(F.col("doc_id"), seed) < bound)
                  .drop("_n"))
    w = Window.partitionBy(key).orderBy(
        sample_key(F.col("doc_id"), seed), F.col("doc_id"))
    return (ranked.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= quota).drop("_rn"))


SPLIT_WEIGHTS_DEFAULT = (("train", 0.90), ("val", 0.05), ("test", 0.05))


def split_assign(docs: DataFrame,
                 weights: tuple[tuple[str, float], ...] =
                 SPLIT_WEIGHTS_DEFAULT,
                 seed: str = "split") -> DataFrame:
    """Deterministic train/val/test assignment: cumulative hash ranges
    over [0, SAMPLE_MOD) in the given order; any residue from
    fractions not summing to 1 falls into the LAST split. A pure
    function of (doc_id, seed) — one narrow codegen map, no shuffle,
    stable across runs/cluster sizes, and any engine reproduces the
    assignment (the oracle replays the same CASE chain).

    -> ``docs`` plus a ``split: string`` column."""
    k = sample_key(F.col("doc_id"), seed)
    cum = 0.0
    expr = F.lit(weights[-1][0])
    cases = []
    for name, frac in weights[:-1]:
        cum += frac
        cases.append((name, int(cum * SAMPLE_MOD)))
    for name, bound in reversed(cases):
        expr = F.when(k < bound, F.lit(name)).otherwise(expr)
    return docs.withColumn("split", expr)


def exact_k_sample(docs: DataFrame, k: int,
                   seed: str = "s0") -> DataFrame:
    """EXACTLY ``k`` documents, deterministically: global top-k by
    (hash draw, doc_id). Catalyst plans the orderBy+limit as
    TakeOrderedAndProject — a per-partition heap of k rows with only
    k rows per partition reaching the driver-side merge; no global
    sort, no skew exposure (the hash key is uniform by construction).
    Complements ``hash_sample`` (approximate fraction) when the
    contract is an exact row budget."""
    return (docs
            .withColumn("_sk", sample_key(F.col("doc_id"), seed))
            .orderBy("_sk", "doc_id")
            .limit(k)
            .drop("_sk"))
