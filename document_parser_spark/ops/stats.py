"""Corpus statistics operators: EXACT distributed quantiles over
bounded-cardinality numeric columns, per-group medians without
per-group buffering, and skew-safe exact top-k per group.

Why not ``percentile()`` / ``ntile()``: Spark's exact ``percentile``
aggregate buffers every value of the group in executor memory (the
OpenHashMap in ``Percentile``), and a global ``ntile`` is a
single-partition window — both are the textbook 100 TB failure
modes. For integer-valued columns (doc lengths, token counts, span
counts — every column a curation pipeline ranks on) the exact answer
is computable from the VALUE HISTOGRAM instead: ``groupBy(value)``
count is a map-side-combinable aggregation whose result is bounded
by the number of distinct values, not rows. Interpolated order
statistics then come from the cumulative histogram — bit-identical
to ANSI ``quantile_cont`` (linear interpolation on the 0-indexed
position ``p·(N-1)``), which is what the DuckDB oracles run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOPK_SALT_BUCKETS = 32


def _interp(vlo: float, vhi: float, frac: float) -> float:
    return vlo + (vhi - vlo) * frac


def exact_quantiles(df: DataFrame, col: str,
                    probs: tuple[float, ...]) -> list[float]:
    """Exact ``quantile_cont`` boundaries of an integer-valued column,
    computed from the value histogram.

    Driver state is O(distinct values) — the documented contract:
    lengths/counts have thousands of distinct values at any corpus
    scale. For genuinely continuous columns use
    ``approx_percentile`` (t-digest, mergeable partials) instead;
    this operator's point is that the EXACT answer is cheap whenever
    the histogram is bounded.
    """
    hist = sorted(
        (r[0], r[1]) for r in
        df.groupBy(col).agg(F.count("*").alias("_c"))
        .filter(F.col(col).isNotNull()).collect()
    )
    n = sum(c for _, c in hist)
    out = []
    for p in probs:
        pos = p * (n - 1)
        lo, hi = int(pos), -(-pos // 1)
        frac = pos - lo
        cum, vlo, vhi = 0, None, None
        for v, c in hist:
            start = cum
            cum += c
            if vlo is None and start <= lo < cum:
                vlo = float(v)
            if vhi is None and start <= hi < cum:
                vhi = float(v)
                break
        out.append(_interp(vlo, vhi, frac))
    return out


def quantile_tiers(df: DataFrame, col: str,
                   probs: tuple[float, ...] = (0.25, 0.5, 0.75)
                   ) -> DataFrame:
    """Assign every row a quantile tier (0..len(probs)) by EXACT
    global boundaries: ``tier = #(boundaries < value)`` — boundary
    values themselves fall in the lower tier (``<=`` semantics), so
    the rule is reproducible in plain SQL.

    The boundaries arrive as literals (one bounded histogram job),
    so the assignment itself is a narrow map — no shuffle, no window.
    """
    bounds = exact_quantiles(df, col, probs)
    tier = F.lit(0)
    for b in bounds:
        tier = tier + (F.col(col) > F.lit(b)).cast("int")
    return df.withColumn("tier", tier.cast("long"))


def group_quantiles(df: DataFrame, key: str, col: str,
                    probs: tuple[float, ...] = (0.5,),
                    prefix: str = "q") -> DataFrame:
    """Exact per-group ``quantile_cont`` of an integer-valued column
    with NO per-group value buffering.

    Shape: one map-side-combined ``groupBy(key, value)`` histogram,
    one window over the (key, value) relation (bounded by distinct
    pairs, not rows), one conditional final aggregation per key. A
    group's cost is its distinct-value count — a billion-row group
    with 10k distinct lengths costs 10k rows in the window.

    -> (key, n_rows, <prefix><pct> per prob) — e.g. q50, q90.
    """
    hist = df.groupBy(key, col).agg(F.count("*").cast("long").alias("_c"))
    w = Window.partitionBy(key).orderBy(col)
    wall = Window.partitionBy(key)
    h = (hist
         .withColumn("_cum", F.sum("_c").over(
             w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
         .withColumn("_n", F.sum("_c").over(wall))
         .withColumn("_start", F.col("_cum") - F.col("_c")))
    aggs = [F.max("_n").alias("n_rows")]
    for p in probs:
        pos = F.lit(p) * (F.col("_n") - 1).cast("double")
        lo = F.floor(pos)
        hi = F.ceil(pos)
        frac = pos - lo
        vlo = F.max(F.when((F.col("_start") <= lo) & (lo < F.col("_cum")),
                           F.col(col))).cast("double")
        vhi = F.max(F.when((F.col("_start") <= hi) & (hi < F.col("_cum")),
                           F.col(col))).cast("double")
        name = f"{prefix}{int(round(p * 100)):02d}"
        aggs.append(F.round(vlo + (vhi - vlo)
                            * F.max(frac), 3).alias(name))
    return h.groupBy(key).agg(*aggs)


def source_stats(docs: DataFrame, key: str = "source",
                 col: str = "n_chars") -> DataFrame:
    """Per-source corpus profile: doc count, total/mean chars and the
    exact median + p90 via :func:`group_quantiles`.

    -> (source, n_docs, sum_chars, avg_chars, q50, q90).
    """
    basic = docs.groupBy(key).agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(col).cast("long").alias("sum_chars"),
        F.round(F.avg(col), 3).alias("avg_chars"))
    quants = group_quantiles(docs, key, col, probs=(0.5, 0.9)) \
        .drop("n_rows")
    return basic.join(quants, key)


def length_outlier_trim(docs: DataFrame, key: str = "lang",
                        col: str = "n_chars",
                        lo_pct: int = 5, hi_pct: int = 95) -> DataFrame:
    """Per-group length-outlier trim (the C4/Gopher-style "drop the
    shortest/longest tail per language" curation gate) with EXACT
    empirical-CDF cuts and no per-group sort of the corpus.

    Cut rule, integer arithmetic only (reproducible bit-exactly in
    ANSI SQL — no 0.05*count double-vs-decimal boundary ambiguity):
    ``lo_cut = min value v with cum_count(v) * 100 >= lo_pct * total``
    and likewise ``hi_cut`` at ``hi_pct``; a doc survives iff
    ``lo_cut <= value <= hi_cut``.

    Shape at 100 TB: one map-side-combined ``groupBy(key, value)``
    histogram (bounded by distinct (lang, length) pairs, not rows),
    one window over that bounded relation, then the cuts — O(#langs)
    rows — broadcast back onto the corpus for a shuffle-free final
    tally. The heavy input is touched twice, never sorted.

    -> (key, lo_cut, hi_cut, kept_docs, dropped_docs, kept_chars).
    """
    hist = (docs.filter(F.col(col).isNotNull())
            .groupBy(key, col).agg(F.count("*").cast("long").alias("_c")))
    w = (Window.partitionBy(key).orderBy(col)
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    h = (hist
         .withColumn("_cum", F.sum("_c").over(w))
         .withColumn("_tot", F.sum("_c").over(Window.partitionBy(key))))
    cuts = h.groupBy(key).agg(
        F.min(F.when(F.col("_cum") * 100 >= F.lit(lo_pct) * F.col("_tot"),
                     F.col(col))).cast("long").alias("lo_cut"),
        F.min(F.when(F.col("_cum") * 100 >= F.lit(hi_pct) * F.col("_tot"),
                     F.col(col))).cast("long").alias("hi_cut"))
    keep = (F.col(col) >= F.col("lo_cut")) & (F.col(col) <= F.col("hi_cut"))
    return (docs.join(F.broadcast(cuts), key)
            .groupBy(key, "lo_cut", "hi_cut")
            .agg(F.sum(keep.cast("long")).alias("kept_docs"),
                 F.sum((~keep).cast("long")).alias("dropped_docs"),
                 F.sum(F.when(keep, F.col(col)).otherwise(F.lit(0)))
                 .cast("long").alias("kept_chars")))


def topk_per_group(df: DataFrame, key: str, order_col: str, k: int,
                   tie_col: str = "doc_id",
                   salt_buckets: int = TOPK_SALT_BUCKETS) -> DataFrame:
    """Exact top-k rows per group by (``order_col`` DESC, ``tie_col``
    ASC), skew-safe: a first window over (key, salt) cuts every
    group to ``salt_buckets * k`` candidates — a hot group's sort is
    split across ``salt_buckets`` partitions — before the exact
    final window ranks ``O(buckets * k)`` rows per group.

    -> df columns + ``rank`` (1-based). Deterministic: the tie
    column makes the total order strict.
    """
    salt = F.pmod(F.xxhash64(F.col(tie_col)), F.lit(salt_buckets))
    order = [F.col(order_col).desc(), F.col(tie_col).asc()]
    w1 = Window.partitionBy(key, "_salt").orderBy(*order)
    w2 = Window.partitionBy(key).orderBy(*order)
    return (df.withColumn("_salt", salt)
            .withColumn("_r1", F.row_number().over(w1))
            .filter(F.col("_r1") <= k)
            .withColumn("rank", F.row_number().over(w2).cast("long"))
            .filter(F.col("rank") <= k)
            .drop("_salt", "_r1"))


# Mixture-monitoring drift ceiling: KL in nats of a domain's word
# distribution against the whole corpus. Same-recipe domains sit well
# under 0.5; a templated/spam domain jumps past it.
KL_DRIFT_MAX = 0.5


def distribution_divergence(docs: DataFrame, key: str = "source",
                            text_col: str = "text",
                            max_kl: float = KL_DRIFT_MAX) -> DataFrame:
    """Corpus-mixture monitoring: per ``key`` group, the KL divergence
    (nats) of the group's word distribution from the corpus-wide one —
    the drift signal a training-data pipeline watches when a source
    changes its crawler, template, or language mix.

        KL(P_g || P) = sum_w (c_gw/n_g) * ln((c_gw * N) / (n_g * c_w))

    -> (key, n_words, n_distinct, kl, drift_ok). Groups are never
    penalized for missing corpus words (only w with c_gw > 0
    contribute), so KL is always finite.

    Scale shape: ONE corpus-sized pass — the (key, word) count with
    map-side partial combine; everything downstream operates on that
    bounded relation (|keys| x |vocab| rows): word totals re-aggregate
    it word-keyed (long payloads), group totals are a |keys|-row
    broadcast, and the corpus total N is one driver-collected scalar
    burned in as a literal (the same fit/score split as
    ``lm.bigram_lm_scores``' vocabulary size — a lazy scalar join
    would plan as the banned BroadcastNestedLoopJoin)."""
    w = (docs.select(F.col(key),
                     F.explode(F.split(F.col(text_col), " "))
                     .alias("word"))
         .filter(F.col("word") != ""))
    kw = w.groupBy(key, "word").agg(
        F.count("*").cast("long").alias("c_gw"))
    word_tot = kw.groupBy("word").agg(
        F.sum("c_gw").cast("long").alias("c_w"))
    grp_tot = kw.groupBy(key).agg(
        F.sum("c_gw").cast("long").alias("n_g"),
        F.count("*").cast("long").alias("n_distinct"))
    n = kw.agg(F.sum("c_gw").cast("long")).first()[0] or 0
    term = (F.col("c_gw").cast("double") / F.col("n_g").cast("double")
            * F.log((F.col("c_gw").cast("double") * F.lit(float(n)))
                    / (F.col("n_g").cast("double")
                       * F.col("c_w").cast("double"))))
    kl = F.round(F.sum(term), 3)
    return (kw.join(word_tot, "word")
            .join(F.broadcast(grp_tot), key)
            .groupBy(key, "n_g", "n_distinct")
            .agg(kl.alias("kl"))
            .select(F.col(key),
                    F.col("n_g").alias("n_words"), "n_distinct", "kl",
                    (F.col("kl") <= F.lit(float(max_kl)))
                    .cast("int").cast("long").alias("drift_ok")))
