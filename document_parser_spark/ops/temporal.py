"""Temporal operators over event streams: distributed as-of join and
multi-dimensional rollup.

As-of join is the canonical operator Spark's join strategies lack
(reference analogue: the enrichment joins of §2 attach side data by
exact key; a time-series pipeline attaches "the latest reference row
at or before this timestamp"). The Spark-first formulation is the
union + ordered-window trick — NOT a range join (O(n·m) candidate
blowup) and NOT a per-row Python loop:

  1. reduce the reference side to one row per (key, ts) — ties are
     broken by the highest ``tie_col`` so the operator is a pure
     function of its input;
  2. union reference and probe rows with a tag ordering references
     FIRST at equal timestamps (as-of is ``<=``); every probe column
     beyond (key, ts) rides along inside one struct, so nothing has
     to be joined back afterwards;
  3. one window per key ordered by (ts, tag):
     ``last(ref_value, ignorenulls=True)`` over the unbounded
     preceding frame carries the latest reference forward;
  4. keep probe rows and unpack the struct.

Cost: ONE hash exchange of (refs ∪ probes) on the key + an in-
partition sort — the distributed merge-join shape, linear in input
(the plan audit in tests/test_plans.py asserts the single exchange).
Skew: a single hot key serializes into one partition's sort; the
bucketed variant (``asof_join_bucketed``) splits each key's timeline
into contiguous time buckets, computes bucket-local as-of, and
carries the per-bucket last reference forward through a SECOND
window over the (key, bucket) summary relation — whose row count is
bounded by key-count × bucket-count, not by events. Both variants
return bit-identical results (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

ASOF_REF_TAG = 0
ASOF_PROBE_TAG = 1


def _tagged_union(probes: DataFrame, refs: DataFrame, key: str,
                  ts: str, ref_value: str,
                  tie_col: str) -> tuple[DataFrame, list[str]]:
    """(key, _ts, _tag, _rv, _ex): reduced references ∪ probes, with
    every probe column except the key and timestamp packed into the
    ``_ex`` struct (NULL on reference rows)."""
    extras = [c for c in probes.columns if c not in (key, ts)]
    if not extras:
        raise ValueError("probes need at least one column besides "
                         f"{key!r} and {ts!r} (an id to return)")
    p = probes.select(key, F.col(ts).alias("_ts"),
                      F.lit(ASOF_PROBE_TAG).alias("_tag"),
                      F.lit(None).cast(
                          refs.schema[ref_value].dataType).alias("_rv"),
                      F.struct(*extras).alias("_ex"))
    r = (refs.groupBy(key, ts)
         .agg(F.max_by(ref_value, tie_col).alias("_rv"))
         .select(key, F.col(ts).alias("_ts"),
                 F.lit(ASOF_REF_TAG).alias("_tag"), "_rv",
                 F.lit(None).cast(p.schema["_ex"].dataType)
                 .alias("_ex")))
    return r.unionByName(p), extras


def _unpack(out: DataFrame, key: str, ts: str,
            extras: list[str]) -> DataFrame:
    return out.select(
        *[F.col(f"_ex.{c}").alias(c) for c in extras],
        key, F.col("_ts").alias(ts), "ref_ts", "ref_value")


def asof_join(probes: DataFrame, refs: DataFrame, key: str = "user_id",
              ts: str = "ts", ref_value: str = "value",
              tie_col: str = "event_id") -> DataFrame:
    """For every probe row, the latest reference row with
    ``ref.ts <= probe.ts`` on the same key.

    -> probes' columns + (ref_ts, ref_value); probes with no earlier
    reference keep NULLs (left semantics).
    """
    u, extras = _tagged_union(probes, refs, key, ts, ref_value, tie_col)
    w = (Window.partitionBy(key).orderBy("_ts", "_tag")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = (u.withColumn("ref_value",
                            F.last("_rv", ignorenulls=True).over(w))
               .withColumn("ref_ts",
                           F.last(F.when(F.col("_tag") == ASOF_REF_TAG,
                                         F.col("_ts")),
                                  ignorenulls=True).over(w)))
    return _unpack(carried.filter(F.col("_tag") == ASOF_PROBE_TAG),
                   key, ts, extras)


def asof_join_bucketed(probes: DataFrame, refs: DataFrame,
                       key: str = "user_id", ts: str = "ts",
                       ref_value: str = "value",
                       tie_col: str = "event_id",
                       bucket_s: int = 86400) -> DataFrame:
    """Skew-safe as-of: identical result to :func:`asof_join`, but a
    hot key's sort is bounded by its densest ``bucket_s``-second time
    bucket instead of its whole history.

    Two-level scan (same decomposition as ``packing.shard_assign``):
    bucket-local as-of via a (key, bucket) window, then the latest
    reference of every EARLIER bucket is carried forward through a
    window over the per-bucket summary relation (one row per
    non-empty (key, bucket)) and joined back — probes whose bucket
    holds no earlier reference fall back to the carried value.
    """
    u, extras = _tagged_union(probes, refs, key, ts, ref_value, tie_col)
    u = u.withColumn("_bkt", (F.unix_timestamp(F.col("_ts"))
                              / F.lit(bucket_s)).cast("long"))
    wl = (Window.partitionBy(key, "_bkt").orderBy("_ts", "_tag")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    local = (u.withColumn("_lrv", F.last("_rv", ignorenulls=True).over(wl))
             .withColumn("_lrt", F.last(
                 F.when(F.col("_tag") == ASOF_REF_TAG, F.col("_ts")),
                 ignorenulls=True).over(wl)))
    # per-(key, bucket) last reference -> carried-forward PREVIOUS-
    # bucket value; the summary relation has one row per non-empty
    # bucket, so this window's input is small by construction
    summary = (u.filter(F.col("_tag") == ASOF_REF_TAG)
               .groupBy(key, "_bkt")
               .agg(F.max_by("_rv", "_ts").alias("_brv"),
                    F.max("_ts").alias("_brt")))
    # one row per non-empty (key, bucket) — probe-only buckets join
    # with NULL summary; the carry frame ends at the PREVIOUS row so a
    # probe only sees references from strictly earlier buckets (its
    # own bucket is handled exactly by the local window above)
    wc = (Window.partitionBy(key).orderBy("_bkt")
          .rowsBetween(Window.unboundedPreceding, -1))
    probe_bkts = u.filter(F.col("_tag") == ASOF_PROBE_TAG) \
                  .select(key, "_bkt").distinct()
    carried = (probe_bkts.join(summary, [key, "_bkt"], "full")
               .withColumn("_crv", F.last("_brv", ignorenulls=True)
                           .over(wc))
               .withColumn("_crt", F.last("_brt", ignorenulls=True)
                           .over(wc))
               .select(key, "_bkt", "_crv", "_crt"))
    out = (local.filter(F.col("_tag") == ASOF_PROBE_TAG)
           .join(carried, [key, "_bkt"], "left")
           .withColumn("ref_ts", F.coalesce("_lrt", "_crt"))
           .withColumn("ref_value", F.coalesce("_lrv", "_crv")))
    return _unpack(out, key, ts, extras)


def event_rollup(events: DataFrame, dims: tuple[str, ...] =
                 ("event_type", "user_id"),
                 value: str = "value") -> DataFrame:
    """Multi-dimensional rollup (the hypertable-rollup shape): counts
    and sums at every prefix granularity of ``dims`` plus the grand
    total, one pass, map-side partial aggregation at every level.

    -> dims + (gid, n_events, sum_value) with ``gid`` the standard
    SQL grouping bitmask (0 = finest level, 2^len(dims)-1 = total).
    """
    return (events.rollup(*dims)
            .agg(F.grouping_id().cast("long").alias("gid"),
                 F.count("*").cast("long").alias("n_events"),
                 F.round(F.sum(value), 2).alias("sum_value"))
            .select(*dims, "gid", "n_events", "sum_value"))
