"""Adversarial-skew evidence for the salted two-phase reassembly
(north rule: "salts skewed hosts/doc-size buckets before the
reassembly shuffle"; reassemble.py implements it — this tool MEASURES
its value instead of asserting it).

Corpus: a heavy-tailed parsed-span relation with one pathological hot
document (``hot_spans`` spans, default 2M) amid ``n_small`` ordinary
docs (~20 spans each). Unsalted, the reassembly ``groupBy(doc_id)``
pins the entire hot document on ONE reducer — the classic straggler;
salted, phase 1 spreads it over ``salt_buckets`` partial collects and
phase 2 merges K arrays. The job materializes ``sum(size(spans))`` so
every array is actually built but nothing hits disk.

Usage:
    python tools/skew_bench.py [master] [hot_spans] [n_small]
    # default: local[8] 2000000 50000  -> appends results to stdout md
"""

from __future__ import annotations

import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_parsed(spark, hot_spans: int, n_small: int, spans_per_small: int):
    from pyspark.sql import functions as F

    total = hot_spans + n_small * spans_per_small
    base = spark.range(0, total, 1, 64)
    is_hot = F.col("id") < hot_spans
    small_idx = F.col("id") - hot_spans
    return base.select(
        F.when(is_hot, F.lit("hot-doc"))
        .otherwise(F.concat(F.lit("d"),
                            F.pmod(small_idx, F.lit(n_small))
                            .cast("string"))).alias("doc_id"),
        F.when(is_hot, F.col("id"))
        .otherwise((small_idx / n_small).cast("long"))
        .cast("int").alias("ord0"),
        F.lit(0).alias("ord1"),
        F.lit("text").alias("kind"),
        F.concat(F.lit("span payload number "), F.col("id").cast("string"))
        .alias("text"),
        F.lit("").alias("media_ref"),
    )


MODES = {
    # always-salt: the round-1 behavior (two-phase for every doc)
    "salted_always": dict(salted=True, salt_threshold=None),
    # adaptive: two-phase only above the span-count threshold (the
    # bench input is a materialized parquet scan, so counting from the
    # parsed relation itself is the cheap path here)
    "adaptive": dict(salted=True, salt_threshold=65536,
                     estimate_from_parsed=True),
    "unsalted": dict(salted=False),
}


def run_once(spark, parsed, mode: str) -> float:
    from pyspark.sql import functions as F

    from document_parser_spark.operators.reassemble import reassemble

    t0 = time.time()
    out = reassemble(parsed, salt_buckets=8, **MODES[mode])
    row = out.agg(F.sum(F.size("spans")).alias("n"),
                  F.count("*").alias("docs")).collect()[0]
    wall = time.time() - t0
    assert row.docs > 0
    return wall


def main() -> int:
    master = sys.argv[1] if len(sys.argv) > 1 else "local[8]"
    hot_spans = int(sys.argv[2]) if len(sys.argv) > 2 else 2_000_000
    n_small = int(sys.argv[3]) if len(sys.argv) > 3 else 50_000
    spans_per_small = 20

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(master)
        .config("spark.sql.shuffle.partitions", "256")
        .config("spark.driver.memory", "24g")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("skew-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    parsed = build_parsed(spark, hot_spans, n_small, spans_per_small)
    parsed.persist().count()   # materialize input once, off the clock

    results = {}
    for mode in MODES:
        run_once(spark, parsed, mode)            # warm-up (JIT, codegen)
        walls = [run_once(spark, parsed, mode) for _ in range(3)]
        results[mode] = statistics.median(walls)
        print(f"{mode}: median {results[mode]:.2f}s "
              f"runs={[round(w, 2) for w in walls]}", flush=True)

    print(f"\nhot doc = {hot_spans} spans, {n_small} small docs x "
          f"{spans_per_small}, master={master}")
    for mode, med in results.items():
        print(f"  {mode}: {med:.2f}s")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
