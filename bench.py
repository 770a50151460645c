#!/usr/bin/env python
"""Headline benchmark — prints ONE JSON line to stdout.

Runs the flagship extraction pipeline plus the headline operator
queries at ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` (default 32). Every query is forced end
to end with the no-op sink (full computation, no collect/transfer
cost, no column-pruning shortcuts a bare count() would allow).

    {"metric": "headline_total", "value": <sum sec>, "unit": "sec",
     "queries": {...per-query sec...}, "sf": <sf>,
     "extract_docs_per_sec": <docs/sec>, "cpus": N}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
MASTER = os.environ.get("SPARK_GRAFT_MASTER", f"local[{CPUS}]")

HEADLINE = [
    "extract_pipeline",
    "a1_reassemble_roundtrip",
    "j2_translate_zip",
    "w3_session_breaks",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "ann_cosine_threshold",
    "text_token_stats",
    "text_lang_id",
    "multimodal_decode_stub",
    "agg_lineitem_pricing",
    "join_revenue_by_nation",
]


def parse_sf(path: str) -> float:
    base = os.path.basename(path.rstrip("/"))
    return float(base[2:]) if base.startswith("sf") else -1.0


def main() -> None:
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(MASTER)
        .config("spark.sql.shuffle.partitions", str(max(CPUS, 8)))
        .config("spark.driver.memory",
                os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
        .appName("document-parser-spark-bench")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    qs = entrymod.queries()

    def force(df) -> None:
        df.write.mode("overwrite").format("noop").save()

    # Pass 1 (cold): JVM JIT + codegen + Python-worker launch dominate
    # first executions (measured: first dedup_minhash_lsh 6.3s cold vs
    # 1.4s warm). Pass 2 (warm) is the steady-state throughput a long
    # job amortizes to — that is the headline; the cold total is
    # reported alongside.
    cold: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, SF_DIR))
        cold[name] = round(time.time() - t0, 3)

    times: dict[str, float] = {}
    for name in HEADLINE:
        t0 = time.time()
        force(qs[name](spark, SF_DIR))
        times[name] = round(time.time() - t0, 3)
        print(f"  {name}: {times[name]}s (cold {cold[name]}s)",
              file=sys.stderr)

    n_docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").count()
    docs_per_sec = round(n_docs / max(times["extract_pipeline"], 1e-9), 1)

    out = {
        "metric": "headline_total",
        "value": round(sum(times.values()), 3),
        "unit": "sec",
        "queries": times,
        "cold_total": round(sum(cold.values()), 3),
        "sf": parse_sf(SF_DIR),
        "extract_docs_per_sec": docs_per_sec,
        "n_docs": n_docs,
        "cpus": CPUS,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
