"""bin/curate.py end-to-end: the packaged curation pipeline must run
the full gate cascade, split deterministically, commit buckets with
lineage, and RESUME idempotently (re-run with READY buckets adds no
rows and changes no bytes). Runs in a subprocess because the CLI owns
its SparkSession (getOrCreate + stop would kill the shared fixture)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PREP = r"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
rows = []
for i in range(120):
    if i % 10 == 0:
        text = "the a of and"     # lang=en but < 8 tokens: fails quality
    elif i % 10 == 1:
        text = "the a of and to in is it for on repeat " * 4
    else:
        text = ("the quick brown fox is on a log and it runs to "
                "the den for food doc%d" % (i % 7))  # dup fingerprints
    rows.append((i, text.strip(), "en", "src%d" % (i % 3), len(text)))
spark.createDataFrame(
    rows, "doc_id long, text string, lang string, source string, "
          "n_chars long").coalesce(2).write.mode("overwrite") \
    .parquet(sys.argv[1])
bench = [(0, "the quick brown fox is on a log and it runs"),]
spark.createDataFrame(bench, "bench_id long, text string") \
    .write.mode("overwrite").parquet(sys.argv[2])
spark.stop()
"""


def _run(args, timeout=600):
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run([sys.executable] + args, env=env,
                         capture_output=True, text=True,
                         timeout=timeout, cwd=REPO)
    assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
    return res.stdout


def test_curate_cli_end_to_end_and_resume(tmp_path):
    inp, bench = str(tmp_path / "corpus"), str(tmp_path / "bench")
    out = str(tmp_path / "curated")
    _run(["-c", PREP, inp, bench])

    cli = ["bin/curate.py", "--input", inp, "--output", out,
           "--benchmark", bench, "--partitions", "8",
           "--shuffle-partitions", "8", "--shard-tokens", "256",
           "--splits", "train:0.8,val:0.1,test:0.1"]
    summary = json.loads(_run(cli).strip().splitlines()[-1])

    f = summary["funnel"]
    # cascade is monotone and every gate fires on this corpus
    assert (f["n_input"] >= f["n_lang"] >= f["n_quality"]
            >= f["n_rep"] >= f["n_dedup"] >= f["n_sampled"])
    assert f["n_quality"] < f["n_lang"]          # quality gate fired
    assert f["n_dedup"] < f["n_rep"]             # dedup collapsed dups
    assert summary["decontaminated"] >= 1        # benchmark overlap hit
    assert summary["buckets_committed"] == 8
    assert summary["output_docs"] == sum(summary["split_counts"].values())

    # resume: nothing left to do, output unchanged
    summary2 = json.loads(_run(cli).strip().splitlines()[-1])
    assert summary2["buckets_committed"] == 0
    assert summary2["output_docs"] == summary["output_docs"]
    assert summary2["split_counts"] == summary["split_counts"]


PREP_UNIQUE = r"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
rows = [(i, "the quick brown fox is on a log and it runs to the den "
            "for food unique%d marker%d" % (i, i), "en",
         "src%d" % (i % 3), 80) for i in range(400)]
spark.createDataFrame(
    rows, "doc_id long, text string, lang string, source string, "
          "n_chars long").coalesce(2).write.mode("overwrite") \
    .parquet(sys.argv[1])
spark.stop()
"""


def test_curate_sampled_run_still_fills_every_split(tmp_path):
    """Regression: the CLI passed ONE seed to both the sampling draw
    and the split draw — two pure functions of (doc_id, seed) — so
    with --sample-fraction <= 0.9 every surviving doc's hash key sat
    below the train boundary and val/test came out structurally empty
    (the 1.0 default masked it). The split seed is now stage-derived;
    a half-sampled run must still populate all three splits (~200
    survivors at 20%/20% val/test: P(an empty split) ~ 1e-19)."""
    inp = str(tmp_path / "corpus")
    out = str(tmp_path / "curated")
    _run(["-c", PREP_UNIQUE, inp])

    cli = ["bin/curate.py", "--input", inp, "--output", out,
           "--sample-fraction", "0.5", "--partitions", "4",
           "--shuffle-partitions", "8",
           "--splits", "train:0.6,val:0.2,test:0.2"]
    summary = json.loads(_run(cli).strip().splitlines()[-1])
    f = summary["funnel"]
    assert 0 < f["n_sampled"] < f["n_input"]      # the sampler fired
    assert set(summary["split_counts"]) == {"train", "val", "test"}
    assert summary["output_docs"] == sum(summary["split_counts"].values())
