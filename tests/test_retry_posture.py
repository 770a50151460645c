"""§2.11 retry posture: the reference retries failed work with
exponential backoff (translator/v1/utils.py:32-51, 2^attempt * 3 — and
its @retry decorator bug means the wrapped call actually runs once per
attempt). The Spark analogue is task-level retry via
``spark.task.maxFailures``: a task attempt that throws is re-scheduled,
and because every pipeline stage is a pure function of its input
partition, a retried task MUST produce byte-identical output.

Evidence: inject a first-attempt-only failure (TaskContext
.attemptNumber()) into a UDF stage feeding the real extract()
pipeline, run under ``local[2, 2]`` (1 retry allowed), and assert the
output equals the uninjected run. Runs in a subprocess because the
retry budget is a session-level setting the shared fixture (correctly)
pins to fail-fast."""

from __future__ import annotations

import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCRIPT = r"""
import pandas as pd
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf

spark = (SparkSession.builder.master("local[2, 2]")
         .config("spark.sql.shuffle.partitions", "4")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.pyspark.enabled", "true")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")

from document_parser_spark.plans.pipeline import extract
from document_parser_spark.sources.synth import synth_dataframe


@pandas_udf("string")
def flaky_identity(s: pd.Series) -> pd.Series:
    ctx = TaskContext.get()
    if ctx is not None and ctx.attemptNumber() == 0:
        raise RuntimeError("injected first-attempt failure")
    return s


docs = synth_dataframe(spark, 60, partitions=3)
key = lambda r: r["doc_id"]
clean = sorted(
    (r.asDict() for r in
     extract(docs).select("doc_id", "status", "markdown").collect()),
    key=key)
flaky_docs = docs.withColumn("doc_id", flaky_identity("doc_id"))
retried = sorted(
    (r.asDict() for r in
     extract(flaky_docs).select("doc_id", "status", "markdown").collect()),
    key=key)
assert retried == clean, "retried output diverged from clean run"
assert len(clean) == 60
print("RETRY_POSTURE_OK", len(clean))
spark.stop()
"""


def test_task_retry_output_identical():
    env = dict(os.environ, PYTHONPATH=REPO)
    res = subprocess.run([sys.executable, "-c", SCRIPT], env=env,
                         capture_output=True, text=True, timeout=600,
                         cwd=REPO)
    assert "RETRY_POSTURE_OK 60" in res.stdout, (
        res.stdout[-2000:] + "\n" + res.stderr[-2000:])
