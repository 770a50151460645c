"""Lineage + idempotent checkpoint-restart tests (SURVEY §5.5)."""

from __future__ import annotations

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from document_parser_spark import lineage as lin
from document_parser_spark.config import LINEAGE_READY
from document_parser_spark.plans.pipeline import extract
from document_parser_spark.schema import DOCUMENTS_IN_SCHEMA
from document_parser_spark.sources.synth import fixtures_dataframe

N_PART = 8


@pytest.fixture()
def out_dir(tmp_path):
    return str(tmp_path / "out")


@pytest.fixture(scope="module")
def result(spark):
    return extract(fixtures_dataframe(spark)).cache()


def test_full_run_commits_all_buckets(spark, result, out_dir):
    done = lin.run_with_lineage(spark, result, out_dir, n_partitions=N_PART)
    assert {d["partition_id"] for d in done} == set(range(N_PART))
    assert all(d["status"] == LINEAGE_READY for d in done)
    assert lin.remaining_buckets(spark, out_dir, N_PART) == []
    back = lin.read_output(spark, out_dir)
    assert back.count() == result.count()
    # metrics roll up exactly
    total_spans = sum(d["span_count"] for d in done)
    assert total_spans == result.agg(F.sum(F.size("spans"))).head()[0]


def test_restart_skips_ready_and_matches_clean_run(spark, result, out_dir):
    # clean run
    lin.run_with_lineage(spark, result, out_dir, n_partitions=N_PART)
    clean = sorted(map(str, lin.read_output(spark, out_dir).collect()))

    # simulate a crash: drop lineage+data for 3 buckets, corrupt their dirs
    for b in (1, 4, 6):
        os.remove(os.path.join(out_dir, "_lineage", f"bucket={b}.json"))
        shutil.rmtree(os.path.join(out_dir, f"part_bucket={b}"))
    assert lin.remaining_buckets(spark, out_dir, N_PART) == [1, 4, 6]

    # record mtimes of untouched READY buckets
    untouched = {
        b: os.path.getmtime(os.path.join(out_dir, f"part_bucket={b}"))
        for b in range(N_PART) if b not in (1, 4, 6)
    }
    done = lin.run_with_lineage(spark, result, out_dir, n_partitions=N_PART)
    assert {d["partition_id"] for d in done} == {1, 4, 6}  # only gaps
    # READY buckets untouched byte-for-byte (dir not rewritten)
    for b, mt in untouched.items():
        assert os.path.getmtime(
            os.path.join(out_dir, f"part_bucket={b}")) == mt
    # restarted output identical to the clean run
    resumed = sorted(map(str, lin.read_output(spark, out_dir).collect()))
    assert resumed == clean


def test_bucket_assignment_stable_across_partitioning(spark, result):
    a = lin.with_bucket(result, 16).select("doc_id", "part_bucket")
    b = lin.with_bucket(result.repartition(7), 16) \
        .select("doc_id", "part_bucket")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_error_rows_counted(spark, out_dir):
    rows = [
        ("bad1", [{"kind": "wav", "text": None, "media_ref": None,
                   "offset": 0}], "h", "s"),
        ("ok1", [{"kind": "text", "text": "fine", "media_ref": "",
                  "offset": 0}], "h", "s"),
    ]
    df = spark.createDataFrame(rows, DOCUMENTS_IN_SCHEMA)
    done = lin.run_with_lineage(spark, extract(df), out_dir, n_partitions=2)
    assert sum(d["parse_failures"] for d in done) == 1
    # lineage files are valid JSON with the full schema
    with open(os.path.join(out_dir, "_lineage",
                           f"bucket={done[0]['partition_id']}.json")) as fh:
        row = json.load(fh)
    assert set(row) == {"partition_id", "status", "input_files",
                        "span_count", "parse_failures", "updated_at"}


def test_crash_leftover_tmp_dir_invisible_to_read_output(spark, result,
                                                         out_dir):
    """A crash between the data write and the rename must not leak the
    in-progress directory into read_output (it lives under _tmp/,
    outside the part_bucket=* glob namespace)."""
    lin.run_with_lineage(spark, result, out_dir, n_partitions=N_PART)
    clean = lin.read_output(spark, out_dir).count()
    # simulate a crashed half-committed bucket write
    stale = os.path.join(out_dir, "_tmp", "bucket=3")
    result.limit(2).write.mode("overwrite").parquet(stale)
    got = lin.read_output(spark, out_dir)
    assert got.count() == clean                      # no duplicated rows
    assert dict(got.dtypes)[lin.BUCKET_COL] == "int"  # type not poisoned
