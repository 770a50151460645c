"""REFERENCED image mode end-to-end: manifest parity with the
markdown's ![](...) links, and the file-materialization half
(reference: abc/abc.py:27-28 — Docling writes image binaries into an
artifacts dir next to the markdown)."""

from __future__ import annotations

import json
import os
import re
import subprocess
import sys

import pytest
from pyspark.sql import functions as F

from document_parser_spark.operators.serialize import (
    artifacts_manifest,
    materialize_artifacts,
)
from document_parser_spark.plans.pipeline import extract

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SPAN_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")

_MD_LINK = re.compile(r"!\[\]\(([^)]*)\)")


@pytest.fixture(scope="module")
def ref_out(spark):
    rows = [
        ("d1", [("text", "before the first image", "", 0),
                ("image", "", "m://d1/a", 1),
                ("text", "between images", "", 2),
                ("image", "", "m://d1/b", 3)]),
        ("d2", [("image", "", "m://d2/solo", 0),
                ("text", "caption text", "", 1)]),
        ("d3", [("text", "no images at all here", "", 0)]),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    return extract(docs, image_mode="referenced").cache()


def test_manifest_matches_markdown_links(ref_out):
    """Every ![](ref) link in the REFERENCED markdown has exactly one
    manifest row, and vice versa — the manifest IS the artifacts dir
    listing, so any drift breaks link resolution after the copy."""
    manifest = artifacts_manifest(ref_out)
    mrows = manifest.collect()
    per_doc_manifest: dict[str, list[str]] = {}
    for r in mrows:
        per_doc_manifest.setdefault(r.doc_id, []).append(r.media_ref)
    for row in ref_out.select("doc_id", "markdown").collect():
        links = _MD_LINK.findall(row.markdown)
        assert sorted(links) == sorted(
            per_doc_manifest.get(row.doc_id, [])), row.doc_id
    # artifact paths are unique (one file per image span)
    paths = [r.artifact_path for r in mrows]
    assert len(paths) == len(set(paths)) == 3


def test_materialize_artifacts_writes_files(spark, ref_out, tmp_path):
    media_rows = [
        ("d1", "m://d1/a", "image", b"PNGBYTES-A", 10),
        ("d1", "m://d1/b", "image", b"PNGBYTES-BB", 11),
        # d2's binary is missing -> status row, never an exception
    ]
    media = spark.createDataFrame(
        media_rows, "doc_id string, media_ref string, media_type string,"
                    " content binary, n_bytes long")
    manifest = artifacts_manifest(ref_out)
    out = materialize_artifacts(manifest, media, str(tmp_path)).collect()
    by_ref = {r.media_ref: r for r in out}
    assert by_ref["m://d1/a"].status == "written"
    assert by_ref["m://d1/b"].status == "written"
    assert by_ref["m://d2/solo"].status == "missing"
    # bytes really landed at the manifest's artifact_path
    for ref, payload in [("m://d1/a", b"PNGBYTES-A"),
                         ("m://d1/b", b"PNGBYTES-BB")]:
        full = tmp_path / by_ref[ref].artifact_path
        assert full.read_bytes() == payload
        assert by_ref[ref].n_bytes == len(payload)


def test_materialize_refuses_path_traversal(spark, tmp_path):
    """``artifact_path`` embeds the raw doc_id:string; a hostile id
    ('../..', absolute, or slash-bearing) must never write outside
    --artifacts-dir. The write is refused and surfaced as an
    ``unsafe_path`` status row (A4: errors are rows), while benign
    slash-bearing ids that stay inside the dir still write."""
    base = tmp_path / "art"
    outside = tmp_path / "escape.bin"
    rows = [
        ("../../" + outside.name, [("image", "", "m://evil", 0)]),
        ("s3://bucket/doc-9", [("image", "", "m://ok", 0)]),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    out = extract(docs, image_mode="referenced")
    media = spark.createDataFrame(
        [("../../" + outside.name, "m://evil", "image", b"EVIL", 4),
         ("s3://bucket/doc-9", "m://ok", "image", b"OK", 2)],
        "doc_id string, media_ref string, media_type string,"
        " content binary, n_bytes long")
    res = {r.media_ref: r for r in materialize_artifacts(
        artifacts_manifest(out), media, str(base)).collect()}
    assert res["m://evil"].status == "unsafe_path"
    assert res["m://evil"].n_bytes == 0
    assert not outside.exists()
    # nothing escaped the base dir anywhere on the tmp tree
    stray = [f for root, _d, fs in os.walk(tmp_path) for f in fs
             if not root.startswith(str(base))]
    assert stray == []
    assert res["m://ok"].status == "written"
    written = [os.path.join(root, f)
               for root, _d, fs in os.walk(base) for f in fs]
    assert len(written) == 1
    with open(written[0], "rb") as fh:
        assert fh.read() == b"OK"


def test_materialize_hostile_ids_become_rows(spark, tmp_path):
    """Ids the filesystem itself rejects (NUL byte -> ValueError from
    realpath/open, >255-byte component -> OSError from makedirs) must
    not crash the Spark task: they surface as ``io_error`` rows
    (ADVICE r4: the unsafe_path guard covered traversal but let these
    escape as task failures)."""
    base = tmp_path / "art"
    nul_id = "doc\x00evil"
    long_id = "x" * 600
    rows = [
        (nul_id, [("image", "", "m://nul", 0)]),
        (long_id, [("image", "", "m://long", 0)]),
        ("fine", [("image", "", "m://fine", 0)]),
    ]
    docs = spark.createDataFrame(rows, SPAN_SCHEMA)
    media = spark.createDataFrame(
        [(nul_id, "m://nul", "image", b"A", 1),
         (long_id, "m://long", "image", b"B", 1),
         ("fine", "m://fine", "image", b"C", 1)],
        "doc_id string, media_ref string, media_type string,"
        " content binary, n_bytes long")
    res = {r.media_ref: r for r in materialize_artifacts(
        artifacts_manifest(extract(docs, image_mode="referenced")),
        media, str(base)).collect()}
    assert res["m://nul"].status == "io_error"
    assert res["m://long"].status == "io_error"
    assert res["m://nul"].n_bytes == 0 and res["m://long"].n_bytes == 0
    assert res["m://fine"].status == "written"


_PREP = r"""
import sys
from pyspark.sql import SparkSession
spark = (SparkSession.builder.master("local[2]")
         .config("spark.ui.enabled", "false").getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
rows, media = [], []
for i in range(12):
    ref = "m://doc%d/0" % i
    rows.append(("doc%d" % i,
                 [("text", "intro text for doc %d" % i, "", 0),
                  ("image", "", ref, 1)]))
    if i % 3 != 2:   # every third binary missing
        media.append(("doc%d" % i, ref, "image",
                      ("BYTES-%d" % i).encode(), 7))
spark.createDataFrame(
    rows, "doc_id string, spans array<struct<kind:string,text:string,"
          "media_ref:string,offset:int>>").write.mode("overwrite") \
    .parquet(sys.argv[1])
spark.createDataFrame(
    media, "doc_id string, media_ref string, media_type string, "
           "content binary, n_bytes long").write.mode("overwrite") \
    .parquet(sys.argv[2])
spark.stop()
"""


def test_extract_cli_referenced_materializes(tmp_path):
    """bin/extract.py --image-mode referenced --media --artifacts-dir:
    manifest parquet + real artifact files + per-file status rows."""
    inp, med = str(tmp_path / "docs"), str(tmp_path / "media")
    out, art = str(tmp_path / "out"), str(tmp_path / "artifacts")
    env = dict(os.environ, PYTHONPATH=REPO)

    def run(args):
        res = subprocess.run([sys.executable] + args, env=env,
                             capture_output=True, text=True,
                             timeout=600, cwd=REPO)
        assert res.returncode == 0, res.stdout[-2000:] + res.stderr[-2000:]
        return res.stdout

    run(["-c", _PREP, inp, med])
    stdout = run(["bin/extract.py", "--input", inp, "--output", out,
                  "--partitions", "4", "--shuffle-partitions", "4",
                  "--image-mode", "referenced", "--media", med,
                  "--artifacts-dir", art])
    summary = json.loads(stdout.strip().splitlines()[-1])
    assert summary["artifacts"] == 12
    assert summary["artifacts_written"] == 8    # 4 of 12 binaries missing
    # the files exist on disk with the expected payloads
    written = []
    for root, _dirs, files in os.walk(art):
        written += [os.path.join(root, f) for f in files]
    assert len(written) == 8
    assert any(open(p, "rb").read().startswith(b"BYTES-") for p in written)
