"""Batched markdown serialization for Spark (SURVEY.md §2.9 F10-F15).

A scalar pandas UDF over the reassembled ``spans`` array column. Inside each
Arrow batch the spans of ALL documents are flattened into one table; chunk
rendering (heading prefixes, list bullets, fences, placeholders) and the
separator logic (blank line, list adjacency, page-break placeholder) are
computed as vectorized numpy selects; the final markdown strings come from a
single ordered group-join. Tables (rare) render via a per-span map.

Golden-tested against refparser.serialize; placeholders in config.py
(page break: abc/abc.py:30, image placeholder mode: abc/abc.py:27).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from document_parser_spark.config import (
    IMAGE_MODE_PLACEHOLDER,
    IMAGE_PLACEHOLDER,
    PAGE_BREAK_PLACEHOLDER,
)
from document_parser_spark.refparser.serialize import (
    _HEADING_REF_RE,
    _LIST_REF_RE,
    LIST_DEPTH_MAX,
    serialize_table,
)


def serialize_batch(spans_series: pd.Series, image_mode: str) -> pd.Series:
    """Series of span lists (dicts with kind/text/media_ref, already in final
    order) -> Series of markdown strings."""
    doc_idx: list[int] = []
    kinds: list[str] = []
    texts: list[str] = []
    medias: list[str] = []
    for i, spans in enumerate(spans_series):
        if spans is None:
            continue
        for sp in spans:
            doc_idx.append(i)
            kinds.append(sp["kind"])
            texts.append(sp["text"] or "")
            medias.append(sp["media_ref"] or "")

    n_docs = len(spans_series)
    if not doc_idx:
        return pd.Series([""] * n_docs, dtype="object")

    df = pd.DataFrame({"doc": doc_idx, "kind": kinds, "text": texts,
                       "media": medias})
    kind = df["kind"].to_numpy()
    text = df["text"].astype("object")
    media = df["media"].astype("object")

    rendered = text.copy()

    # heading/list media_ref grammars: the STRICT regexes shared with
    # the oracle (refparser.serialize._HEADING_REF_RE/_LIST_REF_RE) —
    # any non-matching ref falls back identically on both sides
    # (review-caught: the arms previously disagreed on 'h7', 'li:o',
    # 'li:o:1:x', float depths)
    m = kind == "heading"
    if m.any():
        levels = (pd.to_numeric(
            media[m].str.extract(_HEADING_REF_RE, expand=False),
            errors="coerce").fillna(1).clip(1, 6).astype(int))
        rendered[m] = levels.map(lambda v: "#" * v) + " " + text[m]

    m = kind == "list_item"
    if m.any():
        parts = media[m].str.extract(_LIST_REF_RE)
        matched = parts[0].notna()
        marker = parts[1].where(matched, "u")
        depth = (pd.to_numeric(parts[2], errors="coerce").fillna(0)
                 .clip(0, LIST_DEPTH_MAX).astype(int))
        bullet = np.where(marker == "o", "1.", "-")
        indent = depth.map(lambda d: "  " * d)
        rendered[m] = indent + bullet + " " + text[m]

    m = kind == "table"
    if m.any():
        rendered[m] = text[m].map(serialize_table)

    m = kind == "code"
    if m.any():
        rendered[m] = "```\n" + text[m] + "\n```"

    m = kind == "image"
    if m.any():
        if image_mode == IMAGE_MODE_PLACEHOLDER:
            rendered[m] = IMAGE_PLACEHOLDER
        else:
            rendered[m] = "![](" + media[m] + ")"

    is_pb = kind == "page_break"
    rendered[is_pb] = PAGE_BREAK_PLACEHOLDER

    # drop ONLY empty-rendered tables (the oracle's sole skip): an
    # empty 'text' or unknown-kind chunk still contributes its '\n\n'
    # separator and resets list adjacency, exactly as the oracle's
    # chunk loop appends it (review-caught: dropping every
    # empty-rendered block changed the separators around it)
    keep = (kind != "table") | (rendered.to_numpy() != "")
    df = df[keep]
    rendered = rendered[keep]
    kind = df["kind"].to_numpy()
    is_pb = kind == "page_break"
    doc = df["doc"].to_numpy()

    # separators: none for the first block of a page (doc start or after a
    # page break), '\n' between adjacent list items, blank line otherwise
    first_of_doc = np.ones(len(df), dtype=bool)
    first_of_doc[1:] = doc[1:] != doc[:-1]
    prev_kind = np.roll(kind, 1)
    after_pb = np.zeros(len(df), dtype=bool)
    after_pb[1:] = is_pb[:-1]
    list_adj = (kind == "list_item") & (prev_kind == "list_item")
    sep = np.where(first_of_doc | after_pb | is_pb, "",
                   np.where(list_adj, "\n", "\n\n"))

    parts = pd.Series(sep, index=rendered.index, dtype="object") + rendered
    md = parts.groupby(doc).agg("".join)

    out = pd.Series([""] * n_docs, dtype="object")
    out.iloc[md.index] = md.to_numpy()
    return out


def make_serialize_udf(image_mode: str = IMAGE_MODE_PLACEHOLDER):
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def serialize_markdown_udf(spans: pd.Series) -> pd.Series:
        return serialize_batch(spans, image_mode)

    return serialize_markdown_udf


def artifacts_manifest(docs):
    """REFERENCED mode's artifacts-dir analogue (reference:
    abc/abc.py:27-28 — Docling saves image files next to the markdown).
    A distributed job cannot drop files 'next to' each row, so the
    Spark-shaped contract is a MANIFEST relation: one row per image
    span of the extracted output, carrying the source ``media_ref`` and
    the deterministic ``artifact_path`` the markdown's ``![](...)``
    links resolve against once a downstream copier materializes the
    binaries. Pure narrow ops over the output spans — no shuffle."""
    from pyspark.sql import functions as F

    sp = docs.select(
        "doc_id", F.explode("spans").alias("s")
    ).filter((F.col("s.kind") == "image") & (F.col("s.media_ref") != ""))
    return sp.select(
        "doc_id",
        F.col("s.media_ref").alias("media_ref"),
        F.concat(F.lit("artifacts/"), F.col("doc_id"), F.lit("/"),
                 F.col("s.offset").cast("string")).alias("artifact_path"),
    )


def materialize_artifacts(manifest, media, base_dir: str):
    """The file-materialization half of REFERENCED mode (reference:
    abc/abc.py:27-28 + html_parser.py:62 — Docling writes the image
    binaries into an artifacts dir next to the markdown). Joins the
    :func:`artifacts_manifest` relation with a media table carrying the
    binaries (``ops.multimodal.MEDIA_SCHEMA``: doc_id, media_ref,
    content) and writes each artifact to ``base_dir/artifact_path``
    FROM THE EXECUTORS — one file per image span, exactly the
    reference's artifacts-dir layout, but distributed.

    -> (doc_id, media_ref, artifact_path, n_bytes, status) with status
    ``written``, ``missing`` (manifest row with no media bytes),
    ``unsafe_path`` (the path escapes ``base_dir`` — ``artifact_path``
    embeds the raw ``doc_id:string``, so a hostile id like ``../../x``
    or an absolute path would otherwise write outside the artifacts
    dir; the write is refused and surfaced as a row — the A4 posture:
    never throw, never silently lose) or ``io_error`` (the resolve /
    mkdir / write itself raised — a NUL byte in the id makes realpath
    raise ValueError, an overlong component makes open raise OSError;
    both become rows, not task failures).

    Scale notes: ``base_dir`` must be a shared filesystem / object
    store mount (on a cluster each task writes its own partition's
    files, no driver funnel); the join is media_ref-keyed with the
    binaries on the probe side only. The inner per-row loop is file
    IO, not data transformation — there is nothing to vectorize.
    """
    import os

    import pandas as pd

    joined = manifest.join(
        media.select("doc_id", "media_ref", "content"),
        ["doc_id", "media_ref"], "left")
    out_schema = ("doc_id string, media_ref string, artifact_path string, "
                  "n_bytes long, status string")

    def run(batches):
        root = None  # resolved lazily on the executor
        for pdf in batches:
            if pdf.empty:
                continue
            if root is None:
                os.makedirs(base_dir, exist_ok=True)
                root = os.path.realpath(base_dir)
            n_bytes, status = [], []
            for path, content in zip(pdf["artifact_path"], pdf["content"]):
                if content is None:
                    n_bytes.append(0)
                    status.append("missing")
                    continue
                # doc_id is embedded raw in artifact_path: resolve and
                # refuse anything landing outside base_dir ('..' or
                # absolute ids would traverse out of the artifacts dir)
                try:
                    full = os.path.realpath(os.path.join(root, path))
                    if not full.startswith(root + os.sep):
                        n_bytes.append(0)
                        status.append("unsafe_path")
                        continue
                    os.makedirs(os.path.dirname(full), exist_ok=True)
                    with open(full, "wb") as fh:
                        fh.write(bytes(content))
                except (ValueError, OSError):
                    # NUL-byte ids (ValueError from realpath/open) and
                    # overlong paths (OSError) surface as rows (A4)
                    n_bytes.append(0)
                    status.append("io_error")
                    continue
                n_bytes.append(len(content))
                status.append("written")
            yield pd.DataFrame({
                "doc_id": pdf["doc_id"].astype(str),
                "media_ref": pdf["media_ref"],
                "artifact_path": pdf["artifact_path"],
                "n_bytes": pd.Series(n_bytes, dtype="int64"),
                "status": status,
            })

    return joined.mapInPandas(run, schema=out_schema)
