"""VLM full-page PDF parse branch (SURVEY §2 — the reference's second,
distinct PDF parser: pdf_parser_vlm.py:100-135).

Semantics reproduced (deliberately different from the layout branch):

* the WHOLE document goes through the VLM in one conversion — there is
  no per-item cleaning walk in the reference's VLM parser (no
  ``clean_text``/``to_utf8`` loop), so text passes through verbatim;
* pages become one markdown block each, separated by page-break spans;
* ``raises_on_error=True`` (pdf_parser_vlm.py:109): any malformed line
  fails the WHOLE conversion -> one parse-failure row for the doc (the
  never-throw A4 restatement of the per-request HTTP error);
* the empty-markdown guard (pdf_parser_vlm.py:112-113): a conversion
  yielding only blank text emits nothing -> status 'empty' (P4).

The VLM itself is an external service; the deterministic stand-in
joins each page's line texts in input order (the service defines its
own reading order — ours is the identity, fixed as the contract in
``refparser.pdf.parse_vlm_lines``, the golden oracle for this branch).
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from document_parser_spark.schema import FAIL_KIND


def parse_vlm_batch(doc_ids: np.ndarray, spans_col) -> pd.DataFrame:
    """Batch of (doc_id, pdf-only spans) -> PARSED_SCHEMA rows."""
    from document_parser_spark.refparser.pdf import parse_vlm_lines

    out = {"doc_id": [], "ord0": [], "ord1": [], "kind": [], "text": [],
           "media_ref": []}
    for i, spans in enumerate(spans_col):
        anchor = None
        payloads = []
        for sp in spans:
            off = sp["offset"]
            # NULL offsets never anchor (mixed NULL/non-NULL must not
            # throw — A4 never-throw posture; same fix as the layout
            # kernel's anchor scan in pdf_parse.parse_pdf_batch)
            if off is not None and (anchor is None or off < anchor):
                anchor = off
            payloads.append(sp["text"] or "")
        anchor = int(anchor) if anchor is not None else 0
        blocks, failed = parse_vlm_lines(payloads)
        if failed:
            out["doc_id"].append(doc_ids[i])
            out["ord0"].append(anchor)
            out["ord1"].append(-1)
            out["kind"].append(FAIL_KIND)
            out["text"].append(None)
            out["media_ref"].append(None)
            continue
        for j, (kind, text, media) in enumerate(blocks):
            out["doc_id"].append(doc_ids[i])
            out["ord0"].append(anchor)
            out["ord1"].append(j)
            out["kind"].append(kind)
            out["text"].append(text)
            out["media_ref"].append(media)
    return pd.DataFrame(out)


def pdf_vlm_branch(docs_df):
    """Spark stage: (doc_id, spans pruned to pdf_line) -> PARSED_SCHEMA
    rows via the whole-doc VLM conversion stub."""
    from document_parser_spark.schema import PARSED_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = parse_vlm_batch(pdf["doc_id"].to_numpy(), pdf["spans"])
            if len(res):
                res["ord0"] = res["ord0"].astype("int32")
                res["ord1"] = res["ord1"].astype("int32")
                yield res

    return docs_df.mapInPandas(run, schema=PARSED_SCHEMA)
