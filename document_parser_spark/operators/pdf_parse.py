"""Batched PDF layout parsing for Spark (`mapInPandas` over whole documents).

PDF reading order is a *document-level* computation (lines re-sort across the
whole page), so this branch consumes unexploded ``(doc_id, spans)`` rows with
spans pre-pruned to ``pdf_line`` — avoiding a per-span explode+regroup shuffle
for the PDF family entirely. Inside the batch:
  - coordinate parsing is vectorized with pandas ``.str`` ops over every line
    of every doc at once (``"<page>;<x0>;<y0>;<x1>;<y1>|<text>"``);
  - text cleaning is vectorized over all lines at once;
  - per-(doc, page) column split / y-gap clustering / reading-order sort run
    on small numpy slices (tens of lines each).

Reference parity: reproduces Docling's page->block->line grouping behavior
(pdf_parser.py:31-43) as specified by refparser.pdf; thresholds in config.py.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd

from document_parser_spark.config import COLUMN_GAP_FRACTION, Y_GAP_FACTOR
from document_parser_spark.functions.cleaning import clean_and_fix_series
from document_parser_spark.schema import FAIL_KIND


def _split_columns_np(x0: np.ndarray, x1: np.ndarray) -> np.ndarray:
    """Column id (0/1) per line; all zeros when the page is single-column."""
    xs = np.unique(x0)
    if len(xs) < 2:
        return np.zeros(len(x0), dtype=np.int8)
    extent = x1.max() - xs.min()
    if extent <= 0:
        return np.zeros(len(x0), dtype=np.int8)
    gaps = np.diff(xs)
    gi = int(np.argmax(gaps))
    if gaps[gi] <= COLUMN_GAP_FRACTION * extent:
        return np.zeros(len(x0), dtype=np.int8)
    split = (xs[gi] + xs[gi + 1]) / 2.0
    return (x0 >= split).astype(np.int8)


def _median(a: np.ndarray) -> float:
    """statistics.median parity (average of the two middles for even n)."""
    return float(np.median(a)) if len(a) else 1.0


def parse_pdf_doc_lines(
    page: np.ndarray, x0: np.ndarray, y0: np.ndarray, x1: np.ndarray,
    y1: np.ndarray, clean_text: np.ndarray,
) -> list[tuple[str, str, str]]:
    """One document's valid lines -> ordered blocks (kind, text, media_ref),
    page_break spans included. clean_text is already cleaned+stripped."""
    out: list[tuple[str, str, str]] = []
    for pi, pg in enumerate(np.unique(page)):
        if pi > 0:
            out.append(("page_break", "", ""))
        sel = page == pg
        px0, px1 = x0[sel], x1[sel]
        py0, py1 = y0[sel], y1[sel]
        ptxt = clean_text[sel]
        heights = py1 - py0
        med = _median(heights)
        if med <= 0:
            med = 1.0
        cols = _split_columns_np(px0, px1)
        for col in (0, 1):
            m = cols == col
            if not m.any():
                continue
            order = np.lexsort((px0[m], -py1[m]))
            cy0, cy1 = py0[m][order], py1[m][order]
            ch = heights[m][order]
            ct = ptxt[m][order]
            # whitespace gap above each line vs the previous line's bottom
            new_block = np.ones(len(order), dtype=bool)
            if len(order) > 1:
                gaps = cy0[:-1] - cy1[1:]
                new_block[1:] = gaps > Y_GAP_FACTOR * med
            block_id = np.cumsum(new_block)
            for b in np.unique(block_id):
                bm = block_id == b
                texts = [t for t in ct[bm] if t]
                if not texts:
                    continue
                text = " ".join(texts)
                kind, media = "text", ""
                if int(bm.sum()) == 1:
                    h = float(ch[bm][0])
                    if h >= 2.0 * med:
                        kind, media = "heading", "h1"
                    elif h >= 1.5 * med:
                        kind, media = "heading", "h2"
                out.append((kind, text, media))
    return out


def parse_pdf_batch(doc_ids: np.ndarray, spans_col) -> pd.DataFrame:
    """Batch of (doc_id, pdf-only spans) -> parsed rows
    (doc_id, ord0, ord1, kind, text, media_ref) incl. __fail__ tallies."""
    rows_doc: list[int] = []
    payloads: list[str] = []
    anchors = np.empty(len(doc_ids), dtype=np.int64)
    for i, spans in enumerate(spans_col):
        anchor = None
        for sp in spans:
            off = sp["offset"]
            if anchor is None or off < anchor:
                anchor = off
            rows_doc.append(i)
            payloads.append(sp["text"] or "")
        anchors[i] = anchor if anchor is not None else 0

    out = {"doc_id": [], "ord0": [], "ord1": [], "kind": [], "text": [],
           "media_ref": []}
    if not payloads:
        return pd.DataFrame(out)

    s = pd.Series(payloads, dtype="object")
    parts = s.str.partition("|")
    has_sep = parts[1] == "|"
    coords = parts[0].str.split(";", expand=True)
    if coords.shape[1] < 5:
        for k in range(coords.shape[1], 5):
            coords[k] = None
    nums = coords[[0, 1, 2, 3, 4]].apply(pd.to_numeric, errors="coerce")
    # exactly five integer fields and the | separator
    valid = has_sep & nums.notna().all(axis=1)
    if coords.shape[1] > 5:
        valid &= coords[list(range(5, coords.shape[1]))].isna().all(axis=1)
    # reject floats / non-integer strings (reference regex-free int() parse)
    valid &= ~coords[[0, 1, 2, 3, 4]].apply(
        lambda c: c.str.contains(r"[^0-9+-]", na=True)).any(axis=1)
    # magnitude bound (grammar): accepted values must stay < 10^15 <
    # 2^53 — to_numeric falls back to float64 whenever any row in the
    # batch coerces to NaN, and an integer above 2^53 would round here
    # while the oracle's arbitrary-precision int() keeps it exact
    # (r4 ADVICE). Matches refparser.pdf's {1,15} digit cap.
    valid &= ~coords[[0, 1, 2, 3, 4]].apply(
        lambda c: c.str.replace(r"^[+-]", "", regex=True)
                   .str.len().gt(15)).any(axis=1)

    cleaned = clean_and_fix_series(parts[2]).str.strip().to_numpy()
    doc_arr = np.asarray(rows_doc)
    vmask = valid.to_numpy()

    for i in range(len(doc_ids)):
        dmask = doc_arr == i
        n_fail = int((dmask & ~vmask).sum())
        good = dmask & vmask
        blocks: list[tuple[str, str, str]] = []
        if good.any():
            blocks = parse_pdf_doc_lines(
                nums[0].to_numpy()[good], nums[1].to_numpy()[good],
                nums[2].to_numpy()[good], nums[3].to_numpy()[good],
                nums[4].to_numpy()[good], cleaned[good],
            )
        anchor = int(anchors[i])
        for j, (kind, text, media) in enumerate(blocks):
            out["doc_id"].append(doc_ids[i])
            out["ord0"].append(anchor)
            out["ord1"].append(j)
            out["kind"].append(kind)
            out["text"].append(text)
            out["media_ref"].append(media)
        for f in range(n_fail):
            out["doc_id"].append(doc_ids[i])
            out["ord0"].append(anchor)
            out["ord1"].append(-(f + 1))
            out["kind"].append(FAIL_KIND)
            out["text"].append(None)
            out["media_ref"].append(None)
    return pd.DataFrame(out)


def pdf_branch(docs_df):
    """Spark stage: (doc_id, spans pruned to pdf_line) -> PARSED_SCHEMA rows."""
    from document_parser_spark.schema import PARSED_SCHEMA

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            res = parse_pdf_batch(pdf["doc_id"].to_numpy(), pdf["spans"])
            if len(res):
                res["ord0"] = res["ord0"].astype("int32")
                res["ord1"] = res["ord1"].astype("int32")
                yield res

    return docs_df.mapInPandas(run, schema=PARSED_SCHEMA)
