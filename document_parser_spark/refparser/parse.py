"""Per-document oracle: input span sequence -> (output spans, markdown,
status, n_failures). This is the single-document "reference parser" the Spark
pipeline is golden-tested against (BASELINE.json input_hint per-row invariant:
span-sequence equality (kind, text, media_ref, order)).

Dispatch parity with ParserFactory (app/modules/parser/abc/factory.py:23-66):
each input kind routes to its parser; unsupported kinds raise the reference's
ContentNotSupportedError analogue -> a parse-failure tally, never a throw
(image_parser.py:164-169 converts errors to empty output).

Ordering contract (FIXTURES.md §4):
  - html spans expand to blocks at the span's input offset, in DOM order;
  - ALL pdf_line spans of a doc are laid out together (page/column/block
    reading order), anchored at the first pdf_line span's offset;
  - text / image spans stay at their input offset;
  - output offsets renumbered 0..n-1.
"""

from __future__ import annotations

from dataclasses import dataclass

from document_parser_spark.config import (
    IMAGE_MODE_PLACEHOLDER,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_FAILURE,
)
from document_parser_spark.refparser.html import parse_html
from document_parser_spark.refparser.pdf import parse_pdf_lines
from document_parser_spark.refparser.serialize import serialize_markdown
from document_parser_spark.refparser.textkernel import (
    clean_and_fix,
    clean_table_payload,
    docx_clean_and_fix,
)


@dataclass
class ParsedDoc:
    doc_id: str
    spans: list[tuple[str, str, str, int]]  # (kind, text, media_ref, offset)
    markdown: str
    status: str
    n_failures: int


def parse_document(
    doc_id: str,
    spans: list[tuple[str, str, str, int]],
    image_mode: str = IMAGE_MODE_PLACEHOLDER,
    pdf_vlm: bool = False,
) -> ParsedDoc:
    """spans: input (kind, text, media_ref, offset), any order; processed in
    offset order. ``pdf_vlm=True`` routes pdf_line spans through the VLM
    whole-doc parser contract instead of the layout pipeline (mirrors the
    reference's parser selection, pdf_parser_vlm.py)."""
    ordered = sorted(spans, key=lambda s: s[3])
    # (anchor_offset, sub_index, kind, text, media_ref)
    keyed: list[tuple[int, int, str, str, str]] = []
    failures = 0
    pdf_payloads: list[str] = []
    pdf_anchor: int | None = None

    for kind, text, media_ref, offset in ordered:
        # NULL-text contract (mirrors the Spark pipeline exactly): a
        # NULL payload behaves as the EMPTY payload for every kind —
        # text/docx hit the blank drop, html parses to zero blocks,
        # table cleans to an empty cell, and an empty pdf_line payload
        # is malformed (missing separator) -> a parse-failure tally.
        # The Spark arms pin the same rule (`sp["text"] or ""` in the
        # pdf batch, fillna("") in the table arms, coalesced blank
        # test in the JVM arm), so a NULL never raises and never
        # silently vanishes on either side.
        if text is None:
            text = ""
        if kind == "pdf_line":
            if pdf_anchor is None:
                pdf_anchor = offset
            pdf_payloads.append(text)
        elif kind == "text":
            cleaned = clean_and_fix(text)
            if cleaned.strip():
                keyed.append((offset, 0, "text", cleaned, ""))
        elif kind == "docx":
            # DocParser path: NFC first (docx_parser.py:43), then the
            # shared clean+to_utf8 chain
            cleaned = docx_clean_and_fix(text)
            if cleaned.strip():
                keyed.append((offset, 0, "text", cleaned, ""))
        elif kind == "docx_table":
            # DocParser cell asymmetry: clean_text only, NO to_utf8
            # (docx_parser.py:47-49)
            keyed.append((offset, 0, "table",
                          clean_table_payload(text, fix_cells=False), ""))
        elif kind == "table":
            # generic (pptx/xlsx/pdf/html) cell rule: clean + to_utf8
            # (pdf_parser.py:59-62, pptx_parser.py:52-59)
            keyed.append((offset, 0, "table",
                          clean_table_payload(text, fix_cells=True), ""))
        elif kind == "image":
            keyed.append((offset, 0, "image", "", media_ref or ""))
        elif kind == "html":
            for j, (k, t, m) in enumerate(parse_html(text)):
                keyed.append((offset, j, k, t, m))
        else:
            failures += 1

    if pdf_payloads:
        if pdf_vlm:
            from document_parser_spark.refparser.pdf import parse_vlm_lines
            blocks, pdf_fail = parse_vlm_lines(pdf_payloads)
        else:
            blocks, pdf_fail = parse_pdf_lines(pdf_payloads)
        failures += pdf_fail
        anchor = pdf_anchor if pdf_anchor is not None else 0
        for j, (k, t, m) in enumerate(blocks):
            keyed.append((anchor, j, k, t, m))

    keyed.sort(key=lambda r: (r[0], r[1]))
    out_spans = [(k, t, m, i) for i, (_, _, k, t, m) in enumerate(keyed)]
    markdown = serialize_markdown([(k, t, m) for k, t, m, _ in out_spans],
                                  image_mode)
    if failures:
        status = STATUS_PARSE_FAILURE
    elif not out_spans:
        status = STATUS_EMPTY
    else:
        status = STATUS_OK
    return ParsedDoc(doc_id, out_spans, markdown, status, failures)
