"""Deterministic synthetic corpus (seed-driven, no wall clock).

Two layers:
  1. ``fixture_docs()`` — the hand-built golden corpus (FIXTURES.md §3
     families); small, hand-inspectable, used by the pytest golden tests.
  2. ``generate_doc(idx, seed)`` / ``synth_dataframe(spark, n_docs)`` — the
     scale corpus: family mix with a seeded heavy-tail size distribution and
     a Zipf-ish host skew key, generated *distributed* (mapInPandas over
     ``spark.range``) so bench inputs never bottleneck on the driver. Content
     depends only on (seed, idx) — identical at any parallelism level.
"""

from __future__ import annotations

import numpy as np

from document_parser_spark.config import (
    GIANT_SIZE_BUCKET,
    INVISIBLE_CODEPOINTS,
    SALT_SPAN_THRESHOLD,
    SYNTH_SEED,
)

Span = tuple[str, str, str, int]  # (kind, text, media_ref, offset)

_WORDS = (
    "spark shuffle partition document span markdown heading table cluster "
    "column layout reading order block line page text image media extract "
    "pipeline lineage restart checkpoint salt skew broadcast vector batch "
    "arrow pandas kernel oracle golden fixture corpus token language quality "
    "dedup similarity search embedding cosine minhash simhash shingle"
).split()

_INVISIBLES_SAMPLE = "  ​　﻿­⁠"


def _rng(idx: int, stream: int = 0) -> np.random.RandomState:
    return np.random.RandomState((SYNTH_SEED * 1000003 + idx * 31 + stream)
                                 % (2**31 - 1))


def _sentence(rng: np.random.RandomState, n: int) -> str:
    return " ".join(_WORDS[i] for i in rng.randint(0, len(_WORDS), n))


def _paragraph(rng: np.random.RandomState) -> str:
    return _sentence(rng, int(rng.randint(8, 40)))


# ---------------------------------------------------------------------------
# Hand-built golden fixtures (FIXTURES.md §3)
# ---------------------------------------------------------------------------

_H_BASIC = """<html><head><title>T</title><style>p{color:red}</style></head><body>
<header><a href="/">logo</a></header>
<nav><ul><li><a href="/a">Home</a></li><li><a href="/b">Docs</a></li></ul></nav>
<h1>Extraction Engines</h1>
<p>Main content paragraph one, long enough to clearly pass every boilerplate
threshold in the classifier.</p>
<h2>Background</h2>
<p>Second paragraph with a single <a href="/ref">inline reference link</a> inside
a large amount of surrounding prose so link density stays low.</p>
<aside><a href="/x">ad one</a> <a href="/y">ad two</a></aside>
<div><a href="/p1">Prev</a> | <a href="/p2">Next</a></div>
<footer>Copyright 2026 — contact admin.</footer>
</body></html>"""

_HS_STRUCT = """<body>
<h1>Structures</h1>
<ol><li>first step</li><li>second step<ol><li>nested step</li></ol></li></ol>
<ul><li>bullet alpha</li><li>bullet beta</li></ul>
<table><thead><tr><th>name</th><th>value</th></tr></thead>
<tbody><tr><td>rows</td><td>42</td></tr><tr><td>cols, extra</td><td>7</td></tr></tbody></table>
<pre><code>def f(x):
    return x + 1</code></pre>
<p>Trailing paragraph after all of the structured content blocks here.</p>
</body>"""

# Built programmatically so ALL 23 invisible codepoints are exercised.
_HD_DIRTY = (
    "<body><h1>Dirty/uni0020text</h1>"
    "<p>inv[" + INVISIBLE_CODEPOINTS + "]end of the invisible run with enough trailing words.</p>"
    "<p>escape /uni0416 and bad /uniZZZZ stays, replacement \ufffd dot; "
    "mojibake \u00d0\u00bf\u00d1\u20ac\u00d0\u00b8\u00d0\u00b2\u00d0\u00b5\u00d1\u201a here.</p></body>"
)

_HM_MALFORMED = """<body><p>Unclosed paragraph that keeps going with plenty of words
<div>stray close ahead</wrong></div></p></li><p>Second block fine and long enough.</p>"""


def _pdf_line(page: int, x0: int, y0: int, x1: int, y1: int, text: str) -> str:
    return f"{page};{x0};{y0};{x1};{y1}|{text}"


def _pdf_single() -> list[str]:
    # one page, 3 blocks separated by large y gaps; title line double height
    lines = [_pdf_line(1, 7200, 76000, 40000, 78400, "Single Page Title")]
    y = 71000  # gap below the title (76000-72200=3800) > 1.8 × median height
    for b in range(3):
        for i in range(4):
            lines.append(_pdf_line(1, 7200, y, 50000, y + 1200,
                                   f"block {b} line {i} body text"))
            y -= 1700  # small gap: same block
        y -= 4000  # large gap: new block
    return lines


def _pdf_multi() -> list[str]:
    lines = []
    for page in (1, 2, 3):
        ys = [70000, 68300, 66600]
        order = [2, 0, 1]  # offsets deliberately out of y-order
        for i in order:
            lines.append(_pdf_line(page, 7200, ys[i], 50000, ys[i] + 1200,
                                   f"page {page} line {i}"))
    return lines


def _pdf_two_col() -> list[str]:
    lines = []
    for i in range(4):
        y = 70000 - i * 1700
        lines.append(_pdf_line(1, 7200, y, 28000, y + 1200, f"left col line {i}"))
    for i in range(4):
        y = 70000 - i * 1700
        lines.append(_pdf_line(1, 34000, y, 55000, y + 1200, f"right col line {i}"))
    return lines


def fixture_docs() -> list[tuple[str, list[Span]]]:
    """The golden corpus: ~20 deterministic documents across all families."""
    docs: list[tuple[str, list[Span]]] = []

    docs.append(("h-0001", [("html", _H_BASIC, "", 0)]))
    docs.append(("h-0002", [("html", "<body><p>Fragment one long enough to keep.</p>", "", 0),
                            ("html", "<body><p>Fragment two also long enough.</p>", "", 1)]))
    docs.append(("hs-0001", [("html", _HS_STRUCT, "", 0)]))
    docs.append(("hd-0001", [("html", _HD_DIRTY, "", 0)]))
    docs.append(("hm-0001", [("html", _HM_MALFORMED, "", 0)]))
    docs.append(("hm-0002", [("html", "<body><div>  </div></body>", "", 0)]))

    docs.append(("p-0001", [("pdf_line", t, "", i) for i, t in enumerate(_pdf_single())]))
    docs.append(("pm-0001", [("pdf_line", t, "", i) for i, t in enumerate(_pdf_multi())]))
    docs.append(("pc-0001", [("pdf_line", t, "", i) for i, t in enumerate(_pdf_two_col())]))
    docs.append(("pm-0002", [("pdf_line", "1;100;100;200;200", "", 0),      # malformed: no |
                             ("pdf_line", "1;a;b;c;d|bad coords", "", 1),   # malformed ints
                             ("pdf_line", _pdf_line(1, 7200, 70000, 30000, 71200,
                                                    "good line"), "", 2)]))

    docs.append(("m-0001", [("text", "Intro paragraph before the first image.", "", 0),
                            ("image", "", "img://0001", 1),
                            ("text", "Middle text between two distinct images.", "", 2),
                            ("image", "", "img://0002", 3),
                            ("text", "Closing paragraph after both images.", "", 4)]))
    docs.append(("t-0001", [("text", "Plain text span one.", "", 0),
                            ("text", "  ", "", 1),
                            ("text", "Plain text/uni0021 span � two.", "", 2)]))
    # DocParser-path fixtures (F3 asymmetry, docx_parser.py:43-49):
    # decomposed sequences NFC-compose in docx TEXT items only; mojibake
    # in docx TABLE cells stays (no to_utf8), while the generic "table"
    # kind (pptx/xlsx mapping) repairs it.
    docs.append(("dx-0001", [
        ("docx", "Cafe\u0301 paragraph with de\u0301composed"
                 " se\u0301quences A\u030a long enough to keep.", "", 0),
        ("docx_table", "ce\u0301ll stays decomposed\x1fmojibake"
                       " \u00c3\u00a9 stays"
                       "\x1ecell three\x1fplain /uni0041 cell", "", 1),
        ("docx", "second docx paragraph with /uni0416 escape and"
                 " \ufffd replacement.", "", 2),
        ("docx", "   ", "", 3)]))           # blank docx item -> dropped
    docs.append(("tb-0001", [
        ("text", "Intro text before the generic table span.", "", 0),
        ("table", "he\u0301ad stays decomposed\x1fmojibake"
                  " \u00c3\u00a9 fixed"
                  "\x1erow value\x1fplain cell", "", 1),
        ("image", "", "img://tb-1", 2)]))
    docs.append(("u-0001", [("wav", "RIFF....", "media://a", 0),
                            ("text", "Good span in a doc with a bad one.", "", 1)]))
    docs.append(("u-0002", [("wav", "RIFF....", "media://b", 0)]))
    docs.append(("e-0001", [("text", "   ", "", 0)]))  # -> status "empty"
    return docs


# ---------------------------------------------------------------------------
# Scale corpus (distributed, seeded)
# ---------------------------------------------------------------------------

# family mix: (kind of doc, weight)
_FAMILIES = ("html", "pdf", "mixed", "text")
_FAMILY_P = (0.45, 0.25, 0.15, 0.15)


def _gen_html(rng: np.random.RandomState, size: int) -> str:
    parts = ["<html><body>",
             "<nav><ul>"]
    for i in range(int(rng.randint(3, 8))):
        parts.append(f'<li><a href="/n{i}">{_sentence(rng, 1)}</a></li>')
    parts.append("</ul></nav>")
    parts.append(f"<h1>{_sentence(rng, int(rng.randint(2, 6)))}</h1>")
    for _ in range(size):
        r = rng.rand()
        if r < 0.70:
            parts.append(f"<p>{_paragraph(rng)}</p>")
        elif r < 0.80:
            parts.append(f"<h2>{_sentence(rng, 3)}</h2>")
        elif r < 0.88:
            items = "".join(f"<li>{_sentence(rng, int(rng.randint(2, 7)))}</li>"
                            for _ in range(int(rng.randint(2, 6))))
            parts.append(f"<ul>{items}</ul>")
        elif r < 0.94:
            rows = []
            ncol = int(rng.randint(2, 5))
            for _ in range(int(rng.randint(2, 6))):
                rows.append("<tr>" + "".join(
                    f"<td>{_sentence(rng, 2)}</td>" for _ in range(ncol)) + "</tr>")
            parts.append("<table>" + "".join(rows) + "</table>")
        else:
            parts.append(f"<pre><code>{_sentence(rng, 6)}</code></pre>")
    parts.append(f'<footer><a href="/f">{_sentence(rng, 2)}</a></footer>')
    parts.append("</body></html>")
    return "".join(parts)


def _gen_pdf_spans(rng: np.random.RandomState, size: int) -> list[str]:
    lines, n_pages = [], max(1, size // 12)
    for page in range(1, n_pages + 1):
        y = 76000
        for _ in range(int(rng.randint(2, 6))):       # blocks per page
            for _ in range(int(rng.randint(2, 6))):   # lines per block
                lines.append(_pdf_line(page, 7200, y, 50000, y + 1200,
                                       _sentence(rng, int(rng.randint(4, 10)))))
                y -= 1700
            y -= 4000
    return lines


def generate_doc(idx: int) -> tuple[str, list[Span], str, str]:
    """Deterministic (seeded by idx alone) -> (doc_id, spans, host, bucket)."""
    rng = _rng(idx)
    fam = _FAMILIES[int(rng.choice(len(_FAMILIES), p=_FAMILY_P))]
    # heavy-tail size (Pareto) and Zipf-ish host skew
    size = int(min(3 + rng.pareto(1.3) * 6, 400))
    host = f"host{min(int(rng.zipf(1.5)) - 1, 49):03d}"
    bucket = "s" if size < 8 else "m" if size < 30 else "l" if size < 120 else "xl"
    doc_id = f"{fam[0]}x-{idx:09d}"

    spans: list[Span] = []
    if fam == "html":
        spans.append(("html", _gen_html(rng, size), "", 0))
    elif fam == "pdf":
        spans = [("pdf_line", t, "", i)
                 for i, t in enumerate(_gen_pdf_spans(rng, size))]
    elif fam == "mixed":
        off = 0
        for _ in range(max(2, size // 2)):
            if rng.rand() < 0.3:
                spans.append(("image", "", f"img://{idx}-{off}", off))
            else:
                txt = _paragraph(rng)
                if rng.rand() < 0.1:  # dirty text
                    txt += _INVISIBLES_SAMPLE + "/uni0416�"
                spans.append(("text", txt, "", off))
            off += 1
    else:
        spans = [("text", _paragraph(rng), "", i) for i in range(max(1, size))]
    # honest giant flag (unreachable at the current 400-span cap, but the
    # rule must exist wherever size_bucket is produced — r2 ADVICE): span
    # count or payload bytes above the salting threshold -> 'g'
    if (len(spans) > SALT_SPAN_THRESHOLD
            or sum(len(t) for _, t, _, _ in spans)
            > SALT_SPAN_THRESHOLD * 200):
        bucket = GIANT_SIZE_BUCKET
    return doc_id, spans, host, bucket


def synth_dataframe(spark, n_docs: int, partitions: int | None = None):
    """Distributed deterministic corpus as a DataFrame with the canonical
    input schema. Content is a pure function of row index — identical for any
    partitioning/parallelism (required by the two-cluster-size bench)."""
    import pandas as pd

    from document_parser_spark.schema import DOCUMENTS_IN_SCHEMA

    base = spark.range(0, n_docs, 1, partitions or spark.sparkContext.defaultParallelism)

    def gen(batches):
        for pdf in batches:
            rows = [generate_doc(int(i)) for i in pdf["id"]]
            yield pd.DataFrame({
                "doc_id": [r[0] for r in rows],
                "spans": [[{"kind": k, "text": t, "media_ref": m, "offset": o}
                           for k, t, m, o in r[1]] for r in rows],
                "host": [r[2] for r in rows],
                "size_bucket": [r[3] for r in rows],
            })

    return base.mapInPandas(gen, schema=DOCUMENTS_IN_SCHEMA)


def fixtures_dataframe(spark):
    """The golden corpus as a DataFrame (for end-to-end parity tests)."""
    from document_parser_spark.schema import DOCUMENTS_IN_SCHEMA

    rows = [
        (doc_id,
         [{"kind": k, "text": t, "media_ref": m, "offset": o}
          for k, t, m, o in spans],
         "fixture", "s")
        for doc_id, spans in fixture_docs()
    ]
    return spark.createDataFrame(rows, schema=DOCUMENTS_IN_SCHEMA)
