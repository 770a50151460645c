"""Direct parity of the production HTML batch kernel
(``operators.html_parse.parse_html_rows``) against the pure-Python
oracle (``refparser.html.parse_html``) on HOSTILE-NESTING tag soup —
the structures real web pages are full of but well-formed fixtures
never exercise.

Round-5 soak history: a 30k-doc random-DOM soak found 4,431/30,000
divergences, reduced to 0/120,000 by four emitter fixes (each pinned
below): link context must reset at block boundaries; non-li children
of an open list are invisible subtrees; table cells must be DIRECT
children of the open tr; a block interrupting a run from inside an
open inline element flushes as plain text (li excepted only for
direct children); a DIRECT li-child <br> adds no space.
"""

from __future__ import annotations

import random

import pandas as pd
import pytest

from document_parser_spark.operators.html_parse import parse_html_rows
from document_parser_spark.refparser.html import parse_html


def _got(doc: str):
    df = parse_html_rows(pd.Series([doc], dtype="object"))
    return [(r.kind, r.text, r.media_ref) for r in df.itertuples()]


# each case: minimal repro shrunk from a failing random-DOM doc
REPROS = [
    # link context resets at block boundaries (oracle _walk ->
    # _gather_inline(node, False)); heading inside unclosed <a> kept
    "<a style='x'><h1>p",
    "<a href='/x'><td class=nav>c",
    "<a data-x='1'><blockquote id=main>/",
    "<a>x<div>y</div>z</a>",
    # non-li children of an open list are skipped subtrees
    # (oracle _emit_list)
    "<ul class=nav><blockquote style='x'>p",
    "<ul class=nav><h3>/",
    # cells are DIRECT children of the OPEN tr (oracle find_rows)
    "<table><tr style='x'></tr><td>",
    "<table><tr style='x'><section src=i.png><th style='x'>",
    "<table class=nav><tr class=nav><em data-x='1'><th class=nav>",
    # stray td between rows is a transparent row container
    "<table><td><tr><td>x</td></tr></td></table>",
    # block interrupting from INSIDE an inline flushes "text",
    # not "list_item" (oracle _gather_inline vs _emit_list)
    "<ul href='/x'><li data-x='1'><span style='x'>h<td>",
    "<ul class=nav><li style='x'><code class=nav>l<img src=i.png/>",
    "<li>x<span>y<td>z</td>w</span>v</li>",
    # DIRECT li-child <br> adds no space (oracle routes it through
    # _gather_inline(br) = empty children); inline-nested br does
    "<ul src=i.png><li>h<br id=main/>/",
    "<ul><li>a<span>x<br/>y</span></li></ul>",
    # list DEPTH restarts at 0 unless the ul/ol is a DIRECT child of
    # a list li or another ul/ol (oracle: any other route re-enters
    # through _walk -> _emit_list(node, 0)); counting open list
    # containers overstated '<li><b><ul>' shapes
    "<ul><li><b><ul><li>x</li></ul></b></li></ul>",
    "<ul><li><code><ul><li>x</li></ul></code></li></ul>",
    "<ul><li><div><ul><li>x</li></ul></div></li></ul>",
    "<ul><li><div><li><ul><li>x</li></ul></li></div></li></ul>",
    "<ul><li><ul><li>x</li></ul></li></ul>",      # direct: depth 1
    "<ul><li><ul><ul><li>x</li></ul></ul></li></ul>",  # chain: depth 2
    "<div><li><ul><li>x</li></ul></li></div>",    # stray li: depth 0
    # well-formed sanity alongside
    "<body><ul><li>one</li><li>two <a href=x>link</a></li></ul></body>",
    "<table><thead><tr><th>h</th></tr></thead>"
    "<tbody><tr><td>x</td></tr></tbody></table>",
    "<table><tr><td>out<table><tr><td>in</td></tr></table></td></tr></table>",
]


@pytest.mark.parametrize("doc", REPROS)
def test_hostile_nesting_parity(doc):
    assert _got(doc) == parse_html(doc), doc


_TEXTS = ["alpha beta gamma delta content here", "x", "é ©", "",
          "longer sentence with many plain words to lift text density "
          "score above the boilerplate line for sure",
          "click here", "home | about | contact", "/uni0041 �",
          "price: $9.99!", "      ", "a​b",
          "<!-- note -- >", "-- >", "tail <b cut"]
_ATTRS = ["", " class=nav", " id=main", " href='/x'", " src=i.png",
          " style='x'", " data-x='1'", " data-src=lazy.png",
          " src=a src=b", " alt='src=q'"]
_TAGS = ["div", "p", "span", "a", "ul", "li", "table", "tr", "td", "th",
         "h1", "h2", "h3", "pre", "code", "blockquote", "img", "br",
         "script", "style", "nav", "footer", "header", "aside",
         "section", "article", "b", "i", "em"]


def _rand_node(rng: random.Random, depth: int) -> str:
    if depth > 4 or rng.random() < 0.35:
        return rng.choice(_TEXTS)
    tag = rng.choice(_TAGS)
    if tag in ("img", "br"):
        return f"<{tag}{rng.choice(_ATTRS)}/>"
    kids = "".join(_rand_node(rng, depth + 1)
                   for _ in range(rng.randint(0, 4)))
    return f"<{tag}{rng.choice(_ATTRS)}>{kids}</{tag}>"


def _rand_doc(rng: random.Random) -> str:
    body = "".join(_rand_node(rng, 0) for _ in range(rng.randint(1, 6)))
    return rng.choice([f"<html><body>{body}</body></html>", body,
                       f"<body>{body}", f"{body}</bogus>"])


def test_random_dom_soak_parity():
    """Seeded 1,500-doc mini-soak of the full 120k round-5 protocol —
    unbalanced tags, blocks-in-inlines, lists/tables with invalid
    children, CDATA islands."""
    rng = random.Random(20260820)
    docs = [_rand_doc(rng) for _ in range(1500)]
    got_df = parse_html_rows(pd.Series(docs, dtype="object"))
    by_row: dict[int, list] = {}
    for r in got_df.itertuples():
        by_row.setdefault(r.row, []).append((r.kind, r.text, r.media_ref))
    for i, doc in enumerate(docs):
        assert by_row.get(i, []) == parse_html(doc), doc[:200]
