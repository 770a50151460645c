"""Oracle HTML extractor tests (FIXTURES.md h-/hs-/hd-/hm- families)."""

from document_parser_spark.config import CELL_SEP, ROW_SEP
from document_parser_spark.refparser.html import parse_html


def kinds(blocks):
    return [b[0] for b in blocks]


class TestBoilerplate:
    def test_nav_footer_aside_dropped(self):
        html = """<body><nav><a href=x>Home</a></nav>
        <p>Real content paragraph that is plenty long to keep here.</p>
        <aside><a href=y>ad</a></aside><footer>fine print</footer></body>"""
        blocks = parse_html(html)
        assert len(blocks) == 1
        assert blocks[0][0] == "text"
        assert "Real content" in blocks[0][1]

    def test_link_density_drop(self):
        html = """<body>
        <div><a href=a>Previous page</a> | <a href=b>Next page</a></div>
        <p>Normal paragraph with plenty of words and no links whatsoever here.</p>
        </body>"""
        blocks = parse_html(html)
        assert len(blocks) == 1
        assert "Normal paragraph" in blocks[0][1]

    def test_short_linked_block_drop(self):
        blocks = parse_html("<body><p><a href=a>tiny</a> x</p></body>")
        assert blocks == []

    def test_low_link_density_kept(self):
        html = ("<body><p>A paragraph with one <a href=r>link</a> inside a "
                "large amount of surrounding prose text here.</p></body>")
        blocks = parse_html(html)
        assert len(blocks) == 1
        assert "link" in blocks[0][1]

    def test_script_style_gone(self):
        html = "<body><script>var x=1;</script><style>p{}</style><p>Keep this sentence which is long enough.</p></body>"
        blocks = parse_html(html)
        assert len(blocks) == 1
        assert "var x" not in blocks[0][1]


class TestStructures:
    def test_headings_levels(self):
        blocks = parse_html("<body><h1>One</h1><h3>Three deep heading</h3></body>")
        assert blocks == [("heading", "One", "h1"),
                          ("heading", "Three deep heading", "h3")]

    def test_nested_lists(self):
        html = "<body><ul><li>a</li><li>b<ul><li>c</li></ul></li></ul></body>"
        blocks = parse_html(html)
        assert blocks == [("list_item", "a", "li:u:0"),
                          ("list_item", "b", "li:u:0"),
                          ("list_item", "c", "li:u:1")]

    def test_ordered_list_marker(self):
        blocks = parse_html("<body><ol><li>first</li></ol></body>")
        assert blocks == [("list_item", "first", "li:o:0")]

    def test_table_cells_and_rows(self):
        html = ("<body><table><tr><th>h1</th><th>h2</th></tr>"
                "<tr><td>a</td><td>b</td></tr></table></body>")
        blocks = parse_html(html)
        assert len(blocks) == 1
        kind, text, _ = blocks[0]
        assert kind == "table"
        assert text == f"h1{CELL_SEP}h2{ROW_SEP}a{CELL_SEP}b"

    def test_table_with_thead_tbody(self):
        html = ("<body><table><thead><tr><th>x</th></tr></thead>"
                "<tbody><tr><td>y</td></tr></tbody></table></body>")
        assert parse_html(html)[0][1] == f"x{ROW_SEP}y"

    def test_code_fence_preserves_newlines(self):
        html = "<body><pre><code>def f():\n    return 1</code></pre></body>"
        blocks = parse_html(html)
        assert blocks == [("code", "def f():\n    return 1", "")]

    def test_image_src_preserved(self):
        blocks = parse_html('<body><img src="img://55"/></body>')
        assert blocks == [("image", "", "img://55")]

    def test_image_interrupts_paragraph(self):
        html = ('<body><p>Before the image there is quite a lot of text.'
                '<img src="i"/>After the image there is also plenty of text.</p></body>')
        blocks = parse_html(html)
        assert kinds(blocks) == ["text", "image", "text"]


class TestOrderAndRobustness:
    def test_document_order(self):
        html = ("<body><h1>T</h1><p>First paragraph is long enough to keep.</p>"
                "<ul><li>item</li></ul><p>Second paragraph is long enough too.</p></body>")
        blocks = parse_html(html)
        assert kinds(blocks) == ["heading", "text", "list_item", "text"]

    def test_entities_decoded(self):
        blocks = parse_html("<body><h2>Fish &amp; Chips &#x416;</h2></body>")
        assert blocks[0][1] == "Fish & Chips Ж"

    def test_malformed_no_throw(self):
        blocks = parse_html("<body><p>Unclosed but long enough to keep around"
                            "<div>stray</wrong></div></p></li>")
        assert any("Unclosed" in b[1] for b in blocks)

    def test_empty_input(self):
        assert parse_html("") == []
        assert parse_html("<body><div>  </div></body>") == []

    def test_whitespace_collapsed(self):
        blocks = parse_html("<body><p>a\n   b\t\tc and then enough words to keep it</p></body>")
        assert blocks[0][1].startswith("a b c")

    def test_cleaning_applied(self):
        blocks = parse_html("<body><p>escape /uni0416 plus replacement � "
                            "and enough words to keep</p></body>")
        assert "Ж" in blocks[0][1] and "." in blocks[0][1]
