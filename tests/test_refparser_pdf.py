"""Oracle PDF layout tests (FIXTURES.md p-/pm-/pc- families, §4.2 rules)."""

import pytest

from document_parser_spark.refparser.pdf import (
    PdfLineError,
    parse_line,
    parse_pdf_lines,
)
from document_parser_spark.sources.synth import (
    _pdf_line,
    _pdf_multi,
    _pdf_single,
    _pdf_two_col,
)


class TestParseLine:
    def test_roundtrip(self):
        assert parse_line("1;7200;70100;30950;71300|Hello") == \
            (1, 7200, 70100, 30950, 71300, "Hello")

    def test_pipe_in_text(self):
        assert parse_line("1;0;0;1;1|a|b")[5] == "a|b"

    @pytest.mark.parametrize("bad", ["1;2;3;4;5", "1;2;3|x", "a;b;c;d;e|x", ""])
    def test_malformed_raises(self, bad):
        with pytest.raises(PdfLineError):
            parse_line(bad)


class TestLayout:
    def test_single_page_blocks(self):
        blocks, fails = parse_pdf_lines(_pdf_single())
        assert fails == 0
        # title heading + 3 body blocks
        assert [b[0] for b in blocks] == ["heading", "text", "text", "text"]
        assert blocks[0][1] == "Single Page Title"
        assert blocks[1][1].startswith("block 0 line 0")

    def test_lines_joined_in_y_order(self):
        blocks, _ = parse_pdf_lines(_pdf_single())
        assert blocks[1][1] == ("block 0 line 0 body text block 0 line 1 body text "
                                "block 0 line 2 body text block 0 line 3 body text")

    def test_multi_page_breaks_and_resort(self):
        blocks, fails = parse_pdf_lines(_pdf_multi())
        assert fails == 0
        kinds = [b[0] for b in blocks]
        assert kinds == ["text", "page_break", "text", "page_break", "text"]
        # input offset order was [2,0,1] but y-order restores 0,1,2
        assert blocks[0][1] == "page 1 line 0 page 1 line 1 page 1 line 2"

    def test_two_columns_left_first(self):
        blocks, _ = parse_pdf_lines(_pdf_two_col())
        assert len(blocks) == 2
        assert blocks[0][1].startswith("left col line 0")
        assert blocks[1][1].startswith("right col line 0")

    def test_malformed_lines_tallied_not_thrown(self):
        payloads = ["1;100;100;200;200", "1;a;b;c;d|bad",
                    _pdf_line(1, 0, 0, 100, 1200, "ok line")]
        blocks, fails = parse_pdf_lines(payloads)
        assert fails == 2
        assert [b[1] for b in blocks] == ["ok line"]

    def test_empty(self):
        assert parse_pdf_lines([]) == ([], 0)

    def test_single_line_no_column_split(self):
        blocks, _ = parse_pdf_lines([_pdf_line(1, 0, 0, 10, 1200, "only")])
        assert len(blocks) == 1

    def test_heading_from_line_height(self):
        payloads = [
            _pdf_line(1, 0, 76000, 100, 78400, "Big Title"),      # 2x height
            _pdf_line(1, 0, 70000, 100, 71200, "body one"),
            _pdf_line(1, 0, 68300, 100, 69500, "body two"),
            _pdf_line(1, 0, 66600, 100, 67800, "body three"),
        ]
        blocks, _ = parse_pdf_lines(payloads)
        assert blocks[0] == ("heading", "Big Title", "h1")
        assert blocks[1][0] == "text"
