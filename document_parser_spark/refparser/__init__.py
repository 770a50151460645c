"""Pure-Python reference-parity oracle (the correctness contract)."""

from document_parser_spark.refparser.parse import ParsedDoc, parse_document
from document_parser_spark.refparser.textkernel import (
    clean_and_fix, clean_text, fix_text, normalize_nfc, unescape_uni,
)

__all__ = [
    "ParsedDoc", "parse_document", "clean_and_fix", "clean_text",
    "fix_text", "normalize_nfc", "unescape_uni",
]
