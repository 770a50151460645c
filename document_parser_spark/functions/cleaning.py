"""Vectorized text-cleaning kernels (Spark side of SURVEY.md §2.8 F2,F4-F6).

Two tiers:
  - ``clean_series`` / ``fix_series``: pandas-vectorized batch kernels used
    inside every parse UDF (one Arrow batch crossing, C-speed string ops,
    Python fallback only for the rows that actually contain ``/uni`` escapes
    or mojibake lead bytes — measured <1% of real corpora).
  - ``clean_text_column``: a pure JVM built-in chain (two ``F.translate``
    calls) covering F5+F6 exactly, for pipelines that can prove their input
    has no ``/uni`` escapes / mojibake; kept whole-stage-codegen friendly.

Must stay bit-exact with refparser.textkernel (golden-tested).
"""

from __future__ import annotations

import re

import pandas as pd

from document_parser_spark.config import (
    INVISIBLE_CODEPOINTS,
    INVISIBLE_REPLACEMENT,
    MOJIBAKE_LEAD_HI,
    MOJIBAKE_LEAD_LO,
    REPLACEMENT_CHAR,
    REPLACEMENT_FIX,
    UNI_ESCAPE_PATTERN,
)
from document_parser_spark.refparser.textkernel import fix_text, unescape_uni

_INVISIBLE_TABLE = {ord(c): " " for c in INVISIBLE_CODEPOINTS}
_UNI_LIT = "/uni"
_MOJIBAKE_PAT = f"[{MOJIBAKE_LEAD_LO}-{MOJIBAKE_LEAD_HI}]"
_UNI_RE = re.compile(UNI_ESCAPE_PATTERN)


def clean_series(s: pd.Series) -> pd.Series:
    """clean_text over a string Series: /uniXXXX unescape, U+FFFD -> '.',
    invisible codepoints -> ' '. NaN-safe (left as NaN)."""
    s = s.astype("object")
    mask = s.notna()
    if not mask.any():
        return s
    vals = s[mask]
    # /uni unescape only where the literal appears (regex needs chr(), so it
    # stays Python — but only on the affected rows).
    uni_mask = vals.str.contains(_UNI_LIT, regex=False)
    if uni_mask.any():
        vals.loc[uni_mask] = vals[uni_mask].map(unescape_uni)
    vals = vals.str.replace(REPLACEMENT_CHAR, REPLACEMENT_FIX, regex=False)
    vals = vals.str.translate(_INVISIBLE_TABLE)
    out = s.copy()
    out[mask] = vals
    return out


def fix_series(s: pd.Series) -> pd.Series:
    """to_utf8/fix_text over a string Series: mojibake repair only on rows
    carrying a UTF-8 lead byte signature."""
    s = s.astype("object")
    mask = s.notna()
    if not mask.any():
        return s
    vals = s[mask]
    moji = vals.str.contains(_MOJIBAKE_PAT, regex=True)
    if moji.any():
        vals = vals.copy()
        vals.loc[moji] = vals[moji].map(fix_text)
    out = s.copy()
    out[mask] = vals
    return out


def clean_and_fix_series(s: pd.Series) -> pd.Series:
    """Full kernel in reference call-site order (clean_text then to_utf8,
    pdf_parser.py:56-57)."""
    return fix_series(clean_series(s))


def collapse_series(s: pd.Series) -> pd.Series:
    """HTML whitespace collapse: runs of whitespace -> single space, strip."""
    return s.str.split().str.join(" ")


def clean_text_column(col):
    """JVM-only F5+F6: stays inside whole-stage codegen. Does NOT cover
    /uniXXXX or mojibake — pair with `needs_python_column` when unsure."""
    from pyspark.sql import functions as F

    return F.translate(
        F.translate(col, REPLACEMENT_CHAR, REPLACEMENT_FIX),
        INVISIBLE_CODEPOINTS,
        INVISIBLE_REPLACEMENT,
    )


def make_clean_udf():
    """Scalar pandas UDF for the full kernel (string -> string)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def clean_and_fix_udf(s: pd.Series) -> pd.Series:
        return clean_and_fix_series(s)

    return clean_and_fix_udf
