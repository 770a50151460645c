"""Ingest-time byte decoding (SURVEY §2.8 F1 — the bytes branch of the
reference's ``to_utf8``, abc/abc.py:45-56).

The span table proper carries UTF-8 Spark strings; raw bytes exist only
upstream, when a corpus arrives as ``(doc_id, content: binary)``. This
module is that boundary: decode with the reference's three-step chain
(strict utf-8 -> detected codec -> ``errors='replace'``) and emit the
canonical one-span-per-doc input table that ``extract`` consumes.

Decoding is inherently per-value (the codec attempt chain cannot be
expressed columnar), so the pandas UDF maps the shared
``refparser.textkernel.to_utf8_bytes`` kernel over each Arrow batch —
one Python crossing per batch, C-speed codec work per row, and the
same function serves as its own oracle in tests.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from document_parser_spark.config import (
    GIANT_SIZE_BUCKET,
    SALT_SPAN_THRESHOLD,
)
from document_parser_spark.refparser.textkernel import to_utf8_bytes


def make_decode_udf():
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def decode_bytes_udf(raw: pd.Series) -> pd.Series:
        return raw.map(lambda b: None if b is None
                       else to_utf8_bytes(bytes(b)))

    return decode_bytes_udf


def ingest_raw_text(df: DataFrame, content_col: str = "content",
                    kind: str = "text") -> DataFrame:
    """(doc_id, content: binary, ...) -> canonical span-table rows with
    one decoded span per document (DOCUMENTS_IN_SCHEMA shape)."""
    text = make_decode_udf()(F.col(content_col))
    span = F.array(F.struct(
        F.lit(kind).alias("kind"),
        text.alias("text"),
        F.lit("").alias("media_ref"),
        F.lit(0).cast("int").alias("offset"),
    ))
    host = (F.col("host") if "host" in df.columns
            else F.lit("ingest")).alias("host")
    # size_bucket is the downstream salting hint: flag GIANT docs here,
    # where measuring is free (raw byte length of the still-encoded
    # content — ~1 byte/char lower bound; /200 mirrors the html
    # block-expansion estimate in plans.pipeline). The r2 ADVICE found
    # no producer ever wrote 'g', silently disabling adaptive salting.
    est_spans = F.lit(1) + (F.length(F.col(content_col)) / F.lit(200)) \
        .cast("long")
    bucket = (F.col("size_bucket") if "size_bucket" in df.columns
              else F.when(est_spans > F.lit(SALT_SPAN_THRESHOLD),
                          F.lit(GIANT_SIZE_BUCKET))
              .otherwise(F.lit("s"))).alias("size_bucket")
    return df.select(F.col("doc_id").cast("string").alias("doc_id"),
                     span.alias("spans"), host, bucket)
