"""The end-to-end extraction plan (SURVEY.md §3.1 restated Spark-first).

    read span table
      ├─ PDF family: prune spans to pdf_line, doc-level mapInPandas layout
      │  parse (no explode needed — reading order is a doc-level computation)
      └─ everything else: posexplode(filter(spans, kind != 'pdf_line'))
           ├─ text:    vectorized clean kernel, drop blank
           ├─ image:   passthrough (media_ref preserved verbatim)
           ├─ html:    batched DOM parse (mapInPandas)
           └─ unknown: parse-failure rows (never throw — A4)
      + one presence marker per doc (so fully-dropped docs surface as 'empty')
    -> unionByName -> salted ordered reassembly -> serializer UDF -> output

All branches emit PARSED_SCHEMA; every stage is a narrow map over the explode
except the single reassembly shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from document_parser_spark.config import (
    DEFAULT_SALT_BUCKETS,
    GIANT_SIZE_BUCKET,
    IMAGE_MODE_PLACEHOLDER,
    INPUT_KINDS,
    PY_WHITESPACE,
    SALT_SPAN_THRESHOLD,
    STATUS_EMPTY,
    STATUS_OK,
    STATUS_PARSE_FAILURE,
)
from document_parser_spark.functions.cleaning import (
    clean_text_column,
    make_clean_udf,
    make_docx_clean_udf,
    make_table_clean_udf,
    needs_python_column,
)
from document_parser_spark.operators.html_parse import html_branch
from document_parser_spark.operators.pdf_parse import pdf_branch
from document_parser_spark.operators.reassemble import DOC_MARKER_KIND, reassemble
from document_parser_spark.operators.serialize import make_serialize_udf
from document_parser_spark.schema import FAIL_KIND

_I32_MIN = -2147483648


def explode_spans(df: DataFrame, exclude_pdf: bool = True) -> DataFrame:
    """posexplode(spans) -> one row per span (the iterate_items analogue)."""
    spans = (F.filter("spans", lambda s: s["kind"] != "pdf_line")
             if exclude_pdf else F.col("spans"))
    return (
        df.select("doc_id", F.posexplode(spans).alias("pos", "span"))
        .select(
            "doc_id", "pos",
            F.col("span.kind").alias("kind"),
            F.col("span.text").alias("text"),
            F.col("span.media_ref").alias("media_ref"),
            F.col("span.offset").alias("offset"),
        )
    )


def parse_all_branches(df: DataFrame, pdf_vlm: bool = False) -> DataFrame:
    """Input docs -> union of per-kind parsed rows (PARSED_SCHEMA).
    ``pdf_vlm`` selects the VLM whole-doc PDF parser instead of the
    layout pipeline (the reference's alternative parser,
    pdf_parser_vlm.py)."""
    clean_udf = make_clean_udf()

    exploded = explode_spans(df, exclude_pdf=True)

    # Blank test (F8): the reference's `if not text.strip()` — Python
    # strip semantics via the shared PY_WHITESPACE set (translate is
    # also codegen, where the old (?U)\s rlike was not, and Java's \s
    # misses U+001C-001F)
    def _non_blank(col: str) -> F.Column:
        return F.length(F.translate(col, PY_WHITESPACE, "")) > 0

    def _text_shape(clean_col: F.Column, src: DataFrame) -> DataFrame:
        return (
            src.withColumn("_clean", clean_col)
            .filter(F.col("_clean").isNotNull() & _non_blank("_clean"))
            .select(
                "doc_id",
                F.col("offset").alias("ord0"),
                F.lit(0).alias("ord1"),
                F.lit("text").alias("kind"),
                F.col("_clean").alias("text"),
                F.lit("").alias("media_ref"),
            )
        )

    # The clean kernel's Python-only steps (/uniXXXX unescape, mojibake
    # re-decode) are no-ops unless their trigger pattern is present
    # (needs_python_column), so the overwhelming clean majority runs
    # the EXACT same transform as the JVM translate chain and never
    # leaves whole-stage codegen; only flagged rows cross into the
    # pandas kernel. A F.when() over the UDF would NOT give this —
    # Spark extracts pandas UDFs into their own projection and
    # evaluates them for every row regardless of the branch — hence
    # the filter/filter/union split. The fork duplicates only the
    # scan+explode subtree (columnar, no UDF upstream), which is noise
    # next to removing the Arrow crossing for ~99% of rows.
    text_src = exploded.filter(F.col("kind") == "text")
    is_py = needs_python_column(F.col("text"))
    text_rows = _text_shape(
        clean_text_column(F.col("text")), text_src.filter(~is_py)
    ).unionByName(_text_shape(clean_udf("text"),
                              text_src.filter(is_py)))

    # DocParser path (docx_parser.py:43-49): text items NFC->clean->fix;
    # table cells clean ONLY (the reference's to_utf8 asymmetry). Generic
    # "table" spans (pptx/xlsx ingest mapping) get the pdf/html cell rule.
    docx_rows = (
        exploded.filter(F.col("kind") == "docx")
        .withColumn("_clean", make_docx_clean_udf()("text"))
        .filter(F.col("_clean").isNotNull() & _non_blank("_clean"))
        .select(
            "doc_id",
            F.col("offset").alias("ord0"),
            F.lit(0).alias("ord1"),
            F.lit("text").alias("kind"),
            F.col("_clean").alias("text"),
            F.lit("").alias("media_ref"),
        )
    )

    def _table_rows(kind: str, fix_cells: bool) -> DataFrame:
        return exploded.filter(F.col("kind") == kind).select(
            "doc_id",
            F.col("offset").alias("ord0"),
            F.lit(0).alias("ord1"),
            F.lit("table").alias("kind"),
            make_table_clean_udf(fix_cells)("text").alias("text"),
            F.lit("").alias("media_ref"),
        )

    docx_table_rows = _table_rows("docx_table", fix_cells=False)
    table_rows = _table_rows("table", fix_cells=True)

    image_rows = exploded.filter(F.col("kind") == "image").select(
        "doc_id",
        F.col("offset").alias("ord0"),
        F.lit(0).alias("ord1"),
        F.lit("image").alias("kind"),
        F.lit("").alias("text"),
        F.coalesce("media_ref", F.lit("")).alias("media_ref"),
    )

    html_rows = html_branch(
        exploded.filter(F.col("kind") == "html").select("doc_id", "offset", "text")
    )

    unknown_rows = (
        exploded.filter(~F.col("kind").isin(*INPUT_KINDS))
        .select(
            "doc_id",
            F.col("offset").alias("ord0"),
            F.lit(0).alias("ord1"),
            F.lit(FAIL_KIND).alias("kind"),
            F.lit(None).cast("string").alias("text"),
            F.lit(None).cast("string").alias("media_ref"),
        )
    )

    pdf_docs = (
        df.filter(F.exists("spans", lambda s: s["kind"] == "pdf_line"))
        .select("doc_id",
                F.filter("spans", lambda s: s["kind"] == "pdf_line").alias("spans"))
    )
    if pdf_vlm:
        from document_parser_spark.operators.pdf_vlm import pdf_vlm_branch
        pdf_rows = pdf_vlm_branch(pdf_docs)
    else:
        pdf_rows = pdf_branch(pdf_docs)

    # presence marker: exactly one per input doc, stripped during reassembly
    marker_rows = df.select(
        "doc_id",
        F.lit(_I32_MIN).alias("ord0"),
        F.lit(0).alias("ord1"),
        F.lit(DOC_MARKER_KIND).alias("kind"),
        F.lit(None).cast("string").alias("text"),
        F.lit(None).cast("string").alias("media_ref"),
    )

    return (
        text_rows.unionByName(docx_rows).unionByName(docx_table_rows)
        .unionByName(table_rows).unionByName(image_rows)
        .unionByName(html_rows).unionByName(unknown_rows)
        .unionByName(pdf_rows).unionByName(marker_rows)
    )


def extract(
    df: DataFrame,
    image_mode: str = IMAGE_MODE_PLACEHOLDER,
    salt_buckets: int = DEFAULT_SALT_BUCKETS,
    salted: bool = True,
    salt_threshold: int | None = SALT_SPAN_THRESHOLD,
    parse_images: bool = False,
    translate: bool = False,
    detect_lang: bool = False,
    pdf_vlm: bool = False,
) -> DataFrame:
    """Full pipeline: input span table -> DOCUMENTS_OUT_SCHEMA
    (doc_id, spans, markdown, status) + n_failures column for lineage.

    Optional enrichment stages mirror the reference's request flags:
    ``parse_images`` = VLM OCR insert-after (J1, pdf_parser.py:64-71),
    ``translate`` = per-span translation in place (J2), ``detect_lang``
    = first-3-paragraph language column (A2). All three are narrow
    maps over the reassembled span array — zero extra shuffles.
    """
    parsed = parse_all_branches(df, pdf_vlm=pdf_vlm)
    # Adaptive-salting hot set. Preferred source: the ingest-time
    # size_bucket column (GIANT_SIZE_BUCKET flags docs above the span
    # threshold) — a dictionary-encoded string scan, no spans payload
    # re-measurement. Fallback (no size_bucket column): estimate from
    # the raw spans — span count + payload bytes / 200 (html expands
    # one span into many blocks; the overestimate errs toward the
    # two-phase path, the safe side for an OOM/straggler guard).
    hot_docs = None
    if salted and salt_threshold is not None:
        if "size_bucket" in df.columns:
            hot_docs = (df.filter(F.col("size_bucket")
                                  == GIANT_SIZE_BUCKET)
                        .select("doc_id"))
        else:
            # long accumulator: a giant doc's total span bytes can pass
            # 2^31, and int32 wraparound would hide exactly the doc the
            # guard exists for (r2 ADVICE)
            est = (
                F.size("spans").cast("long")
                + (F.aggregate(
                    "spans", F.lit(0).cast("long"),
                    lambda a, s: a + F.coalesce(F.length(s["text"])
                                                .cast("long"),
                                                F.lit(0).cast("long")))
                   / F.lit(200)).cast("long")
            )
            hot_docs = (df.select("doc_id", est.alias("_n"))
                        .filter(F.col("_n") > salt_threshold)
                        .select("doc_id"))
    docs = reassemble(parsed, salt_buckets=salt_buckets, salted=salted,
                      salt_threshold=salt_threshold, hot_docs=hot_docs)
    if parse_images:
        from document_parser_spark.operators.enrich import (
            insert_ocr_after_images,
        )
        docs = insert_ocr_after_images(docs)
    if detect_lang:
        from document_parser_spark.operators.enrich import detect_language
        docs = detect_language(docs)
    if translate:
        from document_parser_spark.operators.enrich import translate_spans
        docs = translate_spans(docs)
    serialize_udf = make_serialize_udf(image_mode)
    out_cols = [
        F.col("doc_id"),
        F.col("spans"),
        serialize_udf("spans").alias("markdown"),
        F.when(F.col("n_failures") > 0, F.lit(STATUS_PARSE_FAILURE))
        .when(F.size("spans") == 0, F.lit(STATUS_EMPTY))
        .otherwise(F.lit(STATUS_OK)).alias("status"),
        F.col("n_failures"),
    ]
    if detect_lang:
        out_cols.insert(3, F.col("lang"))
    return docs.select(*out_cols)
