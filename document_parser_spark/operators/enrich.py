"""Enrichment stages: OCR insert-after (J1), translate-in-place (J2,
F7), and language autodetection (A2) — SURVEY §3.2.

Reference behavior re-expressed Spark-first:

* J1 (pdf_parser.py:64-71): for each PictureItem the reference calls a
  VLM and splices the OCR text into the tree *immediately after* the
  image. Here the insertion happens on the reassembled span array with
  ``transform`` + ``flatten`` — a narrow map, no join and no extra
  shuffle, because by this point each document's spans are already one
  ordered array. (The join formulation on (doc_id, pos) exists as the
  driver query ``j1_enrichment_join`` for the general case where OCR
  results arrive as a separate relation.)
* J2 (translator/v1/service.py:95-107): per-element translation zipped
  back positionally. In-place ``transform`` over the span array; the
  F7 backtick sanitization (service.py:99) is applied to the
  translated text only, exactly like the reference.
* A2 (translator/v1/service.py:57-72): language = heuristic over the
  first 3 non-empty text spans.

External services (VLM, translator, detector) are deterministic
pluggable stubs: pure column expressions, seeded by content — swap
the expression for a per-partition HTTP batch later without touching
the plan shape.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from document_parser_spark.ops.textstats import (
    LANG_ORDER,
    STOPWORDS,
    lang_argmax,
)

OCR_PREFIX = "[ocr:"
# The reference's OCR failure semantics (image_parser.py:174-182): a
# generic exception during per-element image parsing yields a FIXED
# fallback string spliced into the document (not an empty string, not
# a failure row). Ours is English; the reference's is Russian prose.
OCR_FALLBACK_TEXT = "*image parsing hit a network delay*"


def ocr_stub(seed: Column, fail_marker: str | None = None) -> Column:
    """Deterministic fake VLM output for a media ref / table payload
    (sha2-derived, so golden tests are stable). Empty/whitespace
    output never happens by construction — the reference's P4 guard is
    kept in the caller. ``fail_marker`` makes the stub
    failure-injectable: seeds containing the marker take the
    reference's fallback-string path (image_parser.py:174-182)."""
    ok = F.concat(F.lit(OCR_PREFIX),
                  F.substring(F.sha2(seed, 256), 1, 12), F.lit("]"))
    if fail_marker is None:
        return ok
    return F.when(seed.contains(fail_marker),
                  F.lit(OCR_FALLBACK_TEXT)).otherwise(ok)


def insert_ocr_after_images(docs: DataFrame,
                            spans_col: str = "spans",
                            include_tables: bool = True,
                            fail_marker: str | None = None) -> DataFrame:
    """J1: splice an OCR text span immediately after every image span
    — and, matching the reference's ``PictureItem OR TableItem``
    condition (pdf_parser.py:64-71), after every table span — then
    renumber offsets 0..n-1. Narrow map over the span array.

    Table OCR seeds on the table payload (the reference renders the
    table to an image via ``element.get_image``; our deterministic
    stand-in hashes the content instead). ``include_tables=False``
    restricts to images. ``fail_marker`` injects the reference's
    OCR-failure fallback string (see ``ocr_stub``)."""
    def is_target(s):
        img = (s["kind"] == "image") & (F.length(s["media_ref"]) > 0)
        if not include_tables:
            return img
        return img | (s["kind"] == "table")

    def seed(s):
        return F.when(F.length(s["media_ref"]) > 0, s["media_ref"]) \
                .otherwise(F.coalesce(s["text"], F.lit("")))

    enriched = F.flatten(F.transform(
        F.col(spans_col),
        lambda s: F.when(
            is_target(s),
            F.array(
                s,
                F.struct(
                    F.lit("text").alias("kind"),
                    ocr_stub(seed(s), fail_marker).alias("text"),
                    F.lit("").alias("media_ref"),
                    s["offset"].alias("offset"),
                ),
            ),
        ).otherwise(F.array(s)),
    ))
    renumbered = F.transform(
        enriched,
        lambda s, i: F.struct(
            s["kind"].alias("kind"), s["text"].alias("text"),
            s["media_ref"].alias("media_ref"),
            i.cast("int").alias("offset")))
    return docs.withColumn(spans_col, renumbered)


def translate_stub(text: Column) -> Column:
    """Deterministic fake translator: uppercases (so goldens can see
    the stage ran) then applies the reference's backtick sanitization
    (F7, translator/v1/service.py:99: translated.replace('`', '*'))."""
    return F.translate(F.upper(text), "`", "*")


TRANSLATED_KINDS = ("text", "heading", "list_item", "table")


def translate_spans(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """J2: translate text-bearing spans in place (text items + table
    cells, mirroring the reference's two translated element classes;
    images/code/page breaks pass through untouched)."""
    kinds = F.array(*[F.lit(k) for k in TRANSLATED_KINDS])
    translated = F.transform(
        F.col(spans_col),
        lambda s: F.struct(
            s["kind"].alias("kind"),
            F.when(F.array_contains(kinds, s["kind"]),
                   translate_stub(s["text"]))
            .otherwise(s["text"]).alias("text"),
            s["media_ref"].alias("media_ref"),
            s["offset"].alias("offset")))
    return docs.withColumn(spans_col, translated)


def detect_language(docs: DataFrame, spans_col: str = "spans") -> DataFrame:
    """A2: sample = first 3 non-empty text spans joined by newline (the
    reference's detect-language payload, translator/v1/service.py:57-64),
    scored by the stopword heuristic -> ``lang`` column. Array-only:
    no shuffle, no UDF.

    The per-language ratios materialize ONCE per row behind a Generate
    barrier and the argmax CASE chain is ``textstats.lang_argmax`` —
    shared with ``ops.textstats.lang_id`` (r4 VERDICT #6: the previous
    inline chain re-evaluated each split+filter ratio up to twice per
    language)."""
    sample = F.concat_ws(
        "\n",
        F.slice(
            F.transform(
                F.filter(F.col(spans_col),
                         lambda s: (s["kind"] == "text")
                         & (F.trim(s["text"]) != "")),
                lambda s: s["text"]),
            1, 3))
    words = F.split(F.lower(sample), r"\s+")

    def ratio(stops: tuple[str, ...]) -> Column:
        arr = F.array(*[F.lit(s) for s in stops])
        return (F.size(F.filter(words, lambda x: F.array_contains(arr, x)))
                .cast("double")
                / F.greatest(F.size(words), F.lit(1)).cast("double"))

    r_struct = F.struct(*[ratio(STOPWORDS[lang]).alias(f"_r_{lang}")
                          for lang in LANG_ORDER])
    d = docs.select("*", F.inline(F.array(r_struct)))
    lang, _score = lang_argmax(lambda lg: F.col(f"_r_{lg}"))
    return (d.withColumn("lang", lang)
            .drop(*[f"_r_{lg}" for lg in LANG_ORDER]))
