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

from document_parser_spark.ops.textstats import EN_STOP_RATIO_MIN, STOPWORDS

OCR_PREFIX = "[ocr:"


def ocr_stub(media_ref: Column) -> Column:
    """Deterministic fake VLM output for a media ref (sha2-derived, so
    golden tests are stable). Empty/whitespace output never happens by
    construction — the reference's P4 guard is kept in the caller."""
    return F.concat(F.lit(OCR_PREFIX),
                    F.substring(F.sha2(media_ref, 256), 1, 12), F.lit("]"))


def insert_ocr_after_images(docs: DataFrame,
                            spans_col: str = "spans") -> DataFrame:
    """J1: splice an OCR text span immediately after every image span,
    renumbering offsets 0..n-1. Narrow map over the span array."""
    enriched = F.flatten(F.transform(
        F.col(spans_col),
        lambda s: F.when(
            (s["kind"] == "image") & (F.length(s["media_ref"]) > 0),
            F.array(
                s,
                F.struct(
                    F.lit("text").alias("kind"),
                    ocr_stub(s["media_ref"]).alias("text"),
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
    no shuffle, no UDF."""
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

    order = ("en", "de", "fr", "es")
    best_ratio = ratio(STOPWORDS[order[0]])
    best_lang = F.lit(order[0])
    for lang in order[1:]:
        r = ratio(STOPWORDS[lang])
        cond = r > best_ratio
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(cond, r).otherwise(best_ratio)
    lang = F.when(best_ratio >= F.lit(EN_STOP_RATIO_MIN), best_lang) \
            .otherwise(F.lit("unk"))
    return docs.withColumn("lang", lang)
