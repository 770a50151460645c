"""Interleaved text+media document ops — the payload-specific curation
tier for multimodal training data (OBELICS/MMC4-style document filtering
and image-text pair mining) over the canonical span table
(doc_id, spans:array<struct<kind,text,media_ref,offset>>).

Both operators are NARROW in-row maps over the spans array (higher-order
functions only — zero shuffle, zero Python), so at 10^12 docs they cost
one columnar scan each and compose with any downstream gate. Per-row
work for pair mining is O(images x candidate texts) within one document,
bounded by the ingest span cap (SURVEY §7.3.4) — never by corpus size.

Reference tie-in: the reference's interleaved document model is the
Docling tree of text/picture items in reading order
(/root/reference/app/modules/parser/v1/file_parsers/pdf_parser.py:53-71);
these ops consume exactly that order, materialized as array position.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

_I32_MAX = 2147483647

# media-density gate defaults (OBELICS-style document filter: drop docs
# that are image farms or have too little text per image). Integer-exact
# comparisons only — a ratio threshold becomes `chars >= k * images` so
# engines cannot disagree on float rounding.
MAX_IMAGES_PER_DOC = 32
MIN_CHARS_PER_IMAGE = 2000

# pair-mining defaults: candidate captions need substance, and a caption
# further than MAX_CAPTION_GAP reading-order positions from its image is
# noise (MMC4 pairs images with nearby sentences).
MIN_CAPTION_CHARS = 20
MAX_CAPTION_GAP = 3

# image-boilerplate default (OBELICS/MMC4 image dedup: an image that
# recurs across many documents is a logo, banner, or tracking pixel,
# not content — both pipelines drop repeated images by URL/hash).
IMAGE_BOILERPLATE_DOC_FREQ = 5


def interleave_stats(
    span_docs: DataFrame,
    max_images: int = MAX_IMAGES_PER_DOC,
    min_chars_per_image: int = MIN_CHARS_PER_IMAGE,
) -> DataFrame:
    """Per-document media-density statistics + keep flag.

    keep = n_images <= max_images
           AND n_text >= 1
           AND text_chars >= min_chars_per_image * n_images

    Pure codegen in-row aggregates over the spans array — no shuffle,
    no UDF; at 100 TB this is one scan with full column pruning to
    (doc_id, spans).

    A NULL spans array is treated as empty (r3 ADVICE): the row gets
    ``n_* = 0`` and an explicit ``keep = 0`` (no text), never a NULL
    keep that would leak through a downstream ``keep == 0`` drop
    filter.
    """
    spans = F.coalesce(
        F.col("spans"),
        F.expr("cast(array() as array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>)"))
    n_text = F.size(F.filter(spans, lambda s: s["kind"] == "text"))
    n_images = F.size(F.filter(spans, lambda s: s["kind"] == "image"))
    text_chars = F.aggregate(
        spans,
        F.lit(0).cast("long"),
        lambda a, s: a + F.when(
            (s["kind"] == "text") & s["text"].isNotNull(),
            F.length(s["text"]).cast("long")).otherwise(F.lit(0).cast("long")),
    )
    out = span_docs.select(
        "doc_id",
        F.size(spans).cast("long").alias("n_spans"),
        n_text.cast("long").alias("n_text"),
        n_images.cast("long").alias("n_images"),
        text_chars.alias("text_chars"),
    )
    keep = (
        (F.col("n_images") <= max_images)
        & (F.col("n_text") >= 1)
        & (F.col("text_chars")
           >= F.lit(min_chars_per_image).cast("long") * F.col("n_images"))
    )
    return out.withColumn("keep", keep.cast("long"))


def image_doc_frequency(span_docs: DataFrame) -> DataFrame:
    """-> (media_ref, doc_freq): the number of DISTINCT documents each
    image appears in. Per-doc dedup happens IN-ROW (``array_distinct``
    over the ref list) before the explode, so the one groupBy shuffle
    carries exactly one row per (doc, ref) — never a per-occurrence
    fan-out, and within-doc repeats (galleries) count once."""
    refs = F.array_distinct(F.expr(
        "transform(filter(spans, s -> s.kind = 'image' "
        "AND s.media_ref IS NOT NULL AND s.media_ref <> ''), "
        "s -> s.media_ref)"))
    return (span_docs.select(F.explode(refs).alias("media_ref"))
            .groupBy("media_ref")
            .agg(F.count("*").cast("long").alias("doc_freq")))


def boilerplate_images(
    span_docs: DataFrame,
    max_doc_freq: int = IMAGE_BOILERPLATE_DOC_FREQ,
) -> DataFrame:
    """The recurring-image set: refs in more than ``max_doc_freq``
    distinct documents (logos / banners / tracking pixels)."""
    return (image_doc_frequency(span_docs)
            .filter(F.col("doc_freq") > max_doc_freq))


def strip_boilerplate_images(
    span_docs: DataFrame,
    max_doc_freq: int = IMAGE_BOILERPLATE_DOC_FREQ,
) -> DataFrame:
    """OBELICS-style image dedup: remove image spans whose ``media_ref``
    recurs in more than ``max_doc_freq`` distinct documents, keeping
    every other span (and original offsets — array position stays the
    reading-order carrier downstream).

    Scale shape: the boilerplate set is folded into ONE array row and
    broadcast-cross-joined, so the strip itself is a pure in-row array
    filter — the corpus never shuffles on a doc key. The set is small
    by construction at any realistic threshold (it is the frequent
    TAIL of the ref distribution); if a pathological corpus overflowed
    the broadcast, the swap is an exploded media_ref-keyed left-anti
    join + doc-keyed rebuild — same contract, two exchanges.
    NULL-safe per this repo's span discipline: a NULL media_ref can
    never match the boilerplate set (coalesce pins the predicate)."""
    bad = (boilerplate_images(span_docs, max_doc_freq)
           .agg(F.collect_list("media_ref").alias("_bad")))
    out = span_docs.crossJoin(F.broadcast(bad))
    keep = lambda s: ~F.coalesce(  # noqa: E731
        (s["kind"] == "image")
        & F.array_contains(F.col("_bad"), s["media_ref"]),
        F.lit(False))
    return (out.withColumn("spans", F.filter("spans", keep))
            .drop("_bad"))


def image_caption_pairs(
    span_docs: DataFrame,
    max_gap: int = MAX_CAPTION_GAP,
    min_caption_chars: int = MIN_CAPTION_CHARS,
) -> DataFrame:
    """Mine (image, caption) training pairs from interleaved documents:
    for every image span, the NEAREST candidate text span by
    reading-order distance (array position), ties broken toward the
    PRECEDING span (captions lead their image more often than trail it).
    Candidates must carry at least ``min_caption_chars`` characters;
    images with no candidate within ``max_gap`` positions emit nothing.

    Entirely in-row: position annotation, candidate filter, and the
    per-image argmin (a left-fold ``aggregate`` whose strict ``<`` keeps
    the first — i.e. preceding — element on distance ties) are
    higher-order functions; the only row-count change is the final
    explode of the per-doc pair array (a Generate, still narrow).
    """
    pos_spans = F.expr(
        "transform(spans, (s, i) -> named_struct("
        "'kind', s.kind, 'text', s.text, 'media_ref', s.media_ref, "
        "'pos', i))")
    base = span_docs.select("doc_id", pos_spans.alias("sp"))
    txts = F.expr(
        f"filter(sp, s -> s.kind = 'text' AND s.text IS NOT NULL "
        f"AND length(s.text) >= {int(min_caption_chars)})")
    imgs = F.expr("filter(sp, s -> s.kind = 'image')")
    base = base.select("doc_id", txts.alias("txts"), imgs.alias("imgs"))
    pairs = F.expr(
        f"""
        filter(
          transform(imgs, im -> named_struct(
            'media_ref', im.media_ref,
            'img_pos', im.pos,
            'best', aggregate(txts,
              named_struct('gap', {_I32_MAX}, 'pos', -1,
                           'text', cast(null as string)),
              (acc, t) -> IF(abs(t.pos - im.pos) < acc.gap,
                             named_struct('gap', abs(t.pos - im.pos),
                                          'pos', t.pos, 'text', t.text),
                             acc)))),
          p -> p.best.pos >= 0 AND p.best.gap <= {int(max_gap)})
        """)
    return (
        base.select("doc_id", F.explode(pairs).alias("p"))
        .select(
            "doc_id",
            F.col("p.media_ref").alias("media_ref"),
            F.col("p.img_pos").cast("long").alias("img_pos"),
            F.col("p.best.pos").cast("long").alias("cap_pos"),
            F.col("p.best.gap").cast("long").alias("gap"),
            F.when(F.col("p.best.pos") < F.col("p.img_pos"),
                   F.lit("before")).otherwise(F.lit("after")).alias("side"),
            F.col("p.best.text").alias("caption"),
        )
    )
