"""Ordered document reassembly — THE load-bearing shuffle (SURVEY.md §2.4 A1).

``posexplode`` is the Spark analogue of the reference's ``iterate_items()``
tree walk (pdf_parser.py:53); this operator is the inverse: collect every
parsed span of a document back into one ordered array. Order is carried
exclusively by the ``(ord0, ord1)`` key inside the collected struct — never by
row order, which no shuffle preserves.

Skew handling (north_rule): giant documents are salted across
``salt_buckets`` partial groups first (two-phase collect), so a single hot
doc_id cannot pin one reducer: phase 1 groups by (doc_id, salt) with map-side
partial aggregation; phase 2 merges the K partial arrays per doc and sorts
ONCE after flatten (``array_sort(flatten(collect_list(part)))`` — provably
order-restoring because the sort key is inside each element).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from document_parser_spark.config import DEFAULT_SALT_BUCKETS
from document_parser_spark.schema import FAIL_KIND

DOC_MARKER_KIND = "__doc__"
_META_KINDS = (FAIL_KIND, DOC_MARKER_KIND)


def reassemble(parsed: DataFrame, salt_buckets: int = DEFAULT_SALT_BUCKETS,
               salted: bool = True) -> DataFrame:
    """PARSED_SCHEMA rows -> (doc_id, spans array<struct> in reading order
    with offsets renumbered 0..n-1, n_failures).

    Fail rows (kind='__fail__') and per-doc presence markers (kind='__doc__',
    emitted so that fully-filtered docs still surface with status 'empty')
    are tallied/stripped here.
    """
    item = F.struct(
        F.col("ord0"), F.col("ord1"), F.col("kind"),
        F.col("text"), F.col("media_ref"),
    )
    if salted and salt_buckets > 1:
        part = (
            parsed
            .groupBy("doc_id",
                     F.pmod(F.hash("ord0", "ord1"), F.lit(salt_buckets))
                     .alias("_salt"))
            .agg(F.collect_list(item).alias("part"))
        )
        docs = part.groupBy("doc_id").agg(
            F.array_sort(F.flatten(F.collect_list("part"))).alias("items"))
    else:
        docs = parsed.groupBy("doc_id").agg(
            F.array_sort(F.collect_list(item)).alias("items"))

    meta = F.array(*[F.lit(k) for k in _META_KINDS])
    return docs.select(
        "doc_id",
        F.transform(
            F.filter("items", lambda x: ~F.array_contains(meta, x["kind"])),
            lambda x, i: F.struct(
                x["kind"].alias("kind"),
                x["text"].alias("text"),
                x["media_ref"].alias("media_ref"),
                i.cast("int").alias("offset"),
            ),
        ).alias("spans"),
        F.size(F.filter("items", lambda x: x["kind"] == FAIL_KIND))
        .cast("long").alias("n_failures"),
    )
