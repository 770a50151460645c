"""Driver-window ordering contract (r3 VERDICT #1).

The correctness harness verifies the FIRST 50 entries of ``queries()``
in dict-insertion order, so insertion order is a verification budget.
These tests pin the budget allocation: every query that has never had a
green driver row (r3 window ended at index 49) and every query whose
operator changed this round must sit inside the first 50 slots.
"""

from __future__ import annotations

import __spark_entry__ as entry

DRIVER_WINDOW = 50

# queries with no green driver row in any round (indices 50-76 of the
# r3 ordering) — all must now be inside the window
_NEVER_VERIFIED = {
    "extract_pipeline", "extract_markdown_roundtrip",
    "extract_html_roundtrip", "extract_html_rich_roundtrip",
    "extract_referenced_images", "pdf_vlm_roundtrip",
    "j1_ocr_insert_after", "interleave_media_gate",
    "interleave_caption_pairs", "interleave_image_boilerplate",
    "agg_lineitem_pricing",
    "join_revenue_by_nation", "events_asof_join", "events_rollup",
    "events_json_props", "emb_covariance", "emb_quantize_int8",
    "text_entropy_stats", "text_dup_ngrams", "text_winnow_fingerprints",
    "text_blocklist_gate", "text_classifier_gate", "text_quality_tiers",
    "text_length_outliers", "chunk_sliding_windows",
    "shuffle_global_order", "top_docs_per_source", "corpus_source_stats",
}

# operators modified in round 4 — their queries must re-verify
_TOUCHED_R4 = {
    "dedup_chunks", "dedup_minhash_lsh", "dedup_ngram_jaccard",
    "dedup_ngram_pruned", "decontam_fuzzy", "a1_reassemble_roundtrip",
}


def test_priority_table_is_exhaustive():
    names = list(entry.queries())
    assert set(names) == set(entry._DRIVER_PRIORITY), (
        "every query must have an explicit priority slot — add new "
        "queries to _DRIVER_PRIORITY deliberately (head if unverified)")
    assert len(names) == len(entry._DRIVER_PRIORITY)


def test_high_risk_queries_inside_driver_window():
    head = set(list(entry.queries())[:DRIVER_WINDOW])
    missing = (_NEVER_VERIFIED | _TOUCHED_R4) - head
    assert not missing, f"high-risk queries outside the window: {missing}"


def test_queries_and_oracles_cover_same_names():
    assert set(entry.queries()) == set(entry.oracle_sql())


def test_oracle_order_matches_query_order():
    assert list(entry.queries()) == list(entry.oracle_sql())
