"""The extraction oracles must match Spark on an ADVERSARIAL corpus,
not just the driver's (so far) clean one — the r2 driver red cell
(`extract_markdown_roundtrip` hash flake) was only possible because the
oracle silently depended on the corpus avoiding the kernel's
Python-only steps. This test freezes the structural-guard contract:
every kernel trigger (/uniXXXX, mojibake leads, invisibles, U+FFFD,
unicode whitespace, DOM chars, python-isspace-only controls) mixed
into the text must leave the Spark result and the DuckDB oracle
byte-identical. It already caught one real bug (guarded image-offset
order inversion)."""

from __future__ import annotations

import random

import duckdb
import pytest

Z = chr
NASTY = [
    "/uni0416", "/uni00e9", "/unizzzz",
    "caf" + Z(0xE9),
    Z(0xC2) + " mix",                     # mojibake lead LO
    Z(0xC3) + Z(0xA9) + "coded",          # mojibake pair
    Z(0xFFFD) + "rep",                    # replacement char
    "zero" + Z(0x200B) + "width",         # ZWSP (invisible)
    "nb" + Z(0xA0) + "sp",                # NBSP
    "line" + Z(0x2028) + "sep",           # LINE SEPARATOR
    "para" + Z(0x2029) + "sep",           # PARA SEPARATOR
    "nel" + Z(0x85) + "char",             # NEL
    "ideo" + Z(0x3000) + "sp",            # ideographic space
    "<tag>", "&amp;", "&notent", "a<b", "x&y",
    Z(0x1C) + "fs", Z(0x1F) + "us",       # python-isspace-only ctrls
    "plain", "words", "here", "and", "more", "text", "ok",
    Z(0xF4) + "lead",                     # mojibake lead HI
    Z(0xE2) + Z(0x80) + Z(0x99),          # curly-quote mojibake
    "mid/unidle", "/uni", "end/",
    "tab" + Z(9) + "here", "feed" + Z(12) + "ff",
    "bom" + Z(0xFEFF) + "x",
    Z(0x200B), Z(0x2007), Z(0xFFFD),      # whole-word invisibles
    Z(0x130) + "T",                       # Turkish I: lower() engine-split
    Z(0x3A3) + "IGMA", "TE" + Z(0x3A3),   # final-sigma rule engine-split
    "vt" + Z(0x0B) + "tab",               # \x0B: Java \s has it, RE2 not
    "the", "The", Z(0x130) + "T the of",  # stopword case-fold probes
]

QUERIES = ["extract_markdown_roundtrip", "extract_html_roundtrip",
           "extract_html_rich_roundtrip",
           "extract_pipeline", "extract_referenced_images",
           "text_redact_pii", "text_token_stats", "text_quality_scores",
           "text_fingerprint", "text_lang_id", "text_rolling_fingerprints",
           "dedup_exact", "dedup_ngram_jaccard", "dedup_ngram_pruned",
           "dedup_minhash_lsh", "dedup_simhash", "dedup_cluster_components",
           "dedup_survivors", "shard_token_budget", "f6_clean_invisibles",
           "a1_reassemble_roundtrip", "a2_first3_sample",
           "w1_first_last_span", "w2_block_clustering",
           "f3_nfc_docx", "f3_docx_table_asymmetry",
           "multimodal_meta", "multimodal_decode_stub",
           "sample_hash_deterministic", "sample_stratified_fractions",
           "sample_stratified_quota", "decontam_ngram_hits",
           "curation_funnel", "text_length_outliers", "decontam_fuzzy",
           "text_blocklist_gate", "text_entropy_stats",
           "text_winnow_fingerprints", "shuffle_global_order",
           "text_dup_ngrams", "sample_split_assign", "sample_exact_k",
           "curation_domain_gate", "corpus_drift_kl",
           "dedup_incremental"]


@pytest.fixture(scope="module")
def dirty_sf(tmp_path_factory):
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("dirty_sf")
    rng = random.Random(42)
    rows = []
    for i in range(200):
        words = [rng.choice(NASTY) for _ in range(rng.randint(0, 40))]
        text = " ".join(words)
        rows.append((i, text, "en", "dirty", len(text)))
    t = pa.table({
        "doc_id": pa.array([r[0] for r in rows], pa.int64()),
        "text": pa.array([r[1] for r in rows]),
        "lang": pa.array([r[2] for r in rows]),
        "source": pa.array([r[3] for r in rows]),
        "n_chars": pa.array([r[4] for r in rows], pa.int64()),
    })
    pq.write_table(t, str(d / "documents.parquet"))
    return str(d)


EMB_QUERIES = ["dedup_embedding_cosine", "ann_cosine_threshold",
               "ann_lsh_buckets", "emb_quantize_int8"]


@pytest.fixture(scope="module")
def dirty_emb_sf(tmp_path_factory):
    """Adversarial embeddings: zero vectors (undefined cosine — must
    drop, not crash the job under ANSI mode), near-denormal magnitudes,
    exact-duplicate vectors."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    d = tmp_path_factory.mktemp("dirty_emb")
    rng = random.Random(7)
    rows = []
    for i in range(60):
        if i % 10 == 0:
            v = [0.0] * 64
        elif i % 10 == 1:
            v = [1e-30] * 64
        else:
            v = [rng.uniform(-1, 1) for _ in range(64)]
        rows.append((i, v, i % 3))
    rows.append((100, list(rows[5][1]), 0))    # duplicate vector
    t = pa.table({
        "vec_id": pa.array([r[0] for r in rows], pa.int64()),
        "embedding": pa.array([r[1] for r in rows],
                              pa.list_(pa.float32())),
        "label": pa.array([r[2] for r in rows], pa.int32()),
    })
    pq.write_table(t, str(d / "embeddings.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", EMB_QUERIES)
def test_embedding_oracle_on_dirty_vectors(spark, dirty_emb_sf, qname):
    import __spark_entry__ as entry
    from tools.check_contract import table_hash

    sdf = entry.queries()[qname](spark, dirty_emb_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW embeddings AS SELECT * FROM "
            f"read_parquet('{dirty_emb_sf}/embeddings.parquet')")
    orel = con.sql(entry.oracle_sql()[qname])
    ocols, orows = list(orel.columns), orel.fetchall()
    assert len(srows) == len(orows)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)


@pytest.fixture(scope="module")
def dirty_events_sf(tmp_path_factory):
    """Adversarial event streams: duplicate timestamps and inter-event
    gaps of EXACTLY the session gap (Spark's session_window merges the
    ==gap boundary; an oracle splitting on >= diverged here — r3)."""
    import pyarrow as pa
    import pyarrow.parquet as pq
    from datetime import datetime, timedelta
    d = tmp_path_factory.mktemp("dirty_events")
    rng = random.Random(3)
    rows = []
    for u in range(8):
        t = datetime(2026, 1, 1, 8, 0, 0)
        for i in range(40):
            if i % 7 == 0 and i > 0:
                t = t + timedelta(seconds=1800)   # exactly the gap
            elif i % 5 == 0:
                pass                              # duplicate timestamp
            else:
                t = t + timedelta(seconds=rng.randint(1, 3600))
            rows.append((u, t, f"e{i}"))
    t2 = pa.table({
        "user_id": pa.array([r[0] for r in rows], pa.int64()),
        "ts": pa.array([r[1] for r in rows], pa.timestamp("us")),
        "event_type": pa.array([r[2] for r in rows]),
    })
    pq.write_table(t2, str(d / "events.parquet"))
    return str(d)


@pytest.mark.parametrize("qname", ["w3_session_breaks",
                                   "w3_session_windows"])
def test_session_oracle_on_dirty_events(spark, dirty_events_sf, qname):
    import __spark_entry__ as entry
    from tools.check_contract import table_hash

    sdf = entry.queries()[qname](spark, dirty_events_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW events AS SELECT * FROM "
            f"read_parquet('{dirty_events_sf}/events.parquet')")
    orel = con.sql(entry.oracle_sql()[qname])
    ocols, orows = list(orel.columns), orel.fetchall()
    assert len(srows) == len(orows)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)


@pytest.mark.parametrize("qname", QUERIES)
def test_extraction_oracle_on_dirty_corpus(spark, dirty_sf, qname):
    import __spark_entry__ as entry
    from tools.check_contract import table_hash

    sdf = entry.queries()[qname](spark, dirty_sf)
    srows = [tuple(r) for r in sdf.collect()]
    con = duckdb.connect()
    con.sql("CREATE VIEW documents AS SELECT * FROM "
            f"read_parquet('{dirty_sf}/documents.parquet')")
    orel = con.sql(entry.oracle_sql()[qname])
    ocols, orows = list(orel.columns), orel.fetchall()
    assert len(srows) == len(orows)
    assert sorted(sdf.columns) == sorted(ocols)
    assert table_hash(sdf.columns, srows) == table_hash(ocols, orows)
