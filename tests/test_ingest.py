"""F1 bytes-branch ingest decode tests (abc/abc.py:45-56): strict
utf-8 -> deterministic detected codec -> errors='replace' fallback,
at the kernel level and through the Spark ingest seam."""

from __future__ import annotations

import pytest

from document_parser_spark.refparser.textkernel import (
    detect_encoding,
    to_utf8_bytes,
)

RU = "привет мир это тест"
FR = "déjà vu café crème"


class TestToUtf8Bytes:
    def test_valid_utf8_passthrough(self):
        assert to_utf8_bytes("héllo wörld".encode("utf-8")) == "héllo wörld"

    def test_ascii_passthrough(self):
        assert to_utf8_bytes(b"plain ascii") == "plain ascii"

    def test_cp1251_cyrillic_detected(self):
        assert to_utf8_bytes(RU.encode("cp1251")) == RU

    def test_cp1252_western_detected(self):
        assert to_utf8_bytes(FR.encode("cp1252")) == FR

    def test_latin1_subset_via_cp1252(self):
        # latin-1 text whose bytes are all defined in cp1252 too
        assert to_utf8_bytes(FR.encode("latin-1")) == FR

    def test_undecodable_falls_back_to_replace(self):
        # 0x81 is undefined in cp1252 and an invalid utf-8 start byte
        raw = b"ok \xe2\x28\xa1 bad \x81"
        out = to_utf8_bytes(raw)
        assert "�" in out and out.startswith("ok ")

    def test_detector_pure_ascii_none(self):
        assert detect_encoding(b"nothing high here") is None

    def test_detector_profiles(self):
        assert detect_encoding(RU.encode("cp1251")) == "cp1251"
        assert detect_encoding(FR.encode("cp1252")) == "cp1252"

    # --- breadth beyond the original cp1251/cp1252 pair (r3 verdict
    # "what's missing" #3): BOM families, BOM-less utf-16, the other
    # two major Cyrillic codecs ------------------------------------

    @pytest.mark.parametrize("enc", ["utf-16", "utf-32"])
    def test_bom_families_roundtrip(self, enc):
        # the bare utf-16/utf-32 codecs EMIT a platform-endian BOM;
        # detection maps the BOM back to the consuming codec, so the
        # round trip is exact (no stray U+FEFF)
        txt = "BOM test héllo " + RU
        assert to_utf8_bytes(txt.encode(enc)) == txt

    @pytest.mark.parametrize("enc", ["utf-16-be", "utf-32-le",
                                     "utf-32-be"])
    def test_explicit_bom_prefix_roundtrip(self, enc):
        txt = "explicit bom héllo " + RU
        raw = "﻿".encode(enc) + txt.encode(enc)
        assert to_utf8_bytes(raw) == txt

    def test_bomless_utf16_mixed_script(self):
        # non-Latin pages dilute the NUL stripe — asymmetry still
        # picks the endianness
        txt = "héllo bomless " + RU
        assert to_utf8_bytes(txt.encode("utf-16-le")) == txt
        assert to_utf8_bytes(txt.encode("utf-16-be")) == txt

    def test_bomless_utf16_both_endians(self):
        # needs a non-ASCII char: pure-ASCII utf-16 is VALID utf-8
        # (NUL bytes decode fine), so — exactly like the reference's
        # chain — the detector is never consulted for it
        txt = "mostly ascii utf sixteen héllo text"
        assert to_utf8_bytes(txt.encode("utf-16-le")) == txt
        assert to_utf8_bytes(txt.encode("utf-16-be")) == txt

    def test_koi8r_vs_cp1251_split(self):
        assert detect_encoding(RU.encode("koi8_r")) == "koi8_r"
        assert to_utf8_bytes(RU.encode("koi8_r")) == RU
        # the same prose in cp1251 still routes to cp1251
        assert to_utf8_bytes(RU.encode("cp1251")) == RU

    def test_cp866_dos_cyrillic(self):
        assert detect_encoding(RU.encode("cp866")) == "cp866"
        assert to_utf8_bytes(RU.encode("cp866")) == RU


def test_ingest_raw_text_spark_roundtrip(spark):
    from document_parser_spark.plans.pipeline import extract
    from document_parser_spark.sources.ingest import ingest_raw_text

    rows = [
        ("b1", bytearray("utf-8 text héllo".encode("utf-8"))),
        ("b2", bytearray(RU.encode("cp1251"))),
        ("b3", bytearray(FR.encode("cp1252"))),
        ("b4", bytearray(b"broken \x81 bytes here")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    spans = ingest_raw_text(df)
    got = {r.doc_id: r.spans[0].text for r in spans.collect()}
    assert got["b1"] == "utf-8 text héllo"
    assert got["b2"] == RU
    assert got["b3"] == FR
    assert got["b4"] == to_utf8_bytes(b"broken \x81 bytes here")

    # the decoded table feeds extract() directly (clean maps FFFD->'.')
    out = {r.doc_id: r for r in extract(spans).collect()}
    assert out["b2"].status == "ok"
    assert RU in out["b2"].markdown
    assert "�" not in out["b4"].markdown
