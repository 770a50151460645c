"""End-to-end golden parity: Spark pipeline output == refparser oracle on
every fixture document — exact span-sequence equality (kind, text, media_ref,
order), then markdown string equality, then status (BASELINE.json per-row
invariant; SURVEY.md §5.3)."""

import pytest

from document_parser_spark.refparser.parse import parse_document
from document_parser_spark.sources.synth import fixture_docs, fixtures_dataframe


@pytest.fixture(scope="module")
def pipeline_out(spark):
    from document_parser_spark.plans.pipeline import extract

    df = fixtures_dataframe(spark)
    rows = extract(df).collect()
    return {r["doc_id"]: r for r in rows}


@pytest.fixture(scope="module")
def oracle_out():
    return {doc_id: parse_document(doc_id, spans)
            for doc_id, spans in fixture_docs()}


def test_every_fixture_doc_present(pipeline_out, oracle_out):
    assert set(pipeline_out) == set(oracle_out)


@pytest.mark.parametrize("doc_id", [d for d, _ in fixture_docs()])
def test_span_sequence_equality(doc_id, pipeline_out, oracle_out):
    got = [(s["kind"], s["text"], s["media_ref"], s["offset"])
           for s in pipeline_out[doc_id]["spans"]]
    assert got == oracle_out[doc_id].spans


@pytest.mark.parametrize("doc_id", [d for d, _ in fixture_docs()])
def test_markdown_equality(doc_id, pipeline_out, oracle_out):
    assert pipeline_out[doc_id]["markdown"] == oracle_out[doc_id].markdown


@pytest.mark.parametrize("doc_id", [d for d, _ in fixture_docs()])
def test_status_and_failures(doc_id, pipeline_out, oracle_out):
    assert pipeline_out[doc_id]["status"] == oracle_out[doc_id].status
    assert pipeline_out[doc_id]["n_failures"] == oracle_out[doc_id].n_failures


def test_vlm_branch_golden_parity(spark):
    """pdf_vlm=True routes pdf docs through the whole-doc VLM contract:
    Spark output must equal the refparser oracle with the same flag,
    including the distinctive semantics (verbatim text, whole-doc
    failure on one bad line, page blocks + page breaks, empty guard)."""
    pdf_ids = {d for d, spans in fixture_docs()
               if any(k == "pdf_line" for k, _, _, _ in spans)}
    from document_parser_spark.plans.pipeline import extract
    from document_parser_spark.sources.synth import fixtures_dataframe
    got = {r["doc_id"]: r
           for r in extract(fixtures_dataframe(spark),
                            pdf_vlm=True).collect()
           if r["doc_id"] in pdf_ids}
    for doc_id, spans in fixture_docs():
        if doc_id not in pdf_ids:
            continue
        want = parse_document(doc_id, spans, pdf_vlm=True)
        r = got[doc_id]
        assert [(s["kind"], s["text"], s["media_ref"], s["offset"])
                for s in r["spans"]] == want.spans, doc_id
        assert r["markdown"] == want.markdown, doc_id
        assert r["status"] == want.status, doc_id
        assert r["n_failures"] == want.n_failures, doc_id
    # the malformed-lines fixture must fail WHOLE-doc under VLM
    assert got["pm-0002"]["status"] == "parse_failure"
    assert len(got["pm-0002"]["spans"]) == 0
    # multi-page fixture keeps page breaks
    kinds = [s["kind"] for s in got["pm-0001"]["spans"]]
    assert kinds.count("page_break") == 2
