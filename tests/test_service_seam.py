"""External-service seam (r4 VERDICT #7): the per-partition batched
callable slot behind the enrichment stages — bounded concurrency,
timeout, A4 failure rows — with deterministic stub services that must
reproduce the pure-column stub rows EXACTLY (the oracle contract is
unchanged whichever side of the seam runs)."""

from __future__ import annotations

import threading
import time

from document_parser_spark.operators.service import (
    BatchedService,
    ocr_service_fn,
    ocr_via_service,
    translate_service_fn,
    translate_via_service,
)

SPAN_SCHEMA = ("doc_id string, spans array<struct<kind:string,text:string,"
               "media_ref:string,offset:int>>")

ROWS = [
    ("d1", [("text", "before the `first` image", "", 0),
            ("image", "", "m://d1/a", 1),
            ("text", "between images", "", 2),
            ("image", "", "m://d1/b", 3)]),
    ("d2", [("image", "", "m://d2/solo", 0),
            ("table", "a\x1fb\x1ec\x1fd", "", 1)]),
    ("d3", [("text", "no targets here", "", 0)]),
]


def _spans(df):
    return {
        r.doc_id: [(s["kind"], s["text"], s["media_ref"], s["offset"])
                   for s in r.spans]
        for r in df.collect()
    }


# ---- parity: service-backed path == pure-column stub path ----------


def test_ocr_service_matches_column_stub(spark):
    from document_parser_spark.operators.enrich import (
        insert_ocr_after_images,
    )
    docs = spark.createDataFrame(ROWS, SPAN_SCHEMA)
    want = _spans(insert_ocr_after_images(docs))
    got = _spans(ocr_via_service(
        docs, BatchedService(ocr_service_fn, batch_size=2)))
    assert got == want


def test_translate_service_matches_column_stub(spark):
    from document_parser_spark.operators.enrich import translate_spans
    docs = spark.createDataFrame(ROWS, SPAN_SCHEMA)
    want = _spans(translate_spans(docs))
    got = _spans(translate_via_service(
        docs, BatchedService(translate_service_fn, batch_size=3)))
    assert got == want


# ---- the slot's own contract (no Spark needed) ----------------------


def test_concurrency_is_bounded():
    lock = threading.Lock()
    live = peak = 0

    def fn(chunk):
        nonlocal live, peak
        with lock:
            live += 1
            peak = max(peak, live)
        time.sleep(0.05)
        with lock:
            live -= 1
        return [c.upper() for c in chunk]

    svc = BatchedService(fn, batch_size=2, concurrency=3)
    results, ok = svc([f"p{i}" for i in range(40)])
    assert results == [f"P{i}" for i in range(40)]
    assert all(ok)
    assert peak <= 3
    assert peak >= 2      # the pool really overlapped calls


def test_failing_batch_becomes_fallback_rows():
    def fn(chunk):
        if any("BOOM" in c for c in chunk):
            raise RuntimeError("service exploded")
        return [c.upper() for c in chunk]

    svc = BatchedService(fn, batch_size=2, fallback="<FAIL>")
    results, ok = svc(["a", "b", "BOOM", "d", "e"])
    # chunks: [a,b] ok, [BOOM,d] failed together, [e] ok
    assert results == ["A", "B", "<FAIL>", "<FAIL>", "E"]
    assert ok == [True, True, False, False, True]


def test_timeout_becomes_fallback_rows():
    def fn(chunk):
        if "slow" in chunk[0]:
            time.sleep(5)
        return [c.upper() for c in chunk]

    svc = BatchedService(fn, batch_size=1, concurrency=2,
                         timeout_s=0.2, fallback="<TIMEOUT>")
    results, ok = svc(["slow one", "fast"])
    assert results == ["<TIMEOUT>", "FAST"]
    assert ok == [False, True]


def test_outage_circuit_breaker_bounds_wall_clock():
    """A full outage (every call hangs) must cost ~concurrency x
    timeout_s, NOT n_chunks x timeout_s — thousands of queued chunks
    each burning a full timeout is the task-hang A4 exists to avoid."""
    hang = threading.Event()   # never set: every call blocks forever

    def fn(chunk):
        hang.wait()
        return chunk

    svc = BatchedService(fn, batch_size=1, concurrency=3,
                         timeout_s=0.2, fallback="<DOWN>")
    t0 = time.monotonic()
    results, ok = svc([f"p{i}" for i in range(50)])
    wall = time.monotonic() - t0
    assert results == ["<DOWN>"] * 50 and ok == [False] * 50
    # 3 lanes x 0.2s timeout = breaker trips ~0.6s; 50 x 0.2s = 10s
    # is the pathology; generous margin for scheduler noise
    assert wall < 3.0


def test_one_hung_lane_does_not_fail_healthy_chunks():
    """A single hung worker holds exactly one chunk; the other lanes
    must drain everything else successfully (the breaker only trips
    on `concurrency` CONSECUTIVE timeouts with no success between)."""
    hang = threading.Event()

    def fn(chunk):
        if chunk[0] == "stuck":
            hang.wait()
        return [c.upper() for c in chunk]

    svc = BatchedService(fn, batch_size=1, concurrency=2,
                         timeout_s=0.5, fallback="<T>")
    payloads = ["stuck"] + [f"ok{i}" for i in range(20)]
    results, ok = svc(payloads)
    assert results[0] == "<T>" and ok[0] is False
    assert results[1:] == [p.upper() for p in payloads[1:]]
    assert all(ok[1:])


def test_sustained_outage_bounds_hung_threads():
    """A sustained outage across MANY calls must not leak one wave of
    abandoned worker threads per call in a long-lived executor worker
    (thread-stack memory + OS thread limits -> the 'can't start new
    thread' task failure A4 exists to avoid). The instance's live
    spawned threads stay capped at max_hung_threads, calls past the
    budget resolve to fallback IMMEDIATELY (no timeout_s burn), and a
    later recovery restores service through the same instance."""
    hang = threading.Event()

    def fn(chunk):
        if not hang.is_set():
            hang.wait()
        return [c.upper() for c in chunk]

    svc = BatchedService(fn, batch_size=1, concurrency=3,
                         timeout_s=0.1, fallback="<DOWN>")
    before = threading.active_count()
    for _ in range(10):                      # 10 calls x 3 lanes
        results, ok = svc(["a", "b", "c", "d"])
        assert results == ["<DOWN>"] * 4 and ok == [False] * 4
    alive = [t for t in svc._spawned if t.is_alive()]
    assert len(alive) <= svc.max_hung_threads == 12
    assert threading.active_count() - before <= svc.max_hung_threads
    # budget exhausted -> zero-lane calls are immediate, not timeout_s
    t0 = time.monotonic()
    results, ok = svc([f"p{i}" for i in range(100)])
    assert results == ["<DOWN>"] * 100 and not any(ok)
    assert time.monotonic() - t0 < 0.5
    # service recovers: hung threads drain, the budget returns
    hang.set()
    for t in alive:
        t.join(timeout=5.0)
    results, ok = svc(["x", "y"])
    assert results == ["X", "Y"] and all(ok)


def test_used_instance_still_pickles_into_a_plan():
    """A service called driver-side first holds live Thread objects in
    its hung-thread ledger; it must still cloudpickle into a
    mapInPandas closure (the ledger is per-process state — each
    executor starts with a fresh budget)."""
    from pyspark import cloudpickle

    def fn(chunk):                          # picklable (no captured
        time.sleep(20)                      # locks) but slow enough to
        return chunk                        # leave its threads alive

    svc = BatchedService(fn, batch_size=1, concurrency=2, timeout_s=0.1)
    svc(["a", "b"])                         # leaves 2 hung threads
    assert any(t.is_alive() for t in svc._spawned)
    clone = cloudpickle.loads(cloudpickle.dumps(svc))
    assert clone._spawned == []
    assert clone.max_hung_threads == svc.max_hung_threads


def test_wrong_length_response_is_a_failure():
    svc = BatchedService(lambda chunk: ["only one"], batch_size=3,
                         fallback="<BAD>")
    results, ok = svc(["a", "b", "c"])
    assert results == ["<BAD>"] * 3 and ok == [False] * 3


# ---- A4 through Spark: a failing service yields rows, not a crash --


def test_failing_service_through_spark_is_rows(spark):
    from document_parser_spark.operators.enrich import OCR_FALLBACK_TEXT

    def fn(chunk):
        raise RuntimeError("network down")

    docs = spark.createDataFrame(ROWS, SPAN_SCHEMA)
    out = _spans(ocr_via_service(docs, BatchedService(fn, batch_size=8)))
    # every OCR splice carries the reference's fixed fallback string
    ocr_texts = [s[1] for spans in out.values() for s in spans
                 if s[0] == "text" and s[1] == OCR_FALLBACK_TEXT]
    assert len(ocr_texts) == 4        # 3 images + 1 table
    assert len(out["d1"]) == 6 and len(out["d3"]) == 1


def test_translate_failure_preserves_source_text(spark):
    """A failed/timed-out translate batch must KEEP the original span
    text — the in-place rewrite's A4 fallback is pass-through, never
    the service's fixed fallback string (which is OCR-error prose and
    would destroy the document text)."""
    def fn(chunk):
        if any("boom" in c for c in chunk):
            raise RuntimeError("translator down")
        return [c.upper() for c in chunk]

    docs = spark.createDataFrame(
        [("d1", [("text", "boom sentence", "", 0),
                 ("text", "clean sentence", "", 1),
                 ("image", "", "m://x", 2)])], SPAN_SCHEMA)
    got = _spans(translate_via_service(
        docs, BatchedService(fn, batch_size=1)))
    assert got["d1"] == [("text", "boom sentence", "", 0),
                         ("text", "CLEAN SENTENCE", "", 1),
                         ("image", "", "m://x", 2)]


def test_null_spans_pass_through_both_seams(spark):
    """A NULL spans array passes through whole, exactly like the
    column twins (F.transform(NULL) is NULL) — never-throw parity on
    the same input."""
    from document_parser_spark.operators.enrich import (
        insert_ocr_after_images,
        translate_spans,
    )

    docs = spark.createDataFrame(
        [("dnull", None),
         ("d1", [("image", "", "m://a", 0),
                 ("text", "hello", "", 1)])], SPAN_SCHEMA)
    for seam, twin in (
            (lambda d: ocr_via_service(
                d, BatchedService(ocr_service_fn)),
             insert_ocr_after_images),
            (lambda d: translate_via_service(
                d, BatchedService(translate_service_fn)),
             translate_spans)):
        got = {r.doc_id: r.spans for r in seam(docs).collect()}
        want = {r.doc_id: r.spans for r in twin(docs).collect()}
        assert got["dnull"] is None and want["dnull"] is None
        assert got == want
