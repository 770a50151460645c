"""Pluggable external-service seam for the enrichment stages.

The reference calls live services per element with bounded concurrency:
the VLM image parser runs its requests through a concurrency=3 slot
(image_parser.py:86) and the translator serializes calls behind a
semaphore (translator/v1/service.py:27). This module is that boundary
re-expressed for Spark: a **per-partition batched callable** with
bounded concurrency, a timeout, and the A4 failure posture (an
errored/timed-out batch yields fallback rows, never a task failure).

Hermeticity (SURVEY §7.0) is preserved: nothing here does IO — the
deterministic stubs (`ocr_service_fn`, `translate_service_fn`)
reproduce the pure-column expressions in ``operators.enrich`` exactly
(same sha2-derived OCR token, same uppercase+backtick translation), so
the oracle rows are unchanged whichever path runs. A production
deployment swaps the ``fn`` for an HTTP batch call and touches nothing
else: the plan shape, batching, concurrency bound, and failure
semantics all live on this side of the seam.

Scale notes: the service call runs INSIDE the executor task (one
thread pool per partition, ``concurrency`` in-flight batches), so
total in-flight requests across the cluster = partitions x
concurrency — size partitions to the service's rate limit, exactly
the knob the reference's semaphore provides per process. The spliced
relation is a narrow map over the reassembled docs: no extra shuffle.
"""

from __future__ import annotations

import hashlib
import queue
import threading
from typing import Callable, Iterator, Sequence

import pandas as pd

from document_parser_spark.operators.enrich import (
    OCR_FALLBACK_TEXT,
    TRANSLATED_KINDS,
)


class BatchedService:
    """A bounded-concurrency, timeout-guarded batch-call slot.

    ``fn``: the service — takes a list of payload strings, returns the
    same-length list of results. Called on chunks of ``batch_size``
    payloads, at most ``concurrency`` chunks in flight (DAEMON worker
    threads per call — requests overlap IO exactly like the
    reference's concurrency=3 VLM slot, and a hung call can never
    block Python-worker exit the way concurrent.futures' atexit join
    would). A chunk whose call raises or exceeds ``timeout_s``
    resolves to ``fallback`` for every payload in it and is reported
    failed — the A4 posture (the reference splices a fixed fallback
    string on OCR errors, image_parser.py:174-182).

    Outage circuit-breaker: as many consecutive chunk timeouts as
    there are lanes with no success in between means every lane is
    hung or the service is down — the remaining chunks resolve to
    fallback IMMEDIATELY instead of each burning its own ``timeout_s``
    (an Arrow batch can hold thousands of chunks; without the breaker
    one outage turns a task into n_chunks x timeout_s of wall clock).
    Worst-case wall for a full outage: ~concurrency x timeout_s.

    Hung-thread bound: abandoned workers (a timed-out ``fn`` call
    never returning) stay alive inside a long-lived executor worker,
    so a sustained outage across MANY calls must not accumulate one
    wave of threads per call. The instance tracks its still-alive
    spawned threads and refuses to spawn past ``max_hung_threads``
    (default 4x concurrency): with no lane budget left a call resolves
    straight to fallback (zero new threads, zero extra wall), and the
    budget returns automatically when hung calls eventually die.
    """

    def __init__(self, fn: Callable[[list[str]], Sequence[str]],
                 batch_size: int = 32, concurrency: int = 3,
                 timeout_s: float = 30.0,
                 fallback: str = OCR_FALLBACK_TEXT,
                 max_hung_threads: int | None = None) -> None:
        if batch_size < 1 or concurrency < 1:
            raise ValueError("batch_size and concurrency must be >= 1")
        self.fn = fn
        self.batch_size = batch_size
        self.concurrency = concurrency
        self.timeout_s = timeout_s
        self.fallback = fallback
        self.max_hung_threads = (4 * concurrency if max_hung_threads is None
                                 else max_hung_threads)
        self._spawned: list[threading.Thread] = []

    def __getstate__(self):
        # the hung-thread ledger is per-process state: Thread objects
        # don't pickle, and a service instance used driver-side first
        # must still cloudpickle into a mapInPandas closure — each
        # executor process starts with a fresh budget
        state = self.__dict__.copy()
        state["_spawned"] = []
        return state

    def __call__(self, payloads: list[str]) -> tuple[list[str], list[bool]]:
        """-> (results, ok flags), positionally aligned with payloads."""
        if not payloads:
            return [], []
        chunks = [payloads[i:i + self.batch_size]
                  for i in range(0, len(payloads), self.batch_size)]
        buf: list[Sequence[str] | None] = [None] * len(chunks)
        done = [threading.Event() for _ in chunks]
        todo: queue.SimpleQueue = queue.SimpleQueue()
        for i in range(len(chunks)):
            todo.put(i)
        halted = threading.Event()

        def worker() -> None:
            while not halted.is_set():
                try:
                    i = todo.get_nowait()
                except queue.Empty:
                    return
                try:
                    res = list(self.fn(chunks[i]))
                    if len(res) != len(chunks[i]):
                        raise ValueError("service returned wrong length")
                    buf[i] = res
                except Exception:
                    buf[i] = None
                done[i].set()

        # hung-thread budget: prune finished waves, then spawn only
        # what fits under max_hung_threads (0 lanes = immediate-outage
        # posture: everything below resolves to fallback without
        # burning timeout_s, because no done[i] will ever be set and
        # lanes == 0 trips the breaker on the first wait)
        self._spawned = [t for t in self._spawned if t.is_alive()]
        budget = max(0, self.max_hung_threads - len(self._spawned))
        lanes = min(self.concurrency, len(chunks), budget)
        for _ in range(lanes):
            t = threading.Thread(target=worker, daemon=True)
            t.start()
            self._spawned.append(t)

        results: list[str] = []
        ok: list[bool] = []
        timeout_streak = 0
        outage = lanes == 0
        for i, chunk in enumerate(chunks):
            res = None
            if not outage:
                if done[i].wait(timeout=self.timeout_s):
                    res = buf[i]
                    timeout_streak = 0
                else:
                    # the worker holding this chunk is hung; it will
                    # never pick another chunk, so `lanes`
                    # consecutive timeouts = every lane gone
                    timeout_streak += 1
                    if timeout_streak >= lanes:
                        outage = True
                        halted.set()
            if res is not None:
                results += res
                ok += [True] * len(chunk)
            else:
                results += [self.fallback] * len(chunk)
                ok += [False] * len(chunk)
        halted.set()
        return results, ok


def ocr_service_fn(payloads: list[str]) -> list[str]:
    """Deterministic stub service: byte-identical to the pure-column
    ``enrich.ocr_stub`` ('[ocr:' + sha2(seed, 256)[:12] + ']') so the
    service-backed path and the column path produce the same rows."""
    return ["[ocr:" + hashlib.sha256(p.encode("utf-8")).hexdigest()[:12]
            + "]" for p in payloads]


def translate_service_fn(payloads: list[str]) -> list[str]:
    """Deterministic stub translator: identical to
    ``enrich.translate_stub`` (uppercase, then the F7 backtick
    sanitization — translator/v1/service.py:99)."""
    return [p.upper().replace("`", "*") for p in payloads]


def ocr_via_service(docs, service: BatchedService,
                    spans_col: str = "spans",
                    include_tables: bool = True):
    """Service-backed twin of ``enrich.insert_ocr_after_images``: for
    every image span (and table span, matching the reference's
    PictureItem-or-TableItem condition) splice the service's OCR text
    immediately after it, then renumber offsets 0..n-1.

    One ``mapInPandas`` pass over the reassembled docs; each Arrow
    batch gathers ALL its target payloads into one service invocation
    set (chunked + concurrent inside :class:`BatchedService`), so the
    per-request overhead amortizes across documents — the reference
    issues one request per element and throttles with the semaphore;
    the batch seam is the Spark-shaped version of the same bound."""
    fields = ["kind", "text", "media_ref", "offset"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            payloads: list[str] = []
            for spans in pdf[spans_col]:
                # NULL spans arrays pass through untouched, exactly
                # like the column twin (F.transform(NULL) is NULL) —
                # never-throw parity on the same input
                for s in (spans if spans is not None else ()):
                    if _is_ocr_target(s, include_tables):
                        payloads.append(s["media_ref"] or s["text"] or "")
            results, _ok = service(payloads)
            it = iter(results)
            new_col = []
            for spans in pdf[spans_col]:
                if spans is None:
                    new_col.append(None)
                    continue
                out = []
                for s in spans:
                    out.append({f: s[f] for f in fields})
                    if _is_ocr_target(s, include_tables):
                        out.append({"kind": "text", "text": next(it),
                                    "media_ref": "", "offset": s["offset"]})
                for i, s in enumerate(out):
                    s["offset"] = i
                new_col.append(out)
            out_pdf = pdf.copy()
            out_pdf[spans_col] = new_col
            yield out_pdf

    return docs.mapInPandas(run, schema=docs.schema)


def _is_ocr_target(s, include_tables: bool) -> bool:
    if s["kind"] == "image" and s["media_ref"]:
        return True
    return include_tables and s["kind"] == "table"


# the service twin must translate EXACTLY the kinds the column twin
# does — shared constant, not a re-declaration that could drift
_TRANSLATED = TRANSLATED_KINDS


def translate_via_service(docs, service: BatchedService,
                          spans_col: str = "spans"):
    """Service-backed twin of ``enrich.translate_spans``: translate
    text-bearing spans in place through the batched seam."""
    fields = ["kind", "text", "media_ref", "offset"]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            # NULL text passes through untranslated, exactly like the
            # column twin (F.upper(NULL) is NULL); NULL spans arrays
            # pass through whole (F.transform(NULL) is NULL)
            payloads = [s["text"] for spans in pdf[spans_col]
                        for s in (spans if spans is not None else ())
                        if s["kind"] in _TRANSLATED
                        and s["text"] is not None]
            results, ok = service(payloads)
            # translation failure KEEPS THE SOURCE TEXT — the correct
            # A4 fallback for an in-place rewrite is pass-through, not
            # the service's fixed fallback string (which is OCR-error
            # prose and would DESTROY the span text); the ok flags say
            # which chunks resolved to the fallback
            fixed = [r if k else p for r, k, p in zip(results, ok, payloads)]
            it = iter(fixed)
            new_col = []
            for spans in pdf[spans_col]:
                if spans is None:
                    new_col.append(None)
                    continue
                out = []
                for s in spans:
                    d = {f: s[f] for f in fields}
                    if s["kind"] in _TRANSLATED and s["text"] is not None:
                        d["text"] = next(it)
                    out.append(d)
                new_col.append(out)
            out_pdf = pdf.copy()
            out_pdf[spans_col] = new_col
            yield out_pdf

    return docs.mapInPandas(run, schema=docs.schema)
