"""Text-analysis operators over a ``documents(doc_id, text, ...)`` table.

Language-ID, quality scoring, token counting, and document
fingerprinting — the per-document scoring pass of a training-data
pipeline. Everything here is built-in-function only (whole-stage
codegen, no Python in the hot path) except ``rolling_fingerprints``,
which is a vectorized pandas UDF because a Rabin-Karp rolling hash is
a sequential recurrence the SQL function library cannot express.

All column names are aliased exactly as the driver's DuckDB oracles
expect (the compare hashes values under sorted column names).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import ArrayType, LongType

# Shared vocabulary for the language-ID heuristic. Tiny on purpose —
# it is broadcast into every task as a literal filter; at 100 TB the
# cost is one array_contains per token, all codegen.
STOPWORDS = {
    "en": ("the", "a", "of", "to", "and", "in", "is", "it", "on", "for"),
    "de": ("der", "die", "das", "und", "ist", "ein", "zu", "den", "mit"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "des", "du"),
    "es": ("el", "la", "los", "las", "es", "un", "una", "de", "que"),
}

# words + numbers + each punctuation mark = a BPE-ish lower bound on
# token count (real BPE splits rare words further, never coarser).
BPE_TOKEN_RE = r"[A-Za-z0-9]+|[^A-Za-z0-9\s]"

EN_STOP_RATIO_MIN = 0.05  # >=5% English stopwords -> guess 'en'
QUALITY_MIN_TOKENS = 8
QUALITY_MAX_MEAN_WORD_LEN = 12.0


def _words(col: str = "text") -> F.Column:
    return F.split(F.col(col), " ")


def token_stats(docs: DataFrame) -> DataFrame:
    """(doc_id, n_ws_tokens, n_bpe_tokens, n_chars) — one narrow map."""
    return docs.select(
        "doc_id",
        F.size(_words()).cast("long").alias("n_ws_tokens"),
        F.regexp_count("text", F.lit(BPE_TOKEN_RE)).cast("long")
        .alias("n_bpe_tokens"),
        F.length("text").cast("long").alias("n_chars"),
    )


def quality_scores(docs: DataFrame) -> DataFrame:
    """Length / stopword / word-shape quality features + a keep flag.

    Mirrors the reference's role of dropping junk before serialization
    (SURVEY §2.2 P3/P4) generalized to corpus curation.
    """
    w = _words()
    en = F.array(*[F.lit(s) for s in STOPWORDS["en"]])
    n_tok = F.size(w).cast("long")
    n_stop = F.size(F.filter(w, lambda x: F.array_contains(en, F.lower(x))))
    mean_len = (F.length(F.regexp_replace("text", " ", "")).cast("double")
                / F.greatest(n_tok, F.lit(1)).cast("double"))
    return docs.select(
        "doc_id",
        n_tok.alias("n_tokens"),
        F.round(n_stop.cast("double") / n_tok.cast("double"), 3)
        .alias("stop_ratio"),
        F.round(mean_len, 3).alias("mean_word_len"),
        (
            (n_tok >= QUALITY_MIN_TOKENS)
            & (mean_len <= QUALITY_MAX_MEAN_WORD_LEN)
        ).cast("int").cast("long").alias("quality_ok"),
    )


def lang_id(docs: DataFrame) -> DataFrame:
    """N-gram-free stopword-ratio language guess (deterministic
    heuristic; per-language ratio, argmax with fixed tie order)."""
    w = F.transform(_words(), F.lower)

    def ratio(stops: tuple[str, ...]) -> F.Column:
        arr = F.array(*[F.lit(s) for s in stops])
        return (F.size(F.filter(w, lambda x: F.array_contains(arr, x)))
                .cast("double")
                / F.greatest(F.size(w), F.lit(1)).cast("double"))

    ratios = {lang: ratio(stops) for lang, stops in STOPWORDS.items()}
    # fixed evaluation order = deterministic argmax (strict > keeps the
    # earlier language on ties — same CASE chain in the SQL oracle)
    order = ("en", "de", "fr", "es")
    best_ratio = ratios[order[0]]
    best_lang = F.lit(order[0])
    for lang in order[1:]:
        cond = ratios[lang] > best_ratio
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_ratio = F.when(cond, ratios[lang]).otherwise(best_ratio)
    guess = F.when(best_ratio >= F.lit(EN_STOP_RATIO_MIN), best_lang) \
             .otherwise(F.lit("unk"))
    return docs.select(
        "doc_id",
        guess.alias("lang_guess"),
        F.round(best_ratio, 3).alias("lang_score"),
    )


def fingerprint(docs: DataFrame) -> DataFrame:
    """Whole-document fingerprint: md5 of whitespace-normalized,
    lowercased text. The exact-dedup key."""
    norm = F.lower(F.regexp_replace(F.trim(F.col("text")), r"\s+", " "))
    return docs.select("doc_id", F.md5(norm).alias("fp"))


def rolling_fingerprints(docs: DataFrame, window: int = 8,
                         base: int = 1000003,
                         mod: int = (1 << 61) - 1) -> DataFrame:
    """Rabin-Karp rolling hashes over the word stream, one fingerprint
    per ``window``-word span -> (doc_id, fps array<long>).

    A rolling recurrence (h_{i+1} = (h_i - w_i*B^{k-1})*B + w_{i+k})
    is inherently sequential per document, so this is the designated
    pandas-UDF slow path: numpy-vectorized across the window starts of
    each doc, Arrow-batched across docs. Used for locality-sensitive
    span-level dedup (content-defined chunking style).
    """
    def hash_word(w: str) -> int:
        # FNV-1a, pure python but called once per word per doc
        h = 0xcbf29ce484222325
        for b in w.encode("utf-8"):
            h = ((h ^ b) * 0x100000001b3) & 0xFFFFFFFFFFFFFFFF
        return h & 0x7FFFFFFFFFFFFFFF

    @F.pandas_udf(ArrayType(LongType()))
    def roll(texts: pd.Series) -> pd.Series:
        out = []
        pow_k = pow(base, window - 1, mod)
        for t in texts:
            words = (t or "").split(" ")
            hs = np.array([hash_word(w) for w in words], dtype=np.int64)
            n = len(hs)
            if n < window:
                out.append([])
                continue
            fps = np.empty(n - window + 1, dtype=np.int64)
            h = 0
            for i in range(window):
                h = (h * base + int(hs[i])) % mod
            fps[0] = h
            for i in range(1, n - window + 1):
                h = ((h - int(hs[i - 1]) * pow_k) * base
                     + int(hs[i + window - 1])) % mod
                fps[i] = h % mod
            out.append([int(x) % mod for x in fps])
        return pd.Series(out)

    return docs.select("doc_id", roll("text").alias("fps"))
