"""Portable 60-bit hashing shared by dedup/similarity operators.

Every hash that participates in a driver-verified query must be
reproducible in ANSI SQL (DuckDB oracle), so we derive integers from
``md5`` hex (available and bit-identical in both engines) instead of
Spark's private ``xxhash64``/``hash``:

    Spark : cast(conv(substr(md5(s), 1, 15), 16, 10) as bigint)
    DuckDB: ('0x' || substr(md5(s), 1, 15))::bigint

15 hex chars = 60 bits, always positive, no signed-overflow asymmetry
between the two engines. At 100 TB scale md5 costs more than
xxhash64; the operators accept a ``fast_hash`` flag that swaps in
``xxhash64`` when oracle portability is not needed (production path).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

HASH_BITS = 60


def h60(col: Column) -> Column:
    """Portable 60-bit positive hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def h60_fast(col: Column) -> Column:
    """xxhash64 folded to 60 bits — JVM-codegen fast path (not
    oracle-portable; used when ``fast_hash=True``)."""
    return F.pmod(F.xxhash64(col), F.lit(1 << HASH_BITS)).cast("long")


def hash_col(col: Column, fast: bool = False) -> Column:
    return h60_fast(col) if fast else h60(col)
