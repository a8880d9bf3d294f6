"""Deterministic hashing expressions.

hash_id reproduces the reference's stable row id
(sha256("|".join(parts))[:24], /root/reference/pipeline/sources/ecommerce/
kaggle_amazon_sales_loader.py:28-31) — exact hex parity.

minhash_expr builds engine-portable MinHash signatures from md5 so the
DuckDB oracle can compute the identical signature (Spark's xxhash64 and
DuckDB's hash() are different algorithms; md5 is the portable common
denominator).  At 100 TB the md5-vs-xxhash cost difference is dwarfed by
the shuffle the LSH band join saves.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hash_id(*parts: Column, length: int = 24) -> Column:
    """sha256 of '|'-joined parts, first ``length`` hex chars."""
    return F.substring(F.sha2(F.concat_ws("|", *parts), 256), 1, length)


def minhash_expr(shingle: Column, seed: int) -> Column:
    """One MinHash hash function: md5(seed || shingle); take MIN() of this
    over a document's shingles to get signature component ``seed``.
    Lexicographic MIN over fixed-width hex == numeric min of the hash."""
    return F.md5(F.concat(F.lit(f"{seed}:"), shingle))


def md5_stream(salt: str, col: Column) -> Column:
    """First 8 md5 hex chars of salt||col as a BIGINT in [0, 2^32): an
    independent deterministic pseudo-random stream per salt — the
    engine-portable substitute for RNG state used by the sampling, sketch,
    generator and fuzz queries.  MUST stay the exact mirror of
    ``sql_md5_stream`` below: the per-query oracles replay these streams
    bit-for-bit."""
    return F.conv(
        F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")


def sql_hexbig(expr: str, start: int, n: int) -> str:
    """DuckDB: hex chars [start, start+n) of md5(expr) as a BIGINT (DuckDB
    has no conv(hex); rebuild with per-char instr shifts)."""
    return (
        f"CAST(list_sum(list_transform(range(1, {n + 1}),"
        f" i -> CAST(instr('0123456789abcdef',"
        f" substr(md5({expr}), {start} + i - 1, 1)) - 1 AS BIGINT)"
        f" << (4 * ({n} - i)))) AS BIGINT)"
    )


def sql_md5_stream(salt_expr: str) -> str:
    """DuckDB twin of ``md5_stream``: the 8-hex-char md5 prefix of an
    already-salted SQL string expression as a BIGINT."""
    return sql_hexbig(salt_expr, 1, 8)
