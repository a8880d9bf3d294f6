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
