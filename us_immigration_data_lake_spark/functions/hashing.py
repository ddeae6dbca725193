"""Cross-engine-portable hashing.

The engine's perf-path hash is JVM ``xxhash64`` (operators/dedup.py) —
fast, but nothing outside Spark computes it, so queries built on it can
only be rows-count-checked by an external oracle. ``md5_long`` is the
portable alternative: the first 15 hex digits of md5 parsed as a
60-bit non-negative BIGINT. Every engine with md5 + hex parsing
reproduces it bit-for-bit; DuckDB spelling:

    ('0x' || substr(md5(x), 1, 15))::BIGINT

15 digits (not 16) keeps the value under 2^60, clear of BIGINT sign
issues in either engine. Same family as functions/splits.py's
4-hex-digit split bucket, widened for hash-ordering use (MinHash needs
min() over hash values, SimHash needs 60 usable bits).

Use for correctness-gated variants of hash-dependent operators; keep
xxhash64 for the bench/scale path (md5 is ~5-10× more expensive per
call).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# usable bits in an md5_long value (15 hex digits)
MD5_LONG_BITS = 60


def md5_long(col: Column | str) -> Column:
    """Portable 60-bit hash of a string column: first 15 hex digits of
    md5 as BIGINT. Non-negative, deterministic, engine-independent."""
    c = F.col(col) if isinstance(col, str) else col
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")
