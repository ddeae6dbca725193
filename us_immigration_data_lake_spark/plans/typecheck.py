"""Canonical result-type families for Spark-vs-DuckDB oracle parity.

Round-5 lesson (VERDICT.md "What's wrong" #1): the driver's value hash is
type-sensitive — DuckDB ``factorial()`` returning HUGEINT hashed differently
from Spark's BIGINT even though every value was identical, because wide /
unsigned integers survive the pandas conversion as ``float64``/``object``
while int64-range types print identically.  The local parity suite
stringified values and could not see the drift.

This module maps both engines' declared types into *canonical families*
such that two columns in the same family produce byte-identical normalized
values under the driver's conversion, and two columns in different families
may not.  ``tests/test_oracle_parity.py`` asserts family equality for every
oracle-gated query, so a q180-class artifact now fails in pytest before the
driver ever sees it.

Family design notes:

- Every signed/unsigned integer that fits in int64 is one family
  (``int``): the pandas bridge renders them all as the same digits.
- ``HUGEINT``/``UBIGINT`` (128-bit / unsigned-64) are a *different*
  family (``int128``): pandas widens them to float64 or object, which is
  exactly the q180 failure mode.
- ``float`` (32-bit) and ``double`` are distinct families: float32 repr
  of a value differs from float64 repr.
- Nested types canonicalize recursively (``array<int>`` vs ``BIGINT[]``).
- Unknown spellings canonicalize to themselves (lowercased) so brand-new
  types fail closed (a mismatch), not open.
"""

from __future__ import annotations

import re


def _split_top_comma(s: str) -> tuple[str, str] | None:
    """Split ``s`` at its single top-level comma (depth 0 w.r.t. any of
    ``<>()[]``), returning (left, right) or None if there isn't exactly
    one.  A greedy regex backtracks to the LAST comma, which mis-splits
    nested types like ``map(varchar, map(varchar, bigint))`` — the key
    family would be computed from the wrong substring (ADVICE r6)."""
    depth = 0
    cut = -1
    for i, ch in enumerate(s):
        if ch in "<([":
            depth += 1
        elif ch in ">)]":
            depth -= 1
        elif ch == "," and depth == 0:
            if cut != -1:
                return None  # more than one top-level comma: fail closed
            cut = i
    if cut == -1:
        return None
    return s[:cut], s[cut + 1:]

# --- Spark side -----------------------------------------------------------

_SPARK_SCALAR = {
    "tinyint": "int",
    "smallint": "int",
    "int": "int",
    "bigint": "int",
    "float": "float32",
    "double": "float",
    "string": "str",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ntz": "ts",
    "boolean": "bool",
    "binary": "bytes",
    "void": "null",
    "variant": "variant",
}


def canon_spark_type(s: str) -> str:
    """Canonical family for a Spark ``DataType.simpleString()``."""
    s = s.strip().lower()
    if s in _SPARK_SCALAR:
        return _SPARK_SCALAR[s]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    m = re.fullmatch(r"array<(.+)>", s)
    if m:
        return f"array<{canon_spark_type(m.group(1))}>"
    if s.startswith("map<") and s.endswith(">"):
        kv = _split_top_comma(s[4:-1])
        if kv is not None:
            k, v = kv
            return f"map<{canon_spark_type(k)},{canon_spark_type(v.strip())}>"
    if s.startswith("struct<"):
        return "struct"
    return s


# --- DuckDB side ----------------------------------------------------------

_DUCK_SCALAR = {
    "tinyint": "int",
    "smallint": "int",
    "integer": "int",
    "bigint": "int",
    "utinyint": "int",
    "usmallint": "int",
    "uinteger": "int",
    # NOT int64-safe under the pandas bridge — the q180 failure family:
    "ubigint": "int128",
    "hugeint": "int128",
    "uhugeint": "int128",
    "float": "float32",
    "real": "float32",
    "double": "float",
    "varchar": "str",
    "text": "str",
    "date": "date",
    "timestamp": "ts",
    "timestamp_ns": "ts",
    "timestamp with time zone": "ts",
    "boolean": "bool",
    "blob": "bytes",
    "null": "null",
    '"null"': "null",
    "json": "variant",
}


def canon_duck_type(s: str) -> str:
    """Canonical family for a stringified DuckDB result type."""
    s = s.strip().lower()
    if s in _DUCK_SCALAR:
        return _DUCK_SCALAR[s]
    m = re.fullmatch(r"decimal\((\d+),(\d+)\)", s)
    if m:
        return f"decimal({m.group(1)},{m.group(2)})"
    if s.endswith("[]"):
        return f"array<{canon_duck_type(s[:-2])}>"
    if s.startswith("map(") and s.endswith(")"):
        kv = _split_top_comma(s[4:-1])
        if kv is not None:
            k, v = kv
            return f"map<{canon_duck_type(k)},{canon_duck_type(v.strip())}>"
    if s.startswith("struct("):
        return "struct"
    return s
