"""PII detection / redaction over text columns (SURVEY.md §2.10
extension — the scrubbing pass every training-data pipeline runs
before corpus assembly).

Native ``regexp_count`` / ``regexp_replace`` expressions only —
JVM-side, codegen'd, no UDFs.  At 100 TB this is a pure map stage:
no shuffle, no state, trivially parallel, and the regexes are
pushed through whole-stage codegen alongside whatever filter feeds
them.

Pattern notes: the default patterns are deliberately written in the
regex subset with identical semantics in Java (Spark), RE2 (DuckDB)
and Python — character classes, bounded repetition, alternation; no
lookaround, no backreferences — so oracle queries can replicate the
scrub exactly and planted-case tests can assert counts across
engines.  They are pragmatic corpus-hygiene patterns (catch the bulk,
tolerate false positives — a redacted false positive is cheap; a
leaked true positive is not), not validators.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# ordered: redaction applies in this order, so EMAIL wins over the
# bare-domain part of an address, and IP wins inside host:port text.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"),
    ("phone", r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{3,4}-[0-9]{3,4}"),
)


def pii_counts(df: DataFrame, text_col: str) -> DataFrame:
    """Append one ``n_<kind>`` column per pattern (exact integers).

    Counts run on the PROGRESSIVELY REDACTED text, exactly the chain
    ``scrub_pii`` applies — so ``n_<kind>`` always equals the number of
    ``[<KIND>]`` placeholders the scrub emits.  Counting every pattern
    on the raw text instead would double-count overlapping spans (an
    address like ``a@10.0.0.1.example`` is one EMAIL match, not an
    email plus an IPv4).
    """
    out = df
    running = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        out = out.withColumn(
            f"n_{kind}", F.regexp_count(running, F.lit(pat)).cast("long")
        )
        running = F.regexp_replace(running, pat, f"[{kind.upper()}]")
    return out


def scrub_pii(df: DataFrame, text_col: str, out_col: str | None = None) -> DataFrame:
    """Replace every PII match with ``[KIND]`` placeholders.

    Applies patterns in PII_PATTERNS order on the progressively
    redacted text, so earlier (more specific) patterns claim their
    spans first.
    """
    redacted = F.col(text_col)
    for kind, pat in PII_PATTERNS:
        redacted = F.regexp_replace(redacted, pat, f"[{kind.upper()}]")
    return df.withColumn(out_col or f"{text_col}_redacted", redacted)
