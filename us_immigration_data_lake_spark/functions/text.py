"""Text expressions.

Replaces the reference's ``capitalize_udf`` (U3, etl.py:105-117 —
row-wise Python ``str.title()``) and provides the tokenization
primitives the text-analysis operators build on (SURVEY.md §2.10).

``str.title()`` vs ``F.initcap`` divergence (SURVEY.md §7): ``title()``
capitalizes after ANY non-alpha ("côte d'ivoire" → "Côte D'Ivoire";
initcap gives "Côte D'ivoire"). ``title_case`` reproduces Python
semantics with a native regex pipeline, no UDF.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# split-preserving tokenizer: runs of word chars OR single non-word chars
_WORD_RE = r"[A-Za-zÀ-ÖØ-öø-ÿ]+"


def title_case(col: Column | str) -> Column:
    """Python ``str.title()`` semantics as a native expression:
    uppercase the first letter of every alphabetic run, lowercase the
    rest.

    Exactness domain: whitespace plus the separator classes the
    reference's data actually contains (' - . ( / , and apostrophes —
    country/city names, etl.py:364). Outside that domain (e.g. a digit
    immediately followed by a letter, "abc1def") Python title() also
    capitalizes and this expression does not; swap in an Arrow pandas
    UDF if that exactness ever matters (SURVEY.md §7). Property-tested
    against str.title() over the supported alphabet."""
    c = F.col(col) if isinstance(col, str) else col
    # lower everything, then uppercase any letter that follows a
    # non-letter (or string start). Spark regexp_replace cannot do
    # per-match case mapping, so: split into alpha runs via split(),
    # initcap each run, reassemble with the original separators.
    # Simpler equivalent: transform each alpha run with initcap via
    # aggregate over split keeping separators — but Spark's split drops
    # separators. Instead: apply initcap to the lowercase string, then
    # fix the post-apostrophe/digit cases that initcap misses by a
    # second pass per separator class.
    lowered = F.lower(c)
    out = F.initcap(lowered)
    # initcap only capitalizes after whitespace; str.title capitalizes
    # after every non-alpha. Fix the common separator classes.
    for sep in ("'", "-", ".", "(", "/", ","):
        # uppercase letter immediately following sep
        out = _upper_after(out, sep)
    return out


def _upper_after(col: Column, sep: str) -> Column:
    """Uppercase the letter right after every occurrence of ``sep``
    using a regex positive capture trick — still no UDF: we use
    F.regexp_replace's lack of case functions by splitting and
    transforming the array natively."""
    esc = "\\" + sep if sep in r".^$*+?()[]{}|\/" else sep
    parts = F.split(col, esc, -1)
    fixed = F.transform(
        parts,
        lambda p, i: F.when(
            i == 0, p
        ).otherwise(F.concat(F.upper(F.substring(p, 1, 1)), F.substring(p, 2, 2147483640))),
    )
    return F.array_join(fixed, sep)


def _strip_ws(c: Column) -> Column:
    # F.trim strips SPACES only; Python str.split()/strip() treat all
    # whitespace — strip \s at both ends so the two agree on tabs/newlines
    return F.regexp_replace(c, r"^\s+|\s+$", "")


def tokens(col: Column | str) -> Column:
    """Whitespace tokens, empty-safe (no empty-string tokens);
    matches Python ``str.split()`` including tab/newline handling —
    ''.split() == [], so empty/whitespace-only input yields an empty
    array, not [''] (Spark's split of '' produces one empty token)."""
    c = F.col(col) if isinstance(col, str) else col
    raw = F.split(_strip_ws(c), r"\s+")
    return F.filter(raw, lambda t: t != F.lit(""))


def token_count(col: Column | str) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    stripped = _strip_ws(c)
    return F.when(F.length(stripped) == 0, F.lit(0)).otherwise(
        F.size(F.split(stripped, r"\s+"))
    )


def normalized_text(col: Column | str) -> Column:
    """Canonical form for fingerprinting/dedup: lowercase, collapse
    whitespace, strip."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))
