"""Text-analysis column builders for the LLM-data-pipeline operators.

All JVM-side built-ins (split / explode / sha2 / regexp) — no Python UDFs
in any hot path; every helper has a DuckDB-expressible mirror so the
operators stay EXACT-oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(c: Column | str) -> Column:
    """Whitespace tokenization (matches oracle ``string_split(x, ' ')``)."""
    return F.split(c if isinstance(c, Column) else F.col(c), " ")


def distinct_tokens(c: Column | str) -> Column:
    """Distinct token set, preserving first-occurrence order semantics of
    array_distinct (order is irrelevant downstream: sets are compared via
    intersect/union sizes)."""
    return F.array_distinct(tokens(c))


def fp64(arr: Column) -> Column:
    """Map a string array to sorted int64 fingerprints (``xxhash64`` per
    element). Set-intersection/union SIZES over the fingerprints equal
    those over the strings as long as no two distinct elements of a
    compared pair collide — for documents of ~10² tokens the per-pair
    collision probability is < 10⁴/2⁶⁴ ≈ 5e-16, and the EXACT oracle gate
    (which intersects the literal strings in DuckDB) verifies the
    equality on every fixture run. Longs intersect ~6x faster than
    strings and shuffle 8 bytes/token instead of the token bytes — this
    is the hot-path representation for every pairwise-verify stage."""
    return F.array_sort(F.transform(arr, lambda t: F.xxhash64(t)))


def fingerprint(c: Column | str) -> Column:
    """Canonical document fingerprint: sha256 of the sorted distinct token
    set joined by a single space. Word-order- and duplication-insensitive,
    byte-identical in DuckDB:
    ``sha256(array_to_string(list_sort(list_distinct(string_split(x,' '))), ' '))``.
    """
    return F.sha2(
        F.array_join(F.array_sort(F.array_distinct(tokens(c))), " "), 256
    )


# Tiny per-language stopword anchors for the heuristic language-ID operator.
# Deliberately small so the same sets inline into the DuckDB oracle.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of"],
    "fr": ["le", "la", "et"],
    "es": ["el", "los", "que"],
    "de": ["der", "und", "die"],
}


def marker_hits(toks: Column, markers: list[str]) -> Column:
    """Count of tokens that fall in the marker set (duplicates count —
    mirrors ``len(list_filter(toks, t -> list_contains(markers, t)))``)."""
    arr = F.array(*[F.lit(m) for m in markers])
    return F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
