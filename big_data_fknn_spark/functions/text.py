"""Text primitives for the LLM-data-pipeline operators (SURVEY.md §2.J).

Everything here is built-in-expression-only (JVM-side, whole-stage
codegen) — no Python UDFs in the hot path.  Hashing uses md5 hex
strings because both Spark and DuckDB expose identical md5(), giving
cross-engine-deterministic MinHash/SimHash without bigint parsing.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HEX = "0123456789abcdef"


def tokens(text: Column | str) -> Column:
    """Whitespace tokens (the corpus is single-space word soup)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def shingles(words: Column, n: int) -> Column:
    """Distinct n-word shingles of a token array (order-preserving
    join with single spaces).  Empty array when the doc is shorter
    than n words — F.sequence would otherwise run DESCENDING for
    stop < start and fabricate shingles.

    Built as array_join(slice(words, i, n)) rather than n separate
    element_at calls: CollapseProject inlines whatever expression
    produced `words` (typically split(text)) into each lambda
    reference, so the element_at form re-tokenized the document ~3×
    PER SHINGLE — measured 12× slower building the sf0.1 shingle
    table (6.5 s → 0.5 s cold)."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    mk = lambda i: F.array_join(F.slice(words, i, n), " ")  # noqa: E731
    return F.when(
        F.size(words) >= n, F.array_distinct(F.transform(idx, mk))
    ).otherwise(F.array().cast("array<string>"))


def hex_digit(ch: Column) -> Column:
    """Value 0-15 of one lowercase hex character (instr is 1-based)."""
    return F.instr(F.lit(HEX), ch) - 1


def md5_bit(hash_col: Column, bit: int) -> Column:
    """Bit `bit` (0 = MSB of first hex digit) of an md5 hex string,
    via pure integer arithmetic — identical in Spark and DuckDB."""
    digit = hex_digit(F.substring(hash_col, 1 + bit // 4, 1))
    p = 2 ** (3 - bit % 4)
    return (digit / F.lit(p)).cast("int") % 2
