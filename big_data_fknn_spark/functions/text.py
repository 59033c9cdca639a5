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
    stop < start and fabricate shingles."""
    idx = F.sequence(F.lit(1), F.size(words) - (n - 1))
    mk = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.element_at(words, i + j) for j in range(n)]
    )
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
