"""Tokenization / n-gram helpers — built-in functions only (codegen path).

Word-splitting semantics follow the reference word-count app: words are
maximal runs of ASCII letters, everything else is a separator, case is
preserved (reference: src/mrapps/wc.go Map()).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the reference's `!unicode.IsLetter` separator, restricted to ASCII
WORD_SEP_RE = "[^A-Za-z]+"


def word_tokens(df: DataFrame, text_col: str = "text", out: str = "word") -> DataFrame:
    """One row per word occurrence (reference wc.go Map semantics)."""
    return df.select(
        "*", F.explode(F.split(F.col(text_col), WORD_SEP_RE)).alias(out)
    ).where(F.col(out) != "")


def char_ngrams(col: Column | str, n: int) -> Column:
    """Array of overlapping character n-grams of a string column.

    Pure built-ins: sequence + transform + substring, no Python UDF, so it
    stays inside whole-stage codegen at scale.
    """
    c = F.col(col) if isinstance(col, str) else col
    return F.when(
        F.length(c) >= n,
        F.transform(
            F.sequence(F.lit(1), F.length(c) - (n - 1)),
            lambda i: c.substr(i, F.lit(n)),
        ),
    ).otherwise(F.array(c))
