from mapreduceimplementation_spark.functions.hashing import (
    SQL_HASH64,
    hash64,
    sql_hash64,
)
from mapreduceimplementation_spark.functions.text import (
    WORD_SEP_RE,
    char_ngrams,
    word_tokens,
)
from mapreduceimplementation_spark.functions.vectors import cosine, dot, l2_norm

__all__ = [
    "SQL_HASH64",
    "hash64",
    "sql_hash64",
    "WORD_SEP_RE",
    "char_ngrams",
    "word_tokens",
    "cosine",
    "dot",
    "l2_norm",
]
