"""Property-based tests for the engine-portable hash foundation.

Every probabilistic operator (minhash, simhash, LSH, splits, shards)
rests on one claim: md5-derived hash64 computes the IDENTICAL value in
Python (driver-side parameter derivation), DuckDB (oracles), and Spark
(JVM plans).  hypothesis hammers the Python↔DuckDB pair across arbitrary
strings (cheap — no JVM per case); the Spark side is pinned separately
with one batch check over the generated corpus.
"""

from __future__ import annotations

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduceimplementation_spark.functions.hashing import (
    py_hash64,
    sql_hash64,
)

# arbitrary non-surrogate unicode: the operators only ever hash
# ASCII-safe derived strings, but the hash itself should be correct for
# anything utf-8 (parameter binding sidesteps SQL-literal escaping)
_TEXT = st.text(
    alphabet=st.characters(blacklist_categories=("Cs",)), max_size=64
)

_CON = duckdb.connect()


@settings(max_examples=200, deadline=None)
@given(_TEXT)
def test_py_hash64_matches_duckdb(s: str):
    got = _CON.execute(f"SELECT {sql_hash64('?')}", [s]).fetchone()[0]
    assert got == py_hash64(s)


def test_py_hash64_matches_spark_batch(spark):
    """One JVM round-trip: hash64 over a batch of generated strings must
    equal the Python twin value-for-value."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.functions.hashing import hash64

    vals = [f"probe-{i}-{'x' * (i % 7)}" for i in range(500)]
    df = spark.createDataFrame([(v,) for v in vals], "s string")
    got = {
        r["s"]: r["h"] for r in df.select("s", hash64(F.col("s")).alias("h")).collect()
    }
    for v in vals:
        assert got[v] == py_hash64(v)


def test_fnv1a32_spark_equals_python_on_unicode_corpus(spark):
    """One Spark job checks the SQL byte-fold against the Python twin
    over a deterministic corpus that stresses the UTF-8 path: ASCII,
    2/3/4-byte code points, mixed scripts, and boundary lengths."""
    from pyspark.sql import functions as F

    from mapreduceimplementation_spark.functions.hashing import (
        fnv1a32,
        py_fnv1a32,
    )

    words = (
        [f"w{i}" for i in range(50)]
        + ["", "a", "Z" * 100]
        + ["é", "Ünïcode", "ß", "ʒʒʒ"]          # 2-byte
        + ["中文", "日本語", "한국어", "∑∫≠"]      # 3-byte
        + ["𝕌𝕟𝕚", "😀😀", "𐍈"]                  # 4-byte (surrogate pairs)
        + ["mixed中é𝕌x"]
    )
    df = spark.createDataFrame([(w,) for w in words], "w string")
    got = {r["w"]: r["h"] for r in df.select("w", fnv1a32("w").alias("h")).collect()}
    exp = {w: py_fnv1a32(w) for w in words}
    assert got == exp
