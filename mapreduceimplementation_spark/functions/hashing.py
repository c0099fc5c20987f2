"""Engine-portable 64-bit hashing.

All probabilistic operators (minhash, simhash, LSH) build on ``hash64``:
the first 15 hex chars of md5 parsed as an integer (60 bits, always
positive, fits BIGINT).  md5 is standard everywhere, so the exact same
value is computable in DuckDB (oracle), Spark SQL (JVM-side, whole-stage
codegen — no Python in the hot path), or any other engine.  This also
makes every "random" projection/permutation deterministic and stable
across cluster sizes and Spark versions, which is what you want when a
100 TB dedup job is resumed or re-run.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Mersenne prime 2^61-1: modulus for universal-hash families (a*h+b) % P.
MERSENNE_61 = (1 << 61) - 1


def hash64(col: Column | str, salt: str = "") -> Column:
    """Portable 60-bit hash of a string column (JVM-side md5+conv)."""
    c = F.col(col) if isinstance(col, str) else col
    if salt:
        c = F.concat(F.lit(salt), c)
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


#: DuckDB expression template computing the identical value; format with the
#: SQL expression for the (already salted) string, e.g.
#: ``sql_hash64("'salt' || w")``.
SQL_HASH64 = "(('0x' || substr(md5({expr}), 1, 15))::BIGINT)"


def sql_hash64(expr: str) -> str:
    return SQL_HASH64.format(expr=expr)


def py_hash64(s: str, salt: str = "") -> int:
    """Pure-Python twin of ``hash64`` (same first-15-md5-hex-chars value)
    for driver-side parameter derivation (hyperplane weights, permutation
    seeds).  ONE definition: a drifted copy would silently produce
    signatures that disagree with the JVM/DuckDB hash64."""
    import hashlib

    return int(hashlib.md5((salt + s).encode()).hexdigest()[:15], 16)


# ---------------------------------------------------------------------------
# Reference-parity partitioner: worker.go's ihash (FNV-1a 32-bit)

_FNV_OFFSET = 2166136261
_FNV_PRIME = 16777619
_FNV_MASK = (1 << 32) - 1


def fnv1a32(col: Column | str) -> Column:
    """FNV-1a 32-bit of a string column's UTF-8 bytes — the reference's
    ihash (src/mr/worker.go:31: ``fnv.New32a`` then ``& 0x7fffffff``
    before ``% NReduce``).  Pure SQL byte fold, so our engine can
    reproduce the reference's EXACT reduce-bucket assignment (verified
    against its committed mr-out-<map>-<reduce>.json intermediates in
    tests/test_golden_parity.py).  Returns the full unsigned 32-bit
    value; apply ``& 0x7fffffff`` and ``% n_reduce`` at the call site.

    Per-byte work: h = ((h XOR byte) * prime) mod 2^32 — h stays < 2^32
    so the long multiply (< 2^57) never overflows."""
    c = F.col(col) if isinstance(col, str) else col
    b = F.encode(c, "UTF-8")
    folded = F.aggregate(
        F.sequence(F.lit(1), F.octet_length(b)),
        F.lit(_FNV_OFFSET).cast("long"),
        lambda h, i: (
            h.bitwiseXOR(
                F.conv(F.hex(F.substring(b, i, 1).cast("binary")), 16, 10).cast(
                    "long"
                )
            )
            * _FNV_PRIME
        ).bitwiseAND(F.lit(_FNV_MASK)),
    )
    # sequence(1, 0) runs BACKWARD ([1, 0]), so the empty string must not
    # reach the fold: FNV of no bytes is the offset basis
    return F.when(
        F.octet_length(b) == 0, F.lit(_FNV_OFFSET).cast("long")
    ).otherwise(folded)


def py_fnv1a32(s: str) -> int:
    """Driver twin of ``fnv1a32`` (same fold, byte-for-byte)."""
    h = _FNV_OFFSET
    for byte in s.encode("utf-8"):
        h = ((h ^ byte) * _FNV_PRIME) & _FNV_MASK
    return h
