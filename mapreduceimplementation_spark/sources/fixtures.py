"""Shared fixture-cache keying for the format-parity materializers.

The text/JSON-lines/CSV ingestion operators materialize the parquet
testdata into their format ONCE and reuse it via a _SUCCESS marker.  The
cache key must identify the SOURCE DATA, not just the directory name —
keyed by basename alone, two datasets both named "sf0.1" (or a
regenerated parquet) would silently reuse a stale corpus and the
format-parity gates would compare different data.
"""

from __future__ import annotations

import hashlib
import os


def fixture_dir(prefix: str, source_path: str) -> str:
    """Deterministic temp-dir for a materialized fixture, keyed by the
    source file's absolute path + mtime + size, so changed or different
    source data never reuses a stale cache."""
    import tempfile

    st = os.stat(source_path)
    key = f"{os.path.abspath(source_path)}|{st.st_mtime_ns}|{st.st_size}"
    fp = hashlib.md5(key.encode()).hexdigest()[:12]
    name = os.path.basename(os.path.dirname(source_path)) or "sf"
    return os.path.join(tempfile.gettempdir(), f"{prefix}_{name}_{fp}")
