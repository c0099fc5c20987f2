"""Query/oracle registry.

Each operator registers a (spark, sf_dir) -> DataFrame callable plus an
optional DuckDB-runnable ANSI SQL oracle string.  The driver contract in
``__spark_entry__.py`` is a thin view over these dicts.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

QUERIES: dict[str, Callable[..., Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, oracle: str | None = None):
    """Decorator: register a query callable and (optionally) its SQL oracle."""

    def deco(fn):
        if name in QUERIES:
            raise ValueError(f"duplicate query registration: {name}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle.strip()
        return fn

    return deco
