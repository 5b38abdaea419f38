"""Driver-side Column-expression memoization (r8).

Building the candidate pipeline's wide literal expressions (the
127-entry gazetteer map, the POS rule arrays, the masking/binning
lambdas) costs ~1.5 s of py4j socket roundtrips PER PLAN CONSTRUCTION —
which the flagship pays on every invocation (the bench's median-of-5
re-builds the plan per run, and the 24/7 fold re-builds it per delta).

A pyspark ``Column`` wraps an immutable JVM expression tree that
resolves against a DataFrame BY NAME at analysis time, so a Column
that references only plain column names is reusable across any number
of DataFrames and queries.  This cache memoizes such Columns per
(py4j gateway, semantic key); entries are invalidated automatically
when a new gateway (new JVM) appears, because the key includes the
gateway identity.

Only cache Columns whose builder is a pure function of the key — the
cached object must not capture a DataFrame, a session, or mutable
state.
"""

from __future__ import annotations

from typing import Callable

from pyspark import SparkContext
from pyspark.sql import Column

_CACHE: dict = {}


def _gateway_key() -> int:
    gw = SparkContext._gateway
    return id(gw) if gw is not None else 0


def cached_column(key: tuple, builder: Callable[[], Column]) -> Column:
    """Return the memoized Column for ``key``, building it once per
    JVM gateway.  ``key`` must capture everything the expression
    depends on (dict contents, flags, column names)."""
    k = (_gateway_key(),) + key
    col = _CACHE.get(k)
    if col is None:
        col = builder()
        _CACHE[k] = col
    return col
