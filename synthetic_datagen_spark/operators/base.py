"""Query-catalog registry.

Each operator from SURVEY §2 registers a named QuerySpec: a DataFrame
builder ``(spark, sf_dir) -> DataFrame`` plus (when SQL-expressible) a
DuckDB-runnable ANSI-SQL oracle over the same tables. The driver's
correctness gate runs both and hash-compares — column names and rounded
numeric values must agree exactly.

Conventions for oracle parity (hard-won, see tests/test_oracle_parity.py):
  - alias every computed column identically on both sides;
  - money-sums go through DECIMAL so both engines sum exactly
    (float sums are order-dependent; decimals are associative);
  - other floats are rounded (usually 6 dp) on both sides;
  - DuckDB ``log`` is log10 — oracles use ``ln``;
  - timestamps are emitted as epoch microseconds (BIGINT), dates as
    'yyyy-MM-dd' strings;
  - every top-k ORDER BY carries a unique tiebreaker.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

Builder = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    build: Builder
    oracle: str | None  # ANSI SQL for DuckDB; None → rows-only check
    doc: str = ""
    # For deterministic rows-only queries whose output was captured
    # once as a literal-VALUES oracle (tools/pin_oracles.py), the sf
    # tag the literals are valid at (e.g. "0.01" — the driver's gate
    # scale). The parity harness skips pinned oracles at other sf
    # dirs; None = a real SQL oracle, valid at any scale.
    pinned_sf: str | None = None


REGISTRY: dict[str, QuerySpec] = {}


def pinned_parquet_oracle(query: str) -> str:
    """Oracle SQL for a parquet-captured pin (tools/pin_oracles.py
    --parquet): DuckDB scans the captured frame directly. Used for
    deterministic rows-only queries whose output is too large to inline
    as a VALUES literal; the parquet keeps doubles bit-exact (no
    text round-trip). Always paired with ``pinned_sf`` so the parity
    harness skips the pin at other scale factors."""
    import os

    path = os.path.join(os.path.dirname(__file__), "pins", f"{query}.parquet")
    return f"SELECT * FROM '{path}'"


def register(
    name: str,
    oracle: str | None = None,
    doc: str = "",
    pinned_sf: str | None = None,
):
    """Decorator: register a builder under ``name`` with its oracle SQL."""

    def deco(fn: Builder) -> Builder:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name,
            build=fn,
            oracle=oracle,
            doc=doc or fn.__doc__ or "",
            pinned_sf=pinned_sf,
        )
        return fn

    return deco
