"""Emit pinned-value oracle SQL for deterministic rows-only queries.

For catalog queries whose output is a pure function of (seed, sf0.01
data) but whose computation is not SQL-expressible (LSH/ANN indexes,
DCT pHash, BPE merge learning, counter-RNG generators, PQ codebooks),
the correctness gate can still value-check them: run the query once at
sf0.01 and pin the result as a literal ``SELECT * FROM (VALUES ...)``
oracle. Dtypes are cast cell-wise so DuckDB's frame hashes byte-equal
to Spark's (BIGINT/DOUBLE/BOOLEAN/VARCHAR families).

Usage: python tools/pin_oracles.py <query> [...]  — prints the SQL.
"""

from __future__ import annotations

import math
import sys

import pandas as pd

sys.path.insert(0, "/root/repo")

SF_DIR = "/root/testdata/sf0.01"


def _cell(v, kind: str) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return {"i": "CAST(NULL AS BIGINT)", "f": "CAST(NULL AS DOUBLE)",
                "b": "CAST(NULL AS BOOLEAN)"}.get(kind, "CAST(NULL AS VARCHAR)")
    if kind in ("i", "u"):
        return f"CAST({int(v)} AS BIGINT)"
    if kind == "f":
        return f"CAST({float(v)!r} AS DOUBLE)"
    if kind == "b":
        return "TRUE" if v else "FALSE"
    s = str(v).replace("'", "''")
    return f"'{s}'"


def values_sql(pdf: pd.DataFrame) -> str:
    kinds = {c: pdf[c].dtype.kind for c in pdf.columns}
    rows = []
    for _, r in pdf.iterrows():
        cells = ", ".join(_cell(r[c], kinds[c]) for c in pdf.columns)
        rows.append(f"  ({cells})")
    cols = ", ".join(f'"{c}"' for c in pdf.columns)  # left/right are reserved
    body = ",\n".join(rows)
    return f"SELECT * FROM (VALUES\n{body}\n) AS t({cols})"


def main() -> None:
    from synthetic_datagen_spark.operators import REGISTRY
    from synthetic_datagen_spark.session import get_spark

    as_parquet = "--parquet" in sys.argv
    names = [a for a in sys.argv[1:] if a != "--parquet"]
    spark = get_spark("pin-oracles")
    for name in names:
        pdf = REGISTRY[name].build(spark, SF_DIR).toPandas()
        if as_parquet:
            # Large panels pin as a parquet capture instead of an inline
            # VALUES literal: bit-exact doubles with no repr round-trip,
            # and no thousand-line literals in the operator modules. The
            # oracle SQL reads it via operators.base.pinned_parquet_oracle.
            import os

            # derive from the package location (the same path
            # operators/base.pinned_parquet_oracle reads from), not a
            # hardcoded checkout root
            from synthetic_datagen_spark.operators import base as _ob

            pins_dir = os.path.join(os.path.dirname(_ob.__file__), "pins")
            os.makedirs(pins_dir, exist_ok=True)
            out = os.path.join(pins_dir, f"{name}.parquet")
            pdf.to_parquet(out, index=False)
            print(f"-- {name}: {len(pdf)} rows -> {out}")
        else:
            print(f"-- {name}: {len(pdf)} rows")
            print(values_sql(pdf))
            print()


if __name__ == "__main__":
    main()
