"""Local mirror of the driver's correctness gate.

Runs every REGISTRY query on Spark and its oracle SQL on DuckDB at the
given sf dir, then compares: row count, column names, and exact values
on rows sorted by all columns. Reports the first mismatching cell per
query so fp-parity issues are easy to chase.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys

import duckdb
import pandas as pd

sys.path.insert(0, "/root/repo")

from synthetic_datagen_spark.operators import REGISTRY  # noqa: E402
from synthetic_datagen_spark.schemas import TABLES  # noqa: E402
from synthetic_datagen_spark.session import get_spark  # noqa: E402

def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLES:
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    if len(df):
        df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def cells_equal(a, b) -> bool:
    if a is None and b is None:
        return True
    if isinstance(a, float) or isinstance(b, float):
        try:
            af, bf = float(a), float(b)
        except (TypeError, ValueError):
            return False
        if math.isnan(af) and math.isnan(bf):
            return True
        # Match the driver's byte-level hash: -0.0 and +0.0 are DIFFERENT
        # encodings even though -0.0 == 0.0 in Python. This blind spot
        # hid the cyclical_time_features driver failure for five rounds.
        if af == 0.0 and bf == 0.0:
            return math.copysign(1.0, af) == math.copysign(1.0, bf)
        return af == bf
    return a == b


def _canon_dtype(dt) -> str:
    """Collapse a pandas dtype to the value-encoding family a byte-level
    hash would see: ints, floats, bools, datetimes, or objects."""
    k = dt.kind  # i/u -> int, f -> float, b -> bool, M -> datetime, O -> obj
    return {"i": "int", "u": "int", "f": "float", "b": "bool", "M": "ts"}.get(k, "obj")


def compare(name: str, spark_pd: pd.DataFrame, duck_pd: pd.DataFrame) -> list[str]:
    errs: list[str] = []
    sc, dc = sorted(spark_pd.columns), sorted(duck_pd.columns)
    if sc != dc:
        return [f"schema mismatch: spark={sc} duck={dc}"]
    # dtype-family mismatches (int column one side, float/decimal-object
    # the other) hash differently byte-level even when == says equal —
    # the same blind-spot family as -0.0 vs +0.0. Hard-fail them.
    for c in sc:
        fa, fb = _canon_dtype(spark_pd[c].dtype), _canon_dtype(duck_pd[c].dtype)
        if fa != fb:
            errs.append(
                f"dtype mismatch col {c}: spark={spark_pd[c].dtype}({fa}) "
                f"duck={duck_pd[c].dtype}({fb})"
            )
    if errs:
        return errs
    if len(spark_pd) != len(duck_pd):
        errs.append(f"rowcount mismatch: spark={len(spark_pd)} duck={len(duck_pd)}")
    a, b = canon(spark_pd), canon(duck_pd)
    n = min(len(a), len(b))
    bad = 0
    for i in range(n):
        for c in a.columns:
            if not cells_equal(a[c].iloc[i], b[c].iloc[i]):
                if bad < 3:
                    errs.append(f"row {i} col {c}: spark={a[c].iloc[i]!r} duck={b[c].iloc[i]!r}")
                bad += 1
    if bad:
        errs.append(f"{bad} mismatched cells total")
    return errs


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    if os.environ.get("ORACLE_PLAIN_SESSION"):
        # simulate the driver exactly: a vanilla SparkSession (200
        # shuffle partitions, default AQE), confs only via the
        # __spark_entry__ wrappers — catches partition-count-sensitive
        # float aggregation that get_spark's 32 partitions would hide
        from pyspark.sql import SparkSession

        import __spark_entry__ as entry_mod

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.ui.enabled", "false")
            .appName("oracle-check-plain")
            .getOrCreate()
        )
        wrapped = entry_mod.queries()
        con = duck_con(sf_dir)
        failed = []
        for name, spec in sorted(REGISTRY.items()):
            if only and name not in only:
                continue
            no_oracle = spec.oracle is None or (
                spec.pinned_sf is not None
                and not sf_dir.rstrip("/").endswith("sf" + spec.pinned_sf)
            )  # pinned-value literals only hold at their capture sf
            if no_oracle:
                try:
                    n = wrapped[name](spark, sf_dir).count()
                    print(f"[rows-only] {name}: {n} rows")
                except Exception as e:  # noqa: BLE001
                    print(f"[FAIL] {name}: rows-only error: {e}")
                    failed.append(name)
                continue
            try:
                spark_pd = wrapped[name](spark, sf_dir).toPandas()
                duck_pd = con.execute(spec.oracle).df()
                errs = compare(name, spark_pd, duck_pd)
            except Exception as e:  # noqa: BLE001
                errs = [f"error: {e}"]
            if errs:
                print(f"[FAIL] {name}: {errs[0]}")
                failed.append(name)
            else:
                print(f"[ok] {name}: {len(spark_pd)} rows")
        print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
        return 1 if failed else 0
    spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    failed = []
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        no_oracle = spec.oracle is None or (
            spec.pinned_sf is not None
            and not sf_dir.rstrip("/").endswith("sf" + spec.pinned_sf)
        )  # pinned-value literals only hold at their capture sf
        if no_oracle:
            try:
                n = spec.build(spark, sf_dir).count()
                print(f"[rows-only] {name}: {n} rows")
            except Exception as e:  # noqa: BLE001
                print(f"[FAIL] {name}: rows-only error: {e}")
                failed.append(name)
            continue
        try:
            spark_pd = spec.build(spark, sf_dir).toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: spark error: {e}")
            failed.append(name)
            continue
        try:
            duck_pd = con.execute(spec.oracle).df()
        except Exception as e:  # noqa: BLE001
            print(f"[FAIL] {name}: duckdb error: {e}")
            failed.append(name)
            continue
        errs = compare(name, spark_pd, duck_pd)
        if errs:
            print(f"[FAIL] {name}:")
            for e in errs:
                print(f"    {e}")
            failed.append(name)
        else:
            print(f"[ok] {name}: {len(spark_pd)} rows")
    print(f"\n{len(failed)} failures" + (f": {failed}" if failed else ""))
    return 1 if failed else 0


if __name__ == "__main__":
    raise SystemExit(main())
