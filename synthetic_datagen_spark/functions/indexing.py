"""Distributed total-order indexing — the scalable replacement for
``row_number() OVER (ORDER BY ...)``.

A global ordered window plans Exchange SinglePartition: every row of
the frame flows through ONE task — the canonical 100 TB cluster-melter
(SURVEY §4.3). But a dense global index doesn't need a global window:

  1. ``repartitionByRange`` on the order keys — partition p holds a
     contiguous key range, ranges ascend with p (RangePartitioner
     contract);
  2. ``sortWithinPartitions`` — rows inside p are ordered;
  3. ``monotonically_increasing_id`` — evaluated post-sort, it encodes
     (partition id << 33) | within-partition record number, giving the
     LOCAL rank with zero extra shuffle;
  4. one tiny job collects per-partition row counts (#partitions rows,
     not #rows) and broadcasts cumulative offsets back as a literal
     map: global index = offset[pid] + local rank.

Total cost: one range shuffle + one count job — every stage as wide as
the cluster. Determinism matches the window it replaces: exact when
the order keys are unique (ties take an arbitrary but valid order
either way).

Used by the generator fit paths (block bootstrap block indexing,
Grasynda return/transition extraction) where training frames can be
full-history scans; plan-pinned by tests/test_plans.py (no
unpartitioned window in any fit plan).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_LOW33 = (1 << 33) - 1


def _pin(d: DataFrame) -> DataFrame:
    """Eagerly pin ONE physical execution of the range-partitioned
    frame before the metadata collect. Both helpers here run TWO jobs
    over the same intermediate — a tiny per-partition metadata collect
    and the consuming job — and a lazy re-execution of
    ``repartitionByRange`` re-draws its reservoir-sample boundaries
    with an RDD-id-dependent seed, so at scale (input partitions larger
    than the sample) the two executions can disagree on partition
    assignment, silently corrupting offset[pid]+rank arithmetic.

    ``localCheckpoint(eager=True)`` truncates lineage, so both jobs
    read the SAME stored blocks; on executor loss the job fails loudly
    (blocks are unrecoverable by design) instead of recomputing into a
    different partitioning — for a transient fit-path frame, fail-loud
    beats paying a reliable-checkpoint write of the full history."""
    return d.localCheckpoint(eager=True)


def _n_parts(df: DataFrame, n_parts: int | None) -> int:
    if n_parts:
        return n_parts
    return int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))


def _offset_map(d: DataFrame) -> "F.Column":
    """Collect per-partition counts (bounded: one row per partition)
    and return a literal pid -> exclusive-prefix-offset map column."""
    counts = {
        r["_pid"]: r["_c"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("_c")).collect()
    }
    items: list = []
    acc = 0
    for pid in sorted(counts):
        items += [F.lit(pid), F.lit(acc)]
        acc += counts[pid]
    if not items:  # empty frame: map() needs at least a type
        return F.create_map(F.lit(0), F.lit(0))
    return F.create_map(*items)


def with_global_index(
    df: DataFrame,
    order_cols: list[str],
    index_col: str = "_i",
    n_parts: int | None = None,
) -> DataFrame:
    """Dense 0-based global row index by ``order_cols`` — no global
    window, one range shuffle. Partitions are capped at 2^33 rows by
    the monotonically_increasing_id encoding (~8.6e9 — far above any
    sane partition).

    The partitioned frame is eagerly PINNED (_pin) before the
    offset-collect job: the count job and the consuming job must read
    the SAME physical partitioning — see _pin."""
    d = _pin(
        df.repartitionByRange(_n_parts(df, n_parts), *order_cols)
        .sortWithinPartitions(*order_cols)
        .withColumn("_mid", F.monotonically_increasing_id())
        .withColumn("_pid", F.shiftright("_mid", 33).cast("int"))
    )
    om = _offset_map(d)
    return (
        d.withColumn(index_col, om[F.col("_pid")] + (F.col("_mid").bitwiseAND(_LOW33)))
        .drop("_mid", "_pid")
    )


def with_prefix_sum(
    df: DataFrame,
    order_cols: list[str],
    weight_col: str,
    prefix_col: str = "_prefix",
    n_parts: int | None = None,
    index_col: str | None = None,
) -> DataFrame:
    """Exclusive prefix sum of ``weight_col`` over the total order —
    row r gets the sum of weights of all rows strictly before it.

    Same shape as with_global_index, but the running sum needs a
    partition-LOCAL ordered window (partitioned by the range-partition
    id, never unpartitioned), plus driver-side cumulation of the
    #partitions per-partition totals.

    Pinned before the totals collect for the same reason as
    with_global_index: spark_partition_id() is assignment-dependent,
    so the totals job and the window job must not re-execute the range
    shuffle independently (see _pin).

    ``index_col``: when set, ALSO emit the dense 0-based global row
    index over the same total order — it falls out of the same pinned
    partitioning for free (the metadata collect gains a count column;
    the local rank is a row_number over the same partition-local
    window), so callers needing both never pay a second range shuffle
    + pin the way chaining with_global_index would."""
    d = _pin(
        df.repartitionByRange(_n_parts(df, n_parts), *order_cols)
        .withColumn("_pid", F.spark_partition_id())
    )
    meta = {
        r["_pid"]: (r["_t"], r["_c"])
        for r in d.groupBy("_pid")
        .agg(F.sum(weight_col).alias("_t"), F.count("*").alias("_c"))
        .collect()
    }
    witems: list = []
    citems: list = []
    wacc = 0
    cacc = 0
    for pid in sorted(meta):
        t, c = meta[pid]
        witems += [F.lit(pid), F.lit(wacc)]
        citems += [F.lit(pid), F.lit(cacc)]
        wacc += t or 0
        cacc += c
    om = F.create_map(*witems) if witems else F.create_map(F.lit(0), F.lit(0))
    lw = (
        Window.partitionBy("_pid")
        .orderBy(*order_cols)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    out = d.withColumn(
        prefix_col,
        om[F.col("_pid")] + F.coalesce(F.sum(weight_col).over(lw), F.lit(0)),
    )
    if index_col is not None:
        cm = F.create_map(*citems) if citems else F.create_map(F.lit(0), F.lit(0))
        rw = Window.partitionBy("_pid").orderBy(*order_cols)
        out = out.withColumn(
            index_col, cm[F.col("_pid")] + F.row_number().over(rw) - 1
        )
    return out.drop("_pid")
