"""Custom Python DataSource (Spark 4 `pyspark.sql.datasource` API):
the synthetic tick generator exposed as a first-class readable format —

    spark.dataSource.register(SdgTicksDataSource)
    spark.read.format("sdg_ticks")
         .option("seed", 42).option("n_series", 8).option("n_ticks", 10_000)
         .load()

This is the Spark-native face of the reference's generator plugins
(reference: sdg_plugins generator entry points): planning emits one
InputPartition per series, each executor draws its series' randomness
with the counter-based splitmix64 kernel (generators/seeds.py), so a
value is a pure function of (seed, series_id, step) — the SAME
invariance contract the streaming twin relies on. No driver-side data
generation, no shared RNG state; scale-out is adding partitions.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
    DataSourceWriter,
    WriterCommitMessage,
)

_STEP_SALT = 0x51ED2700  # second-uniform offset for Box-Muller


class _TickPartition(InputPartition):
    def __init__(self, series_id: int):
        self.series_id = series_id


def series_ticks(seed: int, series_id: int, n_ticks: int, sigma: float = 0.01):
    """(steps, values) for one series — pure function of its inputs.

    Gaussian random walk: Box-Muller over two counter-uniform streams,
    cumulative-summed. Used identically by the executor read path and
    the parity test's local recomputation."""
    import numpy as np

    steps = np.arange(n_ticks, dtype=np.uint64)
    from ..generators.seeds import counter_uniforms

    u1 = counter_uniforms(seed, np.uint64(series_id), steps)
    u2 = counter_uniforms(seed, np.uint64(series_id), steps + np.uint64(_STEP_SALT))
    z = np.sqrt(-2.0 * np.log(u1)) * np.cos(2.0 * np.pi * u2)
    return steps.astype(np.int64), np.cumsum(sigma * z)


class _SdgTicksReader(DataSourceReader):
    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.n_series = int(options.get("n_series", 8))
        self.n_ticks = int(options.get("n_ticks", 1000))
        self.sigma = float(options.get("sigma", 0.01))
        self._wanted: set[int] | None = None  # None = all series

    def pushFilters(self, filters):
        """Partition pruning: series_id equality/IN filters are
        consumed here (planning then skips those partitions entirely);
        everything else is returned for Spark to evaluate post-scan."""
        from pyspark.sql.datasource import EqualTo, In

        for f in filters:
            if isinstance(f, EqualTo) and f.attribute == ("series_id",):
                self._wanted = {int(f.value)} if self._wanted is None else (
                    self._wanted & {int(f.value)}
                )
            elif isinstance(f, In) and f.attribute == ("series_id",):
                vals = {int(v) for v in f.value}
                self._wanted = vals if self._wanted is None else self._wanted & vals
            else:
                yield f  # not handled here — Spark keeps it

    def partitions(self):
        sids = range(self.n_series) if self._wanted is None else sorted(
            s for s in self._wanted if 0 <= s < self.n_series
        )
        return [_TickPartition(s) for s in sids]

    def read(self, partition: _TickPartition):
        # one Arrow batch per partition instead of a per-row tuple
        # yield (r13, guide §4): the values are ALREADY numpy vectors —
        # row-at-a-time pickling of 40k tuples through the DataSource
        # protocol was the whole cost of the scan. Same doubles, same
        # int32 narrowing the INT schema always applied.
        import numpy as np
        import pyarrow as pa

        sid = partition.series_id
        steps, values = series_ticks(self.seed, sid, self.n_ticks, self.sigma)
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(np.full(len(steps), sid, dtype=np.int32)),
                pa.array(steps.astype(np.int32)),
                pa.array(values, type=pa.float64()),
            ],
            names=["series_id", "step", "value"],
        )


class SdgTicksDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "sdg_ticks"

    def schema(self) -> str:
        return "series_id INT, step INT, value DOUBLE"

    def reader(self, schema) -> DataSourceReader:
        return _SdgTicksReader(self.options)

    def simpleStreamReader(self, schema) -> SimpleDataSourceStreamReader:
        return _SdgTicksStreamReader(self.options)


def register_sdg_ticks(spark) -> None:
    """Idempotent per-session registration. Also enables Python-source
    filter pushdown: merely DEFINING pushFilters() makes reads fail
    while the flag is off (DATA_SOURCE_PUSHDOWN_DISABLED), so the flag
    and the capability must travel together — this is the one place
    both happen."""
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(SdgTicksDataSource)
    except Exception:  # already registered in this session
        pass


class _SdgTicksStreamReader(SimpleDataSourceStreamReader):
    """Streaming half of the source: offsets are plain step counters,
    each micro-batch emits the next `batch_ticks` steps for every
    series. Because values are counter-based (pure in (seed, series,
    step)), replaying an offset range after failure reproduces the
    exact rows — the exactly-once contract comes from determinism, not
    sink-side dedup. Stream output is therefore bit-equal to the batch
    read of the same step range (pinned in tests)."""

    def __init__(self, options):
        self.seed = int(options.get("seed", 42))
        self.n_series = int(options.get("n_series", 8))
        self.batch_ticks = int(options.get("batch_ticks", 100))
        self.sigma = float(options.get("sigma", 0.01))

    def initialOffset(self):
        return {"step": 0}

    def read(self, start: dict):
        lo = start["step"]
        hi = lo + self.batch_ticks
        return self._rows(lo, hi), {"step": hi}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["step"], end["step"])

    def _rows(self, lo: int, hi: int):
        out = []
        for sid in range(self.n_series):
            steps, values = series_ticks(self.seed, sid, hi, self.sigma)
            for st, v in zip(steps[lo:hi], values[lo:hi]):
                out.append((sid, int(st), float(v)))
        return iter(out)


class _MetricsCommitMessage(WriterCommitMessage):
    def __init__(self, path: str, n_rows: int):
        self.path = path
        self.n_rows = n_rows


class _SdgMetricsWriter(DataSourceWriter):
    """Executor-side write of one JSON-lines part per partition into a
    staging area; commit() promotes the parts with a _SUCCESS manifest
    (listing every part + row count), abort() removes the staging dir —
    the same two-phase contract file committers use, so a failed job
    never leaves half-written parts visible."""

    def __init__(self, options):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("sdg_metrics writer requires a path")

    def write(self, iterator):
        import json
        import os
        import uuid

        part = f"part-{uuid.uuid4().hex}.jsonl"
        staged = os.path.join(self.path, "_staging", part)
        os.makedirs(os.path.dirname(staged), exist_ok=True)
        n = 0
        with open(staged, "w") as fh:
            for row in iterator:
                fh.write(json.dumps(row.asDict()) + "\n")
                n += 1
        return _MetricsCommitMessage(part, n)

    def commit(self, messages):
        import json
        import os

        for m in messages:
            os.replace(
                os.path.join(self.path, "_staging", m.path),
                os.path.join(self.path, m.path),
            )
        manifest = {
            "parts": sorted(m.path for m in messages),
            "total_rows": sum(m.n_rows for m in messages),
        }
        with open(os.path.join(self.path, "_SUCCESS"), "w") as fh:
            json.dump(manifest, fh)

    def abort(self, messages):
        import shutil
        import os

        shutil.rmtree(os.path.join(self.path, "_staging"), ignore_errors=True)


class SdgMetricsDataSource(DataSource):
    """`df.write.format('sdg_metrics').option('path', ...).save()` —
    the reference's JSON metrics sink (S4) as a custom Python
    DataSource writer with a real two-phase commit."""

    @classmethod
    def name(cls) -> str:
        return "sdg_metrics"

    def writer(self, schema, overwrite: bool) -> DataSourceWriter:
        return _SdgMetricsWriter(self.options)


def register_sdg_metrics(spark) -> None:
    try:
        spark.dataSource.register(SdgMetricsDataSource)
    except Exception:
        pass
