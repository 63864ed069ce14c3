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

    def partitions(self):
        return [_TickPartition(s) for s in range(self.n_series)]

    def read(self, partition: _TickPartition):
        sid = partition.series_id
        steps, values = series_ticks(self.seed, sid, self.n_ticks, self.sigma)
        for st, v in zip(steps, values):
            yield (sid, int(st), float(v))


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
    """Idempotent per-session registration."""
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
