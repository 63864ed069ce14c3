"""S9 — external-process source/sink escape hatch
(reference: predictive_evaluator.py:370-394 round-trips CSVs through an
external predictor subprocess with a timeout; augmentation_evaluator
does the in-process variant).

Spark form: each Arrow batch is piped through the subprocess as
header-CSV on stdin, stdout parsed back against a declared schema —
``mapInPandas`` keeps it DataFrame-native, one process per batch, so a
1000-executor cluster runs 1000 concurrent external processes with
Spark task retry as the crash isolation (replacing the reference's
per-call subprocess timeouts, optimize_staged.py:213-218).
"""

from __future__ import annotations

import io
import subprocess
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import StructType


def pipe_through_process(
    df: DataFrame,
    cmd: list[str],
    out_schema: StructType,
    timeout: float = 600.0,
) -> DataFrame:
    """Pipe every batch through ``cmd`` (CSV stdin → CSV stdout)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            proc = subprocess.run(
                cmd,
                input=pdf.to_csv(index=False).encode(),
                capture_output=True,
                timeout=timeout,
                check=True,
            )
            yield pd.read_csv(io.BytesIO(proc.stdout))

    return df.mapInPandas(run, out_schema)
