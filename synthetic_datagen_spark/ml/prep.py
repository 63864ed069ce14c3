"""Training-data preparation — the Spark half of every deep trainer
(reference: app/data_processor.py:97-139 `prepare_training_data`,
called by vae_gan_trainer.py:177-190 and timegan_generator.py).

Pipeline: multi-source union (S2) → sort → keep-first dedup (P3) →
optional log-returns (W1) → sliding windows (W3) → optional cyclical
temporal features aligned to each window's last timestamp. Everything
is lazy DataFrame composition; the single action happens when the
trainer exports (toPandas / TFRecord) — at 100 TB windows stream
through `applyInPandas` consumers instead of collecting.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..functions import timeseries as TS


def prepare_training_windows(
    sources: list[DataFrame],
    value_col: str,
    ts_col: str,
    window_rows: int,
    use_returns: bool = True,
    temporal_features: bool = False,
    series_cols: list[str] | None = None,
) -> DataFrame:
    """(series…, window_id, window_vec, [temporal cols]) training rows.

    `sources` are unioned by name, ordered by time, deduped keep-first
    on the timestamp — exactly the reference's load_multiple_csv
    semantics (app/data_processor.py:27-34) expressed as
    unionByName → dropDuplicates.
    """
    df = sources[0]
    for s in sources[1:]:
        df = df.unionByName(s)
    keys = (series_cols or []) + [ts_col]
    df = df.dropDuplicates(keys)
    part = series_cols or []
    order = [ts_col]
    if use_returns:
        df = TS.log_returns(df, value_col, part, order)
        df = df.filter(F.col("log_ret").isNotNull())
        vcol = "log_ret"
    else:
        vcol = value_col
    win = TS.sliding_windows(df, vcol, window_rows, part, order)
    if temporal_features:
        win = TS.cyclical_time_features(win, ts_col)
    return win.select(
        *part,
        "window_id",
        "window_vec",
        *(
            ["hour_sin", "hour_cos", "dow_sin", "dow_cos", "month_sin", "month_cos"]
            if temporal_features
            else []
        ),
    )
