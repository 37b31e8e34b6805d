"""ST7 — stateful incremental anomaly scoring (SURVEY.md §2.10).

This is the datastream.io heritage proper [pub:dsio]: dsio's
``AnomalyMixin`` detectors (fit/update/score) with its
``update_formulae`` semantics — a running Gaussian per key updated by
convex combination with a capped effective sample size (forgetting) —
rebuilt as a Structured Streaming stateful operator.

The per-row update rule (exponential forgetting once n reaches n_max):

    n'    = min(n + 1, n_max)
    w     = 1 / n'
    mean' = (1 - w) * mean + w * x
    var'  = (1 - w) * var + w * (x - mean) * (x - mean')

Scoring happens BEFORE the update (dsio's score-then-update contract):
z = (x - mean) / sqrt(max(var, eps)), undefined (0) for the first row
of a key.

One pure numpy kernel (`update_and_score`) runs in three places:
  * ``applyInPandasWithState`` streaming op (the real-time path),
  * an ``applyInPandas`` batch op over the full history,
  * the plain-pandas reference in tests.
Rows are processed in (ts, event_id) order everywhere, so the
stream-batch equivalence is exact.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)

EPS = 1e-12

OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("zscore", DoubleType()),
    StructField("mean", DoubleType()),
    StructField("var", DoubleType()),
])

STATE_SCHEMA = StructType([
    StructField("n", DoubleType()),
    StructField("mean", DoubleType()),
    StructField("var", DoubleType()),
])


N_WARMUP = 10.0  # observations per key before z-scores are emitted


def update_and_score(
    values: np.ndarray, n: float, mean: float, var: float, n_max: float
) -> tuple[np.ndarray, np.ndarray, np.ndarray, float, float, float]:
    """Pure kernel: score-then-update over a value sequence.

    Returns (zscores, means_after, vars_after, n, mean, var). The
    per-row recurrence is inherently sequential (each update feeds the
    next), so this loops over the batch in Python — bounded by batch
    size, not dataset size; everything around it is vectorized/Arrow.

    Rows seen while n < N_WARMUP score 0: with one observation the
    running variance is ~0 and the second row would z-score at ~1e8
    (observed in the restream CLI) — a running-Gaussian detector needs
    a minimum sample before its scale estimate means anything.
    """
    z = np.empty(values.size, np.float64)
    means = np.empty(values.size, np.float64)
    vars_ = np.empty(values.size, np.float64)
    for i, x in enumerate(values):
        z[i] = 0.0 if n < N_WARMUP else (x - mean) / np.sqrt(max(var, EPS))
        n = min(n + 1.0, n_max)
        w = 1.0 / n
        old_mean = mean
        mean = (1.0 - w) * mean + w * x
        var = (1.0 - w) * var + w * (x - old_mean) * (x - mean)
        means[i] = mean
        vars_[i] = var
    return z, means, vars_, n, mean, var


def _score_pdf(pdf: pd.DataFrame, n: float, mean: float, var: float,
               n_max: float):
    pdf = pdf.sort_values(["ts", "event_id"])
    z, means, vars_, n, mean, var = update_and_score(
        pdf["value"].to_numpy(np.float64), n, mean, var, n_max)
    out = pd.DataFrame({
        "user_id": pdf["user_id"].to_numpy(),
        "event_id": pdf["event_id"].to_numpy(),
        "ts": pdf["ts"].to_numpy(),
        "value": pdf["value"].to_numpy(np.float64),
        "zscore": z, "mean": means, "var": vars_,
    })
    return out, n, mean, var


def zscore_stateful_stream(events: DataFrame, n_max: float = 200.0) -> DataFrame:
    """The streaming stateful operator (applyInPandasWithState)."""

    def fn(key, pdf_iter, state):
        if state.exists:
            n, mean, var = state.get
        else:
            n, mean, var = 0.0, 0.0, 0.0
        for pdf in pdf_iter:
            out, n, mean, var = _score_pdf(pdf, n, mean, var, n_max)
            yield out
        state.update((float(n), float(mean), float(var)))

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, OUTPUT_SCHEMA, STATE_SCHEMA, "append", "NoTimeout")
    )


def zscore_batch(events: DataFrame, n_max: float = 200.0) -> DataFrame:
    """Batch twin: one applyInPandas pass over each key's full history."""

    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, *_ = _score_pdf(pdf, 0.0, 0.0, 0.0, n_max)
        return out

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fn, OUTPUT_SCHEMA)
    )


def zscore_pandas_reference(pdf: pd.DataFrame, n_max: float = 200.0) -> pd.DataFrame:
    """Driverless reference for tests (pure pandas, no Spark)."""
    outs = []
    for _, g in pdf.groupby("user_id"):
        out, *_ = _score_pdf(g, 0.0, 0.0, 0.0, n_max)
        outs.append(out)
    return (
        pd.concat(outs).sort_values(["user_id", "ts", "event_id"])
        .reset_index(drop=True)
    )


# ---------------------------------------------------------------------------
# ST7b — rolling-window percentile detector + dsio-style registry
# ---------------------------------------------------------------------------

PCT_STATE_SCHEMA = StructType([
    StructField("buf", ArrayType(DoubleType())),
])

PCT_OUTPUT_SCHEMA = StructType([
    StructField("user_id", LongType()),
    StructField("event_id", LongType()),
    StructField("ts", TimestampType()),
    StructField("value", DoubleType()),
    StructField("pct_rank", DoubleType()),
])


def percentile_update_and_score(
    values: np.ndarray, buf: list[float], window: int
) -> tuple[np.ndarray, list[float]]:
    """dsio's rolling-window percentile detector [pub:dsio]: score each
    value by its rank within the trailing window of PRIOR values
    (score-then-update), state = the ring buffer. 0.5 while warming."""
    out = np.empty(values.size, np.float64)
    b = list(buf)
    for i, x in enumerate(values):
        if len(b) < 10:
            out[i] = 0.5
        else:
            arr = np.asarray(b)
            out[i] = float((arr < x).sum() + 0.5 * (arr == x).sum()) / len(b)
        b.append(float(x))
        if len(b) > window:
            b = b[-window:]
    return out, b


def _pct_score_pdf(pdf: pd.DataFrame, buf: list[float], window: int):
    pdf = pdf.sort_values(["ts", "event_id"])
    ranks, buf = percentile_update_and_score(
        pdf["value"].to_numpy(np.float64), buf, window)
    out = pd.DataFrame({
        "user_id": pdf["user_id"].to_numpy(),
        "event_id": pdf["event_id"].to_numpy(),
        "ts": pdf["ts"].to_numpy(),
        "value": pdf["value"].to_numpy(np.float64),
        "pct_rank": ranks,
    })
    return out, buf


def percentile_stateful_stream(events: DataFrame, window: int = 100) -> DataFrame:
    def fn(key, pdf_iter, state):
        buf = list(state.get[0]) if state.exists else []
        for pdf in pdf_iter:
            out, buf = _pct_score_pdf(pdf, buf, window)
            yield out
        state.update(([float(v) for v in buf],))

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            fn, PCT_OUTPUT_SCHEMA, PCT_STATE_SCHEMA, "append", "NoTimeout")
    )


def percentile_batch(events: DataFrame, window: int = 100) -> DataFrame:
    def fn(pdf: pd.DataFrame) -> pd.DataFrame:
        out, _ = _pct_score_pdf(pdf, [], window)
        return out

    return (
        events.select("user_id", "event_id", "ts", "value")
        .groupBy("user_id")
        .applyInPandas(fn, PCT_OUTPUT_SCHEMA)
    )


# dsio exposed pluggable detectors via --detector name + --modules file
# [pub:dsio]; same shape here: name → (stream_fn, batch_fn, score_col)
DETECTOR_REGISTRY: dict[str, tuple] = {
    "gaussian": (zscore_stateful_stream, zscore_batch, "zscore"),
    "percentile": (percentile_stateful_stream, percentile_batch, "pct_rank"),
}


def register_detector(name: str, stream_fn, batch_fn, score_col: str) -> None:
    DETECTOR_REGISTRY[name] = (stream_fn, batch_fn, score_col)


def load_detector_modules(paths: list[str]) -> None:
    """dsio's --modules: import user python files that call
    register_detector at import time."""
    import importlib.util

    for p in paths:
        spec = importlib.util.spec_from_file_location(
            f"user_detectors_{abs(hash(p))}", p)
        mod = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(mod)
