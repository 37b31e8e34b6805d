"""Dashboard metrics sink — the headless counterpart of datastream.io's
``dsio/dashboard/{kibana,bokeh}.py`` [pub:dsio].

dsio pushed scored rows into Elasticsearch and generated a Kibana (or
live Bokeh) dashboard over them. This sandbox has no display or ES, so
the equivalent surface is split into its two actual responsibilities:

  1. a METRICS SINK (`metrics_sink` / `attach_metrics_sink`): per
     micro-batch, aggregate the scored stream into tumbling-window
     dashboard metrics (row/anomaly counts, score moments, extremes per
     (window, key-ish dimension)) and APPEND them to a parquet feed +
     atomically refresh a ``latest.json`` snapshot — exactly what a
     Kibana/Grafana panel polls;
  2. a RENDERER (`render_dashboard`): read the feed back, merge the
     per-batch partials into final per-window rows, and return/print a
     DataFrame table (the terminal stands in for the browser).

The sink stores MERGEABLE partial aggregates (counts, sums, maxima),
never means — so the per-batch appends, re-aggregated at read time,
equal a single batch aggregation over the full history bit-for-bit.
That stream≡batch identity is the test contract (test_stream.py), same
as every other streaming operator here.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

METRIC_COLS = ["n_rows", "n_anomalies", "sum_score", "sum_abs_score",
               "max_abs_score"]


def score_window_metrics(scored: DataFrame, score_col: str,
                         threshold: float = 3.0,
                         window: str = "1 minute") -> DataFrame:
    """Tumbling-window partial metrics of a scored (batch or stream)
    DataFrame. Pure Column ops → map-side combine + one shuffle."""
    return (
        scored.groupBy(F.window("ts", window).alias("w"))
        .agg(
            F.count("*").alias("n_rows"),
            F.sum((F.abs(F.col(score_col)) > threshold).cast("long"))
            .alias("n_anomalies"),
            F.sum(score_col).alias("sum_score"),
            F.sum(F.abs(F.col(score_col))).alias("sum_abs_score"),
            F.max(F.abs(F.col(score_col))).alias("max_abs_score"),
        )
        .select(F.col("w.start").alias("window_start"),
                F.col("w.end").alias("window_end"), *METRIC_COLS)
    )


def metrics_sink(spark: SparkSession, batch_df: DataFrame, batch_id: int,
                 out_dir: str, score_col: str, threshold: float = 3.0,
                 window: str = "1 minute") -> None:
    """foreachBatch handler. Idempotent under at-least-once redelivery:
    each batch's partials land in their OWN ``feed/batch_NNN`` directory
    with mode=overwrite, so a redelivered batch replaces its previous
    partials instead of double-counting them. ``latest.json`` is merged
    INCREMENTALLY (previous snapshot + this batch) — O(1) per batch, not
    a rescan of the whole feed history."""
    snap_path = os.path.join(out_dir, "latest.json")
    prev = {"rows": 0, "anomalies": 0, "max_abs_score": 0.0,
            "last_batch_id": -1}
    if os.path.exists(snap_path):
        with open(snap_path) as f:
            prev = json.load(f)
    if int(batch_id) <= int(prev.get("last_batch_id", -1)):
        # redelivered batch: snapshot is written AFTER the feed, so its
        # presence proves the feed partials landed — nothing to do, and
        # no Spark job is spent finding that out
        return

    os.makedirs(os.path.join(out_dir, "feed"), exist_ok=True)
    part_df = score_window_metrics(batch_df, score_col, threshold, window) \
        .withColumn("batch_id", F.lit(int(batch_id)))
    part_df.write.mode("overwrite").parquet(
        os.path.join(out_dir, "feed", f"batch_{int(batch_id):010d}"))

    inc = part_df.agg(
        F.sum("n_rows").alias("rows"),
        F.sum("n_anomalies").alias("anomalies"),
        F.max("max_abs_score").alias("max_abs_score"),
    ).collect()[0]
    snap = {
        "last_batch_id": int(batch_id),
        "rows": int(prev["rows"]) + int(inc["rows"] or 0),
        "anomalies": int(prev["anomalies"]) + int(inc["anomalies"] or 0),
        "max_abs_score": max(float(prev["max_abs_score"]),
                             float(inc["max_abs_score"] or 0.0)),
        "score_col": score_col,
        "threshold": threshold,
    }
    tmp = snap_path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(snap, f, indent=1)
    os.replace(tmp, snap_path)


def attach_metrics_sink(scored_stream: DataFrame, out_dir: str,
                        score_col: str, threshold: float = 3.0,
                        window: str = "1 minute"):
    """Wire the sink onto a scored stream: returns the started query.
    Redelivery-safe: the per-batch overwrite directories make the feed
    idempotent even though foreachBatch is at-least-once."""
    spark = scored_stream.sparkSession

    def fn(batch_df: DataFrame, batch_id: int) -> None:
        metrics_sink(spark, batch_df, batch_id, out_dir, score_col,
                     threshold, window)

    return (scored_stream.writeStream.foreachBatch(fn)
            .option("checkpointLocation", os.path.join(out_dir, "_ckpt"))
            .outputMode("append").start())


def read_metrics(spark: SparkSession, out_dir: str) -> DataFrame:
    """The feed's per-batch partials, merged to final per-window rows
    (counts/sums summed, maxima maxed) — what a panel renders."""
    root = os.path.join(out_dir, "feed")
    dirs = sorted(os.path.join(root, d) for d in os.listdir(root)
                  if d.startswith("batch_"))
    feed = spark.read.parquet(*dirs)
    return (
        feed.groupBy("window_start", "window_end")
        .agg(F.sum("n_rows").alias("n_rows"),
             F.sum("n_anomalies").alias("n_anomalies"),
             F.sum("sum_score").alias("sum_score"),
             F.sum("sum_abs_score").alias("sum_abs_score"),
             F.max("max_abs_score").alias("max_abs_score"))
    )


def render_dashboard(spark: SparkSession, out_dir: str,
                     n: int = 20) -> DataFrame:
    """Terminal dashboard: headline snapshot + per-window table, newest
    first, with derived display columns (mean |score|, anomaly rate)."""
    with open(os.path.join(out_dir, "latest.json")) as f:
        snap = json.load(f)
    merged = read_metrics(spark, out_dir)
    print(f"[dashboard] rows={snap['rows']} anomalies={snap['anomalies']} "
          f"max|{snap['score_col']}|={snap['max_abs_score']:.3f} "
          f"windows={merged.count()} (threshold {snap['threshold']})")
    table = merged.select(
        "window_start", "n_rows", "n_anomalies",
        F.round(F.col("sum_abs_score") / F.col("n_rows"), 4)
        .alias("mean_abs_score"),
        F.round(F.col("n_anomalies") / F.col("n_rows"), 4)
        .alias("anomaly_rate"),
        F.round("max_abs_score", 3).alias("max_abs_score"),
    ).orderBy(F.desc("window_start"))
    table.show(n, truncate=False)
    return table
