"""ST2–ST6 — windowed/stateless streaming transforms (SURVEY.md §2.10).

Each function takes a DataFrame that may be BATCH or STREAMING and
returns the transformed frame — the same plan works in both modes,
which is exactly how the stream-batch equivalence tests verify them
(replay the same rows file-by-file, compare to the one-shot batch
answer). Sums go through decimal so the equivalence is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def tumbling_counts(events: DataFrame, window: str = "1 hour") -> DataFrame:
    """ST2 — events per (window, event_type)."""
    return (
        events.groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("value").cast("decimal(38,6)"))
             .cast("double").alias("sum_value"))
        .select(F.col("w.start").alias("w_start"),
                F.col("w.end").alias("w_end"), "event_type", "n", "sum_value")
    )


def sliding_counts(events: DataFrame, window: str = "1 hour",
                   slide: str = "15 minutes") -> DataFrame:
    """ST3 — overlapping windows."""
    return (
        events.groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes") -> DataFrame:
    """ST4 — per-user sessions with an inactivity gap."""
    return (
        events.groupBy(F.session_window("ts", gap).alias("s"), "user_id")
        .agg(F.count("*").alias("n_events"),
             F.sum(F.col("value").cast("decimal(38,6)"))
             .cast("double").alias("sum_value"))
        .select(F.col("s.start").alias("s_start"),
                F.col("s.end").alias("s_end"), "user_id", "n_events",
                "sum_value")
    )


def watermarked_tumbling(events: DataFrame, delay: str = "1 hour",
                         window: str = "1 hour") -> DataFrame:
    """ST5 — watermark bounds state and drops too-late rows; on a batch
    frame the watermark is a no-op, so equivalence holds for replays
    with no late data (the late-data drop itself is asserted in the
    dedicated late-arrival test)."""
    return (
        events.withWatermark("ts", delay)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(F.col("w.start").alias("w_start"), "event_type", "n")
    )


def dedupe_stream(events: DataFrame, keys: list[str],
                  watermark_delay: str = "1 hour") -> DataFrame:
    """ST6 — exactly-once-per-key ingest (streaming dedupe)."""
    if events.isStreaming:
        return events.withWatermark("ts", watermark_delay).dropDuplicates(keys)
    return events.dropDuplicates(keys)
