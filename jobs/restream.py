"""spark-submit entry point mirroring datastream.io's CLI shape
[pub:dsio]: replay a static table as a live stream, score each row with
the incremental per-key Gaussian z-score detector, sink scored rows.

dsio:  dsio --input data.csv --sensors v --timefield time --es-uri ...
here:  spark-submit --py-files engine.zip jobs/restream.py \
           --input /root/testdata/sf0.001/events.parquet \
           --key user_id --value value --timefield ts \
           --chunks 4 --out /tmp/scored --threshold 3.0

The restream is deterministic (chunked files with ordered mtimes); the
detector is ST7 (`applyInPandasWithState`, score-then-update, capped
effective sample size); the sink appends parquet per micro-batch with
Spark's checkpoint giving exactly-once.
"""

from __future__ import annotations

import argparse
import sys
import tempfile


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True, help="parquet table to replay")
    p.add_argument("--key", default="user_id", help="detector grouping key")
    p.add_argument("--value", default="value", help="sensor column to score")
    p.add_argument("--timefield", default="ts")
    p.add_argument("--id-field", default="event_id")
    p.add_argument("--chunks", type=int, default=4,
                   help="micro-batches to replay the table as")
    p.add_argument("--detector", default="gaussian",
                   help="registered detector name (gaussian | percentile | "
                        "user-registered via --modules)")
    p.add_argument("--modules", nargs="*", default=[],
                   help="python files that register_detector() custom "
                        "detectors (dsio --modules)")
    p.add_argument("--threshold", type=float, default=3.0,
                   help="|score| above which a row is flagged anomalous")
    p.add_argument("--out", required=True,
                   help="scored sink dir: one batch_NNNN parquet subdir "
                        "per micro-batch (read back with "
                        "recursiveFileLookup=true)")
    p.add_argument("--metrics-dir", default=None,
                   help="also run the dashboard metrics sink (dsio's "
                        "kibana/bokeh counterpart): windowed anomaly "
                        "metrics feed + latest.json + terminal table")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from datastream_io_spark.streaming.detectors import (
        DETECTOR_REGISTRY,
        load_detector_modules,
    )
    from datastream_io_spark.streaming.restream import (
        read_restream,
        stage_restream,
    )

    if args.modules:
        load_detector_modules(args.modules)
    if args.detector not in DETECTOR_REGISTRY:
        raise SystemExit(f"unknown detector {args.detector!r}; "
                         f"registered: {sorted(DETECTOR_REGISTRY)}")
    stream_fn, _, score_col = DETECTOR_REGISTRY[args.detector]

    spark = SparkSession.builder.appName("restream").getOrCreate()
    src = spark.read.parquet(args.input).select(
        F.col(args.key).cast("long").alias("user_id"),
        F.col(args.id_field).cast("long").alias("event_id"),
        F.col(args.timefield).cast("timestamp").alias("ts"),
        F.col(args.value).cast("double").alias("value"),
    )
    stage_dir = tempfile.mkdtemp(prefix="restream_stage_")
    schema = stage_restream(src, stage_dir, args.chunks, order_col="ts")
    stream = read_restream(spark, stage_dir, schema)
    scored = stream_fn(stream).withColumn(
        "is_anomaly", F.abs(F.col(score_col)) > args.threshold)

    # the sink layout is the SAME with or without --metrics-dir (one
    # batch_NNNN parquet dir per micro-batch, idempotent overwrite on
    # redelivery): external consumers read --out identically in both
    # modes (spark.read.option("recursiveFileLookup","true"))
    from datastream_io_spark.streaming.dashboard import metrics_sink

    def sink(batch_df, batch_id: int) -> None:
        if args.metrics_dir:
            # ONE pass: the stateful detector runs once; the batch is
            # both persisted and folded into the dashboard metrics feed
            batch_df.persist()
        batch_df.write.mode("overwrite").parquet(
            f"{args.out}/batch_{int(batch_id):04d}")
        if args.metrics_dir:
            metrics_sink(spark, batch_df, batch_id, args.metrics_dir,
                         score_col, threshold=args.threshold)
            batch_df.unpersist()

    q = (scored.writeStream.foreachBatch(sink)
         .option("checkpointLocation", args.out + "_ckpt")
         .outputMode("append").start())
    q.processAllAvailable()
    q.stop()

    result = (spark.read.option("recursiveFileLookup", "true")
              .parquet(args.out))
    n = result.count()
    n_anom = result.where("is_anomaly").count()
    print(f"scored {n} rows, {n_anom} anomalies "
          f"(|{score_col}| > {args.threshold}, detector={args.detector}) "
          f"→ {args.out}")
    result.where("is_anomaly").orderBy(F.desc(F.abs(F.col(score_col)))) \
        .select("user_id", "event_id", "value",
                F.round(score_col, 3).alias(score_col)) \
        .show(10, truncate=False)
    if args.metrics_dir:
        from datastream_io_spark.streaming.dashboard import render_dashboard

        render_dashboard(spark, args.metrics_dir, n=10)
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
