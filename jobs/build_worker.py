"""spark-submit worker for a multi-process (multi-"executor") index
build: each worker owns the splits with ``split_id % n_workers ==
worker_id`` and builds their segments against a SHARED index directory.
The per-split manifests make this safe (disjoint inputs and outputs,
atomic rename + manifest per split), so a fleet of these workers IS the
"N executors" story — locally as separate JVM processes, on a cluster
as separate spark-submit applications.

    # stage once (any worker or the coordinator):
    spark-submit --py-files engine.zip jobs/build_index.py --stage-only ...
    # then in parallel, e.g. 4 workers:
    for i in 0 1 2 3; do
      spark-submit --py-files engine.zip jobs/build_worker.py \
          --index /data/index --workers 4 --worker-id $i &
    done; wait
    # finalize once:
    spark-submit --py-files engine.zip jobs/build_index.py --finalize-only ...
"""

from __future__ import annotations

import argparse
import json
import sys


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--workers", type=int, default=1)
    p.add_argument("--worker-id", type=int, default=0)
    p.add_argument("--salt-threshold", type=int, default=1 << 20)
    p.add_argument("--salts", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=4)
    args = p.parse_args(argv)

    from concurrent.futures import ThreadPoolExecutor

    from pyspark.sql import SparkSession

    from datastream_io_spark.operators.build import build_segment
    from datastream_io_spark.sources.manifest import pending_splits

    spark = SparkSession.builder.appName(
        f"build_worker_{args.worker_id}").getOrCreate()
    with open(f"{args.index}/staging.json") as f:
        info = json.load(f)
    mine = [s for s in pending_splits(args.index, info["n_splits"])
            if s % args.workers == args.worker_id]

    def run(split_id: int) -> None:
        build_segment(spark, args.index, split_id, info,
                      salt_threshold=args.salt_threshold,
                      n_salts=args.salts)

    if args.concurrency <= 1 or len(mine) <= 1:
        for s in mine:
            run(s)
    else:
        with ThreadPoolExecutor(max_workers=args.concurrency) as pool:
            for _ in pool.map(run, mine):
                pass
    print(f"worker {args.worker_id}/{args.workers}: built {len(mine)} splits")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
