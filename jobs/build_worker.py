"""spark-submit worker for a multi-process (multi-"executor") index
build: workers build segments against a SHARED index directory. By
default each worker CLAIMS pending splits dynamically (atomic
``manifest/claim_NNNN`` markers) so a fast worker steals the tail a
static assignment would leave idle on a straggler; ``--workers W
--worker-id i`` switches to the static ``split % W == i`` partition
(useful when workers must not touch each other's claim files). The
per-split manifests make both safe (disjoint inputs and outputs,
atomic rename + manifest per split), so a fleet of these workers IS
the "N executors" story — locally as separate JVM processes, on a
cluster as separate spark-submit applications.

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
    p.add_argument("--workers", type=int, default=None,
                   help="static split%%W assignment (with --worker-id); "
                        "default: dynamic claiming")
    p.add_argument("--worker-id", type=int, default=0)
    p.add_argument("--salt-threshold", type=int, default=1 << 20)
    p.add_argument("--salts", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--release-claims", action="store_true",
                   help="before pulling, drop stale claims of UNDONE "
                        "splits (a crashed fleet's leftovers would "
                        "otherwise make every retry a no-op). Only run "
                        "this when no other worker is live — a live "
                        "worker's claim looks identical to a stale one")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from datastream_io_spark.operators.build import build_segment
    from datastream_io_spark.sources.manifest import (
        claim_split, pending_splits, release_claims)

    spark = SparkSession.builder.appName(
        f"build_worker_{args.worker_id}").getOrCreate()
    with open(f"{args.index}/staging.json") as f:
        info = json.load(f)
    if args.release_claims:
        n_rel = release_claims(args.index)
        print(f"released {n_rel} stale claims")
    owner = f"worker_{args.worker_id}_pid{__import__('os').getpid()}"
    pending = pending_splits(args.index, info["n_splits"])
    if args.workers is not None:
        mine = iter([s for s in pending
                     if s % args.workers == args.worker_id])
    else:
        # dynamic: claim lazily so late splits can be stolen from
        # stragglers; the iterator is pulled from the worker threads
        mine = (s for s in pending if claim_split(args.index, s, owner))

    def run(split_id: int) -> int:
        build_segment(spark, args.index, split_id, info,
                      salt_threshold=args.salt_threshold,
                      n_salts=args.salts)
        return split_id

    built = []
    if args.concurrency <= 1:
        for s in mine:
            built.append(run(s))
    else:
        # NOT Executor.map: it drains the iterable eagerly, which would
        # claim every pending split up front and forfeit stealing —
        # puller threads take the next (claimed) split only when free
        import threading

        it_lock = threading.Lock()
        errors: list[BaseException] = []

        def puller() -> None:
            while True:
                with it_lock:
                    s = next(mine, None)
                if s is None:
                    return
                try:
                    built.append(run(s))
                except BaseException as exc:  # propagate to main thread
                    errors.append(exc)
                    return

        threads = [threading.Thread(target=puller)
                   for _ in range(args.concurrency)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        if errors:
            # a swallowed split failure must not exit 0: finalize would
            # crash later on the missing manifest, far from the cause
            raise errors[0]
    mode = ("dynamic" if args.workers is None
            else f"static {args.worker_id}/{args.workers}")
    print(f"worker[{mode}]: built {len(built)} splits {sorted(built)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
