"""spark-submit worker for a multi-process (multi-"executor") index
build. EVERY phase of the build fans out to a fleet of these workers
against a SHARED index directory, so on a real cluster all three
phases scale with executor count:

  --phase stage     claim + stage corpus splits (after the coordinator
                    wrote staging_plan.json via build_index.py
                    --plan-only); finish with --stage-commit
  --phase segments  claim + build index segments (the default; after
                    staging is frozen)
  --phase finalize  claim + run per-term-bucket postings/dict merge
                    tasks and per-split docs tasks (after the
                    coordinator ran build_index.py --finalize-reset);
                    finish with --finalize-commit

By default each worker CLAIMS pending tasks dynamically (atomic
``manifest/*claim*`` markers) so a fast worker steals the tail a
static assignment would leave idle on a straggler; ``--workers W
--worker-id i`` switches the segments phase to the static
``split % W == i`` partition. The per-task manifests make both safe
(disjoint inputs and outputs, atomic rename + marker per task), so a
fleet of these workers IS the "N executors" story — locally as
separate JVM processes, on a cluster as separate spark-submit
applications.

    # plan once, then stage in parallel, e.g. 4 workers:
    spark-submit --py-files engine.zip jobs/build_index.py --plan-only ...
    for i in 0 1 2 3; do
      spark-submit --py-files engine.zip jobs/build_worker.py \
          --index /data/index --phase stage --src /data/corpus &
    done; wait
    spark-submit --py-files engine.zip jobs/build_index.py --stage-commit ...
    # segments in parallel:
    for i in 0 1 2 3; do
      spark-submit --py-files engine.zip jobs/build_worker.py \
          --index /data/index &
    done; wait
    # finalize in parallel:
    spark-submit --py-files engine.zip jobs/build_index.py --finalize-reset ...
    for i in 0 1 2 3; do
      spark-submit --py-files engine.zip jobs/build_worker.py \
          --index /data/index --phase finalize &
    done; wait
    spark-submit --py-files engine.zip jobs/build_index.py --finalize-commit ...
"""

from __future__ import annotations

import argparse
import json
import sys


def _pull_concurrently(mine, run, concurrency: int,
                       batch: int = 1) -> list:
    """Drain a lazily-claiming iterator from ``concurrency`` puller
    threads. NOT Executor.map: that drains the iterable eagerly, which
    would claim every pending task up front and forfeit stealing.

    ``batch`` > 1 pulls up to that many claims at once and hands the
    LIST to ``run`` in one call — the stage/finalize task bodies
    (stage_splits, finalize_postings_buckets, finalize_docs_splits)
    accept arbitrary item lists and write one marker per item, so a
    batch runs as ONE Spark job instead of ``batch`` launches. At
    emulation scale the fixed job-launch cost was 50-60% of those
    phases' wall (r5 measurement); on a real cluster the same batching
    turns W executors × T tasks into W jobs. Stealing granularity
    coarsens to the batch — size it ≈ tasks / (concurrency × workers)
    so every lane still gets work."""
    built: list = []
    if concurrency <= 1:
        while True:
            ts = [t for t in (next(mine, None) for _ in range(batch))
                  if t is not None]
            if not ts:
                return built
            built.append(run(ts if batch > 1 else ts[0]))
    import threading

    it_lock = threading.Lock()
    errors: list[BaseException] = []

    def puller() -> None:
        while True:
            with it_lock:
                ts = [t for t in (next(mine, None) for _ in range(batch))
                      if t is not None]
            if not ts:
                return
            try:
                built.append(run(ts if batch > 1 else ts[0]))
            except BaseException as exc:  # propagate to main thread
                errors.append(exc)
                return

    threads = [threading.Thread(target=puller)
               for _ in range(concurrency)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    if errors:
        # a swallowed task failure must not exit 0: the commit would
        # fail later on the missing marker, far from the cause
        raise errors[0]
    return built


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--phase", default="segments",
                   choices=["stage", "segments", "finalize"])
    p.add_argument("--src", default=None,
                   help="corpus path (required for --phase stage)")
    p.add_argument("--fmt", default="parquet",
                   choices=["parquet", "iceberg"])
    p.add_argument("--workers", type=int, default=None,
                   help="static split%%W assignment (with --worker-id, "
                        "segments phase only); default: dynamic claiming")
    p.add_argument("--worker-id", type=int, default=0)
    p.add_argument("--salt-threshold", type=int, default=1 << 20)
    p.add_argument("--salts", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=4)
    p.add_argument("--claim-batch", type=int, default=1,
                   help="stage/finalize claims pulled per Spark job "
                        "(default 1 = one job per claim). The task "
                        "bodies take item lists, so a batch of B claims "
                        "runs as ONE job — amortizes the fixed job-"
                        "launch cost that dominates these phases at "
                        "small per-task data. Size ≈ n_tasks / "
                        "(concurrency × n_workers)")
    p.add_argument("--stage-chunk", type=int, default=None,
                   help="splits per stage task (every worker of a fleet "
                        "must pass the SAME value — chunk claims are "
                        "indexed by it); default n_splits//16, min 1. "
                        "Each task stages its chunk in ONE corpus pass "
                        "(stage_splits), bounding read amplification")
    p.add_argument("--release-claims", action="store_true",
                   help="before pulling, drop this phase's stale claims "
                        "(a crashed fleet's leftovers would otherwise "
                        "make every retry a no-op; done tasks stay done "
                        "via their markers). Only run this when no other "
                        "worker is live — a live worker's claim looks "
                        "identical to a stale one")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from datastream_io_spark.sources.manifest import (
        claim_split,
        claim_task,
        pending_splits,
        read_task_marker,
        release_claims,
        release_task_claims,
    )

    spark = SparkSession.builder.appName(
        f"build_worker_{args.worker_id}").getOrCreate()
    owner = f"worker_{args.worker_id}_pid{__import__('os').getpid()}"

    if args.phase == "stage":
        from datastream_io_spark.operators.build import stage_splits
        from datastream_io_spark.sources.scan import scan_corpus

        if not args.src:
            p.error("--phase stage requires --src")
        if args.release_claims:
            print(f"released {release_task_claims(args.index, 'sclaim_')} "
                  "stale stage claims")
        with open(f"{args.index}/staging_plan.json") as f:
            plan = json.load(f)
        corpus = scan_corpus(spark, args.src, args.fmt)
        n_splits = plan["n_splits"]
        chunk = args.stage_chunk or max(1, n_splits // 16)

        def chunks():
            for c in range((n_splits + chunk - 1) // chunk):
                splits = list(range(c * chunk,
                                    min((c + 1) * chunk, n_splits)))
                undone = [s for s in splits if read_task_marker(
                    args.index, f"stage_{s:04d}") is None]
                if undone and claim_task(args.index,
                                         f"sclaim_c{c:04d}", owner):
                    yield undone
        def run_stage(claimed):
            ss = (sorted({s for c in claimed for s in c})
                  if args.claim_batch > 1 else claimed)
            stage_splits(spark, corpus, args.index, ss, plan)
            return ss

        built = _pull_concurrently(chunks(), run_stage,
                                   args.concurrency,
                                   batch=args.claim_batch)
        staged = sorted(s for ss in built for s in ss)
        print(f"stage worker: staged {len(staged)} splits {staged}")
        return 0

    if args.phase == "finalize":
        from datastream_io_spark.operators.build import (
            finalize_docs_splits,
            finalize_postings_buckets,
        )

        if args.release_claims:
            print(f"released {release_task_claims(args.index, 'fclaim_')} "
                  "stale finalize claims")
        with open(f"{args.index}/staging.json") as f:
            info = json.load(f)

        def run_task(task):
            tasks = task if args.claim_batch > 1 else [task]
            bs = sorted(i for kind, i in tasks if kind == "b")
            ds = sorted(i for kind, i in tasks if kind == "d")
            if bs:
                finalize_postings_buckets(spark, args.index, info, bs)
            if ds:
                finalize_docs_splits(spark, args.index, info, ds)
            return task

        tasks = (
            [("b", k) for k in range(info["n_buckets"])]
            + [("d", s) for s in range(info["n_splits"])]
        )
        mine = (
            t for t in tasks
            if read_task_marker(
                args.index,
                f"fin_bucket_{t[1]:04d}" if t[0] == "b"
                else f"fin_docs_{t[1]:04d}") is None
            and claim_task(args.index, f"fclaim_{t[0]}{t[1]:04d}", owner)
        )
        built = _pull_concurrently(mine, run_task, args.concurrency,
                                   batch=args.claim_batch)
        print(f"finalize worker: ran {len(built)} tasks")
        return 0

    # --phase segments (default)
    from datastream_io_spark.operators.build import build_segment

    with open(f"{args.index}/staging.json") as f:
        info = json.load(f)
    if args.release_claims:
        n_rel = release_claims(args.index)
        print(f"released {n_rel} stale claims")
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

    built = _pull_concurrently(mine, run, args.concurrency)
    mode = ("dynamic" if args.workers is None
            else f"static {args.worker_id}/{args.workers}")
    print(f"worker[{mode}]: built {len(built)} splits {sorted(built)}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
