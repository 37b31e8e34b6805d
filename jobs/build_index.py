"""spark-submit entry point for the batch index build (BASELINE.json:14:
"launched via spark-submit --py-files on a multi-executor cluster").

    zip -r engine.zip datastream_io_spark/
    spark-submit --py-files engine.zip jobs/build_index.py \
        --src /data/corpus_parquet --out /data/index \
        --splits 64 --buckets 1024 --tokenizer code \
        --salt-threshold 1000000 --salts 16

Resumable: re-submitting the same command after a failure skips staged
phases and completed splits (per-split manifests under <out>/manifest).
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--src", default=None,
                   help="corpus table path/identifier (not needed for "
                        "the coordinator bookkeeping steps)")
    p.add_argument("--fmt", default="parquet", choices=["parquet", "iceberg"])
    p.add_argument("--out", required=True, help="index output directory")
    p.add_argument("--splits", type=int, default=16)
    p.add_argument("--buckets", type=int, default=64)
    p.add_argument("--tokenizer", default="code", choices=["simple", "code"])
    p.add_argument("--salt-threshold", type=int, default=1 << 20)
    p.add_argument("--salts", type=int, default=8)
    p.add_argument("--concurrency", type=int, default=4,
                   help="concurrent split jobs")
    p.add_argument("--positions", action="store_true",
                   help="store per-posting token positions (enables "
                        "--mode phrase in jobs/search.py; ~60%% more "
                        "index bytes)")
    p.add_argument("--store-content", action="store_true",
                   help="carry raw content into docs/ (split-aligned, "
                        "zstd) so the served index answers snippets "
                        "without the source corpus mounted; composes "
                        "with --drop-staged")
    p.add_argument("--drop-staged", action="store_true",
                   help="delete the staged corpus copy after finalize")
    p.add_argument("--stage-only", action="store_true",
                   help="phase A only (single job) — then fan segment "
                        "work out to jobs/build_worker.py processes")
    p.add_argument("--plan-only", action="store_true",
                   help="phase A coordinator plan only — then fan the "
                        "staging itself out to build_worker.py "
                        "--phase stage processes")
    p.add_argument("--stage-commit", action="store_true",
                   help="freeze staging.json after all stage workers "
                        "finished")
    p.add_argument("--finalize-only", action="store_true",
                   help="phase C only, single process — after all "
                        "segment workers finished")
    p.add_argument("--finalize-reset", action="store_true",
                   help="clear finalize outputs/markers/claims before "
                        "a finalize worker fleet")
    p.add_argument("--finalize-commit", action="store_true",
                   help="write stats/merge/_INDEX_SUCCESS after all "
                        "finalize workers finished")
    args = p.parse_args(argv)

    import json

    from pyspark.sql import SparkSession

    from datastream_io_spark.operators.build import (
        build_index,
        drop_staged_corpus,
        finalize_commit,
        finalize_index,
        finalize_reset,
        stage_commit,
        stage_corpus,
        stage_plan,
    )

    # the coordinator bookkeeping steps are pure Python — no session
    if args.stage_commit:
        with open(f"{args.out}/staging_plan.json") as f:
            plan = json.load(f)
        info = stage_commit(args.out, plan)
        print(f"staging frozen: n_docs={info['n_docs']}")
        return 0
    if args.finalize_reset:
        finalize_reset(args.out)
        print("finalize state reset")
        return 0
    if args.finalize_commit:
        with open(f"{args.out}/staging.json") as f:
            info = json.load(f)
        stats = finalize_commit(args.out, info,
                                salt_threshold=args.salt_threshold,
                                n_salts=args.salts)
        print(f"finalized: n_docs={stats['n_docs']} "
              f"avgdl={stats['avgdl']:.3f}")
        return 0

    from datastream_io_spark.sources.scan import scan_corpus

    if not args.src and not args.finalize_only:
        p.error("--src is required for staging/build phases")

    # under spark-submit the session config comes from the submit command;
    # getOrCreate attaches to it rather than re-configuring
    spark = SparkSession.builder.appName("build_index").getOrCreate()
    corpus = scan_corpus(spark, args.src, args.fmt) if args.src else None
    if args.plan_only:
        plan = stage_plan(spark, corpus, args.out, args.splits,
                          args.buckets, args.tokenizer,
                          positions=args.positions,
                          store_content=args.store_content)
        print(f"planned: n_docs={plan['n_docs']} "
              f"splits={plan['n_splits']}")
        return 0
    if args.stage_only:
        info = stage_corpus(spark, corpus, args.out, args.splits,
                            args.buckets, args.tokenizer,
                            positions=args.positions,
                            store_content=args.store_content)
        print(f"staged: n_docs={info['n_docs']} splits={info['n_splits']}")
        return 0
    if args.finalize_only:
        import json

        with open(f"{args.out}/staging.json") as f:
            info = json.load(f)
        stats = finalize_index(spark, args.out, info,
                               salt_threshold=args.salt_threshold,
                               n_salts=args.salts)
        print(f"finalized: n_docs={stats['n_docs']} avgdl={stats['avgdl']:.3f}")
        return 0
    stats = build_index(
        spark, corpus, args.out,
        n_splits=args.splits, n_buckets=args.buckets,
        tokenizer=args.tokenizer, salt_threshold=args.salt_threshold,
        n_salts=args.salts, source_desc=f"{args.fmt}:{args.src}",
        max_concurrent_splits=args.concurrency, positions=args.positions,
        store_content=args.store_content,
    )
    if args.drop_staged:
        drop_staged_corpus(args.out)
    print(f"index built: n_docs={stats['n_docs']} avgdl={stats['avgdl']:.3f} "
          f"splits={stats['n_splits']} buckets={stats['n_buckets']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
