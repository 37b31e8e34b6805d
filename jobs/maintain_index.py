"""spark-submit entry point for index maintenance: tombstone deletes,
physical purge, and stream-index compaction.

    spark-submit --py-files engine.zip jobs/maintain_index.py \
        --index /data/index delete --where "lang = 'go'"
    ... delete --doc-ids 17 42 99
    ... purge
    ... compact --target-splits 8        # streaming indexes
    ... merge                            # fold new staged stream batches
    ... sidecars                         # (re)build dict_sorted + dict_ngrams
"""

from __future__ import annotations

import argparse
import sys


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--partitioned", action="store_true",
                   help="--index is a partitioned root: apply "
                        "delete/purge/sidecars to EVERY subindex "
                        "(delete needs --where; compact/merge are "
                        "per-subindex streaming ops — point --index at "
                        "a subindex dir)")
    sub = p.add_subparsers(dest="cmd", required=True)

    d = sub.add_parser("delete", help="tombstone docs (live-docs: every "
                                      "query mode stops returning them)")
    d.add_argument("--doc-ids", nargs="*", type=int, default=None)
    d.add_argument("--where", default=None,
                   help="docs-table predicate, e.g. \"lang = 'go'\"")

    sub.add_parser("purge", help="physically remove tombstoned docs and "
                                 "rebuild df/dict/stats")

    c = sub.add_parser("compact", help="merge per-batch posting rows of a "
                                       "STREAMING index into coarse splits")
    c.add_argument("--target-splits", type=int, required=True)

    sub.add_parser("merge", help="incremental finalize: fold only NEW "
                                 "staged stream batches into the index "
                                 "(O(new data))")
    sub.add_parser("sidecars", help="(re)build the wildcard/fuzzy "
                                    "expansion sidecars (dict_sorted + "
                                    "dict_ngrams)")

    args = p.parse_args(argv)
    if args.cmd == "delete" and bool(args.doc_ids) == bool(args.where):
        p.error("delete needs exactly one of --doc-ids (non-empty) / --where")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("maintain_index").getOrCreate()

    if args.partitioned:
        if args.cmd not in ("delete", "purge", "sidecars"):
            p.error("--partitioned supports delete/purge/sidecars")
        if args.cmd == "delete" and args.doc_ids:
            p.error("--partitioned delete takes --where only (doc ids "
                    "are per-subindex)")
        from datastream_io_spark.operators.partitioned import (
            maintain_all_partitions,
        )

        kw = {"where": args.where} if args.cmd == "delete" else {}
        out = maintain_all_partitions(spark, args.index, args.cmd, **kw)
        for v, res in out.items():
            if args.cmd == "delete":
                print(f"{v}: tombstones now cover {res} docs")
            elif args.cmd == "purge":
                print(f"{v}: purged n_docs={res['n_docs']}")
            else:
                print(f"{v}: sidecars n_terms={res['n_terms']}")
        return 0

    if args.cmd == "delete":
        from datastream_io_spark.operators.indexed_search import delete_docs

        n = delete_docs(spark, args.index,
                        doc_ids=args.doc_ids or None, where=args.where)
        print(f"tombstones now cover {n} docs")
    elif args.cmd == "purge":
        from datastream_io_spark.operators.build import purge_deleted

        stats = purge_deleted(spark, args.index)
        print(f"purged: n_docs={stats['n_docs']} avgdl={stats['avgdl']:.3f}")
    elif args.cmd == "compact":
        from datastream_io_spark.streaming.incremental import (
            compact_stream_index,
        )

        stats = compact_stream_index(spark, args.index, args.target_splits)
        print(f"compacted to n_splits={stats['n_splits']}")
    elif args.cmd == "merge":
        from datastream_io_spark.streaming.incremental import (
            merge_stream_batches,
        )

        stats = merge_stream_batches(spark, args.index)
        print(f"merged: n_docs={stats['n_docs']} "
              f"n_splits={stats['n_splits']}")
    else:
        from datastream_io_spark.operators.dictindex import (
            build_term_sidecars,
        )

        meta = build_term_sidecars(spark, args.index)
        print(f"sidecars built: n_terms={meta['n_terms']} "
              f"range_parts={meta['n_range_parts']} "
              f"gram_buckets={meta['n_gram_buckets']}")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
