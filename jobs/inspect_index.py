"""spark-submit entry point: inspect + validate a built index.

    spark-submit --py-files engine.zip jobs/inspect_index.py \
        --index /data/index [--verify]

Prints the stats header, per-term_bucket posting-row/byte totals, and
split doc-range coverage. ``--verify`` recounts the lineage metrics
from the data and checks them against the manifests (the same
invariants the test suite pins — useful after a resume, a compaction,
or an operational mishap).
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--verify", action="store_true",
                   help="recount postings/bytes/docs and compare with "
                        "stats.json + manifests (exit 1 on mismatch)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    spark = SparkSession.builder.appName("inspect_index").getOrCreate()
    idx = args.index

    with open(os.path.join(idx, "stats.json")) as f:
        stats = json.load(f)
    print("stats.json:")
    for k in ("format", "kind", "n_docs", "avgdl", "n_splits", "n_buckets",
              "tokenizer", "positions", "k1", "b"):
        if k in stats:
            print(f"  {k:12} {stats[k]}")
    tomb = os.path.join(idx, "tombstones")
    if os.path.exists(tomb):
        print(f"  {'tombstones':12} {spark.read.parquet(tomb).count()}")

    from datastream_io_spark.operators.build import blocks_bytes_col

    post = spark.read.parquet(os.path.join(idx, "postings"))
    sizes = (
        post.groupBy("term_bucket")
        .agg(F.count("*").alias("rows"),
             F.countDistinct("term").alias("terms"),
             F.sum("df").alias("postings"),
             F.sum(blocks_bytes_col("blocks")).alias("bytes"))
        .orderBy("term_bucket")
    )
    print("\nper term_bucket:")
    sizes.show(int(stats["n_buckets"]) + 1, truncate=False)

    ranges = (
        post.groupBy("split_id")
        .agg(F.min("first_doc_id").alias("lo"),
             F.max("last_doc_id").alias("hi"),
             F.count("*").alias("rows"))
        .orderBy("lo")
    )
    print("split doc-ranges:")
    ranges.show(100, truncate=False)

    rc = 0
    if args.verify:
        tot = post.agg(
            F.sum("df").alias("n_postings"),
            F.count("*").alias("rows")).collect()[0]
        docs = spark.read.parquet(os.path.join(idx, "docs"))
        n_docs = docs.count()
        ok_docs = n_docs == int(stats["n_docs"])
        print(f"docs count: {n_docs} vs stats {stats['n_docs']} "
              f"{'OK' if ok_docs else 'MISMATCH'}")
        rc |= 0 if ok_docs else 1
        # split ranges must be pairwise disjoint (the merge invariant)
        rs = ranges.collect()
        disjoint = all(a["hi"] < b["lo"] for a, b in zip(rs, rs[1:]))
        print(f"split ranges disjoint: {'OK' if disjoint else 'VIOLATED'}")
        rc |= 0 if disjoint else 1
        merge_path = os.path.join(idx, "manifest", "merge.json")
        if os.path.exists(merge_path):
            with open(merge_path) as f:
                merge = json.load(f)
            ok_p = int(merge.get("n_postings", -1)) == int(tot["n_postings"])
            print(f"postings: {tot['n_postings']} vs merge.json "
                  f"{merge.get('n_postings')} {'OK' if ok_p else 'MISMATCH'}")
            rc |= 0 if ok_p else 1
        dict_terms = spark.read.parquet(os.path.join(idx, "dict")).count()
        post_terms = post.select("term").distinct().count()
        ok_t = dict_terms == post_terms
        print(f"dict terms: {dict_terms} vs postings distinct {post_terms} "
              f"{'OK' if ok_t else 'MISMATCH'}")
        rc |= 0 if ok_t else 1
        print("VERIFY:", "OK" if rc == 0 else "FAILED")
    return rc


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
