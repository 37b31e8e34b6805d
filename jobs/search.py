"""spark-submit entry point for top-k BM25 queries against a built index.

    spark-submit --py-files engine.zip jobs/search.py \
        --index /data/index --query "parse config" --k 10 --mode and
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv: list[str]) -> int:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--index", required=True)
    p.add_argument("--query", required=True)
    p.add_argument("--k", type=int, default=10)
    p.add_argument("--mode", default="and",
                   choices=["and", "or", "phrase", "boolean", "wildcard",
                            "fuzzy", "near", "regex"],
                   help="phrase/near (and quoted phrases in boolean) need "
                        "an index built with positions=True; boolean "
                        "parses AND/OR/NOT, parentheses, and "
                        '"quoted phrases"; wildcard treats the query as a '
                        "term prefix (trailing * optional); fuzzy expands "
                        "the query term to index terms within --max-dist "
                        "edits; near keeps docs whose distinct query "
                        "terms fit a --slop window (--ordered for "
                        "in-order)")
    p.add_argument("--max-dist", type=int, default=1,
                   help="Levenshtein budget for --mode fuzzy")
    p.add_argument("--slop", type=int, default=2,
                   help="extra-token budget for --mode near")
    p.add_argument("--ordered", action="store_true",
                   help="--mode near: terms must appear in query order")
    p.add_argument("--facet", default=None, metavar="COL",
                   help="instead of top-k rows, print per-COL counts of "
                        "ALL docs matching the query (and/or/phrase)")
    p.add_argument("--snippets", action="store_true",
                   help="print a match-window snippet per hit "
                        "(and/or/phrase). Content comes from --src, or "
                        "from the index's own doc store when built with "
                        "--store-content and --src is omitted")
    p.add_argument("--src", default=None,
                   help="source corpus parquet for --snippets (optional "
                        "on a store_content index)")
    p.add_argument("--snippet-width", type=int, default=12)
    p.add_argument("--relational", action="store_true",
                   help="also run the index-free relational path (self-oracle)")
    p.add_argument("--explain", action="store_true",
                   help="print the query PLAN as JSON (resolved terms, "
                        "df/idf, bucket pruning, expansions, boolean "
                        "AST, tombstones) and exit — dict/stats reads "
                        "only, postings never touched")
    p.add_argument("--partitioned", action="store_true",
                   help="--index is a PARTITIONED root (build_partitioned"
                        "_index layout). With --value, route to that "
                        "subindex (partition-local stats); without, run "
                        "the GLOBAL cross-partition top-k under merged "
                        "statistics (and/or/phrase)")
    p.add_argument("--value", default=None,
                   help="partition value to route to (with --partitioned)")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession

    from datastream_io_spark.operators.boolean_search import search_boolean
    from datastream_io_spark.operators.indexed_search import (
        facet_counts, search_fuzzy, search_indexed, search_wildcard,
        snippets)

    spark = SparkSession.builder.appName("search").getOrCreate()
    t0 = time.time()
    if args.explain:
        import json

        from datastream_io_spark.operators.indexed_search import (
            explain_query)

        if args.partitioned:
            p.error("--explain targets one index dir (point --index at "
                    "a subindex for partitioned roots)")
        plan = explain_query(spark, args.index, args.query, args.mode,
                             max_dist=args.max_dist, slop=args.slop,
                             ordered=args.ordered)
        print(json.dumps(plan, indent=1, default=str))
        return 0
    if args.partitioned:
        if args.snippets or args.facet is not None or args.mode not in (
                "and", "or", "phrase", "near", "boolean"):
            p.error("--partitioned supports modes and/or/phrase/near/"
                    "boolean (no --snippets/--facet; point --index at "
                    "a subindex dir for those)")
        from datastream_io_spark.operators.partitioned import (
            read_partitioned, search_all_partitions,
            search_boolean_all_partitions, search_partitioned)

        if args.value is not None:
            if args.mode == "boolean":
                sub = f"{args.index}/{read_partitioned(args.index)['by']}" \
                      f"={args.value}"
                result = search_boolean(spark, sub, args.query, args.k,
                                        with_doc_cols=True)
            else:
                result = search_partitioned(
                    spark, args.index, args.value, args.query, args.k,
                    args.mode, with_doc_cols=True)
            rows = result.collect()
            dt = time.time() - t0
            for r in rows:
                print(f"{r.score:12.6f}  doc={r.doc_id:<10d} "
                      f"{r.repo}/{r.path}")
        else:
            by = read_partitioned(args.index)["by"]
            if args.mode == "boolean":
                result = search_boolean_all_partitions(
                    spark, args.index, args.query, args.k,
                    with_doc_cols=True)
            else:
                result = search_all_partitions(
                    spark, args.index, args.query, args.k, args.mode,
                    with_doc_cols=True, slop=args.slop,
                    ordered=args.ordered)
            rows = result.collect()
            dt = time.time() - t0
            for r in rows:
                print(f"{r.score:12.6f}  {by}={r[by]:<8} "
                      f"doc={r.doc_id:<10d} {r.repo}/{r.path}")
        print(f"-- {len(rows)} rows in {dt * 1000:.0f} ms "
              f"(partitioned, mode={args.mode}, "
              f"value={args.value or '<global>'})")
        return 0
    if args.snippets:
        if args.mode in ("boolean", "wildcard", "fuzzy", "regex"):
            p.error("--snippets supports modes and/or/phrase/near")
        corpus = (spark.read.parquet(args.src)
                  if args.src is not None else None)
        rows = snippets(spark, args.index, corpus, args.query, args.k,
                        args.mode, width=args.snippet_width,
                        slop=args.slop, ordered=args.ordered).collect()
        dt = time.time() - t0
        for r in rows:
            print(f"{r['score']:12.6f}  doc={r['doc_id']:<6} "
                  f"[{r['n_hits']}] {r['snippet']}")
        print(f"-- {len(rows)} snippets in {dt * 1000:.0f} ms "
              f"(mode={args.mode})")
        return 0
    if args.facet is not None:
        if args.mode in ("boolean", "wildcard", "fuzzy", "near", "regex"):
            p.error("--facet supports modes and/or/phrase")
        rows = facet_counts(spark, args.index, args.query, args.facet,
                            args.mode).collect()
        dt = time.time() - t0
        for r in rows:
            print(f"{r['n_docs']:10d}  {args.facet}={r[args.facet]}")
        print(f"-- {len(rows)} facet values in {dt * 1000:.0f} ms "
              f"(mode={args.mode})")
        return 0
    if args.mode == "boolean":
        result = search_boolean(spark, args.index, args.query, args.k,
                                with_doc_cols=True)
    elif args.mode == "wildcard":
        result = search_wildcard(spark, args.index, args.query, args.k,
                                 with_doc_cols=True)
    elif args.mode == "fuzzy":
        result = search_fuzzy(spark, args.index, args.query, args.k,
                              max_dist=args.max_dist, with_doc_cols=True)
    elif args.mode == "regex":
        from datastream_io_spark.operators.indexed_search import search_regex
        result = search_regex(spark, args.index, args.query, args.k,
                              with_doc_cols=True)
    elif args.mode == "near":
        from datastream_io_spark.operators.indexed_search import search_near
        result = search_near(spark, args.index, args.query, args.k,
                             slop=args.slop, ordered=args.ordered,
                             with_doc_cols=True)
    else:
        result = search_indexed(spark, args.index, args.query, args.k,
                                args.mode, with_doc_cols=True)
    rows = result.collect()
    dt = time.time() - t0
    for r in rows:
        print(f"{r.score:12.6f}  doc={r.doc_id:<10d} {r.repo}/{r.path}")
    print(f"-- {len(rows)} rows in {dt * 1000:.0f} ms (mode={args.mode})")
    return 0


if __name__ == "__main__":
    sys.exit(main(sys.argv[1:]))
