"""Local stand-in for the driver's correctness gate: run every
queries()/oracle_sql() pair at a given sf and compare row count, column
names, and an order-insensitive multiset of stringified rows."""

import os
import sys
from collections import Counter

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import duckdb

from datastream_io_spark.driver_queries import ORACLES, QUERIES
from datastream_io_spark.session import get_spark

SF_DIR = os.environ.get("SF_DIR", "/root/testdata/sf0.01")
TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def norm(v):
    if isinstance(v, float):
        return f"{v:.9g}"
    return str(v)


def main(only=None):
    spark = get_spark("check_oracles", cores=8, shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF_DIR}/{t}.parquet')")
    failures = []
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        import time
        t0 = time.time()
        try:
            sdf = fn(spark, SF_DIR)
            srows = sdf.collect()
            scols = sdf.columns
            sset = Counter(tuple(norm(v) for v in r) for r in srows)
        except Exception as e:
            print(f"FAIL {name}: spark error {type(e).__name__}: {e}")
            failures.append(name)
            continue
        if name not in ORACLES:
            print(f"ok?  {name}: rows={len(srows)} (rows-only, no oracle)")
            continue
        try:
            rel = con.sql(ORACLES[name])
            dcols = [c.lower() for c in rel.columns]
            drows = rel.fetchall()
            dset = Counter(tuple(norm(v) for v in r) for r in drows)
        except Exception as e:
            print(f"FAIL {name}: duckdb error {e}")
            failures.append(name)
            continue
        ok_count = len(srows) == len(drows)
        ok_cols = [c.lower() for c in scols] == dcols
        ok_vals = sset == dset
        status = "OK  " if (ok_count and ok_cols and ok_vals) else "FAIL"
        print(f"{status} {name}: rows {len(srows)}/{len(drows)} cols "
              f"{ok_cols} vals {ok_vals} ({time.time()-t0:.1f}s)")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print(f"   spark cols: {scols}\n   duck cols : {rel.columns}")
            if not ok_vals:
                sd = list((sset - dset).items())[:3]
                ds = list((dset - sset).items())[:3]
                print(f"   spark-only: {sd}\n   duck-only : {ds}")
    print("\nFAILURES:", failures or "none")
    return 1 if failures else 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:]) or None))
