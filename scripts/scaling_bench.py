"""Two-parallelism scaling evidence (BASELINE.json:2,14: throughput
scaling efficiency ≥0.8 from N to 4N executors; sandbox has no cluster,
so per the driver instruction we run the SAME job at local[8] and
local[32] on the SAME input and report throughput at both).

Also verifies rank-identity across the two parallelism levels
(BASELINE.json:14) by comparing the top-k docIDs+scores produced at
each level. Writes BENCH/BASELINE.md.
"""

import json
import os
import subprocess
import sys
import tempfile
import time
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

RUNNER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from datastream_io_spark.corpus import corpus_df
from datastream_io_spark.operators.build import build_index
from datastream_io_spark.operators.indexed_search import search_indexed
from datastream_io_spark.session import get_spark

cores = int(sys.argv[1]); n = int(sys.argv[2]); out = sys.argv[3]
spark = get_spark(f"scaling_{{cores}}", cores=cores, shuffle_partitions=2*cores)
src = tempfile.mkdtemp(prefix=f"scal_src_{{cores}}_")
corpus_df(spark, n).write.mode("overwrite").parquet(src)
corpus = spark.read.parquet(src)
idx = tempfile.mkdtemp(prefix=f"scal_{{cores}}_")
t0 = time.time()
build_index(spark, corpus, idx, n_splits=16, n_buckets=32,
            tokenizer="code", salt_threshold=100_000, n_salts=8,
            max_concurrent_splits=8)
build_sec = time.time() - t0
results = {{}}
qlat = {{}}
for q, mode in [("parseConfig", "and"), ("parse config", "and"),
               ("import os error", "or"), ("ident_4999", "or")]:
    t0 = time.time()
    rows = search_indexed(spark, idx, q, 10, mode).collect()
    qlat[f"{{q}}|{{mode}}"] = time.time() - t0
    results[f"{{q}}|{{mode}}"] = [(r.doc_id, round(r.score, 9)) for r in rows]
with open(out, "w") as f:
    json.dump({{"cores": cores, "n": n, "build_sec": build_sec,
               "files_per_sec": n / build_sec, "qlat": qlat,
               "results": results}}, f)
"""


def run(cores: int, n: int) -> dict:
    out = tempfile.mktemp(suffix=".json")
    script = RUNNER.format(repo=REPO)
    subprocess.run([sys.executable, "-c", script, str(cores), str(n), out],
                   check=True, cwd=REPO)
    with open(out) as f:
        return json.load(f)


def main() -> None:
    n = int(os.environ.get("SCALING_CORPUS_N", "20000"))
    lo, hi = 8, 32  # N and 4N worker threads
    t0 = time.time()
    r_lo = run(lo, n)
    r_hi = run(hi, n)
    eff = (r_hi["files_per_sec"] / r_lo["files_per_sec"]) / (hi / lo)
    rank_identical = r_lo["results"] == r_hi["results"]

    md = f"""# BENCH/BASELINE — scaling + rank-identity evidence

Generated {datetime.now(timezone.utc).isoformat()} by scripts/scaling_bench.py.
Same job (index build over the {n}-file synthetic code corpus, then 4
top-k BM25 WAND queries) at two parallelism levels on the same input —
the sandbox stand-in for N vs 4N executors (driver instruction; no real
cluster available).

| parallelism | build sec | files/sec |
|---|---|---|
| local[{lo}] (N) | {r_lo['build_sec']:.1f} | {r_lo['files_per_sec']:.1f} |
| local[{hi}] (4N) | {r_hi['build_sec']:.1f} | {r_hi['files_per_sec']:.1f} |

**Scaling efficiency (throughput_4N / throughput_N) / 4 = {eff:.3f}**
(target ≥ 0.8, BASELINE.json:2)

**Rank identity across parallelism levels: {rank_identical}**
(top-10 docIDs and scores (9 dp) of {len(r_lo['results'])} queries
compared between local[{lo}] and local[{hi}] — BASELINE.json:14)

Query latencies (sec):

| query | local[{lo}] | local[{hi}] |
|---|---|---|
"""
    for k in r_lo["qlat"]:
        md += f"| {k} | {r_lo['qlat'][k]:.3f} | {r_hi['qlat'][k]:.3f} |\n"
    md += f"\nTotal wall time for this evidence run: {time.time()-t0:.0f}s\n"

    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(md)
    print(json.dumps({"efficiency": eff, "rank_identical": rank_identical}))


if __name__ == "__main__":
    main()
