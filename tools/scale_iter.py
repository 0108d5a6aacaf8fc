"""SCALE_ITER: fixpoint-loop cost tracking for the iterative graph
queries (r11 verdict order #5).

For each iterative registration it runs the query at two scales
(default /root/testdata/sf0.1 and /tmp/sf1 — regenerate the latter
with ``tools/make_sfN.py /root/testdata/sf0.1 /tmp/sf1 10``) and
records:

- ``rounds``: the number of per-round loop-termination probes
  executed (each fixpoint loop calls exactly one ``DataFrame.count``
  per round, so this is the executed round count INCLUDING the final
  empty-frontier round).  The claim under test: rounds grow with
  graph DIAMETER, not data size — key-shifted 10x replication must
  not move them.
- ``jobs`` / ``stages``: Spark jobs and stages executed by the query
  (captured via a job group + status tracker).  Stage count is the
  shuffle-boundary count plus one result stage per job — the
  scheduling cost a fixpoint loop pays per round, and the quantity
  that would explode if per-round state ever re-inlined its prefix
  (the plan-doubling failure mode).
- ``sec`` / ``rows``: warmed one-shot wall time and result size.

Usage: python tools/scale_iter.py [--json OUT] [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time

# resolve the repo from this script's location (realpath so a symlinked
# tools/ cannot point at the wrong tree) — same fix as the other tools
REPO = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
sys.path.insert(0, REPO)

QUERIES = [
    "sssp_delta",
    "temporal_reach",
    "sp_counting",
    "pivot_scc",
    "ancestor_chain",
    "betweenness_contrib",
]
SCALES = ["/root/testdata/sf0.1", "/tmp/sf1"]


def run_one(spark, name: str, sf: str) -> dict:
    import __spark_entry__ as e

    # patch the LIVE DataFrame class (pyspark 4's classic instance
    # class, not the unified-API parent — patching the parent is a
    # silent no-op because the child overrides count)
    DataFrame = type(spark.range(1))
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    orig_count = DataFrame.count
    probes = {"n": 0}

    def counting(self):
        probes["n"] += 1
        return orig_count(self)

    group = f"scale_iter_{name}_{sf.replace('/', '_')}"
    # warm the parquet/file-listing caches so sec is steady-state
    orig_count(e.queries()[name](spark, sf))
    DataFrame.count = counting
    sc.setJobGroup(group, name)
    t0 = time.time()
    try:
        df = e.queries()[name](spark, sf)
        rows = orig_count(df)
    finally:
        DataFrame.count = orig_count
        sc.setLocalProperty("spark.jobGroup.id", None)
    sec = time.time() - t0
    jids = tracker.getJobIdsForGroup(group)
    stages = 0
    for j in jids:
        ji = tracker.getJobInfo(j)
        if ji is not None:
            stages += len(ji.stageIds)
    return {
        "query": name,
        "sf": sf,
        "rows": rows,
        "rounds": probes["n"],
        "jobs": len(jids),
        "stages": stages,
        "sec": round(sec, 2),
    }


def main():
    args = sys.argv[1:]
    json_out = None
    if "--json" in args:
        i = args.index("--json")
        json_out = args[i + 1]
        args = args[:i] + args[i + 2:]
    names = args or QUERIES

    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "96g")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    out = []
    for name in names:
        for sf in SCALES:
            r = run_one(spark, name, sf)
            print(json.dumps(r), flush=True)
            out.append(r)
    if json_out:
        with open(json_out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
