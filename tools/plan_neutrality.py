"""Print a normalized physical-plan digest for named registry queries.

Purpose: prove a change is PLAN-NEUTRAL — run this tool in two
checkouts (e.g. pre- and post-merge) and diff the output lines.  The
round-10 use case is the refcounted cache-release landing: releasing a
persisted DataFrame after its result is consumed must not change the
executed plan shape of `pac`, `pac_surrogates`, `er_pipeline`,
`blocking_yield`, or `cluster_cohesion`.

Normalization: expression ids (`#123`), `plan_id=N`, `id=#N`, and
cached-RDD numbers differ run-to-run without changing the plan shape,
so they are masked before hashing.  Everything else — node order,
partitioning arguments, pushed filters, ReadSchema — stays verbatim.

Usage: python tools/plan_neutrality.py [sf_dir] query [query ...]
"""

from __future__ import annotations

import hashlib
import re
import sys


def normalize(plan: str) -> str:
    plan = re.sub(r"#\d+", "#N", plan)
    plan = re.sub(r"plan_id=\d+", "plan_id=N", plan)
    plan = re.sub(r"\bid=#?\d+", "id=N", plan)
    # RDD numbers (MapPartitionsRDD[342], CachedRDD[17], ...) count
    # every RDD the session ever created, so they drift with unrelated
    # session history without changing the plan shape
    plan = re.sub(r"RDD\[\d+\]", "RDD[N]", plan)
    return plan


def main():
    args = sys.argv[1:]
    if args and "/" in args[0]:
        sf_dir, names = args[0], args[1:]
    else:
        sf_dir, names = "/root/testdata/sf0.01", args
    if not names:
        sys.exit("usage: plan_neutrality.py [sf_dir] query [query ...]")

    import os

    repo = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from openseize_spark.session import get_spark

    spark = get_spark("plan-neutrality")
    qs = entrymod.queries()
    unknown = [n for n in names if n not in qs]
    if unknown:
        sys.exit(f"unknown query names: {unknown}")

    for name in names:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        norm = normalize(plan)
        digest = hashlib.md5(norm.encode()).hexdigest()
        print(f"{name} {digest}")


if __name__ == "__main__":
    main()
