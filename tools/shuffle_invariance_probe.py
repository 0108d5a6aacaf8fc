"""Spark-side reduction-order probe: run each query under two different
``spark.sql.shuffle.partitions`` settings (32 — the session default —
and 7, a co-prime count that regroups every partial aggregate) and
require the sorted result sets to match CELL-FOR-CELL at the bit level.

This is the engine-side mirror of ``float_order_audit.py --probe``
(which varies DuckDB's thread count): a float aggregate whose value
depends on Spark's partial-aggregation grouping would flip here long
before it flips in the driver, while the integer-quantized discipline
queries are immune by construction.

Usage: python tools/shuffle_invariance_probe.py [sf_dir] [query ...]
Exit 1 on any divergence.
"""

from __future__ import annotations

import math
import sys


def norm(x):
    if x is None:
        return "NULL"
    if isinstance(x, float):
        if math.isnan(x):
            return "NaN"
        return x.hex()  # bit-level comparison
    return str(x)


def run_once(query_fn, sf_dir: str, shuffle_parts: int):
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", str(shuffle_parts))
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", "8g")
        .appName(f"shuffle-probe-{shuffle_parts}")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = query_fn(spark, sf_dir)
    cols = sorted(df.columns)
    rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
    rows.sort()
    spark.stop()
    return rows


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = sys.argv[2:]

    import os

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    )
    import __spark_entry__ as entrymod

    q = entrymod.queries()
    names = only if only else list(q)[:50]
    bad = []
    for parts in (32, 7):
        # one session per partition setting, all queries inside it —
        # session startup dominates otherwise
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .config("spark.sql.shuffle.partitions", str(parts))
            .config("spark.ui.enabled", "false")
            .config("spark.driver.memory", "8g")
            .appName(f"shuffle-probe-{parts}")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        for name in names:
            try:
                df = q[name](spark, sf_dir)
                cols = sorted(df.columns)
                rows = [tuple(norm(r[c]) for c in cols) for r in df.collect()]
                rows.sort()
            except Exception as ex:
                rows = [("ERR", str(ex)[:120])]
            key = f"{name}@{parts}"
            globals().setdefault("_results", {})[key] = rows
        spark.stop()

    res = globals()["_results"]
    for name in names:
        a, b = res[f"{name}@32"], res[f"{name}@7"]
        if a == b:
            print(f"ok    {name} ({len(a)} rows bit-equal across 32/7 parts)")
        else:
            diff = sum(1 for x, y in zip(a, b) if x != y) + abs(len(a) - len(b))
            print(f"DIVERGES {name}: {diff} differing rows across 32/7 parts")
            bad.append(name)
    print(f"\n{len(bad)} diverging / {len(names)} probed")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
