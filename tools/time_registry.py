"""Time every registered query end-to-end with the noop sink.

Optimization-round measurement harness (guide §1.4): runs each
``queries()`` entry once (optionally with a warmup pass) and reports
per-query wall seconds sorted descending, so the slowest registry
paths — which the driver's correctness gate pays for even when they
are not in the bench headline set — are visible.

Usage: python tools/time_registry.py [sf_dir] [--warmup] [--top N]
                                     [query ...]
Writes JSON to /tmp/registry_times_<sfname>.json as well.
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    args = sys.argv[1:]
    warmup = "--warmup" in args
    if warmup:
        args.remove("--warmup")
    top = 0
    if "--top" in args:
        i = args.index("--top")
        top = int(args[i + 1])
        args = args[:i] + args[i + 2 :]
    sf_dir = args[0] if args else "/root/testdata/sf0.01"
    only = set(args[1:])

    repo = os.path.dirname(os.path.dirname(os.path.realpath(__file__)))
    sys.path.insert(0, repo)
    import __spark_entry__ as entrymod
    from openseize_spark.session import get_spark

    spark = get_spark("time-registry")
    spark.range(10_000).selectExpr("sum(id)").collect()

    qs = entrymod.queries()
    names = [n for n in qs if not only or n in only]
    times: dict[str, float] = {}
    for name in names:
        fn = qs[name]
        spark.sparkContext.setJobDescription(f"time: {name}")
        try:
            if warmup:
                fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            times[name] = round(time.time() - t0, 3)
        except Exception as e:  # noqa: BLE001 - report and continue
            print(f"FAIL {name}: {e}", flush=True)
            times[name] = -1.0
        spark.sparkContext.setJobDescription(None)
        print(f"{times[name]:8.3f}  {name}", flush=True)

    ranked = sorted(times.items(), key=lambda kv: -kv[1])
    print("\n=== slowest ===")
    for name, sec in ranked[: top or 30]:
        print(f"{sec:8.3f}  {name}")
    print(f"total {sum(v for v in times.values() if v > 0):.1f}s "
          f"over {len(times)} queries")
    out = f"/tmp/registry_times_{os.path.basename(sf_dir.rstrip('/'))}.json"
    with open(out, "w") as f:
        json.dump(times, f, indent=1, sort_keys=True)
    print(f"wrote {out}")


if __name__ == "__main__":
    main()
