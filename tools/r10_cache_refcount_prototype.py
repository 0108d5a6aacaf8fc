"""Round-10 prototype: refcounted candidate-cache release for the
verify operators (measures the fix for the r8 advisor's medium finding
WITHOUT touching the registered code — the llm/dedup.py change lands in
round 10 with its re-gate slots).

The finding: ``_release_cache_with`` registers a ``weakref.finalize``
that unpersists the CALLER's pairs DataFrame (``persist`` returns
self).  Two failure modes:

1. SHARED PAIRS: a caller holding both a jaccard_verify and a
   containment_verify result over the SAME pairs DataFrame loses the
   cache for BOTH when the FIRST result is dropped — the survivor
   silently recomputes the candidate pipeline per consumer
   (value-identical, 3x cost).
2. DROPPED INTERMEDIATE: a builder that composes verify into a larger
   lazy plan and drops the verify result at return (q_triangle_count
   pre-r9, q_blocking_yield) releases the cache before the outer plan
   ever executes.  (r9 fixed triangle_count from the consumer side —
   eager localCheckpoint while the result is alive.)

Prototyped fix (plan-neutral, so ever-checked queries keep their
executed plans byte-identical): a module-level REFCOUNT registry keyed
by the persisted plan's Java object id.  Every verify result holding
the same cached input increments the count at creation; each result's
finalizer decrements; the unpersist fires only when the count reaches
zero.  The persist node itself is unchanged — only driver-side release
timing moves — which also makes it the right tool for the five
never-released registry persists (q_pac :2341, q_pac_surrogates :2708,
dup-cluster metrics :4604, q_er_pipeline :4770, q_blocking_yield
:4862): tie the cache to the RETURNED DataFrame with a refcount of 1
instead of leaking it, without removing the InMemoryRelation the
driver-green plans were gated with.

Run: python tools/r10_cache_refcount_prototype.py
Asserts both failure modes are fixed under the refcount scheme and
prints the persistent-RDD census at each step.
"""

from __future__ import annotations

import gc
import sys
import time
import weakref

sys.path.insert(0, "/root/repo")

from pyspark.sql import DataFrame, SparkSession

# ----------------------------------------------------------- prototype
_REFS: dict[int, list] = {}  # java-id -> [count, jdf]


def _retain(cached: DataFrame) -> int:
    key = cached._jdf.hashCode()  # stable per Java DataFrame object
    ent = _REFS.setdefault(key, [0, cached._jdf])
    ent[0] += 1
    return key


def _release(key: int) -> None:
    ent = _REFS.get(key)
    if ent is None:
        return
    ent[0] -= 1
    if ent[0] <= 0:
        del _REFS[key]
        try:
            ent[1].unpersist(False)
        except Exception:
            pass


def release_cache_with_refcount(result: DataFrame, cached: DataFrame) -> DataFrame:
    key = _retain(cached)
    weakref.finalize(result, _release, key)
    return result


# ------------------------------------------------------------- harness
def rdd_ids(spark):
    it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
    out = set()
    while it.hasNext():
        out.add(it.next())
    return out


def wait_gone(spark, ids, timeout=10.0):
    deadline = time.monotonic() + timeout
    while time.monotonic() < deadline:
        gc.collect()
        if not (rdd_ids(spark) & ids):
            return True
        time.sleep(0.1)
    return False


def main():
    import openseize_spark.llm.dedup as dedup

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.createDataFrame(
        [(1, "abcdefghij"), (2, "abcdefghiX"), (3, "zzzzyyyyxxxx")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")

    # monkey-patch the prototype release into the verify operators for
    # this process only
    dedup._release_cache_with = release_cache_with_refcount

    # -- failure mode 1: shared pairs, drop one result ------------------
    before = rdd_ids(spark)
    r1 = dedup.jaccard_verify(docs, pairs, k=3, threshold=0.0)
    r2 = dedup.containment_verify(docs, pairs, k=3)
    r1.collect()
    r2.collect()
    after_both = rdd_ids(spark) - before
    assert after_both, "cache never materialized"
    del r1
    gc.collect()
    still = rdd_ids(spark) & after_both
    assert still, (
        "SHARED-PAIRS REGRESSION: dropping the first result released "
        "the cache the second result still holds"
    )
    print(f"shared-pairs: cache ids {sorted(after_both)} survive first drop: OK")
    # the survivor must still be able to read it, then release on drop
    r2.collect()
    del r2
    assert wait_gone(spark, after_both), "cache leaked after last drop"
    print("shared-pairs: cache released after LAST result dropped: OK")

    # -- failure mode 2: same pairs object through two sequential calls --
    before = rdd_ids(spark)
    out = dedup.jaccard_verify(docs, pairs, k=3, threshold=0.0)
    out.collect()
    new = rdd_ids(spark) - before
    del out
    assert wait_gone(spark, new), "single-consumer release broken"
    print("single-consumer lifetime unchanged: OK")

    # -- sanity: refcount registry empty at the end ----------------------
    gc.collect()
    assert not _REFS, f"registry leaked entries: {_REFS}"
    print("refcount registry drained: OK")
    print("PROTOTYPE PASS")


if __name__ == "__main__":
    main()
