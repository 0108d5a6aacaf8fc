"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "total_headline_sec", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1}

Each query is forced end-to-end with a noop sink (full compute, no
driver collect).  The set covers every execution strategy in the engine:
codegen scan/agg/join, window functions, segment explode, block+halo
Pandas kernels, LSH/dedup shuffles, and broadcast ANN.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    "pricing_summary",      # codegen scan + 7-agg groupBy
    "revenue_by_nation",    # 5-way join w/ broadcast dims
    "running_total",        # window cumulative sum
    "sessionize",           # lag + conditional agg
    "sliding_energy",       # overlapping-segment explode + agg
    "fir_kaiser",           # 25-tap codegen window FIR
    "welch_psd_blocks",     # block+halo Arrow kernel + partial agg
    "resample_poly",        # polyphase block kernel
    "sosfilt_full",         # stateful per-channel IIR kernel (full length)
    "sosfilt_blocks_full",  # parallel-in-time state-scan IIR (full length)
    "stft_blocks",          # bounded-memory STFT (block+halo, no agg)
    "dedup_exact",          # md5 fingerprint hash-groupBy
    "minhash_dedup_prod",   # shingle explode + min-agg + LSH band join (murmur3)
    "text_stats",           # pure string-function scan
    "knn_cosine",           # broadcast brute-force ANN
    "ivf_topk",             # cell-probed ANN (broadcast centroids)
    "kmeans_assign",        # iterative Lloyd's fit (literal-centroid argmin)
    "dedup_clusters",       # LSH pairs + iterative connected components
    "pac",                  # hilbert window FIR + range-join gather
    # round-5 additions: the new heavy surfaces
    "corpus_pipeline",      # composed dedup -> quality -> split -> stats
    "bm25_topk",            # inverted-index sparse retrieval
    "pagerank_sim",         # iterative edge-join graph rounds
    "tfidf_cosine_pairs",   # df-pruned posting-list self-join
    "source_overlap",       # distinct source-gram sets + pair join
    "chunk_dedup",          # chunk fingerprints + corpus-wide counts
    # round-6 additions
    "hll_distinct",         # mergeable HLL register aggregate
    "epoch_repeat",         # broadcast rate join + sequence/explode fan-out
    # round-6 session-2 additions
    "histogram_quantiles",  # mergeable 64-bin quantile sketch + exact harness
    "markov_transitions",   # user-partitioned lead + transition matrix
    "kcenter_coreset",      # iterative exact-int greedy selection (4 rounds)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = float(sf_dir.rstrip("/").split("sf")[-1]) if "sf" in sf_dir else -1.0

    from openseize_spark.session import get_spark

    spark = get_spark("bench")
    # Warm fixed one-time machinery so per-query numbers measure the
    # queries, not JVM init: codegen, the parquet reader, the broadcast
    # path, and the Arrow python-UDF worker pool.
    spark.range(10_000).selectExpr("sum(id)").collect()
    region = spark.read.parquet(f"{sf_dir}/region.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    nation.join(region.hint("broadcast"), nation.n_regionkey == region.r_regionkey).count()

    def _noop_batches(it):
        yield from it

    spark.range(64).selectExpr("id", "cast(id as double) x").mapInPandas(
        _noop_batches, "id long, x double"
    ).write.mode("overwrite").format("noop").save()

    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    # Warmup pass: run every headline query once untimed.  Round-3 showed
    # ~1.3x drift on unchanged plans when new heavy queries joined the
    # session (JIT/GC/page-cache state leaking across queries); a full
    # warmup makes the timed pass measure steady-state plans, not
    # whichever query happened to pay the session's one-time costs.
    for name in HEADLINE:
        qs[name](spark, sf_dir).write.mode("overwrite").format("noop").save()

    # Three timed passes per query; report the median (steady-state
    # estimate) plus per-query [min, max] so sub-second wobbles on a
    # shared box are visible as variance, not mistaken for regressions.
    REPS = 3
    samples: dict[str, list[float]] = {name: [] for name in HEADLINE}
    for _ in range(REPS):
        for name in HEADLINE:
            fn = qs[name]
            t0 = time.time()
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
            samples[name].append(round(time.time() - t0, 3))

    times = {name: sorted(s)[len(s) // 2] for name, s in samples.items()}
    minmax = {
        name: [min(s), max(s)] for name, s in samples.items()
    }
    total = round(sum(times.values()), 3)
    print(
        json.dumps(
            {
                "metric": "total_headline_sec",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "reps": REPS,
                "query_minmax": minmax,
            }
        )
    )


if __name__ == "__main__":
    main()
