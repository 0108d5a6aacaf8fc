"""Deterministic sampling / splitting / shuffling (llm/sampling).

The load-bearing properties: reproducibility (pure function of the
data, independent of partitioning), hash-split stability under corpus
growth, and the two-level shuffle rank agreeing with a single global
sort.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from openseize_spark.llm import sampling


def _docs(spark, n=200, parts=1):
    rows = [(i, f"doc text {i}", "en", f"src{i % 3}", 10 + i) for i in range(n)]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).repartition(parts)


class TestBernoulli:
    def test_partition_invariant_and_rate(self, spark):
        a = sampling.bernoulli_sample(_docs(spark, parts=1), 0.3)
        b = sampling.bernoulli_sample(_docs(spark, parts=7), 0.3)
        ids_a = sorted(r.doc_id for r in a.collect())
        ids_b = sorted(r.doc_id for r in b.collect())
        assert ids_a == ids_b
        # uniform hash: rate holds within a loose binomial bound
        assert 0.15 < len(ids_a) / 200 < 0.45

    def test_seed_changes_sample(self, spark):
        d = _docs(spark)
        a = {r.doc_id for r in sampling.bernoulli_sample(d, 0.3, seed="x").collect()}
        b = {r.doc_id for r in sampling.bernoulli_sample(d, 0.3, seed="y").collect()}
        assert a != b


class TestSplitAssign:
    def test_partition_and_growth_stability(self, spark):
        small = sampling.split_assign(_docs(spark, 100), {"train": 0.8, "val": 0.2})
        big = sampling.split_assign(_docs(spark, 200, parts=5), {"train": 0.8, "val": 0.2})
        small_map = {r.doc_id: r.split for r in small.collect()}
        big_map = {r.doc_id: r.split for r in big.collect()}
        # a doc's split never changes when the corpus doubles
        assert all(big_map[k] == v for k, v in small_map.items())
        assert set(big_map.values()) == {"train", "val"}

    def test_remainder_goes_to_last(self, spark):
        out = sampling.split_assign(_docs(spark), {"a": 0.5, "b": 0.25})
        counts = {r.split: r["count"] for r in out.groupBy("split").count().collect()}
        assert counts["a"] + counts["b"] == 200 and counts["b"] > 0


class TestStratified:
    def test_k_per_group_and_determinism(self, spark):
        out1 = sampling.stratified_sample(_docs(spark, parts=2), "source", k=5)
        out2 = sampling.stratified_sample(_docs(spark, parts=9), "source", k=5)
        r1 = sorted((r.source, r.doc_id) for r in out1.collect())
        r2 = sorted((r.source, r.doc_id) for r in out2.collect())
        assert r1 == r2
        per = out1.groupBy("source").count().collect()
        assert all(r["count"] == 5 for r in per) and len(per) == 3


class TestShuffle:
    def test_matches_global_sort(self, spark):
        d = _docs(spark, 300, parts=6)
        out = sampling.corpus_shuffle(d, num_buckets=16)
        got = [
            r.doc_id
            for r in out.orderBy("shuffle_pos").select("doc_id").collect()
        ]
        expect = [
            r.doc_id
            for r in d.select(
                "doc_id", sampling.salted_hash(F.col("doc_id"), "shuf").alias("_h")
            )
            .orderBy("_h", "doc_id")
            .collect()
        ]
        assert got == expect
        pos = sorted(r.shuffle_pos for r in out.collect())
        assert pos == list(range(300))  # a permutation: dense 0..n-1

    def test_no_single_partition_window(self, spark):
        # parts=4: the fixture's own repartition(1) would plan an
        # 'Exchange SinglePartition' unrelated to the operator under test
        plan = sampling.corpus_shuffle(
            _docs(spark, 50, parts=4), num_buckets=8
        )._jdf.queryExecution().executedPlan().toString()
        # every window partitions by the bucket column; a global
        # order-only window would show 'Window [...] [partitionBy=[]]'
        # or a SinglePartition exchange ahead of it
        assert "SinglePartition" not in plan


class TestShardAssign:
    def test_balanced_and_partition_invariant(self, spark):
        base = _docs(spark, 130)
        a = sampling.shard_assign(base.repartition(1), 25).collect()
        b = sampling.shard_assign(base.repartition(7), 25).collect()
        key = lambda rows: sorted((r.doc_id, r.shard_id, r.shard_pos) for r in rows)
        assert key(a) == key(b)  # pure function of the data
        # shards are full except the last; positions dense within a shard
        from collections import Counter

        sizes = Counter(r.shard_id for r in a)
        assert sorted(sizes) == list(range(6))  # 130/25 -> shards 0..5
        assert all(sizes[s] == 25 for s in range(5)) and sizes[5] == 5
        for s in sizes:
            got = sorted(r.shard_pos for r in a if r.shard_id == s)
            assert got == list(range(sizes[s]))

    def test_rejects_nonpositive_size(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            sampling.shard_assign(_docs(spark, 10), 0)


class TestTokenBudgetSubset:
    def test_prefix_property_and_invariance(self, spark):
        base = _docs(spark, 100).select(
            "doc_id", (F.col("doc_id") % 13 + 1).alias("n_tokens")
        )
        budget = 150
        a = sampling.token_budget_subset(base.repartition(1), budget).collect()
        b = sampling.token_budget_subset(base.repartition(5), budget).collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
        # every kept doc starts under the budget, and the kept set is a
        # prefix of the shuffled order: max kept offset + its tokens
        # covers the budget boundary
        assert all(r.tok_offset < budget for r in a)
        last = max(a, key=lambda r: r.tok_offset)
        assert last.tok_offset + last.n_tokens >= budget or len(a) == 100

    def test_rejects_nonpositive_budget(self, spark):
        import pytest as _pytest

        with _pytest.raises(ValueError):
            sampling.token_budget_subset(_docs(spark, 5), 0)


class TestPackSequences:
    def test_dense_offsets_and_partition_invariance(self, spark):
        base = _docs(spark, 120).select(
            "doc_id", (F.col("doc_id") % 37 + 1).alias("n_tokens")
        )
        cap = 64
        a = sampling.pack_sequences(base.repartition(1), cap).collect()
        b = sampling.pack_sequences(base.repartition(7), cap).collect()
        key = lambda rows: sorted(
            (r.doc_id, r.tok_offset, r.seq_id, r.seq_offset) for r in rows
        )
        assert key(a) == key(b)  # pure function of the data
        # offsets are the prefix sums of n_tokens in shuffle-hash order:
        # sorted offsets are dense (each next = prev + its n_tokens)
        rows = sorted(a, key=lambda r: r.tok_offset)
        acc = 0
        for r in rows:
            assert r.tok_offset == acc
            assert r.seq_id == acc // cap
            assert r.seq_offset == acc % cap
            acc += r.n_tokens

    def test_capacity_bounds(self, spark):
        base = _docs(spark, 50).select(
            "doc_id", (F.col("doc_id") % 9 + 1).alias("n_tokens")
        )
        out = sampling.pack_sequences(base, 32).collect()
        assert all(0 <= r.seq_offset < 32 for r in out)


class TestTemperatureSample:
    def test_t1_keeps_everything(self, spark):
        d = _docs(spark, 90)
        out = sampling.temperature_sample(d, temperature=1.0)
        assert out.count() == 90
        assert out.select("keep_rate").distinct().collect()[0][0] == 1.0

    def test_flattens_skew_deterministically(self, spark):
        # skewed groups: src0 twice the others (doc_id % 3 gives near-equal;
        # build explicit skew instead)
        rows = [(i, f"t{i}", "en", "big" if i < 300 else "small", 10)
                for i in range(400)]
        d = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        )
        a = sampling.temperature_sample(d.repartition(1), 2.0).collect()
        b = sampling.temperature_sample(d.repartition(5), 2.0).collect()
        assert sorted(r.doc_id for r in a) == sorted(r.doc_id for r in b)
        by_src = {}
        for r in a:
            by_src.setdefault(r.source, []).append(r)
        # smallest group keeps everything (rate 1); big group downsampled
        # toward sqrt ratio: r_big = sqrt(100/300) ~ 0.577
        assert len(by_src["small"]) == 100
        assert 0.45 * 300 < len(by_src["big"]) < 0.7 * 300


class TestMixtureSample:
    def test_limiting_group_kept_whole_and_proportions(self, spark):
        from openseize_spark.llm import sampling

        rows = []
        # a: 400 rows weight 1; b: 100 rows weight 1 (limiting);
        # c: 300 rows weight 2
        for i in range(400):
            rows.append((i, "a"))
        for i in range(400, 500):
            rows.append((i, "b"))
        for i in range(500, 800):
            rows.append((i, "c"))
        df = spark.createDataFrame(rows, "doc_id long, source string")
        out = sampling.mixture_sample(
            df, {"a": 1, "b": 1, "c": 2}, group_col="source"
        )
        got = {
            r.source: r.cnt
            for r in out.groupBy("source").agg(F.count("*").alias("cnt")).collect()
        }
        # limiting group = argmin n/w = b (100/1); kept whole
        assert got["b"] == 100
        # a targets 100*1/1 = 100 rows, c targets 100*2/1 = 200 (hash noise)
        assert abs(got["a"] - 100) < 35
        assert abs(got["c"] - 200) < 45
        rates = {r.source: r.keep_rate for r in out.select("source", "keep_rate").distinct().collect()}
        assert rates["b"] == 1.0
        assert abs(rates["a"] - 0.25) < 1e-15
        assert abs(rates["c"] - 2.0 / 3.0) < 1e-15

    def test_unweighted_groups_dropped_and_deterministic(self, spark):
        from openseize_spark.llm import sampling

        df = spark.createDataFrame(
            [(i, "a" if i % 2 else "z") for i in range(100)],
            "doc_id long, source string",
        )
        out1 = sampling.mixture_sample(df, {"a": 1})
        assert out1.filter(F.col("source") == "z").count() == 0
        a = sorted(r.doc_id for r in out1.collect())
        b = sorted(
            r.doc_id
            for r in sampling.mixture_sample(df.repartition(7), {"a": 1}).collect()
        )
        assert a == b  # partition-invariant

    def test_rejects_bad_weights(self, spark):
        from openseize_spark.llm import sampling
        import pytest as _pytest

        df = spark.createDataFrame([(1, "a")], "doc_id long, source string")
        with _pytest.raises(ValueError):
            sampling.mixture_sample(df, {})
        with _pytest.raises(ValueError):
            sampling.mixture_sample(df, {"a": 0})


class TestWriteShards:
    def test_balanced_shard_layout(self, spark, tmp_path):
        from openseize_spark.llm import sampling

        df = spark.createDataFrame(
            [(i, f"text {i}") for i in range(250)], "doc_id long, text string"
        )
        path = str(tmp_path / "shards")
        sampling.write_shards(df, path, rows_per_shard=100)
        back = spark.read.parquet(path)
        sizes = {
            r.shard_id: r.n
            for r in back.groupBy("shard_id").agg(F.count("*").alias("n")).collect()
        }
        assert sizes == {0: 100, 1: 100, 2: 50}
        # every row present exactly once, shard_pos complete per shard
        assert back.select("doc_id").distinct().count() == 250
        pos = sorted(
            r.shard_pos for r in back.filter(F.col("shard_id") == 0).collect()
        )
        assert pos == list(range(100))

    def test_one_file_per_shard(self, spark, tmp_path):
        import glob
        from openseize_spark.llm import sampling

        df = spark.createDataFrame(
            [(i, "x") for i in range(60)], "doc_id long, text string"
        )
        path = str(tmp_path / "shards2")
        sampling.write_shards(df, path, rows_per_shard=20)
        for d in glob.glob(path + "/shard_id=*"):
            files = [f for f in glob.glob(d + "/*.parquet")]
            assert len(files) == 1, d


class TestDsirSample:
    def _mixed_docs(self, spark, parts=1):
        # two "domains": target docs reuse a small zh-ish vocab, raw docs
        # a disjoint one, plus bridge docs mixing both
        rows = []
        for i in range(60):
            rows.append((i, "shan shui feng yue tian di ren he", "zh", "s0", 10))
        for i in range(60, 200):
            rows.append((i, f"river cloud stone {i % 7} wind tree leaf", "en", "s1", 10))
        for i in range(200, 240):
            rows.append((i, "shan shui river cloud feng yue", "en", "s2", 10))
        return spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string, n_chars long"
        ).repartition(parts)

    def test_partition_invariant(self, spark):
        a = sampling.dsir_sample(self._mixed_docs(spark, 1), n_keep=50)
        b = sampling.dsir_sample(self._mixed_docs(spark, 11), n_keep=50)
        ra = sorted((r.doc_id, r.n_tokens, r.score) for r in a.collect())
        rb = sorted((r.doc_id, r.n_tokens, r.score) for r in b.collect())
        assert ra == rb and len(ra) == 50

    def test_prefers_target_domain(self, spark):
        docs = self._mixed_docs(spark)
        out = sampling.dsir_sample(docs, n_keep=50)
        ids = {r.doc_id for r in out.collect()}
        # corpus is 25% target-domain (doc_id < 60) but the sample should
        # be dominated by target-vocab docs (ids < 60 plus bridge >= 200)
        targetish = sum(1 for i in ids if i < 60 or i >= 200)
        assert targetish > 35

    def test_scores_follow_log_ratio_sign(self, spark):
        docs = self._mixed_docs(spark)
        out = {r.doc_id: r.score for r in sampling.dsir_sample(docs, n_keep=240).collect()}
        # pure target-vocab docs score above pure raw-vocab docs
        assert out[0] > out[100]


class TestGroupReservoir:
    def test_k_per_group_and_partition_invariance(self, spark):
        a = sampling.group_reservoir(_docs(spark, parts=1), ["source"], k=5)
        b = sampling.group_reservoir(_docs(spark, parts=7), ["source"], k=5)
        rows_a = sorted((r.source, r.doc_id, r.reservoir_rank) for r in a.collect())
        rows_b = sorted((r.source, r.doc_id, r.reservoir_rank) for r in b.collect())
        assert rows_a == rows_b
        per_group = {}
        for src, _, rank in rows_a:
            per_group.setdefault(src, []).append(rank)
        assert set(per_group) == {"src0", "src1", "src2"}
        for ranks in per_group.values():
            assert sorted(ranks) == [1, 2, 3, 4, 5]

    def test_matches_global_hash_order(self, spark):
        d = _docs(spark, n=60)
        out = sampling.group_reservoir(d, ["source"], k=3, seed="t")
        got = {
            src: [r.doc_id for r in grp]
            for src, grp in _group_by_src(out.collect())
        }
        # replay: per group, ids sorted by (salted hash, id), first 3
        full = d.withColumn(
            "_h", sampling.salted_hash(F.col("doc_id"), "t")
        ).collect()
        want = {}
        for r in sorted(full, key=lambda r: (r._h, r.doc_id)):
            want.setdefault(r.source, [])
            if len(want[r.source]) < 3:
                want[r.source].append(r.doc_id)
        assert {k: sorted(v) for k, v in got.items()} == {
            k: sorted(v) for k, v in want.items()
        }

    def test_small_group_keeps_all(self, spark):
        d = _docs(spark, n=4)  # src1 has 1 row, src0/src2 get <=2
        out = sampling.group_reservoir(d, ["source"], k=5).collect()
        assert len(out) == 4  # groups smaller than k are kept whole


def _group_by_src(rows):
    by = {}
    for r in sorted(rows, key=lambda r: (r.source, r.reservoir_rank)):
        by.setdefault(r.source, []).append(r)
    return by.items()


class TestEpochRepeat:
    def test_copy_counts_and_epoch_tags(self, spark):
        d = _docs(spark, n=90)  # sources src0/src1/src2, 30 docs each
        out = sampling.epoch_repeat(
            d, {"src0": 2.5, "src1": 1.0, "src2": 0.5}, seed="t"
        ).collect()
        by_doc = {}
        for r in out:
            by_doc.setdefault((r.source, r.doc_id), []).append(r.epoch)
        # src1 e=1.0: exactly one copy per doc
        src1 = {k: v for k, v in by_doc.items() if k[0] == "src1"}
        assert len(src1) == 30 and all(v == [1] for v in src1.values())
        # src0 e=2.5: every doc 2 or 3 copies, contiguous epoch tags
        src0 = {k: sorted(v) for k, v in by_doc.items() if k[0] == "src0"}
        assert len(src0) == 30
        assert all(v in ([1, 2], [1, 2, 3]) for v in src0.values())
        n3 = sum(1 for v in src0.values() if len(v) == 3)
        assert 0 < n3 < 30  # fractional draw selected a strict subset
        # src2 e=0.5: subsample, single copies
        src2 = {k: v for k, v in by_doc.items() if k[0] == "src2"}
        assert 0 < len(src2) < 30 and all(v == [1] for v in src2.values())

    def test_fraction_matches_bernoulli_cut(self, spark):
        # the marginal copy uses the same hash cut as bernoulli_sample
        d = _docs(spark, n=90)
        out = sampling.epoch_repeat(d, {"src0": 1.5}, seed="t").collect()
        extra = {
            r.doc_id
            for r in out
            if r.source == "src0" and r.epoch == 2
        }
        bern = {
            r.doc_id
            for r in sampling.bernoulli_sample(
                d.filter(F.col("source") == "src0"), 0.5, seed="t"
            ).collect()
        }
        assert extra == bern

    def test_partition_invariant(self, spark):
        a = sampling.epoch_repeat(
            _docs(spark, parts=1), {"src0": 2.25, "src2": 0.75}, seed="z"
        )
        b = sampling.epoch_repeat(
            _docs(spark, parts=9), {"src0": 2.25, "src2": 0.75}, seed="z"
        )
        ka = sorted((r.doc_id, r.epoch) for r in a.collect())
        kb = sorted((r.doc_id, r.epoch) for r in b.collect())
        assert ka == kb


class TestRound6PlanShapes:
    def test_group_reservoir_uses_group_limit(self, spark):
        # Spark pushes rank-filter <= k into WindowGroupLimit, so each
        # window partition is capped at k rows before the filter — the
        # property that keeps huge strata from materializing at scale
        plan = (
            sampling.group_reservoir(_docs(spark, 100, parts=4), ["source"], k=3)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "WindowGroupLimit" in plan
        assert "SinglePartition" not in plan

    def test_epoch_repeat_no_corpus_shuffle(self, spark):
        # broadcast rate join + generate: the corpus side must not plan
        # any hash-partitioning exchange
        plan = (
            sampling.epoch_repeat(
                _docs(spark, 100, parts=4), {"src0": 2.5}, seed="p"
            )
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BroadcastExchange" in plan
        assert "hashpartitioning" not in plan
