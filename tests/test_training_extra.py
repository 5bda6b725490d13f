"""Unit tests for the sampling / decontamination / SRP-LSH training-data
operators (semantic properties the oracle comparison can't express:
determinism under repartitioning, sign invariance, etc.)."""

from pyspark.sql import functions as F

from realtime_spark.operators.dedup import contaminated_docs
from realtime_spark.operators.sampling import (
    hash_sample,
    sample_n_per_group,
    split_assign,
    stratified_sample,
)
from realtime_spark.operators.similarity import srp_buckets, srp_planes


def _docs(spark):
    rows = [(i, f"src{i % 3}", f"alpha beta gamma delta {i} epsilon zeta") for i in range(200)]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


class TestSampling:
    def test_split_assign_partitions_everything(self, spark):
        d = _docs(spark)
        out = split_assign(d, "doc_id")
        counts = dict(out.groupBy("split").count().collect())
        assert sum(counts.values()) == 200
        assert set(counts) <= {"train", "val", "test"}
        assert counts.get("train", 0) > counts.get("val", 0)

    def test_split_assign_deterministic_under_repartition(self, spark):
        d = _docs(spark)
        a = {r["doc_id"]: r["split"] for r in split_assign(d, "doc_id").collect()}
        b = {
            r["doc_id"]: r["split"]
            for r in split_assign(d.repartition(7), "doc_id").collect()
        }
        assert a == b

    def test_cluster_split_moves_whole_clusters(self, spark):
        """Leakage-free invariant: every member of a cluster lands on the
        cluster REPRESENTATIVE's side (identical to split_assign on the
        rep key), and unclustered docs split exactly like split_assign on
        their own key — plus teeth: the clusters here are built so that a
        naive per-doc split WOULD separate at least one of them."""
        from realtime_spark.operators.sampling import cluster_split

        d = _docs(spark)
        # clusters: {0,1,2} rep 0, {10,11} rep 10, {100,150,199} rep 100
        members = {0: 0, 1: 0, 2: 0, 10: 10, 11: 10, 100: 100, 150: 100, 199: 100}
        clusters = spark.createDataFrame(
            [(k, v) for k, v in members.items()], "doc_id long, cluster_id long"
        )
        splits = (("train", 0.5), ("eval", 0.5))
        got = {
            r["doc_id"]: r["split"]
            for r in cluster_split(d, "doc_id", clusters, splits=splits).collect()
        }
        assert len(got) == 200
        naive = {
            r["doc_id"]: r["split"]
            for r in split_assign(d, "doc_id", splits=splits).collect()
        }
        for doc, rep in members.items():
            assert got[doc] == naive[rep], (doc, rep)
        for doc in set(got) - set(members):
            assert got[doc] == naive[doc], doc
        # teeth: naive DOES split at least one planted cluster
        assert any(
            len({naive[m] for m, r in members.items() if r == rep}) > 1
            for rep in {0, 10, 100}
        )

    def test_bpe_fertility_zero_word_group(self, spark, tmp_path):
        """Tranche probe: a language group whose docs have ZERO trainer
        words (empty / punctuation-only text -> 'und') must report NULL
        fertility, not crash or divide by zero."""
        import pandas as pd

        docs = pd.DataFrame(
            {"doc_id": [1, 2, 3], "text": ["?!...", "", "the of and to a in"]}
        )
        sf = tmp_path / "sf"
        sf.mkdir()
        docs.to_parquet(sf / "documents.parquet")
        from realtime_spark.plans.tokenizer_plan import q_bpe_fertility

        rows = {r["lang"]: r for r in q_bpe_fertility(spark, str(sf)).collect()}
        assert rows["und"]["total_words"] == 0
        assert rows["und"]["fertility"] is None
        assert rows["und"]["n_docs"] == 2
        assert rows["en"]["total_words"] == 6 and rows["en"]["fertility"] > 0

    def test_hash_sample_is_subset_and_stable(self, spark):
        d = _docs(spark)
        s1 = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.3).collect()}
        s2 = {r["doc_id"] for r in hash_sample(d.repartition(5), "doc_id", 0.3).collect()}
        assert s1 == s2
        assert 0 < len(s1) < 200
        # larger fraction strictly contains smaller (nested samples)
        s_big = {r["doc_id"] for r in hash_sample(d, "doc_id", 0.6).collect()}
        assert s1 <= s_big

    def test_stratified_fractions_apply_per_stratum(self, spark):
        d = _docs(spark)
        out = stratified_sample(
            d, "source", {"src0": 1.0, "src1": 0.0}, "doc_id", default_fraction=0.5
        )
        counts = dict(out.groupBy("source").count().collect())
        assert counts.get("src0") == 67  # all of stratum 0 kept
        assert "src1" not in counts  # stratum 1 dropped entirely

    def test_sample_n_per_group_exact_counts(self, spark):
        d = _docs(spark)
        out = sample_n_per_group(d, "source", "doc_id", 5)
        counts = dict(out.groupBy("source").count().collect())
        assert counts == {"src0": 5, "src1": 5, "src2": 5}
        # stable under repartitioning
        out2 = sample_n_per_group(d.repartition(9), "source", "doc_id", 5)
        assert {tuple(r) for r in out.select("source", "doc_id").collect()} == {
            tuple(r) for r in out2.select("source", "doc_id").collect()
        }


class TestDecontaminate:
    def test_detects_shared_shingles_only(self, spark):
        corpus = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "completely unrelated text with different words entirely here"),
                (3, "quick brown fox story continues beyond the benchmark"),
            ],
            "doc_id long, text string",
        )
        eval_df = spark.createDataFrame(
            [(100, "someone saw the quick brown fox jumps today")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r["n_shared"] for r in
               contaminated_docs(corpus, eval_df, "doc_id", "text", k=3).collect()}
        assert 1 in out and 3 in out and 2 not in out
        # doc 1 shares 'the quick brown', 'quick brown fox', 'brown fox jumps'
        assert out[1] == 3
        assert out[3] == 1  # 'quick brown fox'

    def test_min_shared_threshold(self, spark):
        corpus = spark.createDataFrame(
            [(1, "the quick brown fox jumps over the lazy dog"),
             (3, "quick brown fox story continues beyond the benchmark")],
            "doc_id long, text string",
        )
        eval_df = spark.createDataFrame(
            [(100, "someone saw the quick brown fox jumps today")],
            "doc_id long, text string",
        )
        out = contaminated_docs(corpus, eval_df, "doc_id", "text", k=3, min_shared=2)
        assert [r["doc_id"] for r in out.collect()] == [1]


class TestShingleSharedFrac:
    def test_shared_means_present_in_another_doc(self, spark):
        from realtime_spark.operators.dedup import shingle_shared_frac

        d = spark.createDataFrame(
            [
                (1, "the quick brown fox jumps over the lazy dog"),
                (2, "a cat saw the quick brown fox jumps high"),
                (3, "completely unrelated text with different words entirely here"),
            ],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               shingle_shared_frac(d, "doc_id", "text", k=3).collect()}
        # doc 1 <-> doc 2 share 'the quick brown', 'quick brown fox',
        # 'brown fox jumps'; doc 3 shares nothing
        assert out[1]["n_shingles"] == 7 and out[1]["n_shared"] == 3
        assert out[2]["n_shingles"] == 7 and out[2]["n_shared"] == 3
        assert out[3]["n_shared"] == 0 and out[3]["shared_frac"] == 0.0
        assert abs(out[1]["shared_frac"] - 3 / 7) < 1e-6

    def test_shingle_free_short_text_kept_with_null_frac(self, spark):
        from realtime_spark.operators.dedup import shingle_shared_frac

        d = spark.createDataFrame(
            [(1, "two words"), (2, "the quick brown fox runs"),
             (3, "the quick brown fox walks")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               shingle_shared_frac(d, "doc_id", "text", k=3).collect()}
        assert set(out) == {1, 2, 3}  # short doc stays in the output
        assert out[1]["n_shingles"] == 0 and out[1]["shared_frac"] is None
        # 'the quick brown' + 'quick brown fox' shared; last shingle differs
        assert out[2]["n_shared"] == 2 and out[3]["n_shared"] == 2

    def test_within_doc_repeat_not_counted_as_shared(self, spark):
        from realtime_spark.operators.dedup import shingle_shared_frac

        # the k-shingle set is per-doc DISTINCT, so a doc repeating its own
        # phrase gains no shared shingles from itself
        d = spark.createDataFrame(
            [(1, "alpha beta gamma alpha beta gamma"),
             (2, "totally disjoint vocabulary set here")],
            "doc_id long, text string",
        )
        out = {r["doc_id"]: r for r in
               shingle_shared_frac(d, "doc_id", "text", k=3).collect()}
        assert out[1]["n_shared"] == 0


class TestSrp:
    def test_planes_deterministic_and_bounded(self):
        p1 = srp_planes(4, 16)
        p2 = srp_planes(4, 16)
        assert p1 == p2
        assert all(-0.5 <= x < 0.5 for row in p1 for x in row)

    def test_positive_scaling_preserves_bucket(self, spark):
        base = [0.5, -1.0, 2.0, 0.25] * 4
        df = spark.createDataFrame(
            [(1, base), (2, [x * 10.0 for x in base]), (3, [-x for x in base])],
            "vec_id long, embedding array<double>",
        )
        out = {r["vec_id"]: r["srp_bucket"] for r in
               srp_buckets(df, num_planes=8, dim=16).collect()}
        assert out[1] == out[2]  # cosine-identical -> same bucket
        assert out[1] != out[3]  # opposite direction -> different bucket


class TestPacking:
    def test_pack_invariants(self, spark):
        from realtime_spark.operators.text import pack_by_token_budget

        d = _docs(spark).select(
            "doc_id", "source",
            (F.col("doc_id") % 37 + 1).cast("int").alias("n_tok"),
        )
        out = pack_by_token_budget(d, "doc_id", "n_tok", budget=50,
                                   partition_col="source")
        rows = out.collect()
        assert len(rows) == 200
        # per (source, pack): token total < budget + max single doc (overflow
        # by at most one document), and pack ids are contiguous from 0
        from collections import defaultdict

        packs = defaultdict(int)
        for r in rows:
            packs[(r["source"], r["pack_id"])] += r["n_tok"]
        for (src, pid), tot in packs.items():
            assert tot < 50 + 37, f"pack {(src, pid)} too large: {tot}"
        for src in {s for s, _ in packs}:
            ids = sorted(p for s, p in packs if s == src)
            assert ids == list(range(len(ids)))
        # every pack except the last per source reaches the budget
        for src in {s for s, _ in packs}:
            ids = sorted(p for s, p in packs if s == src)
            for p in ids[:-1]:
                assert packs[(src, p)] >= 50 - 37

    def test_pack_deterministic_under_repartition(self, spark):
        from realtime_spark.operators.text import pack_by_token_budget

        d = _docs(spark).select(
            "doc_id", "source", (F.col("doc_id") % 11 + 1).cast("int").alias("n_tok")
        )
        a = {(r["doc_id"], r["pack_id"], r["pack_pos"])
             for r in pack_by_token_budget(d, "doc_id", "n_tok", 40, "source").collect()}
        b = {(r["doc_id"], r["pack_id"], r["pack_pos"])
             for r in pack_by_token_budget(
                 d.repartition(13), "doc_id", "n_tok", 40, "source").collect()}
        assert a == b


class TestDuplicateClusters:
    def test_chain_cycle_and_separate_components(self, spark):
        from realtime_spark.operators.dedup import duplicate_clusters

        pairs = spark.createDataFrame(
            [
                # chain: 10-20, 20-30 (transitive via unscored 10~30)
                (10, 20), (20, 30),
                # cycle: 40-50, 50-60, 60-40
                (40, 50), (50, 60), (60, 40),
                # pair given in descending order
                (80, 70),
            ],
            "doc_a bigint, doc_b bigint",
        )
        got = {
            r["doc_id"]: r["cluster_id"]
            for r in duplicate_clusters(pairs).collect()
        }
        assert got == {10: 10, 20: 10, 30: 10,
                       40: 40, 50: 40, 60: 40,
                       70: 70, 80: 70}

    def test_long_chain_converges(self, spark):
        from realtime_spark.operators.dedup import duplicate_clusters

        n = 12
        pairs = spark.createDataFrame(
            [(i, i + 1) for i in range(1, n)], "doc_a bigint, doc_b bigint"
        )
        got = duplicate_clusters(pairs).collect()
        assert {r["cluster_id"] for r in got} == {1}
        assert len(got) == n


class TestKmeansRefine:
    def test_two_clear_clusters_converge(self, spark):
        from realtime_spark.operators.similarity import kmeans_refine

        # two tight blobs around (1,0) and (0,1); seeds off-center
        rows = [
            (1, [1.0, 0.1]), (2, [1.0, -0.1]), (3, [0.9, 0.0]),
            (4, [0.1, 1.0]), (5, [-0.1, 1.0]), (6, [0.0, 0.9]),
        ]
        corpus = spark.createDataFrame(rows, "vec_id bigint, embedding array<float>")
        seeds = corpus.filter("vec_id in (1, 4)")
        out = kmeans_refine(corpus, seeds, iters=2)
        got = {r["centroid_id"]: r for r in out.collect()}
        assert set(got) == {1, 4}
        assert got[1]["n_members"] == 3 and got[4]["n_members"] == 3
        # centroid 1 ~ mean of blob A
        c1 = got[1]["cent_vec"]
        assert abs(c1[0] - (1.0 + 1.0 + 0.9) / 3) < 1e-6
        assert abs(c1[1] - 0.0) < 1e-6


class TestTrainingShards:
    """write_training_shards materializes the training_order permutation:
    partitioned by shard, in-file rows sorted by position, manifest
    certifies the written data."""

    def test_roundtrip_and_order(self, spark, sf_dir, tmp_path):
        from pyspark.sql import functions as F

        from realtime_spark.operators.sampling import training_order
        from realtime_spark.operators.shards import (
            read_training_shards,
            shard_manifest,
            write_training_shards,
        )
        from realtime_spark.sources.testdata import load_table

        d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
        path = str(tmp_path / "shards")
        write_training_shards(d, path, "doc_id", n_shards=8)

        back = read_training_shards(spark, path)
        assert back.count() == d.count()
        # the written permutation equals the computed one
        want = {
            (r["doc_id"], r["shard"], r["position"])
            for r in training_order(d, "doc_id", 8).collect()
        }
        got = {
            (r["doc_id"], r["shard"], r["position"])
            for r in back.select("doc_id", "shard", "position").collect()
        }
        assert got == want
        # in-file physical order: row order within each parquet file must be
        # ascending position (dataloaders stream files sequentially)
        import glob

        import pyarrow.parquet as pq

        for f in glob.glob(path + "/shard=*/*.parquet"):
            pos = pq.read_table(f, columns=["position"])["position"].to_pylist()
            assert pos == sorted(pos), f
        # manifest: contiguous 1..rows positions per shard
        m = shard_manifest(spark, path, "doc_id")
        for r in m.collect():
            assert r["min_pos"] == 1 and r["max_pos"] == r["rows"]


class TestWordsExprOracleParity:
    """The text.py lang/quality/fingerprint family tokenizes with words_expr
    (apostrophes KEPT); the synthetic corpus has no apostrophes, so the
    oracle gate alone cannot catch an oracle written against tokens_expr.
    This differential runs the REAL oracle SQL strings over an
    apostrophe-bearing corpus and compares them to the Spark operators."""

    def _corpus(self, spark):
        rows = [
            (1, "the of and don't can't it's to a in is that", "en", "src0"),
            (2, "le la de l'ami d'accord et un est que pour", "fr", "src0"),
            (3, "won't shan't o'clock", "en", "src1"),
            (4, "plain words without any apostrophes at all the of and", "en", "src1"),
            (5, "", "en", "src2"),
        ]
        df = spark.createDataFrame(
            rows, "doc_id long, text string, lang string, source string"
        ).withColumn("n_chars", F.length("text"))
        return df

    def _duck(self, df):
        import duckdb

        con = duckdb.connect()
        pdf = df.toPandas()
        con.register("_pdf", pdf)
        con.execute("CREATE TABLE documents AS SELECT * FROM _pdf")
        return con

    def test_lang_quality_fingerprint_mix_oracles_match_on_apostrophes(self, spark):
        from realtime_spark.operators.text import (
            detect_lang,
            fingerprints,
            quality_score,
        )
        from realtime_spark.plans.training import (
            _oracle_lang_id,
            _oracle_lang_mix,
            _oracle_quality,
            ORACLE_TEXT_FINGERPRINTS,
            q_lang_mix,
        )
        from tests.oracle_utils import compare

        d = self._corpus(spark)
        con = self._duck(d)

        compare(
            d.select("doc_id", detect_lang(F.col("text")).alias("detected_lang")),
            con, _oracle_lang_id(), "apostrophe:text_lang_id",
        )
        compare(
            d.select("doc_id", quality_score(F.col("text")).alias("quality")),
            con, _oracle_quality(), "apostrophe:text_quality",
        )
        compare(
            fingerprints(d, "doc_id", "text", k=8),
            con, ORACLE_TEXT_FINGERPRINTS, "apostrophe:text_fingerprints",
        )

        # q_lang_mix loads from a table path; inline its body over `d` instead
        from realtime_spark.operators.text import STOPWORDS, quantize, words_expr

        toks = words_expr(F.col("text"))
        n = F.size(toks)
        scored = []
        for lang, stops in sorted(STOPWORDS.items()):
            arr = F.array(*[F.lit(s) for s in stops])
            hits = F.size(F.filter(toks, lambda t: F.array_contains(arr, t)))
            scored.append(F.round(F.when(n > 0, hits / n).otherwise(F.lit(0.0)), 6))
        allscores = F.array_sort(F.array(*scored))
        best = F.element_at(allscores, -1)
        second = F.element_at(allscores, -2)
        mix = d.select(
            "doc_id",
            quantize(best, 4).alias("best_score"),
            quantize(F.when(best > 0, second / best).otherwise(F.lit(0.0)), 4).alias(
                "mix_ratio"
            ),
        )
        compare(mix, con, _oracle_lang_mix(), "apostrophe:lang_mix")


class TestPackTokenWindows:
    """pack_token_windows: concatenate-and-chunk layout over the training
    permutation — invariants a loader relies on, plus the one-exchange
    plan contract."""

    def test_layout_invariants_and_plan_shape(self, spark, sf_dir):
        import re

        from pyspark.sql import functions as F

        from realtime_spark.operators.sampling import training_order
        from realtime_spark.operators.shards import (
            pack_token_windows,
            packed_window_stats,
        )
        from realtime_spark.sources.testdata import load_table

        L = 512
        d = load_table(spark, sf_dir, "documents")
        packed = pack_token_windows(d, "doc_id", 8, L).cache()
        try:
            # positions match training_order exactly (the materialized-shard
            # permutation IS the packing order)
            to = training_order(d, "doc_id", 8).select(
                "doc_id",
                F.col("shard").alias("e_shard"),
                F.col("position").alias("e_pos"),
            )
            j = packed.join(to, "doc_id")
            assert (
                j.filter("shard <> e_shard OR position <> e_pos").count() == 0
            )
            # per-shard stream is gapless: total tokens == max end offset
            gaps = (
                packed.groupBy("shard")
                .agg(
                    F.sum("n_tokens").alias("tot"),
                    F.max(F.col("start_tok") + F.col("n_tokens")).alias("end"),
                )
                .filter("tot <> end")
            )
            assert gaps.count() == 0
            # window arithmetic: offset in [0, L), spans consistent
            assert (
                packed.filter(
                    (F.col("window_offset") < 0)
                    | (F.col("window_offset") >= L)
                    | (
                        F.col("n_windows")
                        != F.col("last_window") - F.col("first_window") + 1
                    )
                ).count()
                == 0
            )
            # every non-final window of every shard is exactly full
            stats = packed_window_stats(packed, L)
            tails = packed.groupBy("shard").agg(
                F.max("last_window").alias("lastw")
            )
            underfull = stats.join(tails, "shard").filter(
                f"window < lastw AND tokens_filled <> {L}"
            )
            assert underfull.count() == 0
        finally:
            packed.unpersist()

        # plan contract: both windows ride ONE exchange (the shard hash);
        # a second shuffle means the prefix sum lost the partitioning
        plan = (
            pack_token_windows(d, "doc_id", 8, L)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan

    def test_straddle_and_zero_token_docs(self, spark):
        from pyspark.sql import functions as F

        from realtime_spark.operators.shards import pack_token_windows

        # one shard (n_shards=1) so the stream is deterministic end-to-end;
        # a 5-token doc over L=4 must straddle, empty docs must vanish
        df = spark.createDataFrame(
            [(i, "tok " * c) for i, c in enumerate([3, 5, 0, 2, 4])],
            "doc_id bigint, text string",
        )
        out = {
            r["doc_id"]: r
            for r in pack_token_windows(df, "doc_id", 1, 4).collect()
        }
        assert 2 not in out  # zero-token doc dropped
        assert sum(r["n_tokens"] for r in out.values()) == 14
        straddlers = [r for r in out.values() if r["n_windows"] > 1]
        assert straddlers, "a 5-token doc cannot fit one 4-token window"
        for r in out.values():
            assert r["first_window"] == r["start_tok"] // 4
            assert r["last_window"] == (r["start_tok"] + r["n_tokens"] - 1) // 4


class TestLengthBucketBatches:
    """length_bucket_batches: finetuning-loader batching — bucket edges,
    full batches except per-cell tails, exact padding arithmetic."""

    def test_batching_invariants(self, spark, sf_dir):
        import re

        from pyspark.sql import functions as F

        from realtime_spark.operators.shards import (
            batch_padding_stats,
            length_bucket_batches,
        )
        from realtime_spark.sources.testdata import load_table

        edges, bs = [32, 64, 128, 256], 16
        d = load_table(spark, sf_dir, "documents")
        out = length_bucket_batches(d, "doc_id", 8, bs, edges).cache()
        try:
            # bucket edges honored (upper-exclusive)
            lim = {0: (1, 31), 1: (32, 63), 2: (64, 127), 3: (128, 255)}
            for b, (lo, hi) in lim.items():
                bad = out.filter(
                    (F.col("bucket") == b)
                    & ((F.col("n_tokens") < lo) | (F.col("n_tokens") > hi))
                )
                assert bad.count() == 0, b
            assert out.filter("bucket = 4 AND n_tokens < 256").count() == 0
            # every batch except each cell's last is exactly full, and
            # pos_in_batch is a permutation of 0..n-1 within each batch
            sizes = out.groupBy("bucket", "shard", "batch_id").agg(
                F.count(F.lit(1)).alias("n"),
                F.min("pos_in_batch").alias("lo"),
                F.max("pos_in_batch").alias("hi"),
                F.countDistinct("pos_in_batch").alias("uniq"),
            )
            tails = out.groupBy("bucket", "shard").agg(
                F.max("batch_id").alias("last_b")
            )
            assert (
                sizes.join(tails, ["bucket", "shard"])
                .filter(f"batch_id < last_b AND n <> {bs}")
                .count()
                == 0
            )
            assert (
                sizes.filter("lo <> 0 OR hi <> n - 1 OR uniq <> n").count()
                == 0
            )
            # padding identity: real + pad == sum over batches of max*size
            stats = batch_padding_stats(out)
            cap = out.groupBy("bucket", "shard", "batch_id").agg(
                F.max("n_tokens").alias("m"), F.count(F.lit(1)).alias("n")
            )
            expect = (
                cap.groupBy("bucket")
                .agg(F.sum(F.col("m") * F.col("n")).alias("capacity"))
            )
            bad = (
                stats.join(expect, "bucket")
                .filter("real_tokens + pad_tokens <> capacity")
            )
            assert bad.count() == 0
        finally:
            out.unpersist()

        plan = (
            length_bucket_batches(d, "doc_id", 8, bs, edges)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert len(re.findall(r"Exchange hashpartitioning", plan)) == 1, plan
