"""Unit tests for corpus-curation operators (hand-computed micro-fixtures).

The sf-scale oracle parity lives in the driver gate (`corpus_*` queries);
these pin the semantics on inputs small enough to verify by hand.
"""

import pyspark.sql.functions as F
import pytest

from arcane_framework_scala_spark.functions.corpus import (
    contamination,
    hash_split,
    pii_redact,
    repetition_metrics,
)


def _docs(spark, *texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


class TestRepetitionMetrics:
    def test_hand_computed(self, spark):
        # "a b a b c": words=5, distinct=3 -> dup_word = 2/5
        # 2-grams: [a b, b a, a b, b c] -> top = 2/4
        # 3-grams: [a b a, b a b, a b c] -> top = 1/3
        # 5-grams: [a b a b c] -> dup = 0
        row = repetition_metrics(_docs(spark, "a b a b c")).first()
        assert row.words == 5
        assert row.dup_word_ppm == 400_000
        assert row.top_2gram_ppm == 500_000
        assert row.top_3gram_ppm == 333_333
        assert row.dup_5gram_ppm == 0

    def test_degenerate_loop_maxes_out(self, spark):
        row = repetition_metrics(_docs(spark, " ".join(["spam"] * 12))).first()
        assert row.dup_word_ppm == 916_666  # 11/12
        assert row.top_2gram_ppm == 1_000_000
        assert row.dup_5gram_ppm == 1_000_000

    def test_short_doc_reports_zero_for_missing_n(self, spark):
        row = repetition_metrics(_docs(spark, "one two")).first()
        assert row.words == 2
        assert row.top_2gram_ppm == 1_000_000  # single 2-gram is the top one
        assert row.top_3gram_ppm == 0
        assert row.dup_5gram_ppm == 0


class TestContamination:
    def test_shared_ngram_flagged(self, spark):
        bench = _docs(spark, "the quick brown fox jumps over the lazy dog")
        corpus = spark.createDataFrame(
            [
                (10, "prefix the quick brown fox jumps over the lazy dog suffix"),
                (11, "completely unrelated words in this document body here"),
            ],
            "doc_id long, text string",
        )
        rows = contamination(corpus, bench, n=8).collect()
        assert len(rows) == 1
        assert rows[0].doc_id == 10
        # shared 8-grams: positions 2..3 of the contaminated doc
        assert rows[0].hit_grams == 2
        assert rows[0].bench_docs == 1

    def test_duplicate_grams_counted_once(self, spark):
        bench = _docs(spark, "a b c d e f g h")
        corpus = spark.createDataFrame(
            [(5, "a b c d e f g h x a b c d e f g h")],
            "doc_id long, text string",
        )
        row = contamination(corpus, bench, n=8).first()
        assert row.hit_grams == 1  # distinct per doc, despite 2 occurrences


class TestHashSplit:
    def test_deterministic_and_partitioned(self, spark):
        df = spark.range(1000).withColumnRenamed("id", "doc_id")
        a = {r.doc_id: (r.bucket, r.split) for r in hash_split(df).collect()}
        b = {r.doc_id: (r.bucket, r.split) for r in hash_split(df).collect()}
        assert a == b  # pure hash, no RNG
        splits = {v[1] for v in a.values()}
        assert splits == {"train", "val", "test"}
        frac_train = sum(v[1] == "train" for v in a.values()) / 1000
        assert 0.75 < frac_train < 0.85  # md5 buckets ~uniform

    def test_respects_custom_cuts(self, spark):
        df = spark.range(100).withColumnRenamed("id", "doc_id")
        rows = hash_split(df, cuts=(("all", 1000),)).collect()
        assert all(r.split == "all" for r in rows)


class TestPiiRedact:
    def test_all_patterns(self, spark):
        df = _docs(
            spark,
            "mail bob.smith+x@corp.example.co or call 555-867-5309 "
            "from 192.168.1.100 today",
        )
        row = pii_redact(df).first()
        assert row.clean_text == "mail [EMAIL] or call [PHONE] from [IP] today"
        assert (row.email_hits, row.phone_hits, row.ip_hits) == (1, 1, 1)

    def test_clean_text_untouched(self, spark):
        df = _docs(spark, "no personal data in here at all")
        row = pii_redact(df).first()
        assert row.clean_text == "no personal data in here at all"
        assert (row.email_hits, row.phone_hits, row.ip_hits) == (0, 0, 0)

    def test_ip_host_address_falls_to_ip_rule(self, spark):
        # an IP-host address has no alpha TLD, so the email rule skips it
        # and the IP rule still scrubs the host part
        df = _docs(spark, "x admin@10.0.0.7 y")
        row = pii_redact(df).first()
        assert row.clean_text == "x admin@[IP] y"
        assert (row.email_hits, row.ip_hits) == (0, 1)


@pytest.mark.parametrize("n", [1, 2])
def test_repetition_handles_tiny_docs(spark, n):
    row = repetition_metrics(_docs(spark, " ".join("w" * 1 for _ in range(n)))).first()
    assert row.words == n


class TestChunkDocuments:
    def test_windows_stride_and_tail(self, spark):
        from arcane_framework_scala_spark.functions.corpus import chunk_documents

        text = " ".join(f"w{i}" for i in range(10))
        rows = chunk_documents(
            _docs(spark, text), chunk_tokens=4, stride=3
        ).collect()
        got = {r.chunk_id: (r.n_tokens, r.chunk_text) for r in rows}
        assert got[0] == (4, "w0 w1 w2 w3")
        assert got[1] == (4, "w3 w4 w5 w6")
        assert got[2] == (4, "w6 w7 w8 w9")
        assert len(got) == 3  # (10-4+2)/3 trunc +1
        # every token appears in at least one chunk (no data loss)
        seen = set(" ".join(v[1] for v in got.values()).split())
        assert seen == {f"w{i}" for i in range(10)}

    def test_short_doc_single_tail_chunk(self, spark):
        from arcane_framework_scala_spark.functions.corpus import chunk_documents

        rows = chunk_documents(
            _docs(spark, "a b"), chunk_tokens=5, stride=4
        ).collect()
        assert len(rows) == 1
        assert (rows[0].chunk_id, rows[0].n_tokens, rows[0].chunk_text) == (0, 2, "a b")

    def test_rejects_bad_params(self, spark):
        import pytest as _pytest

        from arcane_framework_scala_spark.functions.corpus import chunk_documents

        with _pytest.raises(ValueError):
            chunk_documents(_docs(spark, "a"), chunk_tokens=0)


class TestPackSequences:
    def test_token_conservation_and_seq_sizes(self, spark):
        from arcane_framework_scala_spark.functions.corpus import (
            chunk_documents,
            pack_sequences_md5,
        )

        docs = _docs(spark, *[" ".join(f"w{i}" for i in range(n)) for n in (10, 25, 7, 40)])
        chunks = chunk_documents(docs, chunk_tokens=8, stride=6)
        packed = pack_sequences_md5(chunks, seq_len=16, shards=2).collect()
        # conservation: packed tokens == total chunk tokens
        total_chunk_tokens = sum(r.n_tokens for r in chunks.collect())
        assert sum(r.tokens for r in packed) == total_chunk_tokens
        # every sequence holds exactly seq_len tokens except shard tails
        by_shard = {}
        for r in packed:
            by_shard.setdefault(r.shard, []).append(r)
        for shard, rows in by_shard.items():
            rows.sort(key=lambda r: r.seq_id)
            assert [r.seq_id for r in rows] == list(range(len(rows)))
            for r in rows[:-1]:
                assert r.tokens == 16, r
            assert 1 <= rows[-1].tokens <= 16

    def test_deterministic_under_repartition(self, spark):
        from arcane_framework_scala_spark.functions.corpus import (
            chunk_documents,
            pack_sequences_md5,
        )

        docs = _docs(spark, *["x " * n for n in range(1, 30)])
        chunks = chunk_documents(docs, chunk_tokens=5, stride=4)
        a = sorted(map(tuple, pack_sequences_md5(chunks, seq_len=8).collect()))
        b = sorted(
            map(tuple, pack_sequences_md5(chunks.repartition(7), seq_len=8).collect())
        )
        assert a == b


def test_jsonl_export_roundtrip_and_shard_determinism(spark, sf_dir, tmp_path):
    from arcane_framework_scala_spark.functions.corpus import (
        export_jsonl_shards,
        read_jsonl_shards,
    )

    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text")
        .limit(200)
    )
    path = str(tmp_path / "jsonl")
    export_jsonl_shards(docs, path, shards=4)
    import os

    dirs = sorted(d for d in os.listdir(path) if d.startswith("shard="))
    assert dirs == [f"shard={i}" for i in range(4)]
    # gzip actually applied
    shard0 = os.path.join(path, "shard=0")
    assert any(f.endswith(".json.gz") for f in os.listdir(shard0))
    back = read_jsonl_shards(spark, path, schema="doc_id bigint, text string")
    assert back.count() == 200
    # texts survive byte-exact and the shard assignment is the md5 rule
    orig = {r["doc_id"]: r["text"] for r in docs.collect()}
    import hashlib

    for r in back.collect():
        assert r["text"] == orig[r["doc_id"]]
        expect = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:15], 16) % 4
        assert r["shard"] == expect
    # re-export is deterministic: same doc -> same shard
    path2 = str(tmp_path / "jsonl2")
    export_jsonl_shards(docs, path2, shards=4)
    a = sorted(map(tuple, back.select("doc_id", "shard").collect()))
    b = sorted(
        map(
            tuple,
            read_jsonl_shards(spark, path2, schema="doc_id bigint, text string")
            .select("doc_id", "shard")
            .collect(),
        )
    )
    assert a == b


class TestMixtureSample:
    def _docs(self, spark):
        return spark.createDataFrame(
            [(i, f"text {i}", "web" if i % 3 else "books") for i in range(300)],
            "doc_id long, text string, source string",
        )

    def test_upsampling_emits_integer_copies(self, spark):
        from arcane_framework_scala_spark.functions.corpus import mixture_sample

        out = mixture_sample(
            self._docs(spark), {"books": 3.0, "web": 1.0}
        )
        counts = {
            r["source"]: r["n"]
            for r in out.groupBy("source").agg(F.count("*").alias("n")).collect()
        }
        n_books = 300 // 3  # i % 3 == 0
        assert counts["books"] == 3 * n_books
        assert counts["web"] == 300 - n_books
        # epochs are 0..w-1 for integral weights
        epochs = sorted(
            r["epoch"]
            for r in out.filter("source = 'books' and doc_id = 0").collect()
        )
        assert epochs == [0, 1, 2]

    def test_fractional_weight_is_deterministic_and_close(self, spark):
        from arcane_framework_scala_spark.functions.corpus import mixture_sample

        docs = self._docs(spark)
        a = mixture_sample(docs, {"web": 2.5}, default=0.0)
        b = mixture_sample(docs, {"web": 2.5}, default=0.0)
        ra = sorted((r["doc_id"], r["epoch"]) for r in a.collect())
        assert ra == sorted((r["doc_id"], r["epoch"]) for r in b.collect())
        n_web = 300 - 300 // 3
        n = len(ra)
        assert 2 * n_web <= n <= 3 * n_web
        assert abs(n - 2.5 * n_web) / n_web < 0.2  # ±20% of the half-copy

    def test_downsampling_matches_stratified_semantics(self, spark):
        from arcane_framework_scala_spark.functions.corpus import mixture_sample

        out = mixture_sample(self._docs(spark), {"web": 0.4}, default=0.0)
        assert out.filter("source = 'books'").count() == 0
        n_web = 300 - 300 // 3
        kept = out.count()
        assert 0 < kept < n_web
        assert (out.agg(F.max("epoch")).first()[0]) == 0

    def test_negative_weight_rejected(self, spark):
        from arcane_framework_scala_spark.functions.corpus import mixture_sample

        with pytest.raises(ValueError):
            mixture_sample(self._docs(spark), {"web": -1.0})


class TestQualityFilter:
    def test_flags_and_reasons(self, spark):
        from arcane_framework_scala_spark.functions.corpus import quality_filter

        good = (
            "this is a perfectly reasonable document with the usual words "
            "and enough length to pass all of the cheap quality rules here."
        )
        df = spark.createDataFrame(
            [
                (1, good),
                (2, "short"),  # fails len + tokens
                (3, good + " 123456789 " * 40),  # digit ratio blown
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in quality_filter(df).collect()}
        assert rows[1]["passed"] and rows[1]["reject_reasons"] == ""
        assert not rows[2]["passed"]
        assert "len" in rows[2]["reject_reasons"]
        assert not rows[3]["passed"]
        assert "digits" in rows[3]["reject_reasons"]

    def test_custom_rules(self, spark):
        from arcane_framework_scala_spark.functions.corpus import quality_filter

        df = spark.createDataFrame(
            [(1, "one two three")], "doc_id long, text string"
        )
        out = quality_filter(df, rules=(("tiny", "n_tokens", 0, 2),)).first()
        assert not out["passed"] and out["reject_reasons"] == "tiny"


class TestShuffleShards:
    def test_permutation_properties(self, spark):
        from arcane_framework_scala_spark.functions.corpus import shuffle_shards

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(500)], "doc_id long, text string"
        )
        out = shuffle_shards(docs, num_shards=8, seed=1).collect()
        assert len(out) == 500
        by_shard: dict[int, list[int]] = {}
        for r in out:
            by_shard.setdefault(r["shard"], []).append(r["pos"])
        # positions within each shard are exactly 0..n-1
        for shard, ps in by_shard.items():
            assert sorted(ps) == list(range(len(ps)))
        # roughly balanced: no shard more than 2x the mean
        sizes = [len(v) for v in by_shard.values()]
        assert max(sizes) < 2 * (500 / 8)

    def test_seed_changes_permutation_not_membership(self, spark):
        from arcane_framework_scala_spark.functions.corpus import shuffle_shards

        docs = spark.createDataFrame(
            [(i, f"t{i}") for i in range(200)], "doc_id long, text string"
        )
        a = {(r["doc_id"], r["shard"], r["pos"]) for r in shuffle_shards(docs, 4, seed=1).collect()}
        b = {(r["doc_id"], r["shard"], r["pos"]) for r in shuffle_shards(docs, 4, seed=2).collect()}
        assert {x[0] for x in a} == {x[0] for x in b}
        assert a != b  # different permutation
        # deterministic for the same seed
        a2 = {(r["doc_id"], r["shard"], r["pos"]) for r in shuffle_shards(docs, 4, seed=1).collect()}
        assert a == a2


def test_incremental_pairs_equal_full_minus_old(spark):
    """The exactness invariant: pairs(old ∪ new) == pairs(old) ∪
    incremental(old, new), disjointly."""
    from arcane_framework_scala_spark.functions.dedup import (
        minhash_candidate_pairs,
        minhash_candidate_pairs_incremental,
    )

    base = "the quick brown fox jumps over the lazy dog "
    rows = [(i, base * 3 + f"tail {i % 7}") for i in range(40)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    old = docs.filter("doc_id % 4 != 0")
    new = docs.filter("doc_id % 4 = 0")

    full = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(docs).collect()}
    old_p = {(r["id_a"], r["id_b"]) for r in minhash_candidate_pairs(old).collect()}
    incr = {
        (r["id_a"], r["id_b"])
        for r in minhash_candidate_pairs_incremental(old, new).collect()
    }
    assert incr == full - old_p
    assert incr.isdisjoint(old_p)
    assert incr  # the near-dup corpus guarantees new pairs exist


class TestUnigramLM:
    def test_self_fit_scores_typical_below_atypical(self, spark):
        from arcane_framework_scala_spark.functions.lm import unigram_logprob

        common = "the cat sat on the mat and the dog sat on the rug"
        df = spark.createDataFrame(
            [(1, common), (2, common), (3, "zqx wvу jkl zzz qqq")],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
        # gibberish doc: every token unique in the corpus → higher surprisal
        assert rows[3]["avg_neg_logprob"] > rows[1]["avg_neg_logprob"]
        assert rows[1]["avg_neg_logprob"] == rows[2]["avg_neg_logprob"]

    def test_frozen_model_handles_unseen_tokens(self, spark):
        from arcane_framework_scala_spark.functions.lm import (
            unigram_logprob,
            unigram_model,
        )

        train = spark.createDataFrame(
            [(1, "a b a b a")], "doc_id long, text string"
        )
        model = unigram_model(train)
        new = spark.createDataFrame(
            [(9, "a b zz")], "doc_id long, text string"
        )
        row = unigram_logprob(new, model=model).first()
        # Laplace smoothing keeps the unseen token finite
        assert row["n_tokens"] == 3
        import math

        assert math.isfinite(row["avg_neg_logprob"])


def test_hashed_features_dim_bound_and_counts(spark):
    from arcane_framework_scala_spark.functions.lm import hashed_features

    df = spark.createDataFrame(
        [(1, "a a b"), (2, "a")], "doc_id long, text string"
    )
    rows = hashed_features(df, dim=8).collect()
    assert all(0 <= r["bucket"] < 8 for r in rows)
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r["doc_id"], 0)
        by_doc[r["doc_id"]] += r["cnt"]
    assert by_doc == {1: 3, 2: 1}  # counts preserve token totals
    # same token → same bucket across docs
    b1 = {r["bucket"] for r in rows if r["doc_id"] == 2}
    assert b1 <= {r["bucket"] for r in rows if r["doc_id"] == 1}


def test_knn_label_accuracy_majority_and_tiebreak(spark):
    from arcane_framework_scala_spark.functions.similarity import (
        knn_label_accuracy,
    )

    topk = spark.createDataFrame(
        [(1, 10), (1, 11), (1, 12), (2, 10), (2, 13)],
        "query_id long, vec_id long",
    )
    labels = spark.createDataFrame(
        [(1, 7), (2, 5), (10, 7), (11, 7), (12, 5), (13, 5)],
        "vec_id long, label int",
    )
    got = {
        r["query_id"]: r
        for r in knn_label_accuracy(topk, labels).collect()
    }
    assert got[1]["predicted_label"] == 7 and got[1]["correct"]
    # query 2: one vote each for 7 and 5 → tie breaks to SMALLEST label 5
    assert got[2]["predicted_label"] == 5 and got[2]["correct"]


def test_lm_buckets_splits_into_thirds(spark):
    from arcane_framework_scala_spark.functions.lm import lm_buckets

    # 30 docs with 3 clearly separated surprisal tiers
    common = "the the the the the"
    rows = (
        [(i, common) for i in range(10)]
        + [(i, common + f" extra{i}") for i in range(10, 20)]
        + [(i, f"zz{i} qq{i} ww{i} rr{i} tt{i}") for i in range(20, 30)]
    )
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r["bucket"] for r in lm_buckets(df).collect()}
    assert all(got[i] == "head" for i in range(10))
    assert all(got[i] == "middle" for i in range(10, 20))
    assert all(got[i] == "tail" for i in range(20, 30))


def test_bigram_score_flags_gibberish_and_boilerplate(spark):
    from arcane_framework_scala_spark.functions.lm import bigram_logprob

    typical = "the cat sat on the mat and the dog sat on the mat"
    df = spark.createDataFrame(
        [
            (1, typical),
            (2, typical),
            (3, "mat the on sat cat dog and the on mat sat the"),  # shuffled
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
    # same unigram profile, broken transitions → higher bigram surprisal
    assert rows[3]["avg_neg_logprob"] > rows[1]["avg_neg_logprob"]
    assert rows[1]["n_bigrams"] == len(typical.split()) - 1


def test_band_index_partition_pruning(spark, tmp_path):
    """The persisted band index must be READ partition-pruned: a small
    batch's query scans only the (band, pfx) partitions its buckets
    touch, not the whole index."""
    import os

    from arcane_framework_scala_spark.functions.dedup import (
        build_band_index,
        minhash_candidate_pairs_incremental,
        minhash_candidate_pairs_indexed,
    )

    base = "some repeated content about dedup indexes "
    docs = spark.createDataFrame(
        [(i, base * 2 + f"tail {i % 9}") for i in range(120)],
        "doc_id long, text string",
    )
    old = docs.filter("doc_id % 6 != 0")
    new = docs.filter("doc_id % 6 = 0").limit(3)
    idx = str(tmp_path / "band_idx")
    build_band_index(old, idx)
    total_parts = sum(
        1 for root, dirs, files in os.walk(idx)
        for f in files if f.endswith(".parquet")
    )
    got = minhash_candidate_pairs_indexed(spark, idx, new)
    # correctness: identical to the in-memory incremental path
    live = minhash_candidate_pairs_incremental(old, new)
    assert {tuple(r) for r in got.collect()} == {tuple(r) for r in live.collect()}
    # pruning: the index scan must carry non-empty PartitionFilters
    # (inputFiles() lists the relation pre-pruning, so inspect the plan)
    plan = got._jdf.queryExecution().executedPlan().toString()
    m = [
        line for line in plan.splitlines()
        if "PartitionFilters" in line and "band" in line
    ]
    assert m, plan
    assert not any("PartitionFilters: []" in line for line in m), m
    # and the batch genuinely touches a strict subset of partitions
    from arcane_framework_scala_spark.functions.dedup import minhash_bands
    import pyspark.sql.functions as F

    touched = (
        minhash_bands(new)
        .select("band", F.substring("bucket", 1, 2).alias("pfx"))
        .distinct()
        .count()
    )
    assert touched < total_parts, (touched, total_parts)


def test_band_index_append_maintains_the_index(spark, tmp_path):
    """append_band_index extends the stored index partition-aligned:
    probes against the appended index equal the in-memory incremental
    path over the grown corpus, new files land only inside the batch's
    own (band, pfx) directories, and appending without stored metadata
    refuses (guessed layout params would corrupt every later probe)."""
    import os

    import pytest

    from arcane_framework_scala_spark.functions.dedup import (
        append_band_index,
        build_band_index,
        minhash_candidate_pairs_incremental,
        minhash_candidate_pairs_indexed,
    )

    base = "web corpus page body shared boilerplate text "
    docs = spark.createDataFrame(
        [(i, base * 2 + f"tail {i % 8}") for i in range(150)],
        "doc_id long, text string",
    )
    old = docs.filter("doc_id % 3 != 0")
    batch1 = docs.filter("doc_id % 3 = 0 AND doc_id % 2 = 0")
    batch2 = docs.filter("doc_id % 3 = 0 AND doc_id % 2 = 1")
    idx = str(tmp_path / "idx")
    build_band_index(old, idx)

    def files():
        return {
            os.path.join(os.path.relpath(r, idx), f)
            for r, _d, fs in os.walk(idx)
            for f in fs
            if f.endswith(".parquet")
        }

    before = files()
    append_band_index(idx, batch1)
    added = files() - before
    assert added and before <= files()  # pure append, nothing rewritten
    # every new file sits inside an existing-layout (band, pfx) dir
    assert all(f.startswith("band=") for f in added)

    got = minhash_candidate_pairs_indexed(spark, idx, batch2)
    live = minhash_candidate_pairs_incremental(
        old.unionByName(batch1), batch2
    )
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in live.collect()
    }

    bare = tmp_path / "bare"
    bare.mkdir()
    with pytest.raises(ValueError, match="build it with build_band_index"):
        append_band_index(str(bare), batch1)


def test_band_index_corrupt_meta_raises_clear_error(tmp_path):
    """A truncated/corrupt _INDEX_META.json surfaces a 'rebuild the
    index' ValueError, not an opaque JSONDecodeError (and a missing or
    non-directory path still means 'no metadata') — ADVICE r7."""
    import pytest

    from arcane_framework_scala_spark.functions.dedup import (
        _INDEX_META_FILE,
        _read_index_meta,
    )

    idx = tmp_path / "idx"
    idx.mkdir()
    (idx / _INDEX_META_FILE).write_text('{"pfx_chars": 2, "num_h')
    with pytest.raises(ValueError, match="rebuild"):
        _read_index_meta(str(idx))
    assert _read_index_meta(str(tmp_path / "nope")) is None
    blob = tmp_path / "a_file"
    blob.write_text("x")
    assert _read_index_meta(str(blob)) is None  # NotADirectoryError path


def test_band_index_meta_guards_layout_mismatch(spark, tmp_path):
    """The probe adopts the layout persisted at build time; an explicit
    mismatching parameter raises instead of silently returning empty
    candidate pairs (a 1-char prefix filter matches zero 2-char
    partitions — missed duplicates with no error)."""
    import pytest

    from arcane_framework_scala_spark.functions.dedup import (
        build_band_index,
        minhash_candidate_pairs_incremental,
        minhash_candidate_pairs_indexed,
    )

    base = "another run of repeated dedup index content "
    docs = spark.createDataFrame(
        [(i, base * 2 + f"tail {i % 7}") for i in range(60)],
        "doc_id long, text string",
    )
    old = docs.filter("doc_id % 5 != 0")
    new = docs.filter("doc_id % 5 = 0").limit(3)
    idx = str(tmp_path / "band_idx2")
    # build with the NON-default prefix width — the r6 regression shape
    build_band_index(old, idx, pfx_chars=2)

    # probe with all defaults: the stored pfx_chars=2 is adopted, results
    # match the in-memory incremental path (NOT silently empty)
    got = minhash_candidate_pairs_indexed(spark, idx, new)
    live = minhash_candidate_pairs_incremental(old, new)
    assert {tuple(r) for r in got.collect()} == {
        tuple(r) for r in live.collect()
    }

    # an explicit conflicting layout raises rather than mispruning
    with pytest.raises(ValueError, match="pfx_chars=2"):
        minhash_candidate_pairs_indexed(spark, idx, new, pfx_chars=1)
    with pytest.raises(ValueError, match="num_hashes=16"):
        minhash_candidate_pairs_indexed(spark, idx, new, num_hashes=32)


def test_cluster_safe_split_no_straddle(spark, sf_dir):
    """Every near-dup pair shares a split; singletons match hash_split."""
    import pyspark.sql.functions as F
    from arcane_framework_scala_spark.functions import corpus as cx
    from arcane_framework_scala_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    pairs = dd.minhash_candidate_pairs(docs)
    clusters = dd.dedup_clusters(pairs)
    out = cx.cluster_safe_split(docs, clusters)
    split_of = {r["doc_id"]: r["split"] for r in out.collect()}
    prs = pairs.collect()
    assert prs  # the corpus has near-dups by construction
    for r in prs:
        assert split_of[r["id_a"]] == split_of[r["id_b"]], (r["id_a"], r["id_b"])
    # unclustered docs fall back to their own id -> equals hash_split
    plain = {r["doc_id"]: r["split"] for r in cx.hash_split(docs).collect()}
    clustered = {r["doc_id"] for r in clusters.collect()}
    for d, s in split_of.items():
        if d not in clustered:
            assert s == plain[d]


def test_contrastive_negatives_contract(spark, sf_dir):
    """k negatives per anchor, never self, never same cluster, stable."""
    from arcane_framework_scala_spark.functions import corpus as cx
    from arcane_framework_scala_spark.functions import dedup as dd

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    clusters = dd.dedup_clusters(dd.minhash_candidate_pairs(docs))
    out = cx.contrastive_negatives(docs, clusters, k=4).collect()
    cl = {r["doc_id"]: r["cluster_id"] for r in clusters.collect()}
    by_anchor = {}
    for r in out:
        assert r["neg_id"] != r["doc_id"]
        a, n = cl.get(r["doc_id"]), cl.get(r["neg_id"])
        assert a is None or n is None or a != n  # never a false negative
        by_anchor.setdefault(r["doc_id"], []).append(r)
    n_docs = docs.count()
    assert len(by_anchor) == n_docs
    for rows in by_anchor.values():
        assert sorted(r["rank"] for r in rows) == [1, 2, 3, 4]
        assert len({r["neg_id"] for r in rows}) == 4  # no duplicate negs
    # determinism: a second run returns the identical pair set
    again = cx.contrastive_negatives(docs, clusters, k=4).collect()
    assert {(r["doc_id"], r["rank"], r["neg_id"]) for r in out} == {
        (r["doc_id"], r["rank"], r["neg_id"]) for r in again
    }


def test_band_index_precomputed_bands_identical(spark, tmp_path):
    """r12: the probe's ``precomputed_bands`` fast path (batch
    signatures materialized concurrently with the index build) must
    return EXACTLY the default path's pairs, and must re-derive the
    pruning prefix from the STORED pfx_chars (a caller cannot
    desynchronize the layout)."""
    from arcane_framework_scala_spark.functions.dedup import (
        build_band_index,
        minhash_bands,
        minhash_candidate_pairs_indexed,
    )
    from arcane_framework_scala_spark.plans.materialize import materialize

    base = "some repeated content about dedup indexes "
    docs = spark.createDataFrame(
        [(i, base * 2 + f"tail {i % 9}") for i in range(120)],
        "doc_id long, text string",
    )
    old = docs.filter("doc_id % 6 != 0")
    new = docs.filter("doc_id % 6 = 0")
    idx = str(tmp_path / "band_idx")
    build_band_index(old, idx)
    nb = materialize(minhash_bands(new), eager=True)
    got = minhash_candidate_pairs_indexed(
        spark, idx, new, precomputed_bands=nb
    )
    ref = minhash_candidate_pairs_indexed(spark, idx, new)
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, ref.collect())
    )
    # the pruned scan still carries partition filters on (band, pfx)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert any(
        "PartitionFilters" in line and "pfx" in line
        for line in plan.splitlines()
    )
