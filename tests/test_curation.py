"""Curation operators: split stability, TF-IDF ranking, selection policy,
and the two-level prefix-sum shard packing (must equal the naive global
cumulative sum bit-for-bit)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from bulkfhirloader_spark.operators import curation
from bulkfhirloader_spark.operators.text import token_count_bpe_ish

SF_DIR = "/root/testdata/sf0.001"


def test_hash_split_stable_under_repartition(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = {r["doc_id"]: r["split"] for r in curation.hash_split(docs).collect()}
    b = {
        r["doc_id"]: r["split"]
        for r in curation.hash_split(docs.repartition(13)).collect()
    }
    assert a == b  # randomSplit would fail this
    # rough proportions hold (deterministic hash, 80/10/10 target)
    n = len(a)
    frac_train = sum(1 for s in a.values() if s == "train") / n
    assert 0.7 < frac_train < 0.9
    assert set(a.values()) <= {"train", "val", "test"}


def test_tfidf_ranks_distinctive_terms_first(spark):
    docs = spark.createDataFrame(
        [
            (1, "apple apple apple banana"),
            (2, "banana cherry"),
            (3, "banana dates"),
        ],
        "doc_id long, text string",
    )
    out = curation.tf_idf_top_terms(docs, k=1).collect()
    top = {r["doc_id"]: r["term"] for r in out}
    # 'banana' is in every doc (idf=0) so it can never win
    assert top[1] == "apple"
    assert top[2] == "cherry"
    assert top[3] == "dates"


def test_select_for_training_policy(spark):
    docs = spark.createDataFrame(
        [
            (1, "the cat sat on the mat with a hat", "web"),
            (2, "the cat sat on the mat with a hat", "web"),  # exact dup -> dropped
            (3, "el gato y la casa de los que en", "web"),  # spanish -> dropped
            (4, "1234 5678 !!!! ????", "web"),  # low alpha -> dropped
            (5, "to be or not to be is the question", "books"),
        ],
        "doc_id long, text string, source string",
    )
    out = curation.select_for_training(docs, min_tokens=3, per_source_cap=10)
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [1, 5]


def test_pack_token_shards_equals_global_cumsum(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    fast = curation.pack_token_shards(docs, shard_tokens=5000, bucket_size=32)
    w = Window.orderBy("doc_id").rowsBetween(Window.unboundedPreceding, -1)
    naive = (
        docs.select(
            "doc_id", token_count_bpe_ish(F.col("text")).cast("long").alias("n_tokens")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("coalesce(sum(n_tokens) OVER (ORDER BY doc_id ROWS BETWEEN "
                   "UNBOUNDED PRECEDING AND 1 PRECEDING), 0) div 5000").alias("shard_id"),
        )
    )
    a = {(r["doc_id"], r["n_tokens"], r["shard_id"]) for r in fast.collect()}
    b = {(r["doc_id"], r["n_tokens"], r["shard_id"]) for r in naive.collect()}
    assert a == b
    # shards are monotone in id order and start at 0
    shards = [s for _, _, s in sorted(a)]
    assert shards[0] == 0
    assert all(x <= y for x, y in zip(shards, shards[1:]))


def test_pack_token_shards_plan_is_parallel(spark):
    """The scale property: NO single-partition global window on the
    document stream — the only global ordering happens on the tiny
    bucket-totals relation."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    out = curation.pack_token_shards(docs, shard_tokens=5000, bucket_size=32)
    plan = out._jdf.queryExecution().executedPlan().toString()
    lines = plan.splitlines()
    # the document-stream window (sums n_tokens) must be PARTITIONED by _bkt
    doc_windows = [ln for ln in lines if "Window [sum(n_tokens" in ln]
    assert doc_windows and all("[_bkt" in ln for ln in doc_windows)
    # the only unpartitioned (single-partition) window is over the tiny
    # bucket-totals relation
    totals_windows = [ln for ln in lines if "Window [sum(_bkt_total" in ln]
    assert len(totals_windows) == 1


def test_decontaminate_flags_only_overlapping_docs(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over dogs"),   # shares "the quick brown"
            (2, "completely different words entirely here"),
            (3, "quick brown fox runs away fast"),         # shares "quick brown fox"
        ],
        "doc_id long, text string",
    )
    eval_docs = spark.createDataFrame(
        [(100, "the quick brown fox answer key")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["n_shared_ngrams"]
        for r in curation.decontaminate_ngram_overlap(corpus, eval_docs, n=3).collect()
    }
    # doc 1 shares "the quick brown" + "quick brown fox"; doc 3 shares one
    assert out == {1: 2, 3: 1}


def test_decontaminate_clean_corpus_is_empty(spark):
    corpus = spark.createDataFrame(
        [(1, "alpha beta gamma delta")], "doc_id long, text string"
    )
    eval_docs = spark.createDataFrame(
        [(2, "epsilon zeta eta theta")], "doc_id long, text string"
    )
    assert curation.decontaminate_ngram_overlap(corpus, eval_docs).count() == 0


class TestShardPackingProperty:
    from hypothesis import given, settings, strategies as st

    @given(
        texts=st.lists(
            st.text(alphabet="ab c.", min_size=0, max_size=40),
            min_size=1, max_size=20,
        ),
        shard_tokens=st.integers(5, 40),
    )
    @settings(max_examples=10, deadline=None)
    def test_invariants(self, spark_holder, texts, shard_tokens):
        """The two-level prefix sum must equal naive sequential packing
        exactly on arbitrary corpora (bucket_size=4 forces multi-bucket
        offsets even on tiny inputs), with nondecreasing shard ids."""
        spark = spark_holder[0]
        docs = spark.createDataFrame(
            list(enumerate(texts)), "doc_id long, text string"
        )
        rows = sorted(
            curation.pack_token_shards(
                docs, shard_tokens=shard_tokens, bucket_size=4
            ).collect(),
            key=lambda r: r["doc_id"],
        )
        shard_ids = [r["shard_id"] for r in rows]
        assert shard_ids[0] == 0
        assert all(b - a >= 0 for a, b in zip(shard_ids, shard_ids[1:]))
        # exact equivalence with the naive sequential packing
        cum = 0
        for r in rows:
            assert r["shard_id"] == cum // shard_tokens
            cum += r["n_tokens"]


@pytest.fixture(scope="session")
def spark_holder(spark):
    return [spark]
