"""Tests: BPE trainer on the classic Sennrich word set — known merge
progression, exact greedy segmentation, determinism, early stop."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bpe import (
    EOW,
    bpe_segment,
    bpe_train,
    word_table,
)


def _classic_words(spark):
    # the worked example from the BPE paper: low×5 lower×2 newest×6
    # widest×3 — first merges are (e,s) 9, (es,t) 9, (est,</w>) 9,
    # then (l,o) 7, (lo,w) 7
    toks = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
    )
    return word_table(
        spark.createDataFrame([(toks,)], "t array<string>"), "t"
    )


def test_bpe_train_classic_progression(spark):
    words = _classic_words(spark)
    merges = bpe_train(words, 5)
    assert merges == [
        ("e", "s"),
        ("es", "t"),
        ("est", EOW),
        ("l", "o"),
        ("lo", "w"),
    ]


def test_bpe_segment_matches_training_and_roundtrips(spark):
    words = _classic_words(spark)
    merges = bpe_train(words, 5)
    df = spark.createDataFrame(
        [("newest",), ("lowest",), ("low",)], "word string"
    )
    out = {r.word: r.pieces for r in bpe_segment(df, merges).collect()}
    # 'newest' → n e w est</w> (es+t merged, then est+</w>)
    assert out["newest"] == ["n", "e", "w", "est</w>"]
    # 'lowest' (unseen in training) segments with learned subwords:
    # (l,o) then (lo,w) build 'low', (e,s)(es,t)(est,</w>) build the
    # suffix — two pieces total
    assert out["lowest"] == ["low", "est</w>"]
    assert out["low"] == ["low", EOW]
    # lossless: concatenating pieces reproduces word + marker
    for w, pieces in out.items():
        assert "".join(pieces) == w + EOW


def test_bpe_train_deterministic_and_early_stop(spark):
    words = _classic_words(spark)
    assert bpe_train(words, 5) == bpe_train(words, 5)
    # a corpus of single-char words has no pair occurring twice
    tiny = word_table(
        spark.createDataFrame([(["a", "b"],)], "t array<string>"), "t"
    )
    # each word is [char, </w>] — the (char, </w>) pairs occur once
    # apiece, so training stops after merges with count >= 2 run out
    merges = bpe_train(tiny, 10)
    assert len(merges) < 10


def test_bpe_word_table_counts(spark):
    words = _classic_words(spark)
    got = {r.word: (r.cnt, r.sym) for r in words.collect()}
    assert got["low"][0] == 5 and got["newest"][0] == 6
    assert got["low"][1] == ["l", "o", "w", EOW]
