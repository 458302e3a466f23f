"""Tests: deterministic sampling / mixing / epoch shuffle / sequence
packing (the training-data corpus-prep operators)."""

from __future__ import annotations

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
    deterministic_sample,
    epoch_shuffle,
    group_sample_topk,
    pack_sequences,
    stratified_sample,
    weighted_mix,
)
from tests.conftest import SF_DIR


def test_deterministic_sample_rate_and_stability(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = deterministic_sample(docs, 0.3, ["doc_id"], seed=7)
    b = deterministic_sample(docs, 0.3, ["doc_id"], seed=7)
    ids_a = sorted(r.doc_id for r in a.select("doc_id").collect())
    ids_b = sorted(r.doc_id for r in b.select("doc_id").collect())
    assert ids_a == ids_b  # run-to-run identical
    n = docs.count()
    assert 0.2 * n < len(ids_a) < 0.4 * n  # rate is approximately honored
    # repartitioning the input must not change the sample (unlike
    # Spark's RNG-based df.sample)
    ids_c = sorted(
        r.doc_id
        for r in deterministic_sample(
            docs.repartition(13), 0.3, ["doc_id"], seed=7
        ).select("doc_id").collect()
    )
    assert ids_c == ids_a


def test_stratified_sample_per_stratum_rates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    langs = [r.lang for r in docs.select("lang").distinct().collect()]
    keep_all, keep_none = langs[0], langs[1]
    out = stratified_sample(
        docs, "lang", {keep_all: 1.0, keep_none: 0.0}, ["doc_id"]
    )
    got = {r.lang for r in out.select("lang").distinct().collect()}
    assert keep_all in got and keep_none not in got
    n_stratum = docs.filter(F.col("lang") == keep_all).count()
    assert out.filter(F.col("lang") == keep_all).count() == n_stratum


def test_weighted_mix_tags_and_rates(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    web = docs.filter("doc_id % 2 = 0")
    books = docs.filter("doc_id % 2 = 1")
    out = weighted_mix(
        {"web": (web, 0.5), "books": (books, 1.0)}, ["doc_id"]
    )
    counts = {r.source: r.cnt for r in
              out.groupBy("source").agg(F.count("*").alias("cnt")).collect()}
    assert counts["books"] == books.count()  # rate 1.0 keeps everything
    assert 0.3 * web.count() < counts["web"] < 0.7 * web.count()


def test_epoch_shuffle_is_permutation_and_seed_sensitive(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    e0 = epoch_shuffle(docs, ["doc_id"], seed=0, num_partitions=4)
    e0_again = epoch_shuffle(docs, ["doc_id"], seed=0, num_partitions=4)
    e1 = epoch_shuffle(docs, ["doc_id"], seed=1, num_partitions=4)
    order0 = [r.doc_id for r in e0.collect()]
    assert sorted(order0) == sorted(r.doc_id for r in docs.collect())  # permutation
    assert order0 == [r.doc_id for r in e0_again.collect()]  # reproducible
    assert order0 != [r.doc_id for r in e1.collect()]  # new seed, new epoch
    assert order0 != sorted(order0)  # actually shuffled


def test_epoch_shuffle_order_independent_of_partition_count(spark):
    # The determinism contract: the epoch order is a function of
    # (data, seed) ALONE. Range-partitioning on the hash means the
    # concatenated partition order equals the global hash order
    # whatever num_partitions (or shuffle.partitions default) is.
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select("doc_id")
    o4 = [r.doc_id for r in epoch_shuffle(docs, ["doc_id"], seed=3,
                                          num_partitions=4).collect()]
    o13 = [r.doc_id for r in epoch_shuffle(docs, ["doc_id"], seed=3,
                                           num_partitions=13).collect()]
    o_default = [r.doc_id for r in epoch_shuffle(docs, ["doc_id"],
                                                 seed=3).collect()]
    assert o4 == o13 == o_default


def test_pack_sequences_composite_id_is_collision_free(spark):
    # pack_id = group << 32 | local_pack: decodable, unique across
    # groups even when every doc is its own pack (max local_pack for
    # the row count), and far past the old 10M-per-group modulus.
    docs = spark.createDataFrame(
        [(i, 10) for i in range(300)], "doc_id long, n_tokens long"
    )
    rows = pack_sequences(docs, "n_tokens", 10, ["doc_id"], n_groups=4).collect()
    ids = [r.pack_id for r in rows]
    assert len(set(ids)) == len(ids)  # one pack per doc here, all unique
    groups = {pid >> 32 for pid in ids}
    assert groups <= set(range(4))
    for pid in ids:
        assert 0 <= (pid & 0xFFFFFFFF) < 300


def test_pack_sequences_respects_max_len_and_covers_all(spark):
    docs = spark.createDataFrame(
        [(i, 100 + (i * 37) % 900) for i in range(200)],
        "doc_id long, n_tokens long",
    )
    max_len = 2048
    packed = pack_sequences(
        docs, "n_tokens", max_len, ["doc_id"], n_groups=4
    )
    rows = packed.collect()
    assert sorted(r.doc_id for r in rows) == list(range(200))  # exactly once
    by_pack: dict = {}
    for r in rows:
        by_pack.setdefault(r.pack_id, []).append(r)
    for pid, members in by_pack.items():
        total = sum(min(r.n_tokens, max_len) for r in members)
        assert total <= max_len, (pid, total)
        # offsets are a proper prefix layout
        offs = sorted(r.pack_offset for r in members)
        assert offs[0] == 0


def test_pack_sequences_oversized_doc_gets_own_pack(spark):
    docs = spark.createDataFrame(
        [(1, 5000), (2, 100), (3, 100)], "doc_id long, n_tokens long"
    )
    packed = {r.doc_id: (r.pack_id, r.pack_offset)
              for r in pack_sequences(docs, "n_tokens", 1024, ["doc_id"],
                                      n_groups=1).collect()}
    # the oversized doc is truncated to max_len and fills its own pack:
    # nothing else fits after it, nothing precedes it at offset > 0
    assert packed[1][1] == 0
    assert packed[2][0] != packed[1][0]
    assert packed[3][0] != packed[1][0]


def _chunk_rows(spark, texts, max_tokens, overlap):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        chunk_documents,
    )

    df = spark.createDataFrame(
        [(i, t.split()) for i, t in enumerate(texts)], "doc_id long, t array<string>"
    )
    return (
        chunk_documents(df, "t", max_tokens, overlap)
        .orderBy("doc_id", "chunk_id")
        .collect()
    )


def test_chunk_documents_coverage_and_overlap(spark):
    toks = [f"w{i}" for i in range(23)]
    rows = _chunk_rows(spark, [" ".join(toks)], max_tokens=8, overlap=3)
    # every window ≤ max, consecutive windows share exactly `overlap`
    # tokens, and the union of windows is the whole doc in order
    assert all(r.n_chunk_tokens <= 8 for r in rows)
    assert [r.chunk_id for r in rows] == list(range(len(rows)))
    for prev, cur in zip(rows, rows[1:]):
        assert prev.chunk_tokens[-3:] == cur.chunk_tokens[:3]
    reconstructed = list(rows[0].chunk_tokens)
    for r in rows[1:]:
        reconstructed.extend(r.chunk_tokens[3:])
    assert reconstructed == toks


def test_chunk_documents_edge_sizes(spark):
    # empty doc -> 0 chunks; short doc -> 1 chunk; doc whose tail fits
    # entirely inside the previous window's overlap -> no redundant
    # trailing chunk (17 tokens, max 16, overlap 4 -> starts 0 and 12)
    rows = _chunk_rows(
        spark, ["", "a b c", " ".join(f"w{i}" for i in range(17))], 16, 4
    )
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert 0 not in by_doc
    assert [c.n_chunk_tokens for c in by_doc[1]] == [3]
    assert [c.n_chunk_tokens for c in by_doc[2]] == [16, 5]
    # full coverage: last chunk reaches the end
    assert by_doc[2][-1].chunk_tokens[-1] == "w16"


def test_chunk_documents_rejects_bad_overlap(spark):
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        chunk_documents,
    )

    df = spark.createDataFrame([(1, ["a"])], "doc_id long, t array<string>")
    with pytest.raises(ValueError):
        chunk_documents(df, "t", 8, 8)


def test_token_vocab_counts_and_cutoff_tiebreak(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        token_vocab,
    )

    df = spark.createDataFrame(
        [(["a", "a", "b", ""],), (["b", "c", "a"],)], "t array<string>"
    )
    rows = token_vocab(df, "t", 2).collect()
    # empty tokens excluded; tie between b(2) and nothing else at the
    # cutoff — a:3, b:2 win; c:1 cut
    assert [(r.token, r.cnt) for r in rows] == [("a", 3), ("b", 2)]


def test_group_sample_topk_exact_count_and_determinism(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    a = group_sample_topk(docs, "source", 5, ["doc_id"])
    counts = {r.source: r.n for r in a.groupBy("source").agg(F.count("*").alias("n")).collect()}
    n_per_source = {
        r.source: r.n
        for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()
    }
    for src, n in counts.items():
        assert n == min(5, n_per_source[src])
    # ranks are a dense 1..k prefix per group
    ranks = {
        (r.source, r.sample_rank) for r in a.select("source", "sample_rank").collect()
    }
    for src, n in counts.items():
        assert {(src, i) for i in range(1, n + 1)} <= ranks
    # same ids on a re-run and under a different partition layout
    b = group_sample_topk(docs.repartition(7), "source", 5, ["doc_id"])
    assert sorted(map(tuple, a.select("source", "doc_id").collect())) == sorted(
        map(tuple, b.select("source", "doc_id").collect())
    )


def test_group_sample_topk_prefilter_subsets_consistently(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # A generous prefilter keeps >= k rows per group, so the sample is
    # still exactly k — drawn from the hash-thinned candidate set.
    thinned = group_sample_topk(docs, "source", 3, ["doc_id"], prefilter_rate=0.9)
    counts = [r.n for r in thinned.groupBy("source").agg(F.count("*").alias("n")).collect()]
    assert counts and all(n == 3 for n in counts)
    # the prefilter is the deterministic_sample predicate: every
    # surviving id is in that keep-set
    kept = {r.doc_id for r in deterministic_sample(docs, 0.9, ["doc_id"]).collect()}
    assert {r.doc_id for r in thinned.collect()} <= kept


def test_weighted_sample_topk_determinism_and_weight_bias(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        hash_uniform,
        weighted_sample_topk,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    u = hash_uniform(["doc_id"], seed=7)
    a = weighted_sample_topk(docs, 40, "n_chars", u, tiebreak_cols=["doc_id"])
    b = weighted_sample_topk(
        docs.repartition(13), 40, "n_chars", u, tiebreak_cols=["doc_id"]
    )
    ids_a = sorted(r.doc_id for r in a.collect())
    assert ids_a == sorted(r.doc_id for r in b.collect())  # layout-stable
    assert len(ids_a) == 40
    # priorities are valid and the output carries them
    assert all(0.0 < r.priority <= 1.0 for r in a.collect())
    # weight bias: length-weighted sample overrepresents long docs
    pop_avg = docs.agg(F.avg("n_chars")).collect()[0][0]
    samp_avg = a.agg(F.avg("n_chars")).collect()[0][0]
    assert samp_avg > pop_avg


def test_weighted_sample_topk_excludes_nonpositive_weights(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        hash_uniform,
        weighted_sample_topk,
    )

    df = spark.createDataFrame(
        [(1, 5.0), (2, 0.0), (3, -1.0), (4, 2.0)], "id bigint, w double"
    )
    out = weighted_sample_topk(
        df, 10, "w", hash_uniform(["id"]), tiebreak_cols=["id"]
    )
    assert sorted(r.id for r in out.collect()) == [1, 4]


def test_budget_select_matches_naive_global_window(spark):
    from pyspark.sql import Window

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        budget_select,
    )

    # 200 rows, clumpy priorities (ties included), varied measures
    rows = [(i, float((i * 7) % 23), 1 + (i * 13) % 50) for i in range(200)]
    df = spark.createDataFrame(rows, "id bigint, pri double, m bigint")

    got = {
        r.id: r.cum_measure
        for r in budget_select(
            df, "m", "pri", "id", budget=2000, n_buckets=8
        ).collect()
    }
    w = Window.orderBy(F.col("pri").desc(), F.col("id").asc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    naive = {
        r.id: r.cum
        for r in df.withColumn("cum", F.sum("m").over(w))
        .filter(F.col("cum") <= 2000)
        .collect()
    }
    assert got == naive


def test_budget_select_frac_and_arg_validation(spark):
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        budget_select,
    )

    df = spark.createDataFrame(
        [(i, float(i), 10) for i in range(10)], "id bigint, pri double, m bigint"
    )
    # total = 100; frac 0.35 → budget 35 → exactly 3 rows of 10 kept
    out = budget_select(df, "m", "pri", "id", budget_frac=0.35).collect()
    assert len(out) == 3
    assert {r.id for r in out} == {9, 8, 7}  # highest priorities first
    with pytest.raises(ValueError, match="exactly one"):
        budget_select(df, "m", "pri", "id")
    with pytest.raises(ValueError, match="exactly one"):
        budget_select(df, "m", "pri", "id", budget=5, budget_frac=0.5)


def test_dsir_weights_favor_target_like_docs(spark):
    """DSIR: held-out docs drawn from the target's token distribution
    outscore docs from a disjoint distribution — neither held-out doc
    appears in the target set itself, so the signal is the hashed-ngram
    models, not identity."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        dsir_select,
        dsir_weights,
    )

    target_vocab = "the cat sat on a mat and read a book by the door".split()
    other_vocab = "zz qq xx vv kk pp ww mm nn tt rr ll".split()
    rows = []
    # 8 labeled target docs (cyclic slices of the target stream)
    for i in range(8):
        toks = (target_vocab * 3)[i : i + 20]
        rows.append((i, toks, True))
    # held-out candidates: 4 target-like, 4 other-like — all unlabeled
    for i in range(4):
        rows.append((100 + i, (target_vocab * 3)[i + 5 : i + 25], False))
        rows.append((200 + i, (other_vocab * 3)[i : i + 20], False))
    df = spark.createDataFrame(rows, "doc_id bigint, t array<string>, tgt boolean")
    w = {r.doc_id: r.dsir_score for r in dsir_weights(
        df, "t", "doc_id", "tgt", n_buckets=256
    ).collect()}
    assert min(w[100 + i] for i in range(4)) > max(w[200 + i] for i in range(4))
    # top-k selection returns the target-like candidates before any
    # other-like one (the labeled targets score highest of all)
    sel = [r.doc_id for r in dsir_select(
        df, "t", "doc_id", "tgt", k=12, n_buckets=256
    ).collect()]
    assert set(sel[:12]) >= {100, 101, 102, 103}
    assert all(d not in sel for d in (200, 201, 202, 203)) or all(
        sel.index(100 + i) < sel.index(200 + j)
        for i in range(4)
        for j in range(4)
        if 200 + j in sel
    )


def test_dsir_weights_deterministic_and_exact_ints(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        dsir_weights,
    )

    rows = [
        (i, f"tok{i % 5} tok{(i + 1) % 5} tok{i % 3}".split(), i % 2 == 0)
        for i in range(30)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, t array<string>, tgt boolean")
    a = {(r.doc_id, r.n_grams, r.weight_fp) for r in dsir_weights(
        df, "t", "doc_id", "tgt"
    ).collect()}
    b = {(r.doc_id, r.n_grams, r.weight_fp) for r in dsir_weights(
        df.repartition(7), "t", "doc_id", "tgt"
    ).collect()}
    assert a == b  # fixed-point ints: layout-independent to the bit
    # every doc scored, n_grams = unigrams + bigrams = 2*len - 1
    assert len(a) == 30 and all(n == 5 for _, n, _ in a)


def test_temperature_rebalance_flattens_shares(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        temperature_rebalance,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    before = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    out = temperature_rebalance(
        docs, "lang", ["doc_id"], alpha=0.5, target_frac=0.5, seed=3
    )
    after = {
        r["lang"]: r["n"]
        for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()
    }
    n_before = sum(before.values())
    n_after = sum(after.values())
    # total lands at/below the target (tails saturate at rate 1.0)
    assert n_after <= 0.55 * n_before
    # the head language's SHARE shrinks, the rarest language's grows
    head = max(before, key=before.get)
    tail = min(before, key=before.get)
    assert after[head] / n_after < before[head] / n_before
    assert after[tail] / n_after > before[tail] / n_before
    # keep rates are capped at 1: no language gains rows
    for lang, n in after.items():
        assert n <= before[lang]
    # deterministic and layout-independent
    ids_a = sorted(r.doc_id for r in out.select("doc_id").collect())
    ids_b = sorted(
        r.doc_id
        for r in temperature_rebalance(
            docs.repartition(17), "lang", ["doc_id"],
            alpha=0.5, target_frac=0.5, seed=3,
        ).select("doc_id").collect()
    )
    assert ids_a == ids_b


def test_temperature_rebalance_alpha_one_keeps_proportions(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        temperature_rebalance,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    # alpha=1: q_g == p_g, so every group's rate is the same constant
    # (target_frac) — shares are preserved
    out = temperature_rebalance(
        docs, "lang", ["doc_id"], alpha=1.0, target_frac=0.6, seed=1
    )
    rates = {
        r["lang"]: r["keep_rate"]
        for r in out.select("lang", "keep_rate").distinct().collect()
    }
    for rate in rates.values():
        assert abs(rate - 0.6) < 1e-9


def test_temperature_rebalance_arg_validation(spark):
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        temperature_rebalance,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    with pytest.raises(ValueError, match="exactly one"):
        temperature_rebalance(docs, "lang", ["doc_id"], alpha=0.5)
    with pytest.raises(ValueError, match="exactly one"):
        temperature_rebalance(
            docs, "lang", ["doc_id"], target_frac=0.5, target_total=10
        )


def test_cluster_safe_split_keeps_clusters_together(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in range(200)], "doc_id bigint, text string"
    )
    # clusters: (0,1,2) together, (10,11) together, rest singletons
    clusters = spark.createDataFrame(
        [(0, 100), (1, 100), (2, 100), (10, 200), (11, 200)],
        "doc_id bigint, cluster_id bigint",
    )
    out = cluster_safe_split(docs, "doc_id", clusters, 0.3, seed=1)
    rows = {r.doc_id: r for r in out.collect()}
    assert len(rows) == 200
    # all cluster members share a side and a key
    assert len({rows[i].split for i in (0, 1, 2)}) == 1
    assert len({rows[i].cluster_key for i in (0, 1, 2)}) == 1
    assert rows[0].cluster_key == "c:100"
    assert len({rows[i].split for i in (10, 11)}) == 1
    assert rows[50].cluster_key == "id:50"
    # both sides populated at ~30/70
    n_eval = sum(1 for r in rows.values() if r.split == "eval")
    assert 30 <= n_eval <= 90
    # deterministic and layout-independent
    again = {
        r.doc_id: r.split
        for r in cluster_safe_split(
            docs.repartition(7), "doc_id", clusters, 0.3, seed=1
        ).collect()
    }
    assert again == {k: v.split for k, v in rows.items()}


def test_cluster_safe_split_with_minhash_clusters(spark):
    """End-to-end with the real dedup ladder: planted MinHash twins
    must land on the same side of the split."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
        minhash_near_dups,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        cluster_safe_split,
    )

    base = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(40)
    twins = base.selectExpr("doc_id + 100000 AS doc_id", "text")
    docs = base.select("doc_id", "text").unionByName(twins)
    pairs = minhash_near_dups(docs)
    clusters = connected_components(pairs).select("doc_id", "cluster_id")
    out = cluster_safe_split(docs, "doc_id", clusters, 0.5, seed=2)
    sides = {r.doc_id: r.split for r in out.collect()}
    for r in base.select("doc_id").collect():
        assert sides[r.doc_id] == sides[r.doc_id + 100000], r.doc_id


def test_materialize_packs_orders_and_bounds(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        materialize_packs,
        pack_sequences,
    )

    docs = spark.createDataFrame(
        [
            (i, [f"d{i}t{j}" for j in range(3 + i % 4)])
            for i in range(30)
        ],
        "doc_id bigint, toks array<string>",
    )
    sized = docs.withColumn("n", F.size("toks").cast("bigint"))
    packed = pack_sequences(
        sized, "n", max_len=10, key_cols=["doc_id"], n_groups=4
    )
    out = materialize_packs(packed, "toks", sep_token="<eos>").collect()
    assert out
    total_docs = sum(r.n_docs for r in out)
    assert total_docs == 30  # every doc lands in exactly one pack
    by_pack = {r.pack_id: r for r in out}
    rows = {r.doc_id: r for r in packed.collect()}
    for r in out:
        # tokens + separators fit the window bound
        assert r.n_tokens <= 10 + r.n_docs  # one <eos> per member doc
        assert r.tokens.count("<eos>") == r.n_docs
        # members appear in pack_offset order
        members = sorted(
            (m for m in rows.values() if m.pack_id == r.pack_id),
            key=lambda m: m.pack_offset,
        )
        want = []
        for m in members:
            want += list(m.toks) + ["<eos>"]
        assert r.tokens == want
    assert set(by_pack) == {r.pack_id for r in rows.values()}


def test_temperature_rebalance_null_group_not_dropped(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        temperature_rebalance,
    )

    docs = spark.createDataFrame(
        [(i, "en" if i % 3 else None) for i in range(60)],
        "doc_id bigint, lang string",
    )
    out = temperature_rebalance(
        docs, "lang", ["doc_id"], alpha=0.5, target_frac=1.0, seed=0
    )
    # the null-lang group participates like any other group
    assert out.filter(F.col("lang").isNull()).count() > 0


def test_cluster_safe_split_overlapping_map_no_duplication(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        cluster_safe_split,
    )

    docs = spark.createDataFrame([(1,), (2,)], "doc_id bigint")
    overlapping = spark.createDataFrame(
        [(1, 10), (1, 20), (2, 10)], "doc_id bigint, cluster_id bigint"
    )
    out = cluster_safe_split(docs, "doc_id", overlapping, 0.5).collect()
    assert len(out) == 2  # one row per input doc, min cluster wins
    keys = {r.doc_id: r.cluster_key for r in out}
    assert keys == {1: "c:10", 2: "c:10"}


def _unimax_sequential(counts: dict, budget: int, epoch_cap: float = 1.0):
    """Reference waterfill: the obvious sequential model the operator
    must match — fill capacity-ascending; the first group whose cap
    exceeds its positional share starts the equal-split region."""
    caps = sorted(
        ((int(n * epoch_cap), g) for g, n in counts.items()),
    )
    g_total = len(caps)
    alloc = {}
    spent = 0
    for i, (cap, g) in enumerate(caps):
        remaining_groups = g_total - i
        share = (budget - spent) // remaining_groups
        take = min(cap, share)
        alloc[g] = take
        spent += take
    return alloc


def test_unimax_waterfill_allocation_properties(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        unimax_budget_sample,
    )

    counts = {"en": 700, "fr": 150, "de": 100, "ja": 30, "sw": 20}
    rows = [
        (g_i * 10_000 + i, g)
        for g_i, (g, n) in enumerate(sorted(counts.items()))
        for i in range(n)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    budget = 400
    out = unimax_budget_sample(
        df, "lang", ["doc_id"], total_budget=budget, epoch_cap=1.0, seed=3
    )
    alloc = {
        r.lang: r.alloc
        for r in out.select("lang", "alloc").distinct().collect()
    }
    want = _unimax_sequential(counts, budget)
    # groups with zero allocation keep no rows and so can't be read
    # back from the output — compare the nonzero allocations
    assert alloc == {g: a for g, a in want.items() if a > 0}
    # budget respected; tails full; heads split equally
    assert sum(want.values()) <= budget
    assert want["sw"] == 20 and want["ja"] == 30
    assert want["en"] == want["fr"]  # waterlined heads get equal share
    assert want["de"] == 100  # cap under the line -> full
    # kept fraction tracks alloc/n per group (hash predicate)
    kept = {r.lang: r.cnt for r in out.groupBy("lang").agg(
        F.count("*").alias("cnt")).collect()}
    for g, a in alloc.items():
        assert abs(kept[g] - a) <= max(10, 0.3 * a), (g, kept[g], a)


def test_unimax_epoch_cap_over_one_keeps_all_and_reports_epochs(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        unimax_budget_sample,
    )

    rows = [(i, "big" if i < 400 else "tiny") for i in range(440)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string")
    # epoch_cap=3: the tiny group may be allocated up to 3 epochs; the
    # budget splits equally, so tiny's alloc (120) exceeds its 40 rows
    out = unimax_budget_sample(
        df, "lang", ["doc_id"], total_budget=240, epoch_cap=3.0, seed=1
    )
    tiny = out.filter("lang = 'tiny'")
    assert tiny.count() == 40  # keep_rate caps at 1 -> all rows kept
    ep = tiny.select("epochs").distinct().collect()
    assert len(ep) == 1 and ep[0].epochs == 3.0
    import pytest

    with pytest.raises(ValueError, match="total_budget"):
        unimax_budget_sample(df, "lang", ["doc_id"], total_budget=0)
    with pytest.raises(ValueError, match="epoch_cap"):
        unimax_budget_sample(
            df, "lang", ["doc_id"], total_budget=10, epoch_cap=0
        )


def test_epoch_shards_loader_contract(spark):
    """epoch_shards (round 12): every doc appears exactly once per
    epoch, positions are dense 1..len(shard) per shard, shards are
    hash-balanced, and different epochs produce different layouts."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        epoch_shards,
    )

    docs = spark.range(400).select(F.col("id").alias("doc_id"))
    e0 = epoch_shards(docs, ["doc_id"], seed=0, n_shards=8).collect()
    assert len(e0) == 400
    assert sorted(r["doc_id"] for r in e0) == list(range(400))
    by_shard: dict = {}
    for r in e0:
        by_shard.setdefault(r["shard"], []).append(r["pos"])
    assert set(by_shard) <= set(range(8))
    for poss in by_shard.values():
        assert sorted(poss) == list(range(1, len(poss) + 1))
    sizes = [len(v) for v in by_shard.values()]
    assert max(sizes) - min(sizes) < 200  # hash balance, loose bound
    # determinism + epoch sensitivity
    e0b = epoch_shards(docs, ["doc_id"], seed=0, n_shards=8).collect()
    assert sorted(map(str, e0)) == sorted(map(str, e0b))
    e1 = {r["doc_id"]: (r["shard"], r["pos"])
          for r in epoch_shards(docs, ["doc_id"], seed=1, n_shards=8).collect()}
    moved = sum(1 for r in e0 if e1[r["doc_id"]] != (r["shard"], r["pos"]))
    assert moved > 300  # a new seed is a genuinely new permutation
