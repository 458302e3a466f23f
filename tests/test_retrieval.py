"""Tests: BM25 lexical retrieval."""

from __future__ import annotations

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
    bm25_search,
)


def _corpus(spark):
    rows = [
        (1, ["spark", "shuffle", "join", "the", "the"]),
        (2, ["spark", "spark", "spark", "table", "the"]),
        (3, ["join", "merge", "table", "the", "a"]),
        # long doc with one hit: length normalization should rank it
        # below a short doc with the same tf
        (4, ["spark"] + ["filler"] * 40),
        (5, ["unrelated", "words", "only", "here", "now"]),
    ]
    return spark.createDataFrame(rows, "doc_id bigint, t array<string>")


def test_bm25_ranks_rare_term_matches_first(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(1, ["spark"]), (2, ["join", "merge"])],
        "query_id bigint, q array<string>",
    )
    out = bm25_search(docs, queries, k=3)
    got = {
        (r.query_id, r.rnk): r.doc_id
        for r in out.collect()
    }
    # q1 'spark': doc 2 (tf=3, short) beats doc 1 (tf=1) and doc 4
    # (tf=1 but 41 tokens — length-normalized down)
    assert got[(1, 1)] == 2
    assert got[(1, 2)] == 1
    assert got[(1, 3)] == 4
    # q2 'join merge': doc 3 matches both terms, doc 1 only 'join'
    assert got[(2, 1)] == 3
    assert got[(2, 2)] == 1
    # doc 5 never appears for either query
    assert 5 not in set(got.values())


def test_bm25_k_bound_and_determinism(spark):
    docs = _corpus(spark)
    queries = spark.createDataFrame(
        [(7, ["the", "table"])], "query_id bigint, q array<string>"
    )
    a = bm25_search(docs, queries, k=2).collect()
    assert len(a) == 2
    assert [r.rnk for r in sorted(a, key=lambda r: r.rnk)] == [1, 2]
    b = bm25_search(docs.repartition(5), queries, k=2).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_bm25_repeated_query_terms_count_once(spark):
    docs = _corpus(spark)
    q1 = spark.createDataFrame(
        [(1, ["spark", "spark", "spark"])], "query_id bigint, q array<string>"
    )
    q2 = spark.createDataFrame(
        [(1, ["spark"])], "query_id bigint, q array<string>"
    )
    a = sorted(map(tuple, bm25_search(docs, q1, k=5).collect()))
    b = sorted(map(tuple, bm25_search(docs, q2, k=5).collect()))
    assert a == b


def test_bm25_index_merge_equals_full_rebuild(spark, tmp_dir):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_index,
        bm25_search_with,
        merge_bm25_index,
    )

    docs = _corpus(spark)
    day1 = docs.filter("doc_id <= 3")
    day2 = docs.filter("doc_id > 3")
    # persist day-1 index, read back, merge with day-2 batch
    tf1, dl1 = bm25_index(day1)
    tf1.write.mode("overwrite").parquet(f"{tmp_dir}/tf1")
    dl1.write.mode("overwrite").parquet(f"{tmp_dir}/dl1")
    restored = (
        spark.read.parquet(f"{tmp_dir}/tf1"),
        spark.read.parquet(f"{tmp_dir}/dl1"),
    )
    merged = merge_bm25_index(restored, bm25_index(day2))
    full = bm25_index(docs)
    for m, f in zip(merged, full):
        assert sorted(map(tuple, m.collect())) == sorted(
            map(tuple, f.collect())
        )
    # and the search over the merged index matches the fused operator
    queries = spark.createDataFrame(
        [(1, ["spark"]), (2, ["join", "merge"])],
        "query_id bigint, q array<string>",
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_search,
    )

    a = sorted(map(tuple, bm25_search_with(merged, queries, k=3).collect()))
    b = sorted(map(tuple, bm25_search(docs, queries, k=3).collect()))
    assert a == b


def test_rrf_fuse_integer_scores_and_ranking(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        rrf_fuse,
    )

    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 20, 2), (1, 30, 3)],
        "query_id bigint, doc_id bigint, rnk bigint",
    )
    den = spark.createDataFrame(
        [(1, 20, 1), (1, 40, 2)],
        "query_id bigint, doc_id bigint, rnk bigint",
    )
    out = {r.doc_id: r for r in rrf_fuse([lex, den], topk=4).collect()}
    # doc 20 appears in both lists (ranks 2 and 1) and must win
    assert out[20].rnk == 1 and out[20].n_lists == 2
    # exact integer RRF: 10^8 // 62 + 10^8 // 61
    assert out[20].rrf_fp == 100_000_000 // 62 + 100_000_000 // 61
    assert out[10].rrf_fp == 100_000_000 // 61 and out[10].n_lists == 1
    # single-list docs rank below the fused doc but keep list order
    ranked = sorted(out.values(), key=lambda r: r.rnk)
    assert [r.doc_id for r in ranked] == [20, 10, 40, 30]


def test_rrf_fuse_validation_and_topk(spark):
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        rrf_fuse,
    )

    with pytest.raises(ValueError, match="at least one"):
        rrf_fuse([], topk=3)
    one = spark.createDataFrame(
        [(1, i, i) for i in range(1, 9)],
        "query_id bigint, doc_id bigint, rnk bigint",
    )
    assert rrf_fuse([one], topk=3).count() == 3


def test_bm25_bucketed_index_prunes_and_matches(spark, tmp_dir):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_index,
        bm25_search_indexed,
        bm25_search_with,
        write_bm25_index,
    )

    docs = _corpus(spark)
    write_bm25_index(spark, bm25_index(docs), f"{tmp_dir}/idx", n_term_buckets=16)
    queries = spark.createDataFrame(
        [(1, ["spark"]), (2, ["join", "merge"])],
        "query_id bigint, q array<string>",
    )
    pruned = bm25_search_indexed(spark, f"{tmp_dir}/idx", queries, k=3)
    flat = bm25_search_with(
        (
            spark.read.parquet(f"{tmp_dir}/idx/tf").drop("term_bucket"),
            spark.read.parquet(f"{tmp_dir}/idx/dl"),
        ),
        queries,
        k=3,
    )
    assert sorted(map(tuple, pruned.collect())) == sorted(
        map(tuple, flat.collect())
    )
    # the pruning is real: the tf scan carries a DYNAMIC partition
    # filter on term_bucket (a dynamicpruning subquery from the
    # broadcast query-term side — not a post-scan filter)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    import re

    pf = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert pf and "term_bucket" in pf.group(1), plan[:2000]
    assert "dynamicpruning" in pf.group(1)


def test_mmr_rerank_diversifies_and_degenerates_to_topk(spark):
    """lam=1 must equal plain top-k by score; at lam=0.5 a
    near-duplicate of the top hit is displaced by an orthogonal doc;
    selection is deterministic under repartitioning."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        mmr_rerank,
    )

    rows = [
        (1, 10, 1.00, [1.0, 0.0, 0.0, 0.0]),
        (1, 11, 0.99, [1.0, 0.0, 0.0, 0.0]),   # near-dup of 10
        (1, 12, 0.90, [0.0, 1.0, 0.0, 0.0]),   # orthogonal
        (1, 13, 0.10, [0.0, 0.0, 1.0, 0.0]),
        (2, 20, 0.50, [0.0, 0.0, 0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id bigint, doc_id bigint, score double, "
        "embedding array<double>",
    )
    plain = mmr_rerank(df, k=2, lam=1.0)
    got1 = {
        (r.query_id, r.mmr_rank): r.doc_id for r in plain.collect()
    }
    assert got1[(1, 1)] == 10 and got1[(1, 2)] == 11  # pure score order
    assert got1[(2, 1)] == 20

    div = mmr_rerank(df, k=2, lam=0.5)
    got2 = {
        (r.query_id, r.mmr_rank): r.doc_id for r in div.collect()
    }
    # 11's MMR value: 0.5*0.99 - 0.5*1.0 < 0.5*0.90 - 0.5*0.0 -> 12 wins
    assert got2[(1, 1)] == 10 and got2[(1, 2)] == 12
    # first pick reports no prior similarity; second reports its sim
    prior = {
        (r.query_id, r.mmr_rank): r.max_sim_prior for r in div.collect()
    }
    assert prior[(1, 1)] == -1.0
    assert abs(prior[(1, 2)] - 0.0) < 1e-12

    re = mmr_rerank(df.repartition(5, "doc_id"), k=2, lam=0.5)
    assert sorted(map(tuple, re.collect())) == sorted(
        map(tuple, div.collect())
    )


def test_mmr_monotone_value_with_anticorrelated_no_selfmatch(spark):
    """Adversarial case for the monotone-`mmr_value` invariant: no
    self-match in the pool (top relevance < 1) plus a strongly
    anti-correlated candidate. Under the old two-formula objective
    (rank 1 = raw relevance, rank ≥ 2 unclamped penalty) the rank-2
    value 0.5·0.5 − 0.5·(−1) = 0.75 would EXCEED the rank-1 value
    0.6 and flip `ok` false on correct output; the unified clamped
    objective keeps the chain non-increasing."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        mmr_rerank,
    )

    rows = [
        (1, 10, 0.60, [1.0, 0.0]),
        (1, 11, 0.50, [-1.0, 0.0]),  # cosine to 10 = -1
        (1, 12, 0.40, [0.0, 1.0]),
    ]
    df = spark.createDataFrame(
        rows,
        "query_id bigint, doc_id bigint, score double, "
        "embedding array<double>",
    )
    out = sorted(
        mmr_rerank(df, k=3, lam=0.5).collect(),
        key=lambda r: r.mmr_rank,
    )
    vals = [r.mmr_value for r in out]
    assert vals == sorted(vals, reverse=True), vals
    # rank 1 records the unified objective lam*rel, not raw rel
    assert abs(vals[0] - 0.5 * 0.60) < 1e-12
    # anti-correlated 11 earns no bonus: its penalty clamps to 0,
    # value 0.25 ≥ 12's 0.20 -> selection order 10, 11, 12
    assert [r.doc_id for r in out] == [10, 11, 12]


def test_mmr_catalog_probe_invariants_all_ok(spark):
    """Every row of the r_mmr_rerank catalog probe must carry a true
    `ok` (rank-1 max-relevance + non-increasing greedy value)."""
    import __spark_entry__ as entry

    from tests.conftest import SF_DIR

    df = entry.queries()["r_mmr_rerank"](spark, SF_DIR)
    rows = df.collect()
    assert rows
    assert all(r.ok for r in rows)


def test_bm25_index_remove_equals_rebuild(spark):
    """Index deletes: pruning a doc's rows equals rebuilding from the
    survivors, and search results re-rank accordingly (the removed
    doc leaves, idf/avgdl shift with it)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.retrieval import (
        bm25_index,
        bm25_index_remove,
        bm25_search_with,
    )

    toked = spark.createDataFrame(
        [
            (1, ["spark", "joins", "shuffle"]),
            (2, ["spark", "streams", "state"]),
            (3, ["duck", "oracle", "joins"]),
        ],
        "doc_id long, t array<string>",
    )
    idx = bm25_index(toked)
    idx = (idx[0].localCheckpoint(), idx[1].localCheckpoint())
    rm = spark.createDataFrame([(2,)], "doc_id long")
    pruned = bm25_index_remove(idx, rm)
    rebuilt = bm25_index(toked.filter("doc_id <> 2"))
    for got, want in zip(pruned, rebuilt):
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, want.collect())
        )

    q = spark.createDataFrame(
        [(1, ["spark", "joins"])], "query_id long, q array<string>"
    )
    res = bm25_search_with(pruned, q, k=3).collect()
    assert [r["doc_id"] for r in res][0] == 1
    assert all(r["doc_id"] != 2 for r in res)
    # identical to searching the rebuilt index
    res_rb = bm25_search_with(rebuilt, q, k=3).collect()
    assert [(r["doc_id"], r["score_fp"] if "score_fp" in r.__fields__ else r[2]) for r in res] == [
        (r["doc_id"], r["score_fp"] if "score_fp" in r.__fields__ else r[2]) for r in res_rb
    ]


def test_bm25_search_materialize_false_identical(spark):
    """materialize=False (round 14: callers that already hand in a
    checkpointed corpus skip the internal re-checkpoint) must not
    change a single row."""
    docs = _corpus(spark)
    queries = docs.sparkSession.createDataFrame(
        [(1, ["spark"]), (2, ["join", "merge"])],
        "query_id bigint, q array<string>",
    )
    a = sorted(map(tuple, bm25_search(docs, queries, k=3).collect()))
    b = sorted(
        map(
            tuple,
            bm25_search(
                docs.localCheckpoint(eager=False),
                queries,
                k=3,
                materialize=False,
            ).collect(),
        )
    )
    assert a == b
