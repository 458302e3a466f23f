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
