

def test_subtract_lm_counts_equals_rebuild_and_guards(spark):
    """Abelian delete for the LM ledger: subtracting the removed
    docs' own counts equals rebuilding from the survivors; zero-count
    terms drop; a non-subset subtraction raises instead of shipping a
    corrupt LM."""
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        merge_lm_counts,
        subtract_lm_counts,
        unigram_lm_counts,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta beta gamma"),
            (2, "beta gamma delta"),
            (3, "alpha epsilon"),
        ],
        "doc_id long, text string",
    )
    toked = docs.selectExpr(
        "doc_id",
        "filter(split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')),"
        " ' '), x -> x != '') AS t",
    )
    base = unigram_lm_counts(toked).localCheckpoint()
    removed = unigram_lm_counts(toked.filter("doc_id = 2"))
    got = subtract_lm_counts(base, removed)
    want = unigram_lm_counts(toked.filter("doc_id <> 2"))
    assert sorted(map(tuple, got.collect())) == sorted(
        map(tuple, want.collect())
    )
    # 'delta' (only in doc 2) is GONE, not present with cnt 0
    assert got.filter("term = 'delta'").count() == 0

    # subtracting the same delta twice is a non-subset -> loud error
    once = subtract_lm_counts(base, removed).localCheckpoint()
    with pytest.raises(ValueError, match="negative"):
        subtract_lm_counts(once, removed).collect()

    # add-then-remove round-trips through merge_lm_counts
    day2 = unigram_lm_counts(toked.filter("doc_id = 3"))
    grown = merge_lm_counts(base, day2)
    back = subtract_lm_counts(grown, day2)
    assert sorted(map(tuple, back.collect())) == sorted(
        map(tuple, base.collect())
    )
