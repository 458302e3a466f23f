"""Tests: sources/sinks (S1-S10) — the CSV dialect, junk-header text
records (FIXTURES.md B3), path-derived columns, partitioned parquet
with pruning, warehouse tables."""

from __future__ import annotations

from pathlib import Path

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
    create_warehouse_table,
    literal_table,
    read_csv_dialect,
    read_delimited_text,
    with_path_segment,
    write_csv,
    write_parquet,
)

# FIXTURES.md B3: ECA&D-style junk headers, arity noise, repeated
# header token mid-file.
ECA_TEXT = """\
EUROPEAN CLIMATE ASSESSMENT & DATASET
this is a free-text preamble line

STAID, SOUID,    DATE,   TG, Q_TG
  593,100842,20210101,  -13,    0
  593,100842,20210102,   25,    0
STAID, SOUID,    DATE,   TG, Q_TG
  593,100842,20210103,   40,    0
"""


def test_read_csv_dialect_multiline_quoted(spark, tmp_dir):
    raw = 'id;comments\n1;"line one\nline two"\n2;plain\n'
    p = Path(tmp_dir) / "reviews.csv"
    p.write_text(raw)
    df = read_csv_dialect(spark, str(p), sep=";", schema="id int, comments string")
    got = {r.id: r.comments for r in df.collect()}
    assert got[1] == "line one\nline two"
    assert got[2] == "plain"


def test_read_delimited_text_skips_junk(spark, tmp_dir):
    p = Path(tmp_dir) / "TG_STAID000593.txt"
    p.write_text(ECA_TEXT)
    df = read_delimited_text(
        spark,
        str(p),
        field_names=["STAID", "SOUID", "DATE", "TG", "Q_TG"],
        header_token="STAID",
    )
    rows = df.collect()
    assert len(rows) == 3
    assert {r.DATE for r in rows} == {"20210101", "20210102", "20210103"}
    assert all(r.STAID == "593" for r in rows)


def test_with_path_segment(spark, tmp_dir):
    d = Path(tmp_dir) / "cities" / "amsterdam" / "2021-01"
    d.mkdir(parents=True)
    (d / "listings.csv").write_text("id\n1\n")
    df = read_csv_dialect(spark, str(d / "listings.csv"), schema="id int")
    out = with_path_segment(df, "city", -3)
    assert out.collect()[0].city == "amsterdam"


def test_partitioned_parquet_prunes(spark, tmp_dir):
    df = spark.createDataFrame(
        [(1, 2021, 1), (2, 2021, 2), (3, 2022, 1)], "id int, year int, month int"
    )
    out = f"{tmp_dir}/part"
    write_parquet(df, out, partition_by=["year", "month"])
    back = spark.read.parquet(out)
    pruned = back.filter("year = 2021 AND month = 2")
    assert [r.id for r in pruned.collect()] == [2]
    # partition pruning visible in the physical plan
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan or "partition" in plan.lower()


def test_csv_sink_roundtrip(spark, tmp_dir):
    df = spark.createDataFrame([(1, 'say "hi"\nok')], "id int, body string")
    out = f"{tmp_dir}/csvout"
    write_csv(df, out)
    back = read_csv_dialect(spark, out, schema="id int, body string")
    assert back.collect()[0].body == 'say "hi"\nok'


def test_literal_table_and_warehouse(spark, tmp_dir):
    dim = literal_table(
        spark, [(593, "Amsterdam"), (41, "Berlin")], "STAID int, city string"
    )
    create_warehouse_table(spark, dim, "stations")
    got = spark.sql("SELECT city FROM stations WHERE STAID = 593").collect()
    assert got[0].city == "Amsterdam"
    spark.sql("DROP TABLE stations")


def test_glob_multi_file_scan(spark, tmp_dir):
    """S2 — wildcard path patterns across month directories."""
    for month, ids in [("2021-01", [1, 2]), ("2021-02", [3])]:
        d = Path(tmp_dir) / "cities" / "berlin" / month
        d.mkdir(parents=True)
        (d / "listings.csv").write_text("id\n" + "\n".join(map(str, ids)) + "\n")
    df = read_csv_dialect(
        spark, f"{tmp_dir}/cities/*/*/listings.csv", schema="id int"
    )
    assert sorted(r.id for r in df.collect()) == [1, 2, 3]


def test_json_roundtrip(spark, tmp_dir):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        read_json,
        write_json,
    )

    df = spark.createDataFrame([(1, {"a": 2.5})], "id int, props map<string,double>")
    write_json(df, f"{tmp_dir}/j")
    back = read_json(spark, f"{tmp_dir}/j", schema="id int, props map<string,double>")
    row = back.collect()[0]
    assert row.id == 1 and row.props["a"] == 2.5


def test_csv_rejects_quarantined_not_fatal(spark, tmp_dir):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        read_csv_with_rejects,
    )

    p = Path(tmp_dir) / "dirty.csv"
    p.write_text("id,price\n1,9.5\nnot_a_number,abc\n3,7.25\n")
    df = read_csv_with_rejects(spark, str(p), "id int, price double").cache()
    good = df.filter("_corrupt_record IS NULL")
    bad = df.filter("_corrupt_record IS NOT NULL")
    assert sorted(r.id for r in good.collect()) == [1, 3]
    assert bad.count() == 1
    assert "not_a_number" in bad.collect()[0]._corrupt_record


def test_orc_roundtrip_with_pushdown(spark, tmp_dir):
    """ORC sink/source round-trip preserving schema; predicates reach
    the ORC reader like they do for parquet."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        read_orc,
        write_orc,
    )
    from tests.conftest import SF_DIR

    src = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    write_orc(src, f"{tmp_dir}/nation_orc")
    back = read_orc(spark, f"{tmp_dir}/nation_orc")
    assert back.schema == src.schema
    assert back.count() == src.count()
    plan = back.filter("n_regionkey = 2")._jdf.queryExecution().executedPlan().toString()
    assert "n_regionkey" in plan and "PushedFilters" in plan


def test_compact_output_bounds_file_count(spark, tmp_dir):
    """compact_output must write ceil(rows/target) data files, not one
    per shuffle partition."""
    from pathlib import Path

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        compact_output,
    )

    df = spark.range(1000).repartition(16).toDF("id")
    compact_output(df, f"{tmp_dir}/compacted", target_rows_per_file=400)
    files = [p for p in Path(f"{tmp_dir}/compacted").glob("*.parquet")]
    assert len(files) == 3  # ceil(1000/400)
    assert spark.read.parquet(f"{tmp_dir}/compacted").count() == 1000


def test_read_parquet_evolving_merges_schemas(spark, tmp_dir):
    """Old files lack the late-added column: the merged read surfaces
    it as null for them (column addition only - type changes are
    align_union's job)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        read_parquet_evolving,
    )

    p = f"{tmp_dir}/evolving"
    spark.createDataFrame([(1, 10)], "id bigint, v bigint").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame(
        [(2, 20, "new")], "id bigint, v bigint, tag string"
    ).write.mode("append").parquet(p)

    df = read_parquet_evolving(spark, p)
    assert dict(df.dtypes) == {"id": "bigint", "v": "bigint", "tag": "string"}
    rows = {r.id: (r.v, r.tag) for r in df.collect()}
    assert rows == {1: (10, None), 2: (20, "new")}


def test_read_parquet_evolving_widens_and_renames(spark, tmp_dir):
    """The other two schema-evolution cases a long-lived table hits:
    files written under a NARROW type read under the evolved wide one
    (int→bigint, float→double), and a renamed column's two
    generations coalesce into the new name."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        read_parquet_evolving,
    )

    p = f"{tmp_dir}/evolving_wr"
    # generation 1: id int, qty int, score float
    spark.createDataFrame(
        [(1, 10, 1.5), (2, 20, 2.5)], "id int, qty int, score float"
    ).write.mode("append").parquet(p)
    # generation 2: id widened to bigint, qty renamed to quantity
    # (bigint), score widened to double, late-added tag
    spark.createDataFrame(
        [(3_000_000_000, 30, 3.5, "new")],
        "id bigint, quantity bigint, score double, tag string",
    ).write.mode("append").parquet(p)

    df = read_parquet_evolving(
        spark,
        p,
        schema="id bigint, quantity bigint, score double, tag string",
        renames={"qty": "quantity"},
    )
    assert dict(df.dtypes) == {
        "id": "bigint", "quantity": "bigint",
        "score": "double", "tag": "string",
    }
    rows = {r.id: (r.quantity, float(r.score), r.tag) for r in df.collect()}
    assert rows == {
        1: (10, 1.5, None),
        2: (20, 2.5, None),
        3_000_000_000: (30, 3.5, "new"),
    }


def test_read_parquet_evolving_rename_only_via_merge(spark, tmp_dir):
    """Rename without an explicit schema rides mergeSchema: both
    generations' columns union, then coalesce under the new name."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.io import (
        read_parquet_evolving,
    )

    p = f"{tmp_dir}/evolving_r"
    spark.createDataFrame([(1, 10)], "id bigint, qty bigint").write.mode(
        "append"
    ).parquet(p)
    spark.createDataFrame([(2, 20)], "id bigint, quantity bigint").write.mode(
        "append"
    ).parquet(p)
    df = read_parquet_evolving(spark, p, renames={"qty": "quantity"})
    assert "qty" not in df.columns
    rows = {r.id: r.quantity for r in df.collect()}
    assert rows == {1: 10, 2: 20}
