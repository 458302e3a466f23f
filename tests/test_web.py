"""URL canonicalization / domain curation (functions.web, operators.web)."""

from __future__ import annotations

import duckdb
import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions.web import (
    canonicalize_url_sql,
    registered_domain_sql,
    url_host_sql,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.web import (
    blocklist_filter,
    domain_cap,
    with_domain,
)

CASES = [
    # (raw, canonical, host, registered domain)
    (
        "https://WWW.Example.COM:443/A/b/?utm_source=f&id=7&utm_campaign=x#frag",
        "https://www.example.com/A/b/?id=7",
        "www.example.com",
        "example.com",
    ),
    ("http://example.com:80/path/", "http://example.com/path",
     "example.com", "example.com"),
    # non-default port and userinfo survive; host still lowers
    ("HTTP://USER:pw@Example.co.uk:8080/Path?gclid=abc",
     "http://user:pw@example.co.uk:8080/Path",
     "example.co.uk", "example.co.uk"),
    # tracking-only query → dropped entirely, then trailing slash
    ("https://example.com/?utm_source=a", "https://example.com",
     "example.com", "example.com"),
    ("https://example.com/", "https://example.com",
     "example.com", "example.com"),
    # leading tracking params repair the separator for the survivor
    ("https://a.com/x?utm_a=1&utm_b=2&q=3", "https://a.com/x?q=3",
     "a.com", "a.com"),
    ("https://sub.shop.example.com/p?id=1&ref=x&fbclid=z",
     "https://sub.shop.example.com/p?id=1",
     "sub.shop.example.com", "example.com"),
    # path/query case is content — preserved
    ("https://b.org/CaseSensitive?Q=Up", "https://b.org/CaseSensitive?Q=Up",
     "b.org", "b.org"),
    # slash inside a query value is content — trailing / kept
    ("https://c.io/p?path=/a/", "https://c.io/p?path=/a/", "c.io", "c.io"),
    ("https://b.org:443", "https://b.org", "b.org", "b.org"),
    # userinfo contains ':' — the default port must still collapse so
    # the URL dedup-keys with its portless variant
    ("https://user:pw@d.net:443/x", "https://user:pw@d.net/x",
     "d.net", "d.net"),
    ("http://token@d.net:80/x", "http://token@d.net/x",
     "d.net", "d.net"),
    ("https://localhost/x", "https://localhost/x", "localhost", "localhost"),
    ("not a url", "not a url", "", ""),
]


@pytest.fixture(scope="module")
def canon_rows(spark):
    df = spark.createDataFrame([(c[0],) for c in CASES], ["u"])
    canon = canonicalize_url_sql("u", "spark")
    return df.selectExpr(
        "u",
        f"{canon} AS canon",
        f"{url_host_sql(canon)} AS host",
        f"{registered_domain_sql(url_host_sql(canon))} AS dom",
    ).collect()


def test_canonicalize_cases(canon_rows):
    got = {r["u"]: (r["canon"], r["host"], r["dom"]) for r in canon_rows}
    for raw, canon, host, dom in CASES:
        assert got[raw] == (canon, host, dom), raw


def test_canonicalize_duckdb_parity(canon_rows):
    """The generated SQL is the oracle contract: byte-identical output
    under DuckDB for every case."""
    canon = canonicalize_url_sql("u", "duckdb")
    host = url_host_sql(canon)
    dom = registered_domain_sql(host)
    for r in canon_rows:
        (d,) = duckdb.sql(
            f"SELECT {canon}, {host}, {dom} FROM (SELECT ? AS u)",
            params=[r["u"]],
        ).fetchall()
        assert d == (r["canon"], r["host"], r["dom"]), r["u"]


def test_canonicalize_idempotent(spark, canon_rows):
    """Canonicalizing a canonical URL is a no-op — the property that
    makes the canonical form a safe dedup key."""
    df = spark.createDataFrame([(r["canon"],) for r in canon_rows], ["u"])
    again = df.selectExpr(
        "u", f"{canonicalize_url_sql('u', 'spark')} AS c"
    ).collect()
    for r in again:
        assert r["c"] == r["u"]


def test_canonicalizer_is_scan_stage(spark):
    """Zero exchanges: the whole canonicalize→host→domain chain is
    expression work inside one WholeStageCodegen span."""
    df = spark.createDataFrame([("https://A.com/x",)], ["u"])
    out = with_domain(
        df.select(F.expr(canonicalize_url_sql("u", "spark")).alias("c")), "c"
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_domain_cap_exact_and_deterministic(spark):
    rows = [(i, f"d{i % 3}.com") for i in range(60)]
    df = spark.createDataFrame(rows, ["doc_id", "domain"])
    capped = domain_cap(df, "domain", 5, ["doc_id"])
    out = capped.collect()
    per = {}
    for r in out:
        per.setdefault(r["domain"], []).append(r["doc_id"])
    assert all(len(v) == 5 for v in per.values())
    # repartitioned input keeps the SAME documents
    out2 = domain_cap(df.repartition(7), "domain", 5, ["doc_id"]).collect()
    assert {(r["doc_id"], r["domain"]) for r in out} == {
        (r["doc_id"], r["domain"]) for r in out2
    }


def test_blocklist_filter_broadcast_anti(spark):
    df = spark.createDataFrame(
        [(1, "good.com"), (2, "bad.com"), (3, "good.com")],
        ["doc_id", "domain"],
    )
    blocked = spark.createDataFrame([("bad.com",)], ["domain"])
    out = blocklist_filter(df, "domain", blocked)
    assert sorted(r["doc_id"] for r in out.collect()) == [1, 3]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
