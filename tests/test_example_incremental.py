"""Tests: the incremental daily-crawl DAG — bootstrap, cross-day twin
dropping via the persisted index, and replay idempotence."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.incremental import (
    build_pipeline,
)
from tests.conftest import SF_DIR


def test_incremental_pipeline_days(spark, tmp_dir):
    pipe = build_pipeline(SF_DIR, f"{tmp_dir}/inc")

    # day 0: bootstrap — corpus is the first batch's survivors
    run0 = pipe.run(spark, "0:200")
    day0 = run0.results["published"]
    n0 = day0.count()
    assert n0 > 0
    day0_ids = {r.doc_id for r in day0.select("doc_id").collect()}
    assert day0_ids <= set(range(0, 200))

    # day 1: new slice — corpus strictly grows, all ids unique
    run1 = pipe.run(spark, "200:350")
    day1 = run1.results["published"]
    n1 = day1.count()
    assert n1 > n0
    assert day1.select("doc_id").distinct().count() == n1

    # day 2 replay of day 0's documents: every batch doc is already
    # in the corpus verbatim, so the index probe drops them all and
    # the published corpus is unchanged — replay idempotence.
    run2 = pipe.run(spark, "0:200")
    day2 = run2.results["published"]
    # unchanged count == the replayed batch contributed zero rows
    # (published = corpus ∪ batch_deduped, ids unique-gated). The
    # batch_deduped handle itself is stale post-swap by the
    # atomic_publish caveat — don't count it here.
    assert day2.count() == n1


def test_incremental_drops_cross_day_twins(spark, tmp_dir):
    """A day-2 document that verbatim-copies a day-1 document (under a
    fresh id) must be caught by the index probe, not ingested."""
    workdir = f"{tmp_dir}/inc_twins"
    pipe = build_pipeline(SF_DIR, workdir)
    pipe.run(spark, "0:100")

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    twins = docs.filter(F.col("doc_id") < 3).select(
        (F.col("doc_id") + 50000).alias("doc_id"), "text", "lang", "source"
    )
    # splice the twins in as "the next day's batch" by running the
    # novel stage directly against the published index
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        dedup_against_index,
    )

    hits = dedup_against_index(
        twins,
        spark.read.parquet(f"{workdir}/index/buckets"),
        spark.read.parquet(f"{workdir}/index/shingles"),
    )
    assert {r.new_id for r in hits.collect()} == {50000, 50001, 50002}
    # and each twin matched its original
    assert {(r.new_id - 50000) == r.corpus_id for r in hits.collect()} == {True}


@pytest.mark.slow
def test_incremental_lm_ledger_tracks_corpus_and_survives_replay(spark, tmp_dir):
    """The period-partitioned LM ledger folds to exactly the LM of the
    published corpus after every period, INCLUDING a replayed one
    (the replay rewrites its partition with identical content — never
    double-counts)."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        unigram_lm_counts,
    )

    pipe = build_pipeline(SF_DIR, f"{tmp_dir}/inc_lm")
    toks = (
        "filter(split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), "
        "' '), x -> x != '')"
    )

    def corpus_lm(corpus):
        toked = corpus.select("doc_id", F.expr(toks).alias("t"))
        return {
            r.term: r.cnt
            for r in unigram_lm_counts(toked, "t", "doc_id").collect()
        }

    r0 = pipe.run(spark, "0:150")
    assert {r.term: r.cnt for r in r0.results["lm"].collect()} == corpus_lm(
        r0.results["published"]
    )
    r1 = pipe.run(spark, "150:300")
    lm1 = {r.term: r.cnt for r in r1.results["lm"].collect()}
    assert lm1 == corpus_lm(r1.results["published"])
    # replay of period 0: corpus unchanged, ledger partition rewritten
    # identically → the folded LM is byte-for-byte the same
    r2 = pipe.run(spark, "0:150")
    assert {r.term: r.cnt for r in r2.results["lm"].collect()} == lm1


@pytest.mark.slow
def test_incremental_hll_ledger_folds_to_direct_and_survives_replay(
    spark, tmp_dir
):
    """The period-partitioned HLL ledger must fold to EXACTLY the
    direct (one-shot) ledger over the published corpus after every
    period — split-build-then-union and direct-build are bit-exact for
    DataSketches HLL — and a replayed period rewrites its partition
    with identical sketches, so estimates never move."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
        hll_ledger,
        ledger_estimates,
    )

    pipe = build_pipeline(SF_DIR, f"{tmp_dir}/inc_hll")

    def direct(corpus):
        led = hll_ledger(corpus, ["source"], ["doc_id", "lang"])
        return {
            r.source: (r.n_rows, r.doc_id_distinct, r.lang_distinct)
            for r in ledger_estimates(led, ["source"]).collect()
        }

    r0 = pipe.run(spark, "0:150")
    got0 = {
        r.source: (r.n_rows, r.doc_id_distinct, r.lang_distinct)
        for r in r0.results["ledger"].collect()
    }
    assert got0 == direct(r0.results["published"])

    r1 = pipe.run(spark, "150:300")
    got1 = {
        r.source: (r.n_rows, r.doc_id_distinct, r.lang_distinct)
        for r in r1.results["ledger"].collect()
    }
    assert got1 == direct(r1.results["published"])

    # replay of period 0: corpus unchanged, the period's ledger
    # partition rewrites byte-identically -> the fold is unchanged
    r2 = pipe.run(spark, "0:150")
    got2 = {
        r.source: (r.n_rows, r.doc_id_distinct, r.lang_distinct)
        for r in r2.results["ledger"].collect()
    }
    assert got2 == got1


@pytest.mark.slow
def test_incremental_profile_ledger_folds_to_direct_and_survives_replay(
    spark, tmp_dir
):
    """The period-partitioned profile ledger (histogram + bottom-k)
    must fold to EXACTLY the direct one-shot build over the published
    corpus after every period — bin counts are exact integers and the
    periods partition doc_id space, so split-build-then-merge and
    direct-build are bit-exact for the quantiles AND the sample — and
    a replayed period rewrites its partition deterministically, so
    the serving view never moves."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.bottomk import (
        bottomk_ledger,
        ledger_distinct_estimate,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.histogram import (
        histogram_ledger,
        ledger_quantiles,
    )

    pipe = build_pipeline(SF_DIR, f"{tmp_dir}/inc_prof")

    def direct(corpus):
        hist = histogram_ledger(
            corpus.withColumn("len_chars", F.length("text").cast("double")),
            ["source"],
            "len_chars",
            0.0,
            1000.0,
            40,
        )
        hq = {
            r.source: (r.n_rows, r.q50, r.q95)
            for r in ledger_quantiles(
                hist, ["source"], 0.0, 1000.0, [0.5, 0.95]
            ).collect()
        }
        sk = {
            r.source: (r.sample_size, r.distinct_est)
            for r in ledger_distinct_estimate(
                bottomk_ledger(corpus, ["source"], "doc_id", 16),
                ["source"],
                16,
            ).collect()
        }
        return {s: hq[s] + sk[s] for s in hq}

    def served(run):
        return {
            r.source: (r.n_rows, r.q50, r.q95, r.sample_size, r.distinct_est)
            for r in run.results["profile"].collect()
        }

    r0 = pipe.run(spark, "0:150")
    assert served(r0) == direct(r0.results["published"])

    r1 = pipe.run(spark, "150:300")
    got1 = served(r1)
    assert got1 == direct(r1.results["published"])

    # replay of period 0: corpus unchanged, the period's partition
    # rewrites deterministically -> the fold is unchanged
    r2 = pipe.run(spark, "0:150")
    assert served(r2) == got1


@pytest.mark.slow
def test_incremental_hitters_ledger_bounds_and_survives_replay(spark, tmp_dir):
    """The period-partitioned heavy-hitters ledger must serve sound
    bounds after every period — lb <= true corpus count <= ub for
    every served token (true counts recomputed exactly from the
    published corpus) — keep the presence guarantee on the merged
    ledger form (true > other_max => token served), and a replayed
    period must rewrite its partition deterministically so the
    serving view never moves."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
        ledger_topk,
        merge_heavyhitters_ledgers,
    )

    pipe = build_pipeline(SF_DIR, f"{tmp_dir}/inc_hh")
    toks_expr = (
        "filter(split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), "
        "' '), x -> x != '')"
    )

    def exact(corpus):
        return {
            (r["source"], r["tok"]): r["c"]
            for r in corpus.select(
                "source", F.explode(F.expr(toks_expr)).alias("tok")
            )
            .groupBy("source", "tok")
            .agg(F.count(F.lit(1)).cast("bigint").alias("c"))
            .collect()
        }

    def served(run):
        return {
            (r["source"], r["item"]): (r["rank"], r["lb"], r["ub"])
            for r in run.results["hitters"].collect()
        }

    r0 = pipe.run(spark, "0:150")
    true0 = exact(r0.results["published"])
    got0 = served(r0)
    assert got0
    for (src, tok), (_, lb, ub) in got0.items():
        assert lb <= true0[(src, tok)] <= ub, (src, tok, lb, ub)
    # single period: the ledger IS the exact top — lb == ub == true
    assert all(lb == ub for (_, lb, ub) in got0.values())

    r1 = pipe.run(spark, "150:300")
    true1 = exact(r1.results["published"])
    got1 = served(r1)
    for (src, tok), (_, lb, ub) in got1.items():
        assert lb <= true1[(src, tok)] <= ub, (src, tok, lb, ub)

    # presence guarantee on the merged LEDGER form: any token whose
    # true corpus count beats the merged other_max must be served
    full = spark.read.parquet(f"{tmp_dir}/inc_hh/hitters_ledger").drop(
        "period"
    )
    merged = merge_heavyhitters_ledgers([full], ["source"], k=16)
    omax = {r["source"]: r["other_max"] for r in merged.collect()}
    tops = {
        (r["source"], r["item"])
        for r in ledger_topk(merged, ["source"]).collect()
    }
    for (src, tok), cnt in true1.items():
        if cnt > omax[src]:
            assert (src, tok) in tops, (src, tok, cnt, omax[src])

    # replay of period 0: partition rewrites deterministically, the
    # fold is unchanged
    r2 = pipe.run(spark, "0:150")
    assert served(r2) == got1


def test_incremental_pagerank_warm_start_and_replay(spark, tmp_dir):
    """The pagerank stage resumes from the newest predecessor
    checkpoint (hi <= lo), equals a directly-computed warm-start over
    the same published graph, and a replayed period rewrites its
    partition identically (it never warm-starts from its own
    output)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.graph import (
        pagerank_fixed_point,
    )

    wd = f"{tmp_dir}/inc_pr"
    pipe = build_pipeline(SF_DIR, wd)
    pipe.run(spark, "0:200")
    run1 = pipe.run(spark, "200:350")
    got = sorted(map(tuple, run1.results["pagerank"].collect()))

    # direct recompute: same graph off the published corpus, warm-
    # started from period 0's checkpoint
    docs = spark.read.parquet(f"{wd}/corpus")
    src_node = -(F.pmod(F.xxhash64("source"), F.lit(2**40)) + F.lit(1))
    edges = docs.select(
        F.col("doc_id").cast("bigint").alias("src"),
        src_node.cast("bigint").alias("dst"),
    ).unionByName(
        docs.select(
            src_node.cast("bigint").alias("src"),
            F.col("doc_id").cast("bigint").alias("dst"),
        )
    )
    init = spark.read.parquet(f"{wd}/pagerank_ranks/period=0_200")
    want = sorted(map(tuple, pagerank_fixed_point(
        edges, iterations=2, init_ranks=init).collect()))
    assert got == want

    # source hub nodes (negative ids) outrank their doc leaves
    ranks = {n: r for n, r in got}
    hub_min = min(r for n, r in got if n < 0)
    doc_max = max(r for n, r in got if n >= 0)
    assert hub_min > doc_max

    # replay: published corpus is unchanged, the predecessor is still
    # period 0 (never the period's own output) — identical partition
    run2 = pipe.run(spark, "200:350")
    again = sorted(map(tuple, run2.results["pagerank"].collect()))
    assert again == got

    # leftover junk from failed/crashed publishes must be SKIPPED by
    # the warm-start predecessor scan, not int()-parsed: a
    # `__staging` dir (failed validation), an `__old` dir (crash
    # mid-swap), and an uncommitted period dir (no _SUCCESS) all
    # start with "period=" — round-7 ADVICE found a loose parse here
    # that turned one failed publish into a permanent ValueError.
    import os

    os.makedirs(f"{wd}/pagerank_ranks/period=0_200__staging")
    os.makedirs(f"{wd}/pagerank_ranks/period=0_200__old")
    # uncommitted dir (no _SUCCESS) whose hi ties the real
    # predecessor's — must lose to the committed period=0_200
    os.makedirs(f"{wd}/pagerank_ranks/period=50_200")
    run3 = pipe.run(spark, "200:350")
    assert sorted(map(tuple, run3.results["pagerank"].collect())) == got


def test_incremental_corpus_manifest_serves_pruned_reads(spark, tmp_dir):
    """The manifest stage keeps a zone manifest reconciled with the
    published corpus across periods and replays: pruned reads pass
    the fail-closed staleness check and equal the full-scan filter,
    and a replayed period leaves the manifest serving identically."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.skipping import (
        pruned_read,
    )

    wd = f"{tmp_dir}/inc_mf"
    pipe = build_pipeline(SF_DIR, wd)
    pipe.run(spark, "0:200")
    r2 = pipe.run(spark, "200:350")
    assert r2.results["manifest"].count() >= 1

    mf = spark.read.parquet(f"{wd}/corpus_manifest")
    got = pruned_read(
        spark, f"{wd}/corpus", mf, [("doc_id", 50, 250)]
    ).select("doc_id")
    want = spark.read.parquet(f"{wd}/corpus").filter(
        "doc_id >= 50 AND doc_id <= 250"
    ).select("doc_id")
    want_ids = sorted(r[0] for r in want.collect())
    assert sorted(r[0] for r in got.collect()) == want_ids

    # replay: corpus content unchanged but atomic_publish writes fresh
    # UUID part names — the manifest reconciles to the new listing
    # with IDENTICAL stats (equality modulo the file column) and keeps
    # passing the staleness check
    stats_cols = [c for c in mf.columns if c != "file"]
    before = sorted(map(tuple, mf.select(stats_cols).collect()))
    pipe.run(spark, "200:350")
    mf2 = spark.read.parquet(f"{wd}/corpus_manifest")
    assert sorted(map(tuple, mf2.select(stats_cols).collect())) == before
    again = pruned_read(
        spark, f"{wd}/corpus", mf2, [("doc_id", 50, 250)]
    )
    assert again.count() == len(want_ids)


@pytest.mark.slow
def test_incremental_triangles_equal_full_recompute_and_replay(
    spark, tmp_dir
):
    """The triangles stage maintains token-collocation triangle
    counts under edge additions: after each period the published
    artifact must equal a FULL recompute over every edge published so
    far (incremental ≡ from-scratch), and a replayed period — whose
    delta derives from the same published doc slice — republishes
    identical content."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.graph import (
        triangle_counts,
    )

    wd = f"{tmp_dir}/inc_tri"
    pipe = build_pipeline(SF_DIR, wd)
    pipe.run(spark, "0:200")
    run1 = pipe.run(spark, "200:350")
    got = sorted(map(tuple, run1.results["triangles"].collect()))
    assert got, "triangles artifact is empty"

    # full recompute over ALL published edge partitions to date
    all_edges = spark.read.parquet(
        f"{wd}/triangle_edges/period=0_200",
        f"{wd}/triangle_edges/period=200_350",
    )
    want = sorted(
        map(
            tuple,
            triangle_counts(all_edges)
            .withColumnRenamed("node", "token")
            .collect(),
        )
    )
    assert got == want
    # the token graph genuinely has triangles (the invariant is not
    # vacuous) and some node's count grew vs period 0 alone
    assert any(t[2] > 0 for t in got)

    # replay period 1: same published slice -> same delta -> the
    # partition rewrites content-identically
    run2 = pipe.run(spark, "200:350")
    again = sorted(map(tuple, run2.results["triangles"].collect()))
    assert again == got


@pytest.mark.slow
def test_retention_delete_every_family_equals_survivor_rebuild(
    spark, tmp_dir
):
    """Round-10: the retention stage retires docs across EVERY
    maintained artifact by its family's native delete path (corpus
    republish, index anti-join removal, abelian LM subtract, monotone
    period rebuild) — and each post-delete artifact equals the one a
    pipeline over a corpus that never held those docs would have
    built."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.examples.incremental import (
        retention_delete,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        unigram_lm_counts,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        minhash_index_build,
    )
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sketches import (
        hll_ledger,
        ledger_estimates,
        merge_hll_ledgers,
    )

    wd = f"{tmp_dir}/inc_ret"
    pipe = build_pipeline(SF_DIR, wd)
    pipe.run(spark, "0:200")
    pipe.run(spark, "200:350")
    periods = [(0, 200), (200, 350)]

    corpus = spark.read.parquet(f"{wd}/corpus")
    deleted = [
        r["doc_id"]
        for r in corpus.filter("doc_id % 23 = 0").select("doc_id").collect()
    ]
    assert deleted, "no % 23 docs ingested — the test would be vacuous"
    retention_delete(spark, wd, deleted, periods)

    survivors = spark.read.parquet(f"{wd}/corpus").localCheckpoint()
    assert survivors.filter("doc_id % 23 = 0").count() == 0

    toks = (
        "filter(split(trim(regexp_replace(lower(text), '[^a-z]+', ' ')), "
        "' '), x -> x != '')"
    )

    # abelian family: folded LM ledger == direct counts over survivors
    lm_fold = (
        spark.read.parquet(f"{wd}/lm_ledger")
        .groupBy("term")
        .agg(F.sum("cnt").cast("bigint").alias("cnt"))
    )
    lm_direct = unigram_lm_counts(
        survivors.select("doc_id", F.expr(toks).alias("t"))
    )
    assert sorted(map(tuple, lm_fold.collect())) == sorted(
        map(tuple, lm_direct.collect())
    )

    # monotone family: folded HLL estimates == ledger built fresh from
    # the survivors period by period
    def estimates(root):
        full = spark.read.parquet(root).drop("period")
        return sorted(map(tuple, ledger_estimates(
            merge_hll_ledgers([full], ["source"]), ["source"]
        ).collect()))

    fresh = f"{tmp_dir}/inc_ret_fresh_hll"
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        atomic_publish,
    )

    for lo, hi in periods:
        atomic_publish(
            hll_ledger(
                survivors.filter(F.col("doc_id").between(lo, hi - 1)),
                ["source"], ["doc_id", "lang"],
            ),
            f"{fresh}/period={lo}_{hi}",
        )
    assert estimates(f"{wd}/hll_ledger") == estimates(fresh)

    # index family: removal == rebuild from the surviving corpus
    b_got = spark.read.parquet(f"{wd}/index/buckets")
    s_got = spark.read.parquet(f"{wd}/index/shingles")
    b_want, s_want = minhash_index_build(
        survivors, max_shingles_per_doc=512, k=32, bands=8, n=3
    )
    assert sorted(map(tuple, b_got.collect())) == sorted(
        map(tuple, b_want.collect())
    )
    assert sorted(map(tuple, s_got.collect())) == sorted(
        map(tuple, s_want.collect())
    )
