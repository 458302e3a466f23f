"""Semantic tests for the near-dedup ladder: crafted near-duplicates
must be found, unrelated docs must not — the correctness contract for
the rows-only (non-oracle) MinHash/SimHash operators."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
    exact_dedup_fingerprint,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_near_dups,
    simhash_dup_buckets,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "near the warm fire and the birds sing in the tall green trees all day"
)
NEAR = BASE.replace("green trees", "green forests")  # one-word mutation
FAR = (
    "completely different content about spark query engines columnar "
    "storage shuffle partitions and adaptive execution plans at scale"
)


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [(1, BASE), (2, NEAR), (3, FAR), (4, BASE.upper())],
        "doc_id long, text string",
    )


def test_word_shingles_count(spark):
    df = spark.createDataFrame([(1, "a b c d")], "doc_id long, text string")
    got = sorted(r.shingle for r in word_shingles(df, n=3).collect())
    assert got == ["a b c", "b c d"]
    short = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
    assert word_shingles(short, n=3).count() == 0


def test_exact_dedup_finds_case_variant(spark, docs):
    out = exact_dedup_fingerprint(docs)
    assert out.count() == 3  # BASE and BASE.upper() share a fingerprint
    keep = {r.keep_doc_id for r in out.collect()}
    assert 1 in keep and 4 not in keep  # min-id survivor


def test_jaccard_pairs_scores_near_dup(spark, docs):
    pairs = {(r.doc_a, r.doc_b): r.jaccard for r in jaccard_pairs(docs, threshold=0.5).collect()}
    assert (1, 2) in pairs and pairs[(1, 2)] > 0.75
    assert (1, 4) in pairs and pairs[(1, 4)] == 1.0  # case-normalized
    assert not any(3 in p for p in pairs)


def test_minhash_lsh_finds_near_dup_not_far(spark, docs):
    cands = {(r.doc_a, r.doc_b) for r in minhash_lsh_candidates(docs).collect()}
    assert (1, 2) in cands and (1, 4) in cands
    verified = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_near_dups(docs, threshold=0.5).collect()
    }
    assert (1, 2) in verified
    assert not any(3 in p for p in verified)


def test_simhash_buckets_exact_dups_only(spark, docs):
    buckets = simhash_dup_buckets(docs).collect()
    # BASE vs BASE.upper() tokenize identically → same signature.
    assert len(buckets) == 1
    assert buckets[0].n_docs == 2 and buckets[0].keep_doc_id == 1


def test_connected_components_chain_transitivity(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
        dedup_by_clusters,
    )

    # chain 1-2, 2-3, 3-4 (one component) + island pair 10-11
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], "doc_a long, doc_b long"
    )
    got = {r.doc_id: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame(
        [(i, f"t{i}") for i in [1, 2, 3, 4, 10, 11, 99]], "doc_id long, text string"
    )
    kept = sorted(r.doc_id for r in dedup_by_clusters(docs, pairs).collect())
    assert kept == [1, 10, 99]  # canonical per cluster + untouched doc


def test_minhash_catalog_query_clusters_planted_twins(spark):
    """The catalog query plants a mutated twin per subset doc; the
    MinHash→connected-components chain must put every doc in the same
    cluster as its twin (doc_id + 1e6), labeled by the min id."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans.probes import (
        d_minhash_dup_clusters,
    )
    from tests.conftest import SF_DIR

    out = d_minhash_dup_clusters(spark, SF_DIR).collect()
    clusters = {r.k1: r.k2 for r in out if r.slice == "cluster"}
    # the merged 'simhash_pair' slice must also pair every twin
    sim_pairs = {(r.k1, r.k2) for r in out if r.slice == "simhash_pair"}
    assert sim_pairs, "simhash slice returned no pairs"
    subset_ids = [
        r.doc_id
        for r in spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .filter("doc_id % 20 = 0")
        .select("doc_id")
        .collect()
    ]
    for d in subset_ids:
        # Twin must land in the same cluster as its source doc (the
        # label may be an even smaller doc id when the corpus contains
        # genuine near-dups that chain clusters together).
        assert d in clusters and clusters[d + 1_000_000] == clusters[d]
        assert clusters[d] <= d  # min-label canonical survivor


def test_simhash_near_dups_banded(spark, docs):
    """Banding must recover hamming>0 near-dup pairs (exhaustively for
    hamming <= bands-1) and never pair unrelated docs."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        simhash_near_dups,
        simhash_signatures,
    )

    sigs = {r.doc_id: r.simhash for r in simhash_signatures(docs).collect()}
    ham_near = bin(sigs[1] ^ sigs[2]).count("1")
    assert 0 < ham_near <= 15  # fixture sanity: a true near-dup, not exact
    pairs = {
        (r.doc_a, r.doc_b): r.hamming
        for r in simhash_near_dups(docs, bands=16, max_hamming=15).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == ham_near
    assert (1, 4) in pairs and pairs[(1, 4)] == 0  # case-variant: exact
    assert not any(3 in p for p in pairs)  # FAR never pairs


def test_connected_components_warns_without_fixpoint(spark):
    """Hitting max_iter before convergence must warn, not silently
    return incomplete labels (a 4-chain needs >1 one-hop round)."""
    import warnings as w

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "doc_a long, doc_b long"
    )
    with w.catch_warnings(record=True) as caught:
        w.simplefilter("always")
        connected_components(chain, max_iter=1).collect()
    assert any("fixpoint" in str(c.message) for c in caught)


def test_shingle_forms_agree(spark):
    """The scan-stage array form and the exploded inverted-index form
    must describe the same shingle sets (minhash verify and jaccard
    scoring depend on their agreement)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        shingle_hash_arrays,
        word_shingles,
    )

    docs = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, "one two Three, one two three!")],
        "doc_id long, text string",
    )
    arrs = {
        r.doc_id: sorted(r.shingles)
        for r in shingle_hash_arrays(docs, n=3).collect()
    }
    exploded = (
        word_shingles(docs, n=3)
        .select("doc_id", F.expr("xxhash64(shingle)").alias("h"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_list("h")).alias("hs"))
        .collect()
    )
    assert arrs[2] == []  # shorter than n ⇒ empty, not descending-sequence junk
    assert {r.doc_id: list(r.hs) for r in exploded} == {1: arrs[1], 3: arrs[3]}


def test_jaccard_pairs_hot_shingle_cap(spark):
    """With a df cap, pairs discoverable only through a hot shingle
    disappear, but surviving pairs keep their exact full-set Jaccard
    (identical to the uncapped result)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        jaccard_pairs,
    )

    hot = "alpha beta gamma"  # the 3-gram shared by ALL docs
    docs = spark.createDataFrame(
        [
            (1, hot + " one two three four five"),
            (2, hot + " one two three four six"),   # near-dup of 1
            (3, hot + " seven eight nine ten eleven"),  # only hot overlap
        ],
        "doc_id long, text string",
    )
    exact = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, n=3, threshold=0.0).collect()
    }
    assert set(exact) == {(1, 2), (1, 3), (2, 3)}
    capped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in jaccard_pairs(docs, n=3, threshold=0.0, max_shingle_df=2).collect()
    }
    # (1,3)/(2,3) shared only the df=3 hot shingle — pruned from
    # discovery; (1,2)'s score still counts the hot shingle exactly.
    assert set(capped) == {(1, 2)}
    assert capped[(1, 2)] == exact[(1, 2)]


def test_jaccard_prefix_equals_exact(spark, docs):
    """Prefix filtering is EXACT: identical (pair, jaccard) output to
    the full inverted-index form at every threshold, including on a
    corpus with a universal hot shingle (the case the df-cap variant
    provably misses — hot tokens sort to the suffix and never enter
    the prefix index, yet the pair survives because a rare shingle
    lands in both prefixes)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    for t in (0.9, 0.5, 0.2):
        exact = sorted(
            map(tuple, jaccard_pairs(docs, n=3, threshold=t).collect())
        )
        pref = sorted(
            map(tuple, jaccard_pairs_prefix(docs, n=3, threshold=t).collect())
        )
        assert pref == exact, (t, pref, exact)

    # adversarial: overlap is MOSTLY one hot shingle; a df-cap of 2
    # drops the (1,3)/(2,3) pairs from discovery, prefix filtering
    # keeps every qualifying pair with its exact score
    hot = "alpha beta gamma"
    adv = spark.createDataFrame(
        [
            (1, hot + " one two three four five"),
            (2, hot + " one two three four six"),
            (3, hot + " seven eight nine ten eleven"),
        ],
        "doc_id long, text string",
    )
    want = sorted(
        map(tuple, jaccard_pairs(adv, n=3, threshold=0.05).collect())
    )
    got = sorted(
        map(tuple, jaccard_pairs_prefix(adv, n=3, threshold=0.05).collect())
    )
    assert got == want and {(a, b) for a, b, _ in got} == {
        (1, 2),
        (1, 3),
        (2, 3),
    }


def test_jaccard_prefix_float_hostile_threshold(spark):
    """t = 0.07 with a 100-shingle doc is the float-ceil trap:
    0.07 * 100 = 7.000000000000001 in doubles, so a float F.ceil
    rounds the overlap bound up to 8 — shortening doc 1's prefix from
    94 to 93 tokens AND tightening the length filter to |y| >= 8.
    The planted pair sits exactly on the boundary: doc 2 is a 9-word
    run of doc 1 (7 shingles, all shared), J = 7/100 = 0.07 exactly,
    and under the rarest-first order doc 1's shared tokens occupy
    positions 94-100 — so the buggy prefix contains NO shared token
    and the buggy length filter rejects |y| = 7. The exact bigint
    rational bound ((num*s + den - 1) div den with t = 7/100) must
    keep the pair, matching the quadratic form."""
    from itertools import product

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    words = ["".join(w) for w in product("abcdefghij", repeat=3)][:102]
    rows = [
        (1, " ".join(words)),              # 100 distinct shingles
        (2, " ".join(words[:9])),          # 7 shingles, all inside doc 1
        (3, " ".join("".join(w) for w in product("qrstu", repeat=3))[:200]),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    want = sorted(
        map(tuple, jaccard_pairs(docs, n=3, threshold=0.07).collect())
    )
    got = sorted(
        map(tuple, jaccard_pairs_prefix(docs, n=3, threshold=0.07).collect())
    )
    assert got == want
    assert {(a, b) for a, b, _ in got} == {(1, 2)}
    assert abs(got[0][2] - 0.07) < 1e-12


def test_decontaminate_drops_eval_overlap(spark):
    """Exact copies AND docs embedding a 13-gram eval passage must be
    dropped; clean docs survive."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        contaminated_ids,
        decontaminate,
    )

    eval_q = (
        "what is the capital of france and which river flows through "
        "it on the way to the english channel near the old harbor"
    )
    clean = (
        "spark executes declarative plans through catalyst and tungsten "
        "with whole stage code generation across many partitioned tasks"
    )
    train = spark.createDataFrame(
        [
            (1, eval_q),                                  # verbatim copy
            (2, "intro text. " + eval_q + " closing."),   # embedded passage
            (3, clean),                                   # untouched
        ],
        "doc_id long, text string",
    )
    heldout = spark.createDataFrame([(100, eval_q)], "doc_id long, text string")
    bad = sorted(r.doc_id for r in contaminated_ids(train, heldout).collect())
    assert bad == [1, 2]
    kept = sorted(r.doc_id for r in decontaminate(train, heldout).collect())
    assert kept == [3]


def test_shingle_cap_bounds_memory_and_preserves_normal_docs(spark):
    """max_shingles_per_doc: a pathological long doc's verify array is
    bounded at the cap; docs under the cap keep their exact shingle
    SET (order aside), and minhash output over normal docs is
    unchanged by the cap. The long doc's mutated twin must still be
    found via the bottom-k estimate."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        minhash_near_dups,
        shingle_hash_arrays,
    )

    normal_a = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    # letter-only tokens: the shingle normalization strips digits
    def w(i: int) -> str:
        return "".join(chr(97 + (i // 26**p) % 26) for p in range(3))

    long_doc = " ".join(w(i) for i in range(2000))
    docs = spark.createDataFrame(
        [
            (1, normal_a),
            (2, normal_a + " appended"),
            (3, long_doc),
            (4, long_doc + " mutated"),
        ],
        "doc_id long, text string",
    )
    capped = {
        r.doc_id: list(r.shingles)
        for r in shingle_hash_arrays(docs, n=3, max_shingles_per_doc=64).collect()
    }
    full = {
        r.doc_id: list(r.shingles)
        for r in shingle_hash_arrays(docs, n=3).collect()
    }
    assert len(capped[3]) == 64 and len(full[3]) > 1000  # bounded
    assert set(capped[1]) == set(full[1])  # under cap: exact set kept
    # bottom-k really is the k smallest of the full set
    assert capped[3] == sorted(full[3])[:64]

    pairs = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_near_dups(
            docs, k=16, bands=8, threshold=0.5, max_shingles_per_doc=64
        ).collect()
    }
    uncapped = {
        (r.doc_a, r.doc_b): r.jaccard
        for r in minhash_near_dups(docs, k=16, bands=8, threshold=0.5).collect()
    }
    assert (1, 2) in pairs and pairs[(1, 2)] == uncapped[(1, 2)]  # normal: exact
    assert (3, 4) in pairs  # long twins still found via the sketch


def test_catalog_decontaminate_planted_coverage(spark):
    """The d_decontaminate catalog query plants its own contamination;
    every planted doc must come back flagged with the right label —
    verbatim always, fragment13 whenever the doc has >= 13 normalized
    words (shorter docs have no complete 13-gram, legitimately
    missed)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    rows = QUERIES["d_decontaminate"](spark, SF_DIR).collect()
    flagged = {r.doc_id: r.planted for r in rows}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    from pyspark.sql import functions as F

    wordy = docs.select(
        "doc_id",
        F.size(
            F.split(
                F.expr("trim(regexp_replace(lower(text), '[^a-z]+', ' '))"), " "
            )
        ).alias("n_words"),
    ).collect()
    for r in wordy:
        if r.doc_id % 97 == 0:
            assert flagged.get(r.doc_id) == "verbatim", r.doc_id
        elif r.doc_id % 89 == 0 and r.n_words >= 13:
            assert flagged.get(r.doc_id) == "fragment13", r.doc_id


def test_catalog_sample_mix_exact_keep_sets(spark):
    """c_sample_mix rows are the exact hash-predicate keep-sets:
    recompute the xxhash64 predicate per row and compare set-equal —
    and the stratified slice must keep ALL of src0 and NONE of src2."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES
    from tests.conftest import SF_DIR

    out = QUERIES["c_sample_mix"](spark, SF_DIR)
    got = {(r.op, r.bucket, r.doc_id) for r in out.collect()}

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    b5 = F.pmod(F.xxhash64(F.lit(5), "doc_id"), F.lit(1_000_000))
    b7 = F.pmod(F.xxhash64(F.lit(7), "doc_id"), F.lit(1_000_000))
    expected = set()
    for r in docs.select("doc_id", "source", b5.alias("b5"), b7.alias("b7")).collect():
        if (r.source == "src0" or (r.source == "src1" and r.b5 < 400_000)):
            expected.add(("stratified", r.source, r.doc_id))
        if r.doc_id % 2 == 0 and r.b7 < 250_000:
            expected.add(("mixture", "head", r.doc_id))
        if r.doc_id % 2 == 1 and r.b7 < 750_000:
            expected.add(("mixture", "tail", r.doc_id))
    assert got == expected


def test_connected_components_long_chain_converges_in_log_rounds(spark):
    """A 60-edge chain has diameter 60: hook-only propagation needs 60
    rounds, pointer jumping ~log2(60)+2. max_iter=10 proves the
    shortcut is doing the work (and no convergence warning fires)."""
    import warnings as _warnings

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
    )

    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "doc_a long, doc_b long"
    )
    with _warnings.catch_warnings():
        _warnings.simplefilter("error", RuntimeWarning)  # warn = fail
        labels = connected_components(edges, max_iter=10)
        got = {r.doc_id: r.cluster_id for r in labels.collect()}
    assert set(got) == set(range(61))
    assert set(got.values()) == {0}  # one component, min-id label


def test_edit_distance_pairs_complete_for_equal_length(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        edit_distance_pairs_blocked,
    )

    rows = [
        (1, "abcdefgh"),
        (2, "abcdefgX"),  # dist 1 from 1 (substitution in suffix half)
        (3, "Xbcdefgh"),  # dist 1 from 1 (substitution in prefix half)
        (4, "XbcdefgX"),  # dist 2 from 1, dist 1 from 2 and 3
        (5, "zzzzzzzz"),  # far from everything
    ]
    df = spark.createDataFrame(rows, "rid bigint, code string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs_blocked(df, "rid", "code", 1).collect()
    }
    # every true distance-<=1 pair, none of the distance-2 ones
    assert got == {(1, 2, 1), (1, 3, 1), (2, 4, 1), (3, 4, 1)}


def test_edit_distance_pairs_three_pieces_for_dist_two(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        edit_distance_pairs_blocked,
    )

    # max_dist=2 -> 3 pieces; two substitutions leave one piece intact
    rows = [(1, "abcdefghi"), (2, "Xbcdefghi"), (3, "XbcdeXghi")]
    df = spark.createDataFrame(rows, "rid bigint, code string")
    got = {
        (r.id_a, r.id_b, r.dist)
        for r in edit_distance_pairs_blocked(df, "rid", "code", 2).collect()
    }
    assert got == {(1, 2, 1), (1, 3, 2), (2, 3, 1)}


def test_incremental_dedup_against_index(spark, tmp_dir):
    """Index the corpus once, probe it with a new batch: cross
    (batch, corpus) near-dup pairs match the full-recompute ground
    truth restricted to cross pairs; in-batch pairs are out of
    contract; persistence round-trips through parquet."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
        minhash_near_dups,
    )
    from tests.conftest import SF_DIR

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    corpus = docs.filter(F.col("doc_id") < 400)
    # the new batch: fresh ids, where 3 docs are verbatim twins of
    # corpus docs (planted near-dups) and the rest are new text
    twins = (
        corpus.filter(F.col("doc_id") < 3)
        .select((F.col("doc_id") + 10000).alias("doc_id"), "text")
    )
    fresh = docs.filter(F.col("doc_id") >= 400).select(
        (F.col("doc_id") + 10000).alias("doc_id"), "text"
    )
    batch = twins.unionByName(fresh)

    buckets, shingles = minhash_index_build(corpus)
    buckets.write.mode("overwrite").parquet(f"{tmp_dir}/idx/buckets")
    shingles.write.mode("overwrite").parquet(f"{tmp_dir}/idx/shingles")
    got = {
        (r.new_id, r.corpus_id)
        for r in dedup_against_index(
            batch,
            spark.read.parquet(f"{tmp_dir}/idx/buckets"),
            spark.read.parquet(f"{tmp_dir}/idx/shingles"),
        ).collect()
    }
    # every planted twin is found against its corpus original
    assert {(10000, 0), (10001, 1), (10002, 2)} <= got
    # ground truth: full recompute over corpus ∪ batch, cross pairs only
    full = minhash_near_dups(corpus.select("doc_id", "text").unionByName(batch))
    cross = {
        (max(r.doc_a, r.doc_b), min(r.doc_a, r.doc_b))
        for r in full.collect()
        if (r.doc_a >= 10000) != (r.doc_b >= 10000)
    }
    assert got == cross


def test_boilerplate_strip_removes_cross_doc_chunks(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        boilerplate_strip,
    )

    # "nav bar home login" is template boilerplate shared by docs 0-2;
    # everything else is unique body text. chunk=4, freq>=2.
    rows = [
        (0, ["nav", "bar", "home", "login", "alpha", "beta", "gamma", "delta"]),
        (1, ["nav", "bar", "home", "login", "epsilon", "zeta", "eta", "theta"]),
        (2, ["nav", "bar", "home", "login"]),
        (3, ["iota", "kappa", "lam", "mu"]),
    ]
    toked = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    out = {
        r.doc_id: r
        for r in boilerplate_strip(toked, "t", "doc_id", 4, 2).collect()
    }
    assert out[0].n_chunks == 2 and out[0].n_boilerplate == 1
    assert out[0].clean_text == "alpha beta gamma delta"
    assert out[1].clean_text == "epsilon zeta eta theta"
    # fully-boilerplate doc survives as a row with empty clean text
    assert out[2].n_chunks == 1 and out[2].n_boilerplate == 1
    assert out[2].clean_text == ""
    # unique doc untouched
    assert out[3].n_boilerplate == 0 and out[3].clean_text == "iota kappa lam mu"


def test_boilerplate_strip_partial_tail_chunk_not_merged(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        boilerplate_strip,
    )

    # a short tail chunk ("x y") is NOT the same fingerprint as the
    # full boilerplate chunk prefix — only exact chunk matches count
    rows = [
        (0, ["a", "b", "c", "d", "x", "y"]),
        (1, ["a", "b", "c", "d"]),
    ]
    toked = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    out = {
        r.doc_id: r
        for r in boilerplate_strip(toked, "t", "doc_id", 4, 2).collect()
    }
    assert out[0].n_boilerplate == 1 and out[0].clean_text == "x y"
    assert out[1].clean_text == ""


def test_repeated_spans_catches_mid_document_passage(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        repeated_spans,
    )

    shared = ["one", "two", "three", "four", "five", "six", "seven", "eight"]
    docs = spark.createDataFrame(
        [
            # shared 8-gram starts at offset 4 in doc 1, offset 1 in
            # doc 2 — an ALIGNED chunker would miss the doc-1 copy
            (1, ["aa", "bb", "cc"] + shared + ["dd"]),
            (2, shared + ["ee", "ff"]),
            (3, ["gg", "hh", "ii", "jj", "kk", "ll", "mm", "nn", "oo"]),
        ],
        "doc_id bigint, t array<string>",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in repeated_spans(docs, n=8).collect()
    }
    assert spans[1] == (4, 11, 1)
    assert spans[2] == (1, 8, 1)
    assert 3 not in spans


def test_repeated_spans_merges_overlapping_windows(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        repeated_spans,
    )

    shared = [f"w{i}" for i in range(12)]  # 12-token shared passage
    docs = spark.createDataFrame(
        [
            (1, shared + ["x1", "y1"]),
            (2, ["z2"] + shared),
        ],
        "doc_id bigint, t array<string>",
    )
    spans = {
        r.doc_id: (r.span_start, r.span_end, r.n_windows)
        for r in repeated_spans(docs, n=8).collect()
    }
    # 12-token passage = 5 sliding 8-windows, one merged island
    assert spans[1] == (1, 12, 5)
    assert spans[2] == (2, 13, 5)


def test_repeated_spans_respects_min_docs_and_short_docs(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        repeated_spans,
    )

    shared = [f"s{i}" for i in range(8)]
    docs = spark.createDataFrame(
        [
            (1, shared),
            (2, shared),
            (3, shared),
            (4, ["short", "doc"]),  # < n tokens: no windows, no crash
        ],
        "doc_id bigint, t array<string>",
    )
    three = repeated_spans(docs, n=8, min_docs=3)
    assert {r.doc_id for r in three.collect()} == {1, 2, 3}
    four = repeated_spans(docs, n=8, min_docs=4)
    assert four.count() == 0


def test_strip_repeated_spans_cuts_exactly_the_spans(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        strip_repeated_spans,
    )

    shared = [f"w{i}" for i in range(12)]
    docs = spark.createDataFrame(
        [
            (1, ["aa", "bb"] + shared + ["cc"]),
            (2, shared + ["dd", "ee", "ff"]),
            (3, ["unique", "tokens", "only", "in", "this", "doc",
                 "plus", "more", "filler"]),
            (4, shared),  # fully duplicated -> empty
        ],
        "doc_id bigint, t array<string>",
    )
    out = {r.doc_id: r for r in strip_repeated_spans(docs, n=8).collect()}
    assert out[1].clean_tokens == ["aa", "bb", "cc"]
    assert out[1].n_removed == 12
    assert out[2].clean_tokens == ["dd", "ee", "ff"]
    # untouched doc passes through whole
    assert out[3].n_removed == 0 and out[3].n_tokens == 9
    # fully-duplicated doc comes back empty, not missing
    assert out[4].clean_tokens == [] and out[4].n_tokens == 0
    # every input doc is present
    assert set(out) == {1, 2, 3, 4}


def test_link_records_best_match_and_typo_recall(spark):
    """Cross-table linkage: every corrupted feed key must link back to
    its master row; best_match keeps exactly one deterministic row per
    left id (min dist, right-id tie-break)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        link_records_blocked,
    )

    master = spark.createDataFrame(
        [(i, f"{i * 7919:08d}") for i in range(1, 40)], "mid bigint, mkey string"
    )
    feed = spark.createDataFrame(
        [
            (100 + i, ("9" + f"{i * 7919:08d}"[1:]) if i % 3 == 0 else f"{i * 7919:08d}")
            for i in range(1, 40)
        ],
        "fid bigint, fkey string",
    )
    out = link_records_blocked(
        master, feed, "mid", "mkey", "fid", "fkey", max_dist=1,
        best_match=True,
    )
    rows = {r.mid: (r.fid, r.dist) for r in out.collect()}
    assert len(rows) == 39  # one best match per master row
    for i in range(1, 40):
        fid, dist = rows[i]
        assert fid == 100 + i  # its own feed twin wins
        assert dist == (1 if i % 3 == 0 and f"{i*7919:08d}"[0] != "9" else 0)


def test_link_records_block_guard_trips_on_templated_keys(spark):
    """The per-block population guard: templated keys with a constant
    prefix collapse one piece into a single block — the guard must fail
    loudly (naming the block) instead of launching the |L|x|R| join,
    and max_block_rows=None must restore the unguarded behavior."""
    import pytest
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        link_records_blocked,
    )

    # every key shares the constant half "CUSTOMER" -> piece 0 is one
    # giant block on both sides
    master = spark.createDataFrame(
        [(i, f"CUSTOMER{i:08d}") for i in range(1, 60)],
        "mid bigint, mkey string",
    )
    feed = spark.createDataFrame(
        [(100 + i, f"CUSTOMER{i:08d}") for i in range(1, 60)],
        "fid bigint, fkey string",
    )
    guarded = link_records_blocked(
        master, feed, "mid", "mkey", "fid", "fkey", max_dist=1,
        max_block_rows=50,
    )
    with pytest.raises(SparkRuntimeException, match="link_records_blocked"):
        guarded.count()
    # disabled guard: same candidates, job completes
    out = link_records_blocked(
        master, feed, "mid", "mkey", "fid", "fkey", max_dist=1,
        max_block_rows=None,
    )
    assert out.filter("dist = 0").count() == 59


def test_link_records_deletion_blocking_full_recall_mixed_lengths(spark):
    """Deletion-neighborhood linkage must recover substitution,
    insertion AND deletion corruptions (pieces blocking only
    guarantees equal-length substitutions) — verified against the
    quadratic ground truth."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        link_records_blocked,
    )

    master = spark.createDataFrame(
        [(i, f"{i * 7919:08d}") for i in range(1, 60)],
        "mid bigint, mkey string",
    )

    def corrupt(i, key):
        if i % 3 == 0:
            return "9" + key[1:]          # substitution
        if i % 3 == 1:
            return key[:4] + "x" + key[4:]  # insertion (length L+1)
        return key[:3] + key[4:]           # deletion (length L-1)

    feed = spark.createDataFrame(
        [(100 + i, corrupt(i, f"{i * 7919:08d}")) for i in range(1, 60)],
        "fid bigint, fkey string",
    )
    got = {
        (r.mid, r.fid): r.dist
        for r in link_records_blocked(
            master, feed, "mid", "mkey", "fid", "fkey",
            max_dist=1, method="deletion",
        ).collect()
    }
    # quadratic ground truth
    exact = {
        (r.mid, r.fid): r.dist
        for r in master.crossJoin(feed)
        .withColumn("dist", F.levenshtein("mkey", "fkey").cast("bigint"))
        .filter("dist <= 1")
        .collect()
    }
    assert got == exact
    # every feed row links back to its master twin
    assert all((i, 100 + i) in got for i in range(1, 60))


def test_link_records_methods_agree_on_equal_length(spark):
    """On fixed-width keys (pieces' lossless regime) both blocking
    schemes must produce the identical verified pair set."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        link_records_blocked,
    )

    master = spark.createDataFrame(
        [(i, f"{i * 6007:07d}") for i in range(1, 50)],
        "mid bigint, mkey string",
    )
    feed = spark.createDataFrame(
        [
            (100 + i, ("8" + f"{i * 6007:07d}"[1:]) if i % 2 == 0 else f"{i * 6007:07d}")
            for i in range(1, 50)
        ],
        "fid bigint, fkey string",
    )
    out = {}
    for m in ("pieces", "deletion"):
        out[m] = {
            (r.mid, r.fid, r.dist)
            for r in link_records_blocked(
                master, feed, "mid", "mkey", "fid", "fkey",
                max_dist=1, method=m,
            ).collect()
        }
    assert out["pieces"] == out["deletion"]


def test_connected_components_incremental_equals_full_recompute(spark):
    """Folding a day's pairs into stored labels must equal the
    one-shot resolve over all pairs — across every interesting case:
    a bridge pair merging two old components, a pair extending one
    component with a new node, a brand-new component of unseen nodes,
    a pair touching an old singleton, and untouched components that
    must pass through byte-identically."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
        connected_components_incremental,
    )

    def cc(pairs_rows):
        df = spark.createDataFrame(pairs_rows, "doc_a bigint, doc_b bigint")
        return connected_components(df)

    def labels_of(df):
        return sorted((r.doc_id, r.cluster_id) for r in df.collect())

    # day 1: components {1,2,3}, {10,11}, {20,21}, untouched {30,31},
    # and singleton {40} (a node with a self-evident cluster)
    day1 = [(1, 2), (2, 3), (10, 11), (20, 21), (30, 31)]
    stored = cc(day1).unionByName(
        spark.createDataFrame([(40, 40)], "doc_id bigint, cluster_id bigint")
    )
    # day 2: bridge {1..3}+{10,11}; extend {20,21} with new 22;
    # brand-new {50,51}; touch singleton 40 with new 41
    day2 = [(3, 10), (21, 22), (50, 51), (40, 41)]
    got = connected_components_incremental(
        stored, spark.createDataFrame(day2, "doc_a bigint, doc_b bigint")
    )
    want = cc(day1 + day2).unionByName(
        spark.createDataFrame([], "doc_id bigint, cluster_id bigint")
    )
    assert labels_of(got) == labels_of(want)
    # untouched component passes through
    as_map = dict(labels_of(got))
    assert as_map[30] == 30 and as_map[31] == 30


@pytest.mark.slow
def test_jaccard_prefix_property_random_corpora(spark):
    """Property: prefix filtering is EXACT for arbitrary corpora and
    thresholds — including float-hostile ones (0.07, 0.15, 1/3-ish)
    and degenerate docs (empty, shorter than n, identical twins).
    Hypothesis drives corpus shape; every case must equal the
    quadratic form pair-for-pair, score-for-score."""
    from hypothesis import given, settings, strategies as st

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        jaccard_pairs_prefix,
    )

    words = [f"{a}{b}{c}" for a in "abcde" for b in "fg" for c in "hij"]

    @settings(max_examples=12, deadline=None)
    @given(
        docs=st.lists(
            st.lists(st.sampled_from(words), min_size=0, max_size=24),
            min_size=2,
            max_size=7,
        ),
        t=st.sampled_from([0.07, 0.15, 0.3333333333333333, 0.5, 0.85]),
        data=st.data(),
    )
    def prop(docs, t, data):
        # plant one exact twin pair sometimes (adversarial density)
        if len(docs) >= 2 and data.draw(st.booleans()):
            docs = docs + [docs[0]]
        rows = [(i, " ".join(d)) for i, d in enumerate(docs)]
        frame = spark.createDataFrame(rows, "doc_id long, text string")
        want = sorted(
            map(tuple, jaccard_pairs(frame, n=3, threshold=t).collect())
        )
        got = sorted(
            map(
                tuple,
                jaccard_pairs_prefix(frame, n=3, threshold=t).collect(),
            )
        )
        assert got == want, (t, rows, got, want)

    prop()


def test_minhash_index_remove_equals_rebuild(spark):
    """Retention deletes: pruning a doc's rows from the persisted
    index equals rebuilding it from the surviving corpus (signatures
    are per-doc), and a batch re-introducing a REMOVED doc's text is
    no longer vetoed while a surviving near-twin still is."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        dedup_against_index,
        minhash_index_build,
        minhash_index_remove,
    )

    docs = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon zeta eta theta"),
            (2, "one two three four five six seven eight nine"),
            (3, "red orange yellow green blue indigo violet colors"),
        ],
        "doc_id long, text string",
    )
    bk, sh = minhash_index_build(docs)
    bk, sh = bk.localCheckpoint(), sh.localCheckpoint()
    rm = spark.createDataFrame([(2,)], "doc_id long")
    bk2, sh2 = minhash_index_remove(bk, sh, rm)
    rb_bk, rb_sh = minhash_index_build(docs.filter("doc_id <> 2"))
    assert sorted(map(tuple, bk2.collect())) == sorted(
        map(tuple, rb_bk.collect())
    )
    assert sorted(map(tuple, sh2.collect())) == sorted(
        map(tuple, rb_sh.collect())
    )

    batch = spark.createDataFrame(
        [
            (12, "one two three four five six seven eight nine"),
            (13, "red orange yellow green blue indigo violet colors"),
        ],
        "doc_id long, text string",
    )
    hits = {
        r["new_id"]
        for r in dedup_against_index(batch, bk2, sh2).collect()
    }
    assert hits == {13}  # 12's twin was removed; 13's survives


def test_connected_components_check_every_identical_labels(spark):
    """check_every=2 (round 14: one blocking convergence count per two
    hook+shortcut rounds) must return labels identical to the
    per-round-check form — a round applied past the fixpoint is the
    identity, so only the NUMBER of driver actions may change."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
    )

    # chains (need multiple pointer-jump rounds), a star, an island
    pairs = (
        [(i, i + 1) for i in range(1, 9)]
        + [(100, x) for x in range(101, 106)]
        + [(200, 201)]
        + [(i, i + 1) for i in range(300, 330)]
    )
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    base = {
        (r.doc_id, r.cluster_id)
        for r in connected_components(df, check_every=1).collect()
    }
    for ce in (2, 3):
        got = {
            (r.doc_id, r.cluster_id)
            for r in connected_components(df, check_every=ce).collect()
        }
        assert got == base, f"check_every={ce} changed labels"


def test_connected_components_check_every_validates(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        connected_components,
    )

    df = spark.createDataFrame([(1, 2)], "doc_a long, doc_b long")
    with pytest.raises(ValueError, match="check_every"):
        connected_components(df, check_every=0)
