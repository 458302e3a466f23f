"""Unit tests: deterministic text classifiers (N1/N2 semantics) and
text-statistics functions on crafted strings."""

from __future__ import annotations

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.functions import text as T


def run(spark, texts, col):
    df = spark.createDataFrame([(t,) for t in texts], "text string")
    return [r.out for r in df.select(col.alias("out")).collect()]


def test_lang_detect_markers(spark):
    texts = [
        "the cat and the dog is here with us",
        "le chat et la mer les amis",
        "der hund und die katze das haus",
        "el gato los perros que corren una casa",
        "xyzzy qwerty",
    ]
    assert run(spark, texts, T.lang_detect("text")) == [
        "en", "fr", "de", "es", "und",
    ]


def test_lang_detect_tie_breaks_by_priority(spark):
    # 'the'(en) and 'le'(fr) once each → tie → priority order wins.
    assert run(spark, ["the le"], T.lang_detect("text")) == ["en"]


def test_sentiment_domain(spark):
    texts = [
        "this is good and great",         # pos
        "terrible awful bad",             # neg
        "good but bad",                   # tie → n/a
        "nothing to say",                 # no markers → n/a
    ]
    assert run(spark, texts, T.sentiment("text")) == ["pos", "neg", "n/a", "n/a"]


def test_token_count_edges(spark):
    texts = ["one two three", "  padded   spaces  ", "", "single"]
    assert run(spark, texts, T.token_count("text")) == [3, 2, 0, 1]


def test_fingerprint_normalizes_case_and_space(spark):
    texts = ["Hello  World", "hello world", "HELLO WORLD ", "other"]
    fps = run(spark, texts, T.fingerprint("text"))
    assert fps[0] == fps[1] == fps[2]
    assert fps[3] != fps[0]


def test_quality_score_bands(spark):
    good = "the quick brown fox jumps over the lazy dog and runs away " * 3
    short = "hi"
    assert run(spark, [good], T.quality_score("text")) == [1.0]
    # "hi": length band fails, stopword ratio 0.0 (out of band) fails,
    # punctuation density passes → 1/3
    got = run(spark, [short], T.quality_score("text"))[0]
    assert abs(got - 1 / 3) < 1e-12


def test_redact_pii_replaces_all_kinds_globally(spark):
    texts = [
        "mail a.b+c@x.co.uk and d@y.io twice",          # two emails
        "servers 10.0.0.1 and 192.168.255.7 up",        # two ips
        "call +1 (555) 010-1234 or 555-010-9999 now",   # two phones
        "clean text with no contact information here",
    ]
    got = run(spark, texts, T.redact_pii("text"))
    assert got[0] == "mail <EMAIL> and <EMAIL> twice"
    assert got[1] == "servers <IP> and <IP> up"
    assert got[2] == "call <PHONE> or <PHONE> now"
    assert got[3] == texts[3]


def test_redact_pii_order_ips_not_eaten_by_phone(spark):
    # the phone pattern matches dotted digit runs too: IPs must be
    # tokenized FIRST so they keep their typed tag
    got = run(spark, ["ip 10.1.2.3 then +1 555 010 1234"], T.redact_pii("text"))
    assert got == ["ip <IP> then <PHONE>"]


def test_repetition_profile_flags_repetitive_docs(spark, tmp_path):
    """Crafted docs through the actual catalog query: a 50x-repeated
    phrase must gate 'drop' with dup_token_frac 0.98; an all-distinct
    doc gates 'keep' with 0.0."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.plans import QUERIES

    docs = spark.createDataFrame(
        [
            (1, ("buy now " * 50).strip()),            # 2 distinct / 100 tokens
            (2, "alpha beta gamma delta epsilon"),     # all distinct
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(f"{tmp_path}/documents.parquet")
    out = {r.doc_id: r for r in QUERIES["t_repetition_profile"](
        spark, str(tmp_path)).collect()}
    assert out[1].n_tokens == 100
    assert out[1].dup_token_frac == 0.98 and out[1].gate == "drop"
    assert out[1].dup_bigram_frac > 0.9
    assert out[2].dup_token_frac == 0.0 and out[2].gate == "keep"


def test_tfidf_topk_semantics(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        tfidf_topk,
    )
    import math

    # "common" appears in all 3 docs (idf = ln(1) = 0 → never top);
    # "rare" only in doc 0; doc 1 repeats "pair" so tf outweighs.
    rows = [
        (0, ["common", "rare", "pair"]),
        (1, ["common", "pair", "pair", "pair"]),
        (2, ["common", "solo"]),
    ]
    toked = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    out = {
        (r.doc_id, r.rnk): r for r in tfidf_topk(toked, "t", "doc_id", 2).collect()
    }
    assert out[(0, 1)].term == "rare"  # idf ln(3/1) beats pair's ln(3/2)
    assert out[(0, 2)].term == "pair"
    assert out[(1, 1)].term == "pair" and out[(1, 1)].tf == 3
    assert out[(2, 1)].term == "solo"
    # common has idf 0 → score 0; it may only appear as a rank-2 filler
    assert all(r.term != "common" or r.score_q4 == 0 for r in out.values())
    # quantization: doc0 rare = 1 * ln(3) = 1.0986 → 10986
    assert out[(0, 1)].score_q4 == math.floor(math.log(3.0) * 10000 + 0.5)


def test_unigram_lm_score_semantics(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        unigram_lm_score,
    )
    import math

    # corpus: "the" dominates (6 of 8 tokens), "zq" is a one-off.
    # Doc 0 is all-typical, doc 1 contains the rare token → lower score.
    rows = [
        (0, ["the", "the", "the"]),
        (1, ["the", "zq"]),
        (2, ["the", "the", "cat"]),
    ]
    toked = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    out = {r.doc_id: r for r in unigram_lm_score(toked, "t", "doc_id").collect()}

    total, vocab, alpha = 8, 3, 0.5

    def logp(cnt):
        return math.log((cnt + alpha) / (total + alpha * vocab))

    def expected(counts):  # list of per-token corpus counts, one per token
        # mirror the operator: per-TERM fixed-point of tf*logp, summed
        from collections import Counter

        tf = Counter(counts)
        s = sum(math.floor(tfv * logp(c) * 10000 + 0.5) for c, tfv in tf.items())
        return s / 10000 / len(counts)

    assert out[0].n_tokens == 3
    assert abs(out[0].avg_logprob - expected([6, 6, 6])) < 1e-12
    assert abs(out[1].avg_logprob - expected([6, 1])) < 1e-12
    # the all-typical doc outranks the rare-token doc
    assert out[0].avg_logprob > out[1].avg_logprob
    # rare-token doc scores lowest of the three
    assert out[1].avg_logprob == min(r.avg_logprob for r in out.values())
    assert set(out[d].tier for d in out) <= {"high", "mid", "low"}


def test_bigram_lm_score_semantics(spark):
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        bigram_lm_score,
    )

    rows = [
        (0, ["a", "b", "a", "b"]),   # typical bigrams (a,b) dominate
        (1, ["b", "a"]),             # the rare reversed bigram
        (2, ["a"]),                  # single token: no bigrams, no row
    ]
    toked = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    out = {r.doc_id: r for r in bigram_lm_score(toked, "t", "doc_id").collect()}
    assert set(out) == {0, 1}  # doc 2 has no bigrams
    assert out[0].n_bigrams == 3 and out[1].n_bigrams == 1
    # (a,b) occurs twice in the corpus, (b,a) twice too ((a,b),(b,a),(a,b)
    # from doc 0 and (b,a) from doc 1) — doc 0's mix of the two common
    # bigrams must score >= doc 1's single (b,a): equal-count bigrams,
    # but conditional denominators differ (c1(a)=5 vs c1(b)=3)
    assert out[0].avg_logprob < 0 and out[1].avg_logprob < 0
    # monotonicity probe: a doc whose only bigram is corpus-rare
    # relative to its prefix count ((b,b): c2=1 vs c1(b)=5) scores
    # below the typical doc
    rows2 = rows + [(3, ["b", "b"])]
    toked2 = spark.createDataFrame(rows2, "doc_id bigint, t array<string>")
    out2 = {r.doc_id: r.avg_logprob
            for r in bigram_lm_score(toked2, "t", "doc_id").collect()}
    assert out2[3] < out2[0]


def test_unigram_lm_counts_merge_and_frozen_scoring(spark, tmp_dir):
    """The incremental LM path: delta counts fold exactly
    (merge(counts(A), counts(B)) == counts(A∪B)), scoring against the
    merged table matches the fused self-trained form, the table
    round-trips through parquet, and OOV tokens in a NEW batch score
    at the smoothing floor."""
    import math

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        merge_lm_counts,
        unigram_lm_counts,
        unigram_lm_score,
        unigram_lm_score_with,
    )

    a = spark.createDataFrame(
        [(0, ["the", "the", "cat"]), (1, ["the", "dog"])],
        "doc_id bigint, t array<string>",
    )
    b = spark.createDataFrame(
        [(2, ["the", "cat", "sat"])], "doc_id bigint, t array<string>"
    )
    full = a.unionByName(b)

    merged = {
        r.term: r.cnt
        for r in merge_lm_counts(
            unigram_lm_counts(a), unigram_lm_counts(b)
        ).collect()
    }
    direct = {r.term: r.cnt for r in unigram_lm_counts(full).collect()}
    assert merged == direct

    # frozen-LM scoring over the training corpus == fused self-trained
    counts = unigram_lm_counts(full)
    counts.write.mode("overwrite").parquet(f"{tmp_dir}/lm")
    reloaded = spark.read.parquet(f"{tmp_dir}/lm")
    frozen = {
        r.doc_id: (r.n_tokens, r.avg_logprob, r.tier)
        for r in unigram_lm_score_with(full, reloaded).collect()
    }
    fused = {
        r.doc_id: (r.n_tokens, r.avg_logprob, r.tier)
        for r in unigram_lm_score(full).collect()
    }
    assert frozen == fused

    # OOV in a new batch: cnt=0 → p = α/(T+αV); T=8, V=4 → α/(10)
    new_batch = spark.createDataFrame(
        [(99, ["zyx"])], "doc_id bigint, t array<string>"
    )
    row = unigram_lm_score_with(new_batch, reloaded).collect()[0]
    want = math.floor(math.log(0.5 / (8 + 0.5 * 4)) * 10000 + 0.5) / 10000
    assert abs(row.avg_logprob - want) < 1e-12


def test_bigram_lm_tables_merge_and_frozen_scoring(spark, tmp_dir):
    """Bigram LM incremental path: (c2, c1) tables fold exactly across
    deltas, frozen scoring over the training corpus matches the fused
    form, and a new batch's unseen bigram scores with conditional 0 —
    only the interpolated unigram term — with no division error."""
    import math

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.aggregates import (
        bigram_lm_score,
        bigram_lm_score_with,
        bigram_lm_tables,
        merge_bigram_lm_tables,
    )

    a = spark.createDataFrame(
        [(0, ["a", "b", "a", "b"])], "doc_id bigint, t array<string>"
    )
    b = spark.createDataFrame(
        [(1, ["b", "a"])], "doc_id bigint, t array<string>"
    )
    full = a.unionByName(b)

    m_c2, m_c1 = merge_bigram_lm_tables(bigram_lm_tables(a), bigram_lm_tables(b))
    f_c2, f_c1 = bigram_lm_tables(full)
    assert {tuple(r) for r in m_c2.collect()} == {tuple(r) for r in f_c2.collect()}
    assert {tuple(r) for r in m_c1.collect()} == {tuple(r) for r in f_c1.collect()}

    # frozen == fused over the training corpus (parquet round-trip)
    f_c2.write.mode("overwrite").parquet(f"{tmp_dir}/c2")
    f_c1.write.mode("overwrite").parquet(f"{tmp_dir}/c1")
    c2r = spark.read.parquet(f"{tmp_dir}/c2")
    c1r = spark.read.parquet(f"{tmp_dir}/c1")
    frozen = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_lm_score_with(full, c2r, c1r).collect()
    }
    fused = {
        r.doc_id: (r.n_bigrams, r.avg_logprob)
        for r in bigram_lm_score(full).collect()
    }
    assert frozen == fused

    # OOV bigram from seen unigrams: ("a","a") unseen → p_cond 0,
    # p = 0.3 * (c1(a)+0.5)/(T+0.5V); T=6, V=2, c1(a)=3
    new_batch = spark.createDataFrame(
        [(9, ["a", "a"])], "doc_id bigint, t array<string>"
    )
    row = bigram_lm_score_with(new_batch, c2r, c1r).collect()[0]
    p = (1.0 - 0.7) * ((3 + 0.5) / (6 + 0.5 * 2))
    want = math.floor(math.log(p) * 10000 + 0.5) / 10000
    assert abs(row.avg_logprob - want) < 1e-12
    # fully-OOV unigrams: floor only, still finite
    oov = spark.createDataFrame(
        [(10, ["zz", "qq"])], "doc_id bigint, t array<string>"
    )
    r2 = bigram_lm_score_with(oov, c2r, c1r).collect()[0]
    p2 = (1.0 - 0.7) * (0.5 / (6 + 0.5 * 2))
    want2 = math.floor(math.log(p2) * 10000 + 0.5) / 10000
    assert abs(r2.avg_logprob - want2) < 1e-12
