"""Aggregation shapes (SURVEY.md §2.4) + determinism helpers.

Reference behaviors rebuilt: group-by count/avg, ratio-to-total via
scalar subquery (``redshift-etl-notebook.ipynb`` cells 41/47), the
two-level nested aggregation (cell 51 — "cities visited" histogram),
per-group set-collect flattened to CSV
(``apps/process_reviewers.py:87,93``), and top-k
(cells 47/49 ``ORDER BY ... DESC LIMIT 5``).

``dec_sum`` / ``dec_avg`` are the catalog-wide pattern for
cross-engine-deterministic money aggregation: exact decimal
accumulation (associative ⇒ partition-order independent), one final
IEEE cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

DEC = "decimal(18,4)"
_SCALE = 10000


def _fixed(c: Column) -> Column:
    """Per-row fixed-point quantization at 4 decimal places:
    ``floor(x*10000 + 0.5)`` as bigint. Unlike a double→decimal cast
    (whose half-boundary rounding differs between engines — Spark uses
    the exact binary expansion, DuckDB the shortest decimal repr), this
    is a pure IEEE-754 multiply+add+floor: bit-identical everywhere."""
    return F.floor(c * _SCALE + F.lit(0.5)).cast("bigint")


def dec_sum(col: Column | str, alias: str) -> Column:
    """Order-independent sum of a double expression: per-row 4-dp
    fixed-point quantization, exact integer sum, one final double
    division. Associative ⇒ partition/accumulation-order independent."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_fixed(c)).cast("double") / _SCALE).alias(alias)


def dec_avg(col: Column | str, alias: str) -> Column:
    """Order-independent mean: exact fixed-point sum → double, divided
    by 10^4 then the bigint count — deterministic double divisions."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_fixed(c)).cast("double") / _SCALE / F.count(c)).alias(alias)


def dec_sum_over(col: Column | str, window, alias: str) -> Column:
    """Windowed :func:`dec_sum`: the same order-independent fixed-point
    sum as an analytic over ``window`` — lets a per-group total attach
    to every row in ONE scan (window exchange on the partition key)
    instead of the groupBy + self-join two-scan shape."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(_fixed(c)).over(window).cast("double") / _SCALE).alias(alias)


def dec_sum_sql(expr: str, alias: str) -> str:
    """DuckDB oracle fragment matching :func:`dec_sum` exactly."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {_SCALE} AS {alias}"
    )


def dec_avg_sql(expr: str, alias: str) -> str:
    """DuckDB oracle fragment matching :func:`dec_avg` exactly."""
    return (
        f"CAST(SUM(CAST(FLOOR(({expr}) * {_SCALE} + 0.5) AS BIGINT)) AS DOUBLE)"
        f" / {_SCALE} / COUNT({expr}) AS {alias}"
    )


def ratio_to_total(
    df: DataFrame, group: list[str], alias: str = "share"
) -> DataFrame:
    """Per-group count share of the grand total. The reference does
    this with a scalar subquery in the SELECT list (cell 41/47:
    ``count(*)::decimal / (SELECT count(*) ...)``); here the total is
    a 1-row rollup of the aggregated counts attached by bounded
    broadcast crossJoin — no second scan of the input, and no
    single-partition window either, so the shape survives
    high-cardinality groups (per-token shares over a vocabulary)
    where the earlier unpartitioned-window form would funnel the
    whole aggregate through one task.
    """
    counts = df.groupBy(*group).agg(F.count("*").alias("cnt"))
    total = counts.agg(F.sum("cnt").cast("bigint").alias("__total"))
    return (
        counts.crossJoin(F.broadcast(total))
        .withColumn(
            alias, F.col("cnt").cast("double") / F.col("__total").cast("double")
        )
        .drop("__total")
    )


def nested_histogram(
    df: DataFrame, entity: str, attribute: str
) -> DataFrame:
    """Two-level aggregation (reference cell 51): distinct
    (entity, attribute) pairs → per-entity attribute count → histogram
    of those counts. Returns (n_<attribute>, num_<entity>).
    """
    per_entity = (
        df.select(entity, attribute)
        .distinct()
        .groupBy(entity)
        .agg(F.count("*").alias("n_attr"))
    )
    return per_entity.groupBy("n_attr").agg(F.count("*").alias("num_entities"))


def collect_set_csv(
    df: DataFrame, group: list[str], col: str, alias: str
) -> DataFrame:
    """Per-group distinct-set flattened to a sorted CSV string —
    reference ``collect_set`` + ``array_join``
    (``apps/process_reviewers.py:87,93``), with ``array_sort`` added
    so the string is deterministic (collect_set order is not).
    """
    return df.groupBy(*group).agg(
        F.array_join(F.array_sort(F.collect_set(col)), ",").alias(alias)
    )


def topk(df: DataFrame, order_desc: list[str | Column], k: int) -> DataFrame:
    """Deterministic top-k: ORDER BY ... DESC LIMIT k. Spark plans
    TakeOrderedAndProject — per-partition heaps, no global sort.
    ``order_desc`` must include a unique tie-break column.
    """
    cols = [F.col(c) if isinstance(c, str) else c for c in order_desc]
    return df.orderBy(*[c.desc() for c in cols]).limit(k)


def token_vocab(toked: DataFrame, tokens_col: str, k: int) -> DataFrame:
    """Global token vocabulary (training-data extension): explode the
    token arrays, count occurrences, return the top-``k`` tokens by
    frequency with the token string as the deterministic tie-break.

    Scale shape: the explode is scan-stage; the count groupBy carries a
    map-side partial aggregate whose key cardinality is the VOCABULARY
    (≪ corpus tokens), so the one shuffle moves per-vocab-entry partial
    counts, not per-token rows; the top-k plans as
    TakeOrderedAndProject (per-partition heaps, no global sort)."""
    counts = (
        toked.select(F.explode(F.col(tokens_col)).alias("token"))
        .filter(F.col("token") != "")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return counts.orderBy(F.col("cnt").desc(), F.col("token").asc()).limit(k)


def tfidf_topk(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    k: int = 3,
) -> DataFrame:
    """Top-``k`` terms per document by TF-IDF (training-data
    extension): ``score = tf × ln(n_docs / df)`` with tf the in-doc
    term count and df the number of documents containing the term.
    The keyword-extraction / relevance-weighting primitive a corpus
    pipeline builds on (salient-term indexing, near-topic filtering,
    quality features).

    Returns (id, term, tf, df, score_q4, rnk ≤ k): tf/df are exact
    bigints, the score ships as the catalog's 4-dp fixed-point integer
    (``floor(x·10⁴ + 0.5)``) so the only float in the row is quantized
    the same way both engines' ``ln`` evaluates it. Ties inside a doc
    break on the term string.

    Scale shape: explode is scan-stage; the tf groupBy shuffles on
    (doc, term); the df rollup re-aggregates the tf TABLE (one row per
    doc-term, already ≪ corpus tokens) on term. The tf⋈df join is a
    plain keyed exchange — df is vocabulary-rows but corpus-derived,
    so no broadcast hint (a hot term's join rows are bounded by its
    df; AQE skew-split handles the head words). n_docs attaches as a
    1-row broadcast scalar, and the final top-k is a per-doc window —
    partitioned by the id, never single-partition."""
    terms = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("term")
    ).filter(F.col("term") != "")
    # Materialize the (id, term, tf) table ONCE (lazy localCheckpoint):
    # the df rollup prunes columns differently from the join probe, so
    # ReuseExchange never unified the two subtrees and the whole
    # scan → tokenize → explode → (id, term) shuffle ran twice per
    # query (guide §2.4 — the plan showed two full parquet scans of
    # the corpus; same fix as bm25_search's shared tokenized corpus).
    tf = (
        terms.groupBy("id", "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .localCheckpoint(eager=False)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # n_docs stays a count over `toked` (NOT over tf: documents with
    # zero non-empty tokens are absent from tf but must count toward
    # n_docs). Column pruning reduces it to a metadata-cheap scan.
    total = toked.select(F.count(F.lit(1)).alias("n_docs"))
    score = F.col("tf") * F.log(
        F.col("n_docs").cast("double") / F.col("df").cast("double")
    )
    w = Window.partitionBy("id").orderBy(
        score.desc(), F.col("term").asc()
    )
    return (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(total))
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(
            F.col("id").alias(id_col),
            "term",
            "tf",
            "df",
            F.floor(score * F.lit(10000.0) + F.lit(0.5))
            .cast("bigint")
            .alias("score_q4"),
            F.col("rnk").cast("bigint").alias("rnk"),
        )
    )


def unigram_lm_score(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    tier_high: float = -3.40,
    tier_mid: float = -3.41,
    return_terms: bool = False,
) -> DataFrame:
    """Corpus-LM quality score (training-data extension): train an
    add-``alpha``-smoothed unigram language model ON THE CORPUS ITSELF
    and score every document by its mean token log-probability — the
    CCNet-style perplexity filter (Wenzek et al. 2020) with the
    n-gram LM reduced to the unigram case so the whole train+score
    pass is two aggregations. Documents full of corpus-typical tokens
    score high; gibberish / off-distribution documents score low and
    land in the ``low`` tier a curation pipeline drops or downsamples.

    Returns (id, n_tokens, avg_logprob, tier): ``avg_logprob =
    Σ tf·ln((cnt+α)/(T+α·V)) / n_tokens`` with cnt the corpus count of
    the term, T total corpus tokens, V vocabulary size. The per-term
    product is quantized to the catalog's 4-dp fixed point BEFORE the
    per-doc sum (order-independent exact integer addition), and the
    tier CASE compares that integer sum against ``threshold ·
    n_tokens · 10⁴`` in exact integer space — no float boundary can
    flip a tier between engines.

    Scale shape (mirrors :func:`tfidf_topk`): explode is scan-stage;
    the tf groupBy shuffles on (doc, term); the LM itself is a rollup
    of the tf TABLE on term (vocabulary-sized); (T, V) attach as a
    1-row broadcast scalar; tf⋈counts is a plain keyed exchange (the
    LM table is corpus-derived — no broadcast hint; AQE may still
    choose broadcast from its observed size); the final per-doc
    groupBy re-shuffles on the id. Nothing is ever single-partition
    except the 1-row scalar."""
    terms = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("term")
    ).filter(F.col("term") != "")
    # NOT checkpointed (round 13, measured): the tf table's three
    # consumers (LM rollup, totals chain, join probe) do rebuild the
    # scan → explode → shuffle prefix three times (no ReuseExchange
    # after column pruning), but a shared lazy localCheckpoint of tf
    # measured ~10% SLOWER at both sf0.1 and the 10x decade — the
    # block write/read + materialization barrier of the full
    # (id, term, tf) table costs more than the two extra codegen-fused
    # pruned rebuilds it saves (unlike tfidf_topk, where the same
    # checkpoint halved the 10x-decade time — measure per operator).
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("cnt"))
    totals = counts.agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )
    logp = F.log(
        (F.col("cnt").cast("double") + F.lit(float(alpha)))
        / (
            F.col("total_tokens").cast("double")
            + F.lit(float(alpha)) * F.col("vocab").cast("double")
        )
    )
    if return_terms:
        # diagnostic seam for the ln-boundary sweep
        # (tests/test_ln_boundary.py): the per-(doc, term) frame with
        # the EXACT pre-quantization product the 4-dp fixed point
        # floors — same expression object, nothing re-derived
        return (
            tf.join(counts, "term")
            .crossJoin(F.broadcast(totals))
            .select("id", "term", (F.col("tf") * logp).alias("raw"))
        )
    scored = (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(_fixed(F.col("tf") * logp)).alias("sum_fp"),
        )
    )
    # integer-exact tier cut: sum_fp ≥ thr·1e4·n_tokens  ⇔  avg ≥ thr
    def _cut(thr: float) -> Column:
        return F.col("sum_fp") >= F.lit(round(thr * 10000)) * F.col("n_tokens")

    return scored.select(
        F.col("id").alias(id_col),
        "n_tokens",
        (F.col("sum_fp").cast("double") / _SCALE / F.col("n_tokens")).alias(
            "avg_logprob"
        ),
        F.when(_cut(tier_high), "high")
        .when(_cut(tier_mid), "mid")
        .otherwise("low")
        .alias("tier"),
    )


def unigram_lm_counts(
    toked: DataFrame, tokens_col: str = "t", id_col: str = "doc_id"
) -> DataFrame:
    """The unigram LM as a TABLE — (term, cnt) corpus counts. Counts
    are additive, so this is the persistable/incremental half of
    :func:`unigram_lm_score`: land today's delta counts, fold them
    into the stored table with :func:`merge_lm_counts` (one
    delta-sized union+groupBy — the corpus is never rescanned), and
    score any batch against the frozen LM with
    :func:`unigram_lm_score_with`. Scoring new data against a FIXED
    reference LM is the deployed CCNet shape (the filter must not
    drift with the batch being filtered)."""
    terms = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("term")
    ).filter(F.col("term") != "")
    return terms.groupBy("term").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt")
    )


def merge_lm_counts(*tables: DataFrame) -> DataFrame:
    """Fold LM count tables: union + one groupBy sum. Exact and
    associative (bigint addition), so
    ``merge(counts(A), counts(B)) == counts(A ∪ B)`` row-for-row —
    the O(delta + vocab) maintenance path."""
    merged = tables[0]
    for t in tables[1:]:
        merged = merged.unionByName(t)
    return merged.groupBy("term").agg(
        F.sum("cnt").cast("bigint").alias("cnt")
    )


def subtract_lm_counts(
    base: DataFrame, removed: DataFrame
) -> DataFrame:
    """Retention-delete maintenance for the LM count ledger: counts
    form an ABELIAN GROUP (bigint addition has exact inverses), so
    removing documents is folding the REMOVED docs' own count table
    in with negated counts — O(removed + vocab), the corpus is never
    rescanned, and the result equals rebuilding from the surviving
    corpus row-for-row (pinned in tests). Terms whose count reaches
    zero drop out (a rebuilt table never contains them); a term going
    NEGATIVE means ``removed`` was not a subset of what ``base``
    counted — that is corruption, not a valid delete, and it raises
    loudly rather than silently shipping a broken LM.

    The same inverse-fold works for every purely-additive state
    (:func:`agg_state`'s count/sum components — but NOT its min/max,
    and NOT the HLL/bottom-k/heavy-hitters sketches, which are
    monotone joins without inverses: those families delete by
    recomputing the affected period partition, the ledger layout's
    native delete path)."""
    neg = removed.select(
        "term", (-F.col("cnt")).cast("bigint").alias("cnt")
    )
    out = merge_lm_counts(base, neg).localCheckpoint(eager=False)
    bad = out.filter(F.col("cnt") < 0).limit(1).collect()
    if bad:
        raise ValueError(
            "subtract_lm_counts: term "
            f"{bad[0]['term']!r} would go negative "
            f"({bad[0]['cnt']}) — the removed counts are not a subset "
            "of the base ledger (double-subtraction or wrong period?)"
        )
    return out.filter(F.col("cnt") > 0)


def unigram_lm_score_with(
    toked: DataFrame,
    counts: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    alpha: float = 0.5,
    tier_high: float = -3.40,
    tier_mid: float = -3.41,
) -> DataFrame:
    """Score documents against a GIVEN unigram LM count table (from
    :func:`unigram_lm_counts`, possibly merged across many deltas and
    read back from parquet). Same output contract and fixed-point
    determinism as :func:`unigram_lm_score`; the one semantic addition
    is out-of-vocabulary handling — tokens absent from the LM score at
    the smoothing floor ``α/(T+α·V)`` via a left join with cnt
    coalesced to 0, exactly what a frozen reference LM must do to a
    new batch. Scale shape: the batch's tf table left-joins the
    vocabulary-sized LM (keyed exchange, hint-free), (T, V) attach as
    the 1-row scalar."""
    terms = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("term")
    ).filter(F.col("term") != "")
    tf = terms.groupBy("id", "term").agg(F.count(F.lit(1)).alias("tf"))
    totals = counts.agg(
        F.sum("cnt").alias("total_tokens"),
        F.count(F.lit(1)).alias("vocab"),
    )
    logp = F.log(
        (F.coalesce(F.col("cnt"), F.lit(0)).cast("double") + F.lit(float(alpha)))
        / (
            F.col("total_tokens").cast("double")
            + F.lit(float(alpha)) * F.col("vocab").cast("double")
        )
    )
    scored = (
        tf.join(counts, "term", "left")
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("tf").cast("bigint").alias("n_tokens"),
            F.sum(_fixed(F.col("tf") * logp)).alias("sum_fp"),
        )
    )

    def _cut(thr: float) -> Column:
        return F.col("sum_fp") >= F.lit(round(thr * 10000)) * F.col("n_tokens")

    return scored.select(
        F.col("id").alias(id_col),
        "n_tokens",
        (F.col("sum_fp").cast("double") / _SCALE / F.col("n_tokens")).alias(
            "avg_logprob"
        ),
        F.when(_cut(tier_high), "high")
        .when(_cut(tier_mid), "mid")
        .otherwise("low")
        .alias("tier"),
    )


def bigram_lm_score(
    toked: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    lam: float = 0.7,
    alpha: float = 0.5,
    return_terms: bool = False,
) -> DataFrame:
    """Interpolated bigram-LM quality score (training-data extension):
    the next rung of the CCNet perplexity ladder above
    :func:`unigram_lm_score` — every document is scored by its mean
    bigram log-probability under ``p(w₂|w₁) = λ·c₂(w₁,w₂)/c₁(w₁) +
    (1-λ)·(c₁(w₂)+α)/(T+α·V)``, a corpus-trained bigram conditional
    interpolated with the add-α unigram (so unseen bigrams never hit
    log 0). Repetitive/templated text scores high, shuffled or
    off-distribution text low — a sharper quality signal than unigram
    frequency alone. ``c₁`` is the full unigram count (the standard
    corpus approximation: prefix occurrences differ from it only at
    document-final positions).

    Returns (id, n_bigrams, avg_logprob). Documents with fewer than 2
    tokens have no bigrams and emit no row. Per-bigram products are
    4-dp fixed-point quantized before the per-doc sum — exact integer
    addition, order-independent across engines and partitionings.

    Scale shape: bigram extraction is a scan-stage transform+explode
    (never a self-join); tf₂ shuffles on (doc, w₁, w₂); the corpus
    bigram/unigram tables are rollups of the tf tables (bigram-
    vocabulary / vocabulary cardinality); tf₂ re-joins them as plain
    keyed exchanges (corpus-derived — no broadcast hint; AQE
    skew-split covers head bigrams); (T, V) attach as the 1-row
    scalar; the final per-doc groupBy is the last shuffle."""
    bigrams = toked.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                f"CASE WHEN size({tokens_col}) < 2 THEN "
                f"array() ELSE transform(sequence(1, size({tokens_col}) - 1), "
                f"i -> struct(element_at({tokens_col}, i) AS w1, "
                f"element_at({tokens_col}, i + 1) AS w2)) END"
            )
        ).alias("bg"),
    ).select("id", "bg.w1", "bg.w2")
    tf2 = bigrams.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf2"))
    c2 = tf2.groupBy("w1", "w2").agg(F.sum("tf2").alias("c2"))
    # unigram counts over ALL token positions (not just prefixes)
    uni = toked.select(
        F.col(id_col).alias("id"), F.explode(F.col(tokens_col)).alias("w")
    ).filter(F.col("w") != "")
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).alias("c1"))
    totals = c1.agg(
        F.sum("c1").alias("total_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    p_cond = (
        F.col("c2").cast("double") / F.col("c1_prefix").cast("double")
    )
    p_uni = (
        F.col("c1_next").cast("double") + F.lit(float(alpha))
    ) / (
        F.col("total_tokens").cast("double")
        + F.lit(float(alpha)) * F.col("vocab").cast("double")
    )
    logp = F.log(F.lit(float(lam)) * p_cond + F.lit(1.0 - float(lam)) * p_uni)
    joined = (
        tf2.join(c2, ["w1", "w2"])
        .join(c1.select(F.col("w").alias("w1"), F.col("c1").alias("c1_prefix")), "w1")
        .join(c1.select(F.col("w").alias("w2"), F.col("c1").alias("c1_next")), "w2")
        .crossJoin(F.broadcast(totals))
    )
    if return_terms:
        # diagnostic seam for the ln-boundary sweep — the exact
        # pre-quantization per-bigram product
        return joined.select(
            "id", "w1", "w2", (F.col("tf2") * logp).alias("raw")
        )
    return (
        joined
        .groupBy("id")
        .agg(
            F.sum("tf2").cast("bigint").alias("n_bigrams"),
            F.sum(_fixed(F.col("tf2") * logp)).alias("sum_fp"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            (F.col("sum_fp").cast("double") / _SCALE / F.col("n_bigrams")).alias(
                "avg_logprob"
            ),
        )
    )


def agg_state(df: DataFrame, keys: list[str], measure: str) -> DataFrame:
    """Mergeable per-key aggregate STATE for one double measure:
    ``(count, fixed-point sum, min, max)`` — the partial-aggregation
    half of an incremental rollup (materialized-view maintenance).

    At 100 TB the point is to never re-aggregate the full corpus: keep
    yesterday's state table, compute today's delta state, and fold the
    two with :func:`merge_agg_states` — every component is associative
    and commutative, so ``merge(state(A), state(B)) ==
    state(A ∪ B)`` exactly (the sum is the catalog's 4-dp fixed-point
    integer, so even the float component is order-independent).
    """
    c = F.col(measure)
    return df.groupBy(*keys).agg(
        F.count(c).cast("bigint").alias("state_cnt"),
        F.sum(_fixed(c)).alias("state_sum_fp"),
        F.min(c).alias("state_min"),
        F.max(c).alias("state_max"),
    )


def merge_agg_states(keys: list[str], *states: DataFrame) -> DataFrame:
    """Fold any number of :func:`agg_state` tables into one: counts
    and fixed-point sums add, min/max fold — one union + one grouped
    aggregation over the (small) state tables, the delta-sized path of
    incremental view maintenance."""
    merged = states[0]
    for s in states[1:]:
        merged = merged.unionByName(s)
    return merged.groupBy(*keys).agg(
        F.sum("state_cnt").cast("bigint").alias("state_cnt"),
        F.sum("state_sum_fp").alias("state_sum_fp"),
        F.min("state_min").alias("state_min"),
        F.max("state_max").alias("state_max"),
    )


def finalize_agg_state(state: DataFrame, keys: list[str], name: str) -> DataFrame:
    """Resolve a state table into the user-facing aggregate columns
    ``cnt, sum_<name>, avg_<name>, min_<name>, max_<name>`` — the same
    deterministic double arithmetic as :func:`dec_sum`/:func:`dec_avg`
    (exact integer sum, one final division)."""
    sum_d = F.col("state_sum_fp").cast("double") / _SCALE
    return state.select(
        *keys,
        F.col("state_cnt").alias("cnt"),
        sum_d.alias(f"sum_{name}"),
        (sum_d / F.col("state_cnt")).alias(f"avg_{name}"),
        F.col("state_min").alias(f"min_{name}"),
        F.col("state_max").alias(f"max_{name}"),
    )


def bigram_lm_tables(
    toked: DataFrame, tokens_col: str = "t", id_col: str = "doc_id"
) -> tuple[DataFrame, DataFrame]:
    """The bigram LM as TABLES — ((w1, w2, c2), (w, c1)) corpus
    counts, the persistable/incremental half of
    :func:`bigram_lm_score` (mirror of :func:`unigram_lm_counts` for
    the interpolated bigram). Both tables are additive: fold daily
    deltas with :func:`merge_bigram_lm_tables` and score any batch
    against the frozen pair with :func:`bigram_lm_score_with`."""
    bigrams = toked.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                f"CASE WHEN size({tokens_col}) < 2 THEN "
                f"array() ELSE transform(sequence(1, size({tokens_col}) - 1), "
                f"i -> struct(element_at({tokens_col}, i) AS w1, "
                f"element_at({tokens_col}, i + 1) AS w2)) END"
            )
        ).alias("bg"),
    ).select("bg.w1", "bg.w2")
    c2 = bigrams.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("bigint").alias("c2")
    )
    uni = toked.select(
        F.explode(F.col(tokens_col)).alias("w")
    ).filter(F.col("w") != "")
    c1 = uni.groupBy("w").agg(F.count(F.lit(1)).cast("bigint").alias("c1"))
    return c2, c1


def merge_bigram_lm_tables(
    a: tuple[DataFrame, DataFrame], b: tuple[DataFrame, DataFrame]
) -> tuple[DataFrame, DataFrame]:
    """Fold two (c2, c1) table pairs: unions + one groupBy sum each —
    exact bigint addition, so the merge equals retraining on the
    union. O(delta + vocab²-observed), never O(corpus)."""
    c2 = (
        a[0].unionByName(b[0])
        .groupBy("w1", "w2")
        .agg(F.sum("c2").cast("bigint").alias("c2"))
    )
    c1 = (
        a[1].unionByName(b[1])
        .groupBy("w")
        .agg(F.sum("c1").cast("bigint").alias("c1"))
    )
    return c2, c1


def bigram_lm_score_with(
    toked: DataFrame,
    c2: DataFrame,
    c1: DataFrame,
    tokens_col: str = "t",
    id_col: str = "doc_id",
    lam: float = 0.7,
    alpha: float = 0.5,
) -> DataFrame:
    """Score documents against GIVEN bigram LM tables (from
    :func:`bigram_lm_tables`, possibly delta-merged and read back
    from parquet). Same output contract and fixed-point determinism
    as :func:`bigram_lm_score`; adds out-of-vocabulary handling for a
    NEW batch scored against a frozen reference LM: an unseen bigram
    contributes conditional probability 0 (only the interpolated
    unigram term survives), an unseen unigram scores at the add-α
    floor — both via left joins with coalesced counts, no division by
    a missing prefix count."""
    bigrams = toked.select(
        F.col(id_col).alias("id"),
        F.explode(
            F.expr(
                f"CASE WHEN size({tokens_col}) < 2 THEN "
                f"array() ELSE transform(sequence(1, size({tokens_col}) - 1), "
                f"i -> struct(element_at({tokens_col}, i) AS w1, "
                f"element_at({tokens_col}, i + 1) AS w2)) END"
            )
        ).alias("bg"),
    ).select("id", "bg.w1", "bg.w2")
    tf2 = bigrams.groupBy("id", "w1", "w2").agg(F.count(F.lit(1)).alias("tf2"))
    totals = c1.agg(
        F.sum("c1").alias("total_tokens"), F.count(F.lit(1)).alias("vocab")
    )
    # unseen prefix ⇒ c2 is necessarily 0 too: coalesce the prefix
    # denominator to 1 so 0/1 = 0 replaces the undefined 0/0
    p_cond = (
        F.coalesce(F.col("c2"), F.lit(0)).cast("double")
        / F.coalesce(F.col("c1_prefix"), F.lit(1)).cast("double")
    )
    p_uni = (
        F.coalesce(F.col("c1_next"), F.lit(0)).cast("double")
        + F.lit(float(alpha))
    ) / (
        F.col("total_tokens").cast("double")
        + F.lit(float(alpha)) * F.col("vocab").cast("double")
    )
    logp = F.log(F.lit(float(lam)) * p_cond + F.lit(1.0 - float(lam)) * p_uni)
    return (
        tf2.join(c2, ["w1", "w2"], "left")
        .join(
            c1.select(F.col("w").alias("w1"), F.col("c1").alias("c1_prefix")),
            "w1",
            "left",
        )
        .join(
            c1.select(F.col("w").alias("w2"), F.col("c1").alias("c1_next")),
            "w2",
            "left",
        )
        .crossJoin(F.broadcast(totals))
        .groupBy("id")
        .agg(
            F.sum("tf2").cast("bigint").alias("n_bigrams"),
            F.sum(_fixed(F.col("tf2") * logp)).alias("sum_fp"),
        )
        .select(
            F.col("id").alias(id_col),
            "n_bigrams",
            (F.col("sum_fp").cast("double") / _SCALE / F.col("n_bigrams")).alias(
                "avg_logprob"
            ),
        )
    )
