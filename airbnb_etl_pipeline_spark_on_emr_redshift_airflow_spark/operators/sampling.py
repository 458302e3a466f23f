"""Training-data sampling / mixing / packing operators.

The corpus-preparation steps between "deduped documents" and "training
batches" (training-data extension beyond the reference, alongside the
dedup/similarity ladder): deterministic subsampling, mixture weighting
across sources, epoch shuffling, and fixed-context sequence packing.

Design rules shared by all four:

- **Deterministic by construction** — sampling decisions come from
  ``xxhash64(key, seed)``, never from an RNG, so a run is reproducible
  across retries, partition counts, and cluster sizes (Spark's
  ``sample``/``sampleBy`` reseed per partition split, which silently
  changes the sample when the input layout changes).
- **No driver-side state** — every operator is a column expression or
  a bounded ``applyInPandas`` group; nothing collects.
- **One shuffle or less** — sampling and mixing are scan-stage
  filters; shuffle appears only where semantics require placement
  (epoch shuffle, packing groups).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Hash-bucket resolution for sampling rates: 1/1e6 granularity.
_BUCKETS = 1_000_000


def _rate_filter(key_cols: list[str], rate: float, seed: int):
    """Deterministic keep-predicate: keep iff
    ``xxhash64(seed, keys) mod 1e6 < rate * 1e6``."""
    bucket = F.pmod(F.xxhash64(F.lit(seed), *key_cols), F.lit(_BUCKETS))
    return bucket < int(rate * _BUCKETS)


def deterministic_sample(
    df: DataFrame, rate: float, key_cols: list[str], seed: int = 0
) -> DataFrame:
    """Keep a deterministic ``rate`` fraction of rows, keyed by
    ``key_cols``: the same (key, seed) is kept or dropped identically
    in every run, on any cluster layout — a scan-stage filter, no
    shuffle, no RNG state."""
    return df.filter(_rate_filter(key_cols, rate, seed))


def stratified_sample(
    df: DataFrame,
    strata_col: str,
    fractions: dict,
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. downsample boilerplate
    web text to 10% while keeping 100% of books): ``fractions`` maps
    stratum value -> keep rate; missing strata keep rate 0. Pure
    scan-stage CASE over the hash bucket — never a shuffle, unlike
    count-then-limit approaches."""
    bucket = F.pmod(F.xxhash64(F.lit(seed), *key_cols), F.lit(_BUCKETS))
    keep = F.lit(False)
    for value, rate in fractions.items():
        keep = keep | (
            (F.col(strata_col) == F.lit(value)) & (bucket < int(rate * _BUCKETS))
        )
    return df.filter(keep)


def weighted_mix(
    sources: dict[str, tuple[DataFrame, float]],
    key_cols: list[str],
    seed: int = 0,
) -> DataFrame:
    """Mixture weighting across corpora: ``sources`` maps source name
    -> (DataFrame, keep_rate). Each source is deterministically
    subsampled at its rate and tagged with a ``source`` column, then
    union'd by name — the standard "x% web, y% code, z% books" recipe
    as one lazy plan. Rates are per-source keep fractions (relative
    mixture weights / epochs are a caller-side computation from corpus
    sizes)."""
    tagged = []
    for name, (df, rate) in sources.items():
        tagged.append(
            df.filter(_rate_filter(key_cols, rate, seed)).withColumn(
                "source", F.lit(name)
            )
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return out


def epoch_shuffle(
    df: DataFrame, key_cols: list[str], seed: int = 0, num_partitions: int | None = None
) -> DataFrame:
    """Deterministic global shuffle for one training epoch: rows are
    ordered by ``xxhash64(seed, keys)`` — a RANGE repartition on the
    hash plus a within-partition sort, so each partition holds a
    contiguous slice of the global hash order and reading partitions
    in order yields THE total order by (hash, keys). That order is a
    function of (data, seed) alone — independent of
    ``num_partitions``, ``spark.sql.shuffle.partitions``, and cluster
    layout (partition boundaries only pick the split points of the
    same global order; hash ties break on the key columns). One
    shuffle; no single-partition stage; a new seed is a new epoch
    permutation."""
    hashed = df.withColumn("__h", F.xxhash64(F.lit(seed), *key_cols))
    parted = (
        hashed.repartitionByRange(num_partitions, "__h")
        if num_partitions
        else hashed.repartitionByRange("__h")
    )
    return parted.sortWithinPartitions("__h", *key_cols).drop("__h")


def epoch_shards(
    df: DataFrame,
    key_cols: list[str],
    seed: int = 0,
    n_shards: int = 16,
) -> DataFrame:
    """The DATA-LOADER MANIFEST form of :func:`epoch_shuffle`
    (round 12): per row, the shard a loader worker reads it from and
    its position within that shard — ``shard = pmod(xxhash64(seed,
    keys), n_shards)``, ``pos = row_number() over (partition by shard
    order by hash, keys)``. Worker *w* streaming shard *w* in ``pos``
    order yields a deterministic, seed-keyed epoch permutation with
    hash-balanced shards (±O(√(N/shards)) skew) — the reproducible
    multi-epoch ordering a resumable trainer needs (epoch = new seed;
    restart = seek to the recorded pos). One shuffle on ``shard``;
    nothing single-partition; every quantity is a pure xxhash64/rank
    expression, so the manifest replays bit-for-bit cross-engine."""
    from pyspark.sql import Window

    h = F.xxhash64(F.lit(seed), *key_cols)
    w = Window.partitionBy("shard").orderBy("__h", *key_cols)
    return (
        df.select(*key_cols, h.alias("__h"))
        .withColumn("shard", F.pmod(F.col("__h"), F.lit(n_shards)).cast("int"))
        .withColumn("pos", F.row_number().over(w).cast("bigint"))
        .drop("__h")
    )


def group_sample_topk(
    df: DataFrame,
    group_col: str,
    k: int,
    key_cols: list[str],
    prefilter_rate: float | None = None,
    seed: int = 0,
) -> DataFrame:
    """Exactly-k deterministic sample per group: rank each group's rows
    by ``md5(key)`` (a uniform, engine-portable pseudo-order — unlike
    ``xxhash64``, md5 exists identically in every SQL engine, so this
    sampler is oracle-checkable cross-engine) and keep the first ``k``.
    Complements ``stratified_sample``: that keeps a *fraction* with no
    count guarantee; this guarantees the exact per-group count.

    Adds ``sample_rank`` (1..k within each group). One shuffle on
    ``group_col``. For groups far larger than ``k``, pass
    ``prefilter_rate`` to cut rows by the deterministic xxhash64
    predicate *before* the window sort so the per-group sort is over
    ~``rate·|group|`` rows, not the full group — callers should pick a
    rate that keeps ≥ k survivors per group with margin (e.g.
    ``50·k/min_group_size``); the operator itself never silently
    under-fills without such a prefilter.
    """
    out = df
    if prefilter_rate is not None:
        out = out.filter(_rate_filter(key_cols, prefilter_rate, seed))
    order = F.md5(F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols]))
    w = Window.partitionBy(group_col).orderBy(order.asc(), *key_cols)
    return (
        out.withColumn("sample_rank", F.row_number().over(w))
        .filter(F.col("sample_rank") <= k)
    )


def chunk_documents(
    df: DataFrame,
    tokens_col: str,
    max_tokens: int,
    overlap: int = 0,
) -> DataFrame:
    """Split each document's token array into fixed context windows of
    ``max_tokens`` with ``overlap`` tokens shared between consecutive
    chunks (the long-document splitting step before tokenized training
    batches — the complement of :func:`pack_sequences`, which merges
    short docs; a real pipeline chunks then packs).

    Emits one row per chunk with ``chunk_id`` (0-based within the
    doc), ``chunk_tokens`` (the token slice), and ``n_chunk_tokens``.
    Window starts are ``range(0, max(n - overlap, 1), step)`` with
    ``step = max_tokens - overlap``: every token is covered (the last
    start is ≥ n - max_tokens), no window is fully contained in its
    predecessor, and zero-token docs emit zero chunks.

    Scale shape: a pure scan-stage generate (sequence + explode +
    slice) — no shuffle, no UDF, at any corpus size; output rows carry
    only the slice, so a chunk row never duplicates the whole doc.
    """
    if not 0 <= overlap < max_tokens:
        raise ValueError(
            f"chunk_documents: need 0 <= overlap < max_tokens, "
            f"got overlap={overlap} max_tokens={max_tokens}"
        )
    step = max_tokens - overlap
    starts = F.expr(
        f"CASE WHEN size({tokens_col}) = 0 THEN array() "
        f"ELSE sequence(0, greatest(size({tokens_col}) - {overlap}, 1) - 1, "
        f"{step}) END"
    )
    keep = [c for c in df.columns if c != tokens_col]
    exploded = df.select(*keep, F.col(tokens_col), F.explode(starts).alias("__start"))
    chunk = F.slice(F.col(tokens_col), F.col("__start") + 1, max_tokens)
    return exploded.select(
        *keep,
        F.expr(f"CAST(__start DIV {step} AS BIGINT)").alias("chunk_id"),
        chunk.alias("chunk_tokens"),
        F.size(chunk).cast("bigint").alias("n_chunk_tokens"),
    )


def pack_sequences(
    df: DataFrame,
    len_col: str,
    max_len: int,
    key_cols: list[str],
    n_groups: int = 1024,
    seed: int = 0,
) -> DataFrame:
    """Greedy first-fit packing of variable-length documents into
    fixed-size context windows (the "sequence packing" step before
    tokenized training batches): emits one row per input row with a
    ``pack_id`` (global, deterministic) and ``pack_offset`` (token
    start inside the pack); every pack's total length ≤ ``max_len``
    (rows longer than ``max_len`` get a pack of their own).

    Scale shape: rows hash into ``n_groups`` packing groups (size the
    modulus so a group's rows fit one task comfortably — corpus_rows /
    n_groups ≈ 10k-1M), one shuffle; the greedy scan runs per group in
    an Arrow-batched ``applyInPandas``. Packing quality is per-group
    (greedy within a group), which is the standard trade — global
    optimal packing would serialize.
    """
    n_groups = max(1, n_groups)
    if n_groups > (1 << 31):
        raise ValueError(
            f"pack_sequences: n_groups={n_groups} exceeds 2^31 — "
            "pack_id packs (group, local_pack) into one int64 as "
            "group << 32 | local_pack"
        )

    grouped = df.withColumn(
        "__g", F.pmod(F.xxhash64(F.lit(seed), *key_cols), F.lit(n_groups))
    ).withColumn("__h", F.xxhash64(F.lit(seed + 1), *key_cols))

    out_schema = ", ".join(
        [f"{name} {dtype}" for name, dtype in df.dtypes]
        + ["pack_id bigint", "pack_offset bigint"]
    )
    payload_cols = list(df.columns)

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        # Deterministic order inside the group: by the secondary hash.
        pdf = pdf.sort_values("__h", kind="mergesort").reset_index(drop=True)
        group = int(pdf["__g"].iloc[0])
        pack_ids, offsets = [], []
        local_pack, used = 0, 0
        for length in pdf[len_col]:
            length = int(min(length, max_len))
            if used + length > max_len and used > 0:
                local_pack += 1
                used = 0
            # Collision-free composite id: high 32 bits = group, low 32
            # = pack index within the group. A group would need 2^32
            # packs (far beyond one task's rows) to overflow the low
            # half — assert rather than silently collide.
            if local_pack >= (1 << 32):
                raise ValueError(
                    "pack_sequences: >2^32 packs in one group — raise "
                    "n_groups so groups stay task-sized"
                )
            pack_ids.append((group << 32) | local_pack)
            offsets.append(used)
            used += length
        pdf = pdf[payload_cols].copy()
        pdf["pack_id"] = pack_ids
        pdf["pack_offset"] = offsets
        return pdf

    return grouped.groupBy("__g").applyInPandas(pack, out_schema)


def hash_uniform(key_cols: list[str], seed: int = 0) -> Column:
    """Deterministic pseudo-uniform in (0, 1) from row keys — the
    production randomness source for :func:`weighted_sample_topk`
    (xxhash64: layout- and retry-stable like every sampler here).
    Oracle-checked queries substitute an engine-portable arithmetic
    hash instead (xxhash64 exists only in Spark)."""
    h = F.xxhash64(F.lit(seed), *[F.col(c) for c in key_cols])
    # map to (0,1): abs bucket + half-step offset avoids exact 0/1
    return (F.pmod(h, F.lit(_BUCKETS)) + 0.5) / _BUCKETS


def weighted_sample_topk(
    df: DataFrame,
    k: int,
    weight_col: str,
    u_col: Column,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, Efraimidis–Spirakis
    A-ES: each row draws priority ``u^(1/w)`` from its uniform ``u``
    and weight ``w``; the global top-``k`` priorities ARE a weighted
    sample without replacement. Deterministic given a deterministic
    ``u_col`` (see :func:`hash_uniform`).

    Scale shape: priority is a scan-stage expression; top-k plans as
    TakeOrderedAndProject (per-partition heaps + driver merge of k
    rows) — no global sort, no shuffle of the corpus. Rows with
    non-positive weight are excluded (they'd never be sampled).
    Output adds ``priority`` (descending = selection order); pass
    ``tiebreak_cols`` (a unique key) so the k-boundary is total.
    """
    w = F.col(weight_col).cast("double")
    pri = F.pow(u_col, 1.0 / w).alias("priority")
    order = [F.col("priority").desc()] + [
        F.col(c) for c in (tiebreak_cols or [])
    ]
    return df.filter(w > 0).select("*", pri).orderBy(*order).limit(k)


def budget_select(
    df: DataFrame,
    measure_col: str,
    priority_col: str,
    tiebreak_col: str,
    budget: int | None = None,
    budget_frac: float | None = None,
    n_buckets: int = 32,
    rel_err: float = 0.001,
) -> DataFrame:
    """Priority-ordered budget selection (training-data extension):
    sort the corpus best-first by ``priority_col`` (descending,
    ``tiebreak_col`` ascending for a unique total order) and keep rows
    while the running total of ``measure_col`` stays within the
    budget — "take the highest-quality documents until the token
    budget is spent", the greedy knapsack every fixed-compute
    pretraining run starts from. Pass either an absolute ``budget`` or
    ``budget_frac`` (fraction of the corpus-wide measure total,
    resolved via a 1-row scalar).

    The naive form is ``SUM(m) OVER (ORDER BY priority DESC)`` — a
    GLOBAL window, i.e. one partition holding the corpus. Here the
    running sum is two-phase (same scheme as
    :func:`..windows.global_distribution_ranks`): approx-quantile
    boundaries on the priority column give a monotone bucket id
    (scan-stage CASE, no shuffle); per-bucket measure totals (tiny
    aggregate, ≤ ``n_buckets`` rows) turn into cumulative offsets via
    a window over that tiny frame, broadcast back; each row's running
    total is its bucket offset plus a within-bucket running sum (one
    shuffle partitioned by bucket). Equal priorities share a bucket,
    so the offset math is exact regardless of boundary error; only
    bucket SIZES are approximate.

    Adds ``cum_measure`` (the running total including the row) and
    keeps rows with ``cum_measure <= budget``. ``priority_col`` must
    be non-null (engines disagree on null ordering — coalesce
    upstream).

    Degenerate case: a priority value spanning ≥ 1/n_buckets of the
    corpus collapses into one bucket (equal values cannot straddle a
    boundary), and a CONSTANT priority makes the within-bucket window
    global again. Results stay exact; only parallelism degrades. Use
    a high-cardinality priority (a quality score, not a 3-level
    tier), or decorate ties with a deterministic hash fraction before
    calling."""
    if (budget is None) == (budget_frac is None):
        raise ValueError(
            "budget_select: pass exactly one of budget / budget_frac"
        )
    boundaries = df.stat.approxQuantile(
        priority_col, [i / n_buckets for i in range(1, n_buckets)], rel_err
    )
    # descending bucket id: 1 + #boundaries strictly above the value
    bucket = F.lit(1)
    for b in boundaries:
        bucket = bucket + F.when(F.col(priority_col) < F.lit(b), 1).otherwise(0)
    bucketed = df.withColumn("__bucket", bucket)

    m = F.col(measure_col).cast("bigint")
    per_bucket = bucketed.groupBy("__bucket").agg(F.sum(m).alias("__bsum"))
    w_off = Window.orderBy("__bucket").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offsets = per_bucket.select(
        "__bucket",
        F.coalesce(F.sum("__bsum").over(w_off), F.lit(0)).alias("__offset"),
        F.sum("__bsum")
        .over(
            Window.rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        )
        .alias("__total"),
    )

    w_local = (
        Window.partitionBy("__bucket")
        .orderBy(F.col(priority_col).desc(), F.col(tiebreak_col).asc())
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.col("__offset") + F.sum(m).over(w_local)
    if budget is not None:
        limit = F.lit(int(budget))
    else:
        # bigint total < 2^53 ⇒ the double product is exact enough for
        # a deterministic floor in both engines
        limit = F.floor(
            F.col("__total").cast("double") * F.lit(float(budget_frac))
        )
    return (
        bucketed.join(F.broadcast(offsets), "__bucket")
        .withColumn("cum_measure", cum)
        .filter(F.col("cum_measure") <= limit)
        .drop("__bucket", "__bsum", "__offset", "__total")
    )


# ---- DSIR: data selection via importance resampling -----------------


def _md5_bucket(col: Column, n_buckets: int) -> Column:
    """Engine-portable hash bucket: the first 4 hex digits of md5 as
    an integer, mod ``n_buckets``. md5 produces identical bytes in
    every SQL engine (unlike ``xxhash64``), so bucket assignments —
    and therefore the whole DSIR weight computation — are
    oracle-checkable cross-engine. 16 bits of hash is plenty: buckets
    only need to be uniform, not collision-free (collisions are the
    POINT of the hashing trick)."""
    return (
        F.conv(F.md5(col).substr(1, 4), 16, 10).cast("int") % n_buckets
    )


def dsir_weights(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    target_col: str,
    n_buckets: int = 1024,
    alpha: float = 1.0,
    scale: int = 10_000,
) -> DataFrame:
    """Hashed n-gram importance weights for data selection (DSIR,
    Xie et al. 2023, "Data Selection for Language Models via
    Importance Resampling"): score every document by how much more
    likely its token stream is under a bag-of-hashed-ngrams model of
    the TARGET distribution (rows where ``target_col`` is true — e.g.
    a trusted high-quality subset) than under the RAW corpus model.

    ``weight(d) = Σ_b count_d[b] · (log p_tgt[b] − log p_raw[b])``
    over unigram+bigram features hashed into ``n_buckets`` buckets
    (add-``alpha`` smoothing on both models). Returns one row per doc:
    ``(id, n_grams, weight_fp, dsir_score)`` where ``weight_fp`` is
    the ``scale``-fixed-point integer sum (exact, order-independent —
    the same cross-engine determinism device as the LM scorers) and
    ``dsir_score = weight_fp / scale / n_grams`` is the
    length-normalized per-gram log-ratio.

    Scale shape: gram extraction is scan-stage (transform + one
    explode, no self-join); the (doc, bucket) count table is one hash
    shuffle; both models are rollups of that table to ≤ ``n_buckets``
    rows — bounded by a CONSTANT, not by corpus size, so the log-ratio
    table attaches to the per-doc counts as an AQE-broadcast keyed
    join (unlike a corpus-derived vocabulary, which must never carry a
    broadcast hint); the final per-doc sum is the last shuffle.
    """
    grams = df.select(
        F.col(id_col).alias("id"),
        F.col(target_col).cast("boolean").alias("__tgt"),
        F.explode(
            F.expr(
                f"concat({tokens_col}, CASE WHEN size({tokens_col}) < 2 "
                f"THEN array() ELSE transform("
                f"sequence(1, size({tokens_col}) - 1), "
                f"i -> concat(element_at({tokens_col}, i), '_', "
                f"element_at({tokens_col}, i + 1))) END)"
            )
        ).alias("gram"),
    )
    db = (
        grams.withColumn("bucket", _md5_bucket(F.col("gram"), n_buckets))
        .groupBy("id", "__tgt", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        # Materialized once (lazy checkpoint): FOUR consumers (raw,
        # tgt, totals, the final per-doc join) each re-ran the gram
        # explode + md5 bucketing + count shuffle otherwise — column
        # pruning gives each consumer a differently-pruned subtree, so
        # ReuseExchange never fires on them (two identical 358k-row
        # gram stages per run at sf0.1, 4 corpus scans at any scale).
        # The cached frame is the slim (id, tgt, bucket, cnt) count
        # table — the smallest thing the four rollups can share.
        .localCheckpoint(eager=False)
    )
    raw = db.groupBy("bucket").agg(F.sum("cnt").alias("c_raw"))
    tgt = (
        db.filter(F.col("__tgt"))
        .groupBy("bucket")
        .agg(F.sum("cnt").alias("c_tgt"))
    )
    # 1-row totals attach via a bounded crossJoin (≤ n_buckets rows on
    # the left, exactly 1 on the right).
    totals = db.agg(
        F.sum("cnt").alias("t_raw"),
        F.sum(F.when(F.col("__tgt"), F.col("cnt")).otherwise(F.lit(0))).alias(
            "t_tgt"
        ),
    )
    a, b = float(alpha), float(alpha) * n_buckets
    lm = (
        raw.join(tgt, "bucket", "left")
        .na.fill({"c_tgt": 0})
        .crossJoin(F.broadcast(totals))
        .select(
            "bucket",
            F.floor(
                (
                    F.log(
                        (F.col("c_tgt").cast("double") + F.lit(a))
                        / (F.col("t_tgt").cast("double") + F.lit(b))
                    )
                    - F.log(
                        (F.col("c_raw").cast("double") + F.lit(a))
                        / (F.col("t_raw").cast("double") + F.lit(b))
                    )
                )
                * F.lit(float(scale))
                + F.lit(0.5)
            )
            .cast("bigint")
            .alias("lr_fp"),
        )
    )
    return (
        db.join(lm, "bucket")
        .groupBy("id")
        .agg(
            F.sum("cnt").cast("bigint").alias("n_grams"),
            F.sum(F.col("cnt") * F.col("lr_fp")).cast("bigint").alias(
                "weight_fp"
            ),
        )
        .select(
            F.col("id").alias(id_col),
            "n_grams",
            "weight_fp",
            (
                F.col("weight_fp").cast("double")
                / F.lit(float(scale))
                / F.col("n_grams")
            ).alias("dsir_score"),
        )
    )


def temperature_rebalance(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    alpha: float = 0.5,
    target_frac: float | None = None,
    target_total: int | None = None,
    seed: int = 0,
    u_col: Column | None = None,
) -> DataFrame:
    """Temperature-based group rebalancing (training-data extension —
    the multilingual-mixture recipe of mT5 / XLM-R): resample so group
    ``g``'s share moves from its natural ``p_g = n_g / N`` toward the
    temperature-flattened ``q_g = n_g^alpha / Σ n_j^alpha``
    (``alpha = 1/T``; ``alpha=1`` keeps the corpus as-is, ``alpha=0``
    is uniform-over-groups). Head groups (English, web crawl) are
    downsampled; tail groups keep up to 100% of their rows — the
    without-replacement cap, so the achieved total can undershoot the
    target when tails saturate (the standard trade; upsampling is an
    epoch-level concern, not a row filter).

    Per-group keep rate: ``r_g = min(1, T·q_g / n_g)`` where ``T`` is
    the row target (``target_total``, or ``floor(target_frac · N)``;
    exactly one must be given). Rows are kept by the same deterministic
    hash predicate as every sampler here (``u < r_g`` with
    ``u = hash_uniform(key_cols, seed)``), so the keep-set is a pure
    function of (data, alpha, target, seed) — layout- and retry-stable.
    Pass ``u_col`` to substitute an engine-portable uniform for
    oracle-checked use.

    Scale shape: group counts are one small aggregate (group
    cardinality is dim-like by contract — languages / sources, not
    docs); the 2-row totals attach via bounded broadcast crossJoin; the
    rate table re-attaches to the corpus as an AQE-broadcast keyed join
    (no explicit hint — same rule as every corpus-derived small table);
    the keep predicate is scan-stage. ``alpha=0.5`` uses ``sqrt``
    (IEEE correctly-rounded in both engines) rather than ``pow``, and
    each group's weight is quantized to fixed point (1e6) BEFORE the
    ``Z`` normalizer sums them — an exact integer sum is associative,
    so ``Z`` (and with it every ``keep_rate`` and the ``u <
    keep_rate`` boundary) is independent of partition/accumulation
    order: bit-identical cross-engine and across layouts.

    Output: the kept rows with ``keep_rate`` appended.
    """
    if (target_frac is None) == (target_total is None):
        raise ValueError(
            "temperature_rebalance: pass exactly one of "
            "target_frac / target_total"
        )

    def _powa_fp(c: Column) -> Column:
        # Fixed-point (1e6) per-group weight: sqrt/pow are IEEE
        # correctly-rounded doubles, but SUMMING raw doubles is
        # accumulation-order-dependent (partition layout could shift
        # Z, and with it the u < keep_rate boundary, by 1 ulp).
        # Quantizing each term to an exact bigint makes Z an integer
        # sum — associative, so order-independent — and every
        # downstream double op is a deterministic function of exact
        # integer inputs. The 1e-6 rate granularity is far below any
        # sampling-rate tolerance that matters.
        d = c.cast("double")
        w = F.sqrt(d) if alpha == 0.5 else F.pow(d, float(alpha))
        return F.floor(w * F.lit(1_000_000.0) + F.lit(0.5)).cast("bigint")

    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_g"))
    totals = counts.agg(
        F.sum("__n_g").cast("bigint").alias("__N"),
        F.sum(_powa_fp(F.col("__n_g"))).cast("bigint").alias("__Z"),
    )
    if target_total is not None:
        tgt = F.lit(int(target_total)).cast("double")
    else:
        tgt = F.floor(
            F.col("__N").cast("double") * F.lit(float(target_frac))
        ).cast("double")
    rates = (
        counts.crossJoin(F.broadcast(totals))
        .select(
            F.col(group_col).alias("__grp"),
            F.least(
                F.lit(1.0),
                _powa_fp(F.col("__n_g")).cast("double")
                / F.col("__Z").cast("double")
                * tgt
                / F.col("__n_g").cast("double"),
            ).alias("keep_rate"),
        )
    )
    u = u_col if u_col is not None else hash_uniform(key_cols, seed)
    # Null-safe group match: groupBy counts nulls as their own group,
    # so a null-group row must find its rate too (a plain equi-join
    # would silently drop every null-group row).
    return (
        df.join(rates, F.col(group_col).eqNullSafe(F.col("__grp")))
        .drop("__grp")
        .filter(u < F.col("keep_rate"))
    )


def dsir_select(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    target_col: str,
    k: int,
    n_buckets: int = 1024,
    alpha: float = 1.0,
) -> DataFrame:
    """Top-``k`` documents by DSIR importance weight (deterministic
    greedy form — for the sampled variant, feed ``dsir_score`` into
    ``weighted_sample_topk`` as the weight). Order is (score desc,
    id asc): the score is a ratio of exact integers so both engines
    order identically. TakeOrderedAndProject — per-partition heaps,
    no global sort."""
    w = dsir_weights(
        df, tokens_col, id_col, target_col, n_buckets=n_buckets, alpha=alpha
    )
    return w.orderBy(
        F.col("dsir_score").desc(), F.col(id_col).asc()
    ).limit(k)


def cluster_safe_split(
    df: DataFrame,
    id_col: str,
    clusters: DataFrame,
    eval_frac: float,
    seed: int = 0,
    u_col: Column | None = None,
) -> DataFrame:
    """Train/eval split with a duplicate-leakage guard: every member
    of a duplicate cluster lands in the SAME split, so a near-copy of
    an eval document can never sit in train (the split-time
    counterpart of benchmark decontamination — Lee et al. 2022 measure
    exactly this eval-leakage effect from naive random splits).

    ``clusters`` maps ``id_col`` -> ``cluster_id`` (from any rung of
    the dedup ladder: exact-fingerprint groups, MinHash connected
    components, SemDeDup cells). Documents absent from ``clusters``
    are singletons. The split decision hashes the CLUSTER key — one
    deterministic uniform per cluster (``u_col`` overrides it for
    engine-portable oracle use, receiving the coalesced cluster key as
    its input column) — so membership, not chance, decides the side.

    Returns the input rows plus ``cluster_key`` (the cluster id as a
    string, or ``id:<doc id>`` for singletons) and ``split``
    ('train'/'eval').

    Scale shape: one keyed LEFT join of the (slim) cluster map onto
    the corpus — no hint; cluster maps are corpus-derived — and a
    scan-stage hash predicate. No shuffle beyond the join.
    """
    # Resolve overlapping memberships deterministically (a doc listed
    # under two clusters — e.g. raw pair output — would otherwise
    # DUPLICATE its corpus row through the join): min cluster wins.
    # One extra shuffle of the slim map only.
    cmap = (
        clusters.groupBy(id_col)
        .agg(F.min("cluster_id").alias("__cid"))
        .select(
            F.col(id_col),
            F.concat(F.lit("c:"), F.col("__cid").cast("string")).alias(
                "__ckey"
            ),
        )
    )
    joined = df.join(cmap, id_col, "left")
    ckey = F.coalesce(
        F.col("__ckey"),
        F.concat(F.lit("id:"), F.col(id_col).cast("string")),
    )
    if u_col is None:
        u = (
            F.pmod(F.xxhash64(F.lit(seed), ckey), F.lit(_BUCKETS)) + 0.5
        ) / _BUCKETS
    else:
        u = u_col(ckey) if callable(u_col) else u_col
    return (
        joined.withColumn("cluster_key", ckey)
        .withColumn(
            "split",
            F.when(u < F.lit(float(eval_frac)), "eval").otherwise("train"),
        )
        .drop("__ckey")
    )


def materialize_packs(
    packed: DataFrame,
    tokens_col: str,
    sep_token: str | None = None,
) -> DataFrame:
    """Turn :func:`pack_sequences` assignments into the actual packed
    token arrays — the last hop before training batches: one row per
    ``pack_id`` with the member documents' tokens concatenated in
    ``pack_offset`` order, optionally joined by ``sep_token`` (the
    EOS/document-boundary marker every LM pretraining batch carries).

    Input is the :func:`pack_sequences` output plus the token column.
    Returns (pack_id, n_docs, n_tokens, tokens).

    Scale shape: one shuffle on ``pack_id``; per-group state is ONE
    pack's tokens — bounded by ``max_len`` (+ separators) by the
    packing contract, regardless of corpus size. The offset-ordered
    concatenation is ``array_sort`` on (offset, tokens) structs +
    ``flatten`` — pure column expressions, no Python.
    """
    sep = (
        F.array(F.lit(sep_token))
        if sep_token is not None
        else F.array().cast("array<string>")
    )
    member = F.struct(
        F.col("pack_offset").alias("o"),
        F.concat(F.col(tokens_col), sep).alias("tk"),
    )
    rolled = (
        packed.select("pack_id", member.alias("__m"))
        .groupBy("pack_id")
        .agg(F.collect_list("__m").alias("__ms"))
    )
    toks = F.flatten(
        F.transform(F.array_sort(F.col("__ms")), lambda m: m["tk"])
    )
    return rolled.select(
        "pack_id",
        F.size("__ms").cast("bigint").alias("n_docs"),
        F.size(toks).cast("bigint").alias("n_tokens"),
        toks.alias("tokens"),
    )


def unimax_budget_sample(
    df: DataFrame,
    group_col: str,
    key_cols: list[str],
    total_budget: int,
    epoch_cap: float = 1.0,
    seed: int = 0,
    u_col: Column | None = None,
) -> DataFrame:
    """UniMax-style budget-capped group mixture (Chung et al. 2023,
    "UniMax: Fairer and More Effective Language Sampling"): spend a
    TOTAL row budget as uniformly as possible across groups, except
    no group may contribute more than ``epoch_cap`` passes over its
    own data. Tail groups (small languages) contribute everything up
    to their cap; head groups split the remaining budget EQUALLY —
    the waterfill that UniMax showed beats temperature smoothing for
    multilingual mixtures (no head group starves the mid-tail).

    Allocation is the exact waterfill: with capacities
    ``c_g = floor(epoch_cap * n_g)``, every group gets
    ``alloc_g = min(c_g, w)`` where the waterline ``w`` is the
    largest uniform share spending ≤ the budget. Closed form over
    the capacity-sorted group table: groups whose cap fits under
    their positional share keep the cap; the first group whose cap
    exceeds it starts the waterline region, which splits the leftover
    budget by integer division. EVERY comparison and the waterline
    itself are exact integer arithmetic (cross-multiplied
    inequalities, integer div), so allocations are identical across
    engines and layouts — the property the DuckDB oracle checks
    end-to-end.

    Rows are kept by the deterministic hash predicate
    ``u < alloc_g / n_g`` (``hash_uniform`` over ``key_cols``; pass
    ``u_col`` for an engine-portable substitute). ``epoch_cap > 1``
    means groups allocated past one epoch keep ALL rows
    (``keep_rate`` caps at 1); the returned ``epochs`` column
    (``alloc_g / n_g``) tells the training loop how many passes to
    take — upsampling is an epoch-level concern, same contract as
    :func:`temperature_rebalance`.

    Scale shape: one dim-sized count aggregate; the waterfill is two
    windows over the GROUP table (dim-sized by contract — languages /
    sources, never documents); the allocation re-attaches as an
    AQE-sized keyed join; the keep predicate is scan-stage.

    Output: kept rows + ``keep_rate`` (the filter rate, ≤ 1),
    ``alloc`` (the group's row allocation) and ``epochs``.
    """
    if total_budget <= 0:
        raise ValueError("unimax_budget_sample: total_budget must be > 0")
    if epoch_cap <= 0:
        raise ValueError("unimax_budget_sample: epoch_cap must be > 0")
    B = F.lit(int(total_budget)).cast("bigint")
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("__n_g"))
    caps = counts.select(
        F.col(group_col).alias("__grp"),
        "__n_g",
        F.floor(F.col("__n_g").cast("double") * F.lit(float(epoch_cap)))
        .cast("bigint")
        .alias("__cap"),
    )
    # capacity-sorted positional frame (dim-sized; the single-partition
    # window over it is the same class as temperature's 2-row totals)
    w_order = Window.orderBy(F.col("__cap").asc(), F.col("__grp").asc())
    pos = caps.select(
        "__grp",
        "__n_g",
        "__cap",
        F.row_number().over(w_order).alias("__rn"),
        F.sum("__cap")
        .over(w_order.rowsBetween(Window.unboundedPreceding, -1))
        .alias("__s_before"),
        F.count(F.lit(1)).over(
            Window.orderBy(F.lit(1)).rowsBetween(
                Window.unboundedPreceding, Window.unboundedFollowing
            )
        ).alias("__g_total"),
    ).select(
        "__grp",
        "__n_g",
        "__cap",
        "__rn",
        F.coalesce(F.col("__s_before"), F.lit(0)).cast("bigint").alias("__sb"),
        "__g_total",
    )
    # group is waterline-bound when its cap exceeds its positional
    # share: cap * remaining_groups > remaining_budget (exact integers)
    bound = pos.withColumn(
        "__bound",
        (F.col("__cap") * (F.col("__g_total") - F.col("__rn") + 1))
        > (B - F.col("__sb")),
    )
    first = bound.filter(F.col("__bound")).agg(
        F.min("__rn").alias("__first_rn")
    )
    # waterline = integer share of the leftover at the first bound
    # position (NULL when no group is bound — the budget covers all
    # caps and every group just takes its cap)
    line = (
        bound.crossJoin(F.broadcast(first))
        .filter(F.col("__rn") == F.col("__first_rn"))
        .select(
            # true bigint division (`div`), not double `/` + floor: the
            # quotient stays exact for budgets past 2^53 (B - __sb >= 0
            # here, so truncation == floor)
            F.expr(
                f"(CAST({int(total_budget)} AS BIGINT) - __sb)"
                " div (__g_total - __rn + 1)"
            )
            .cast("bigint")
            .alias("__w"),
            F.col("__first_rn").alias("__w_rn"),
        )
    )
    alloc = (
        bound.crossJoin(F.broadcast(first))
        .join(F.broadcast(line), how="left")
        .select(
            "__grp",
            "__n_g",
            F.when(
                F.col("__first_rn").isNull()
                | (F.col("__rn") < F.col("__first_rn")),
                F.col("__cap"),
            )
            .otherwise(F.col("__w"))
            .cast("bigint")
            .alias("alloc"),
        )
        .select(
            "__grp",
            "alloc",
            F.least(
                F.lit(1.0),
                F.col("alloc").cast("double") / F.col("__n_g").cast("double"),
            ).alias("keep_rate"),
            (F.col("alloc").cast("double") / F.col("__n_g").cast("double"))
            .alias("epochs"),
        )
    )
    u = u_col if u_col is not None else hash_uniform(key_cols, seed)
    return (
        df.join(alloc, F.col(group_col).eqNullSafe(F.col("__grp")))
        .drop("__grp")
        .filter(u < F.col("keep_rate"))
    )
