"""Property-based tests (hypothesis): algebraic invariants of the
merge/dedup operators that must hold for ANY input, not just fixtures.

Kept to few examples — every example executes real Spark jobs."""

from __future__ import annotations

import pytest

pytestmark = pytest.mark.slow

from hypothesis import HealthCheck, example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.joins import (
    incremental_merge,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.relational import (
    align_union,
)
from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.windows import (
    latest_per_key_rn,
)

SLOW = settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),    # key
        st.integers(min_value=0, max_value=9),    # order
        st.integers(min_value=0, max_value=99),   # tiebreak/payload
    ),
    min_size=0,
    max_size=25,
)


def _df(spark, data):
    return spark.createDataFrame(data, "k int, ord int, payload int") \
        if data else spark.createDataFrame([], "k int, ord int, payload int")


@SLOW
@given(data=rows)
def test_latest_per_key_rn_picks_max(spark, data):
    df = _df(spark, data)
    out = latest_per_key_rn(df, ["k"], ["ord", "payload"]).collect()
    expected = {}
    for k, o, p in data:
        if k not in expected or (o, p) > expected[k]:
            expected[k] = (o, p)
    assert {r.k: (r.ord, r.payload) for r in out} == expected


@SLOW
@given(snap=rows, delta=rows)
def test_incremental_merge_idempotent(spark, snap, delta):
    """Re-delivering the same delta must not change the model — the
    property the reference's monthly re-union relies on
    (README.md:210-213)."""
    s, d = _df(spark, snap), _df(spark, delta)
    once = incremental_merge(s, d, ["k"], ["ord", "payload"])
    twice = incremental_merge(once, d, ["k"], ["ord", "payload"])
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


@SLOW
@given(a=rows, b=rows)
def test_align_union_preserves_rows(spark, a, b):
    da = _df(spark, a).withColumnRenamed("payload", "extra_a")
    db = _df(spark, b).withColumnRenamed("payload", "extra_b")
    out = align_union(da, db)
    assert out.count() == len(a) + len(b)
    assert set(out.columns) == {"k", "ord", "extra_a", "extra_b"}

@SLOW
@given(
    ids=st.lists(st.integers(min_value=0, max_value=10_000),
                 min_size=1, max_size=30, unique=True),
    low=st.floats(min_value=0.1, max_value=0.4),
    high=st.floats(min_value=0.5, max_value=0.9),
)
def test_deterministic_sample_is_nested_by_rate(spark, ids, low, high):
    """Hash-bucket sampling is monotone: the keep-set at a lower rate
    is a subset of the keep-set at any higher rate (same seed) — the
    property that lets a pipeline carve consistent sub-corpora."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        deterministic_sample,
    )

    df = spark.createDataFrame([(i,) for i in ids], "doc_id long")
    small = {r.doc_id for r in deterministic_sample(df, low, ["doc_id"], seed=3).collect()}
    big = {r.doc_id for r in deterministic_sample(df, high, ["doc_id"], seed=3).collect()}
    assert small <= big


@SLOW
@given(
    lengths=st.lists(st.integers(min_value=1, max_value=3000),
                     min_size=1, max_size=40),
    max_len=st.integers(min_value=512, max_value=2048),
)
def test_pack_sequences_invariants(spark, lengths, max_len):
    """For ANY length distribution: every doc packed exactly once,
    no pack exceeds max_len, offsets tile each pack without overlap."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        pack_sequences,
    )

    df = spark.createDataFrame(
        list(enumerate(lengths)), "doc_id long, n_tokens long"
    )
    rows = pack_sequences(df, "n_tokens", max_len, ["doc_id"], n_groups=3).collect()
    assert sorted(r.doc_id for r in rows) == list(range(len(lengths)))
    packs: dict = {}
    for r in rows:
        packs.setdefault(r.pack_id, []).append(r)
    for members in packs.values():
        members.sort(key=lambda r: r.pack_offset)
        cursor = 0
        for r in members:
            assert r.pack_offset == cursor
            cursor += min(r.n_tokens, max_len)
        assert cursor <= max_len


cdc_changes = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=5),   # key
        st.integers(min_value=0, max_value=99),  # payload
        st.integers(min_value=0, max_value=9),   # seq
        st.sampled_from(["I", "U", "D"]),        # op
    ),
    min_size=0,
    max_size=25,
)


@SLOW
@given(changes=cdc_changes)
def test_apply_cdc_matches_latest_wins_model(spark, changes):
    """apply_cdc against a direct Python fold: per key the max
    (seq, op) change wins; a winning delete drops the key; untouched
    snapshot keys pass through."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        apply_cdc,
    )

    snap_rows = [(k, 1000 + k) for k in range(3)]  # keys 0,1,2
    snap = spark.createDataFrame(snap_rows, "k int, payload int")
    feed = (
        spark.createDataFrame(changes, "k int, payload int, seq int, op string")
        if changes
        else spark.createDataFrame([], "k int, payload int, seq int, op string")
    )
    out = {r.k: r.payload for r in apply_cdc(snap, feed, ["k"], "seq", "op").collect()}

    winners: dict[int, tuple] = {}
    for k, p, s, o in changes:
        if k not in winners or (s, o) > (winners[k][0], winners[k][1]):
            winners[k] = (s, o, p)
    expected = {}
    for k, p in snap_rows:
        if k not in winners:
            expected[k] = p
        elif winners[k][1] != "D":
            expected[k] = winners[k][2]
    for k, (s, o, p) in winners.items():
        if k not in dict(snap_rows) and o != "D":
            expected[k] = p
    assert out == expected


scd2_history = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),   # key
        st.integers(min_value=0, max_value=9),   # ts
        st.sampled_from(["x", "y", None]),       # attr (incl. nulls)
    ),
    min_size=0,
    max_size=20,
    unique_by=lambda t: (t[0], t[1]),  # unique (key, ts): tie col = ts
)


@SLOW
@given(hist=scd2_history)
def test_scd2_matches_run_length_model(spark, hist):
    """scd2_intervals against a Python run-length collapse of each
    key's (ts-ordered) attribute sequence, null-safe."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        scd2_intervals,
    )

    df = (
        spark.createDataFrame(hist, "k int, ts int, attr string")
        if hist
        else spark.createDataFrame([], "k int, ts int, attr string")
    )
    out = sorted(
        (
            (r.k, r.attr, r.effective_from, r.effective_to, r.is_current)
            for r in scd2_intervals(df, "k", "attr", "ts", "ts").collect()
        ),
        key=lambda t: (t[0], t[2]),  # (key, from): attr may be None
    )

    expected = []
    by_key: dict[int, list] = {}
    for k, ts, a in sorted(hist, key=lambda t: (t[0], t[1])):
        by_key.setdefault(k, []).append((ts, a))
    for k, seq in by_key.items():
        runs = []
        for ts, a in seq:
            if not runs or runs[-1][0] != a:
                runs.append([a, ts])
        for i, (a, start) in enumerate(runs):
            nxt = runs[i + 1][1] if i + 1 < len(runs) else None
            expected.append((k, a, start, nxt, nxt is None))
    assert out == sorted(expected, key=lambda t: (t[0], t[2]))


@given(
    n_publishes=st.integers(min_value=1, max_value=6),
    keep=st.integers(min_value=1, max_value=4),
)
@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
def test_versioned_publish_invariants(spark, tmp_path_factory, n_publishes, keep):
    """For ANY publish sequence: the pointer equals the publish count,
    read_latest returns the last payload, at most `keep` versions
    survive, and the pointed-at version is always among them."""
    import pathlib

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.gating import (
        read_latest,
        read_version_pointer,
        versioned_publish,
    )

    root = str(tmp_path_factory.mktemp("vp"))
    for i in range(1, n_publishes + 1):
        df = spark.createDataFrame([(i,)], "payload bigint")
        assert versioned_publish(df, root, keep=keep) == i
    assert read_version_pointer(root) == n_publishes
    assert read_latest(spark, root).collect()[0].payload == n_publishes
    alive = sorted(
        int(p.name.split("=")[1]) for p in pathlib.Path(root).glob("v=*")
    )
    assert len(alive) <= keep
    assert n_publishes in alive


@SLOW
@given(
    data=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=40),   # priority (ties!)
            st.integers(min_value=1, max_value=30),   # measure
        ),
        min_size=0,
        max_size=30,
    ),
    budget=st.integers(min_value=0, max_value=300),
)
def test_budget_select_matches_greedy_prefix_model(spark, data, budget):
    """budget_select == the sequential greedy model for ANY priorities
    (including heavy ties), measures, and budget — the bucketed
    two-phase running sum must be indistinguishable from a single
    global scan."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.sampling import (
        budget_select,
    )

    rows = [(i, float(p), m) for i, (p, m) in enumerate(data)]
    schema = "id bigint, pri double, m bigint"
    df = spark.createDataFrame(rows, schema) if rows else \
        spark.createDataFrame([], schema)
    got = {
        r.id: r.cum_measure
        for r in budget_select(
            df, "m", "pri", "id", budget=budget, n_buckets=4
        ).collect()
    }
    expected, cum = {}, 0
    for i, p, m in sorted(rows, key=lambda r: (-r[1], r[0])):
        cum += m
        if cum <= budget:
            expected[i] = cum
    assert got == expected


@SLOW
@given(
    docs=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "d"]),
            min_size=1,
            max_size=12,
        ),
        min_size=1,
        max_size=8,
    )
)
def test_boilerplate_strip_identity_when_chunks_unique(spark, docs):
    """With every chunk made doc-unique (tokens salted by doc id),
    nothing is boilerplate: reassembly must reproduce each document
    verbatim — splitting + fingerprinting + reordering is lossless."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        boilerplate_strip,
    )

    rows = [
        (i, [f"{tok}{i}" for tok in toks]) for i, toks in enumerate(docs)
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, t array<string>")
    out = {
        r.doc_id: r
        for r in boilerplate_strip(df, "t", "doc_id", 3, 2).collect()
    }
    for i, toks in rows:
        assert out[i].n_boilerplate == 0
        assert out[i].clean_text == " ".join(toks)


@SLOW
@given(old=rows, new=rows)
def test_snapshot_diff_apply_cdc_roundtrip(spark, old, new):
    """For ANY two snapshots (unique-keyed), applying the diff of
    (old -> new) onto old reproduces new exactly — diff and fold are
    inverses."""
    from pyspark.sql import functions as F

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.merge import (
        apply_cdc,
        snapshot_diff,
    )

    def snap(data):
        # dedup to unique keys: last tuple per key wins
        uniq = {}
        for k, o, p in data:
            uniq[k] = (k, o, p)
        vals = list(uniq.values())
        schema = "k int, ord int, payload int"
        return (
            spark.createDataFrame(vals, schema)
            if vals
            else spark.createDataFrame([], schema)
        )

    o, n = snap(old), snap(new)
    feed = snapshot_diff(o, n, ["k"]).withColumn("seq", F.lit(1))
    if not feed.head(1):
        # no changes: snapshots must already be equal
        assert sorted(map(tuple, o.collect())) == sorted(
            map(tuple, n.collect())
        )
        return
    rebuilt = apply_cdc(o, feed, ["k"], "seq", "op", delete_op="D")
    assert sorted(map(tuple, rebuilt.collect())) == sorted(
        map(tuple, n.collect())
    )


@SLOW
@given(
    docs=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=9),
            st.lists(
                st.sampled_from(["a", "b", "c", "d"]),
                min_size=0,
                max_size=14,
            ),
        ),
        min_size=0,
        max_size=8,
    ),
)
# regression: overlapping duplicated windows bridging a non-duplicated
# offset (d1 windows at 1 and 3 merge across the undupped offset 2)
@example(docs=[(0, ["a", "a", "b", "a"]), (1, ["a", "b", "a", "a", "b"])])
def test_repeated_spans_invariants(spark, docs):
    """For ANY corpus: spans are within bounds, at least n long,
    disjoint and non-adjacent per doc, and equal EXACTLY the maximal
    runs of tokens covered by cross-document-duplicated n-gram
    windows (token-coverage semantics: an offset interior to a merged
    run need not itself start a duplicated window — two overlapping
    duplicated windows bridge it)."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.dedup import (
        repeated_spans,
    )

    uniq = {}
    for k, toks in docs:
        uniq[k] = (k, toks)
    vals = list(uniq.values())
    schema = "doc_id int, t array<string>"
    df = (
        spark.createDataFrame(vals, schema)
        if vals
        else spark.createDataFrame([], schema)
    )
    n = 3
    out = repeated_spans(df, n=n).collect()
    toks = dict(vals)
    # ground truth: n-grams by doc
    from collections import defaultdict

    where = defaultdict(set)
    for d, ts in vals:
        for i in range(len(ts) - n + 1):
            where[tuple(ts[i:i + n])].add(d)
    dup_positions = defaultdict(set)
    for d, ts in vals:
        for i in range(len(ts) - n + 1):
            if len(where[tuple(ts[i:i + n])]) >= 2:
                dup_positions[d].add(i + 1)
    per_doc = defaultdict(list)
    n_windows = {}
    for r in out:
        assert 1 <= r.span_start <= r.span_end <= len(toks[r.doc_id])
        assert r.span_end - r.span_start + 1 >= n
        per_doc[r.doc_id].append((r.span_start, r.span_end))
        n_windows[(r.doc_id, r.span_start)] = r.n_windows
    # ground truth: maximal runs of covered token positions
    for d, spans in per_doc.items():
        spans.sort()
        for (s1, e1), (s2, e2) in zip(spans, spans[1:]):
            assert s2 > e1 + 1  # disjoint, non-adjacent
        covered = sorted(
            {t for p in dup_positions[d] for t in range(p, p + n)}
        )
        runs = []
        for t in covered:
            if runs and t == runs[-1][1] + 1:
                runs[-1] = (runs[-1][0], t)
            else:
                runs.append((t, t))
        assert spans == runs
        for s, e in spans:
            want = sum(1 for p in dup_positions[d] if s <= p <= e - n + 1)
            assert n_windows[(d, s)] == want
    assert set(per_doc) == {d for d, ps in dup_positions.items() if ps}


def test_drift_report_self_comparison_is_stable(spark):
    """PSI of a snapshot against itself must be ~0 (only Laplace
    smoothing noise) and never flag; disjoint halves of the same
    distribution stay under the gate; validation errors are loud."""
    import pytest

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.profile import (
        drift_report,
    )
    from tests.conftest import SF_DIR

    orders = spark.read.parquet(f"{SF_DIR}/orders.parquet")
    same = drift_report(
        orders, orders, numeric_cols=["o_totalprice"],
        cat_cols=["o_orderpriority"],
    ).collect()
    assert all(r.psi_fp == 0 and not r.drift for r in same)

    halves = drift_report(
        orders.filter("o_orderkey % 2 = 0"),
        orders.filter("o_orderkey % 2 = 1"),
        numeric_cols=["o_totalprice"],
    ).collect()
    assert all(not r.drift for r in halves)
    assert all(abs(r.psi) < 0.1 for r in halves)

    with pytest.raises(ValueError, match="numeric_cols"):
        drift_report(orders, orders)


hh_items = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),    # group
        st.integers(min_value=0, max_value=12),   # item (small domain
                                                  # forces eviction ties)
        st.integers(min_value=0, max_value=3),    # period
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(data=hh_items, k=st.integers(min_value=1, max_value=4))
@example(data=[(0, i % 5, i % 3) for i in range(40)], k=2)
def test_heavyhitters_merge_bounds_sound_model(spark, data, k):
    """Model check over random multisets split into arbitrary periods:
    for EVERY item served by the merged fold, lb <= true <= ub, and
    any item whose true count beats the merged other_max is present
    in the merged ledger top."""
    from collections import Counter

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
        heavyhitters_ledger,
        ledger_topk,
        ledger_topk_bounds,
        merge_heavyhitters_ledgers,
    )

    df = spark.createDataFrame(data, "grp int, item int, period int")
    leds = [
        heavyhitters_ledger(
            df.filter(f"period = {p}"), ["grp"], "item", k=k
        )
        for p in sorted({p for _, _, p in data})
    ]
    true = Counter((g, i) for g, i, _ in data)
    for r in ledger_topk_bounds(leds, ["grp"], k=k).collect():
        t = true[(r["grp"], r["item"])]
        assert r["lb"] <= t <= r["ub"], (dict(r.asDict()), t)
    merged = merge_heavyhitters_ledgers(leds, ["grp"], k=k)
    omax = {r["grp"]: r["other_max"] for r in merged.collect()}
    tops = {
        (r["grp"], r["item"])
        for r in ledger_topk(merged, ["grp"]).collect()
    }
    for (g, i), t in true.items():
        if t > omax.get(g, 0):
            assert (g, i) in tops, ((g, i), t, omax.get(g))


whh_items = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1),    # grp
        st.integers(min_value=0, max_value=7),    # item
        st.integers(min_value=0, max_value=3),    # period
        st.integers(min_value=0, max_value=20),   # weight (incl. 0)
    ),
    min_size=1,
    max_size=60,
)


@SLOW
@given(data=whh_items, k=st.integers(min_value=1, max_value=4))
@example(data=[(0, i % 5, i % 3, i % 7) for i in range(40)], k=2)
def test_weighted_heavyhitters_bounds_sound_model(spark, data, k):
    """Weighted model check: the same soundness claims over random
    NONNEGATIVE integer weights (including zero-weight rows) split
    into arbitrary periods — lb <= true weighted total <= ub for every
    served item; presence past the merged other_max."""
    from collections import Counter

    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.heavyhitters import (
        heavyhitters_ledger,
        ledger_topk,
        ledger_topk_bounds,
        merge_heavyhitters_ledgers,
    )

    df = spark.createDataFrame(data, "grp int, item int, period int, w int")
    leds = [
        heavyhitters_ledger(
            df.filter(f"period = {p}"), ["grp"], "item", k=k, weight_col="w"
        )
        for p in sorted({p for _, _, p, _ in data})
    ]
    true = Counter()
    for g, i, _, w in data:
        true[(g, i)] += w
    for r in ledger_topk_bounds(leds, ["grp"], k=k).collect():
        t = true[(r["grp"], r["item"])]
        assert r["lb"] <= t <= r["ub"], (dict(r.asDict()), t)
    merged = merge_heavyhitters_ledgers(leds, ["grp"], k=k)
    omax = {r["grp"]: r["other_max"] for r in merged.collect()}
    tops = {
        (r["grp"], r["item"])
        for r in ledger_topk(merged, ["grp"]).collect()
    }
    for (g, i), t in true.items():
        if t > omax.get(g, 0):
            assert (g, i) in tops, ((g, i), t, omax.get(g))


merge_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=9),     # key
        # NULLABLE value: a NULL makes the clause conditions evaluate
        # to NULL, which SQL MERGE treats as not-satisfied with
        # fall-through to the next clause (the round-10 defect was
        # ~NULL silently dropping such rows from the update clause)
        st.one_of(st.none(), st.integers(min_value=-50, max_value=50)),
    ),
    min_size=0,
    max_size=12,
    unique_by=lambda t: t[0],
)


@SLOW
@given(base=merge_rows, src=merge_rows, cut=st.integers(-20, 20))
@example(base=[(1, 5)], src=[(1, None)], cut=4)
def test_table_merge_equals_clause_replay(
    spark, tmp_path_factory, base, src, cut
):
    """Table.merge with all three clauses ≡ the row-by-row clause
    replay, for ANY base/source frames (values NULLABLE) and any
    delete threshold. The delete clause conditions on the SOURCE
    value and the update clause is unconditional, so a NULL source
    value makes the delete condition NULL while the update clause
    still applies — the SQL MERGE fall-through edge (a non-TRUE
    clause condition falls to the next clause; pre-round-11 the
    engine's ~NULL silently gave such rows NO action). The pinned
    @example is exactly that edge: base v=5, source v=NULL → the row
    must UPDATE to v=NULL (5+NULL), not keep 5."""
    if not base:
        return  # an empty table cannot be created (append-first rule)
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        Table,
    )

    root = str(tmp_path_factory.mktemp("mprop")) + "/t"
    t = Table.create(spark, root, "k")
    t.append(spark.createDataFrame(base, "k bigint, v bigint"))
    sdf = (
        spark.createDataFrame(src, "k bigint, v bigint")
        if src
        else spark.createDataFrame([], "k bigint, v bigint")
    )
    t.merge(
        sdf,
        matched_delete=f"s.v >= {cut}",
        matched_update=True,
        update_set={"v": "s.v + t.v"},
        not_matched_insert="s.k % 2 = 0",
    )

    state = {k: v for k, v in base}
    for k, sv in src:
        if k in state:
            tv = state[k]
            if sv is not None and sv >= cut:
                del state[k]
            else:  # fall-through: unconditional UPDATE SET
                state[k] = sv + tv if sv is not None and tv is not None \
                    else None
        elif k % 2 == 0:
            state[k] = sv
    got = {r["k"]: r["v"] for r in t.read().collect()}
    assert got == state


obs_rows = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=2),     # key
        st.integers(min_value=0, max_value=40),    # hour offset
        st.integers(min_value=-100, max_value=100),  # value
    ),
    min_size=1,
    max_size=15,
    unique_by=lambda t: (t[0], t[1]),
)


@SLOW
@given(data=obs_rows)
def test_resample_interpolate_equals_pointwise_replay(spark, data):
    """resample_interpolate ≡ the documented pointwise semantics for
    ANY observation set: hourly grid per key over [min, max], linear
    between bracketing observations over epoch micros, exact at hits,
    forward-fill past the last observation."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.operators.timeseries import (
        resample_interpolate,
    )

    base_s = 1_700_000_000
    df = spark.createDataFrame(
        [(k, base_s + h * 3600, float(v)) for k, h, v in data],
        "k bigint, secs bigint, v double",
    ).select(
        "k", F.timestamp_seconds(F.col("secs")).alias("ts"), "v"
    )
    out = {
        (r["k"], r["ts"].timestamp()): r["v"]
        for r in resample_interpolate(df, "k", "ts", "v", "1 HOUR")
        .collect()
    }

    bykey: dict[int, list[tuple[int, float]]] = {}
    for k, h, v in data:
        bykey.setdefault(k, []).append((base_s + h * 3600, float(v)))
    want = {}
    for k, obs in bykey.items():
        obs.sort()
        lo, hi = obs[0][0], obs[-1][0]
        for t in range(lo, hi + 1, 3600):
            prev = max((o for o in obs if o[0] <= t), key=lambda o: o[0])
            nxts = [o for o in obs if o[0] > t]
            if not nxts:
                want[(k, float(t))] = prev[1]
            else:
                nxt = min(nxts, key=lambda o: o[0])
                frac = (t - prev[0]) / (nxt[0] - prev[0])
                want[(k, float(t))] = prev[1] + (nxt[1] - prev[1]) * frac
    assert out == want


# ----- composite-key facade DML model check (round 11) --------------------

_dml_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.lists(
                st.tuples(
                    st.integers(0, 2), st.integers(0, 3),
                    st.integers(-20, 20),
                ),
                min_size=1, max_size=4,
                unique_by=lambda t: (t[0], t[1]),
            ),
        ),
        st.tuples(
            st.just("delete"),
            st.lists(
                st.tuples(st.integers(0, 2), st.integers(0, 3)),
                min_size=1, max_size=3, unique_by=lambda t: t,
            ),
        ),
        st.tuples(st.just("update_where"), st.integers(-10, 10)),
        st.tuples(st.just("delete_where"), st.integers(-10, 10)),
    ),
    min_size=1, max_size=6,
)


@SLOW
@given(base=st.lists(
    st.tuples(st.integers(0, 2), st.integers(0, 3), st.integers(-20, 20)),
    min_size=1, max_size=8, unique_by=lambda t: (t[0], t[1]),
), ops=_dml_ops)
def test_composite_key_dml_sequence_equals_model(
    spark, tmp_path_factory, base, ops
):
    """Model check: ANY sequence of upsert / delete / update_where /
    delete_where on an (a, b)-keyed facade table ≡ the dict replay —
    the composite fold has one total order across every DML verb."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        Table,
    )

    root = str(tmp_path_factory.mktemp("cdml")) + "/t"
    t = Table.create(spark, root, ["a", "b"])
    t.append(spark.createDataFrame(base, "a int, b int, v bigint"))
    state = {(a, b): v for a, b, v in base}
    for kind, arg in ops:
        if kind == "upsert":
            t.upsert(spark.createDataFrame(arg, "a int, b int, v bigint"))
            for a, b, v in arg:
                state[(a, b)] = v
        elif kind == "delete":
            t.delete(arg)
            for k in arg:
                state.pop(tuple(k), None)
        elif kind == "update_where":
            t.update_where(f"v >= {arg}", {"v": "v + 1"})
            state = {
                k: (v + 1 if v is not None and v >= arg else v)
                for k, v in state.items()
            }
        else:
            t.delete_where(f"v < {arg}")
            state = {
                k: v for k, v in state.items()
                if not (v is not None and v < arg)
            }
    got = {(r["a"], r["b"]): r["v"] for r in t.read().collect()}
    assert got == state


_mh_ops = st.lists(
    st.one_of(
        st.tuples(
            st.just("upsert"),
            st.lists(
                st.tuples(st.integers(0, 4), st.integers(-20, 20)),
                min_size=1, max_size=3, unique_by=lambda t: t[0],
            ),
        ),
        st.tuples(st.just("update_where"), st.integers(-10, 10)),
        st.tuples(st.just("delete_where"), st.integers(-10, 10)),
        st.tuples(st.just("optimize"), st.just(None)),
        st.tuples(st.just("append"), st.lists(
            st.tuples(st.integers(100, 104), st.integers(-20, 20)),
            min_size=1, max_size=2, unique_by=lambda t: t[0],
        )),
    ),
    min_size=2, max_size=7,
)


@SLOW
@given(
    base=st.lists(
        st.tuples(st.integers(0, 4), st.integers(-20, 20)),
        min_size=1, max_size=6, unique_by=lambda t: t[0],
    ),
    ops=_mh_ops,
    handle_picks=st.lists(st.booleans(), min_size=7, max_size=7),
)
def test_two_handle_serial_ops_never_conflict_and_match_model(
    spark, tmp_path_factory, base, ops, handle_picks
):
    """Round-12 model check for the OPTIMISTIC-CONCURRENCY tickets:
    ANY serial sequence of append / upsert / update_where /
    delete_where / optimize, alternating arbitrarily between TWO
    handles of one table, must (a) never raise ConcurrentWriteError —
    serial writers always read fresh state, so a false-positive here
    would be a ticket-bookkeeping bug (stale base, unreleased
    transition) — and (b) equal the dict replay. Appends use keys
    disjoint from DML keys so the model stays a plain dict."""
    from airbnb_etl_pipeline_spark_on_emr_redshift_airflow_spark.sources.table import (
        Table,
    )

    root = str(tmp_path_factory.mktemp("mh")) + "/t"
    t0 = Table.create(spark, root, "k")
    t0.append(spark.createDataFrame(base, "k int, v bigint"))
    t1 = Table(spark, root)
    handles = [t0, t1]
    state = dict(base)
    for i, (kind, arg) in enumerate(ops):
        t = handles[int(handle_picks[i % len(handle_picks)])]
        if kind == "upsert":
            t.upsert(spark.createDataFrame(arg, "k int, v bigint"))
            state.update(arg)
        elif kind == "append":
            new = [(k, v) for k, v in arg if k not in state]
            if not new:
                continue
            t.append(spark.createDataFrame(new, "k int, v bigint"))
            state.update(new)
        elif kind == "update_where":
            t.update_where(f"v >= {arg}", {"v": "v + 1"})
            state = {
                k: (v + 1 if v >= arg else v) for k, v in state.items()
            }
        elif kind == "delete_where":
            t.delete_where(f"v < {arg}")
            state = {k: v for k, v in state.items() if not v < arg}
        else:
            if state:  # optimize requires data
                t.optimize(keep=10)
    got = {r["k"]: r["v"] for r in t0.read().collect()}
    assert got == state
    got1 = {r["k"]: r["v"] for r in t1.read().collect()}
    assert got1 == state
