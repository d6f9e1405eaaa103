"""Property-based tests (SURVEY §5.4): random mutation sequences against the
capture/replay pair.

Invariant: for any base table state v0 and any sequence of row mutations
producing v1, ``apply_changes(v0, snapshot_diff(v0, v1)) == v1``, and the
diff's event classification matches the mutations that survive collapsing
(diff sees net effects only — SURVEY §7.4 point 4).
"""

from __future__ import annotations

import datetime as dt

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from cdc_audit_spark.capture import apply_changes, snapshot_diff

TS = dt.datetime(2026, 1, 1)

# a table state: pk → (name, balance); names/balances from tiny alphabets to
# force collisions and no-op updates
_state = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.tuples(
        st.one_of(st.none(), st.sampled_from(["a", "b", "c"])),
        st.one_of(st.none(), st.sampled_from([0.0, 1.5, 2.25])),
    ),
    max_size=20,
)


def _df(spark, state):
    rows = [(k, v[0], v[1]) for k, v in sorted(state.items())]
    return spark.createDataFrame(rows, "pk int, name string, bal double") if rows else \
        spark.createDataFrame([], "pk int, name string, bal double")


@pytest.mark.usefixtures("spark")
@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(v0=_state, v1=_state)
def test_replay_reconstructs_any_state_pair(spark, v0, v1):
    df0, df1 = _df(spark, v0), _df(spark, v1)
    audit = snapshot_diff(df0, df1, ["pk"], ts=TS)
    replayed = apply_changes(df0, audit, ["pk"])
    assert sorted(map(tuple, replayed.collect())) == sorted(map(tuple, df1.collect()))

    # classification matches set algebra on the keys
    events = {(r["pk"]): r["audit_event"] for r in audit.collect()}
    inserted = set(v1) - set(v0)
    deleted = set(v0) - set(v1)
    changed = {k for k in set(v0) & set(v1) if v0[k] != v1[k]}
    assert {k for k, e in events.items() if e == "insert"} == inserted
    assert {k for k, e in events.items() if e == "delete"} == deleted
    assert {k for k, e in events.items() if e == "update"} == changed
    # audit_pk contiguous from 1
    pks = sorted(r["audit_pk"] for r in audit.collect())
    assert pks == list(range(1, len(pks) + 1))


# ---------------------------------------------------------------- IVM algebra

# group labels and values from tiny alphabets to force group migrations,
# exact cancellations, and emptied groups
_gstate = st.dictionaries(
    keys=st.integers(min_value=0, max_value=30),
    values=st.tuples(
        st.sampled_from(["g0", "g1", "g2"]),
        st.sampled_from([0.0, 1.5, -2.25, 4.0]),
    ),
    max_size=20,
)


def _gdf(spark, state):
    rows = [(k, v[0], v[1]) for k, v in sorted(state.items())]
    return spark.createDataFrame(rows, "pk int, g string, v double") if rows \
        else spark.createDataFrame([], "pk int, g string, v double")


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(v0=_gstate, v1=_gstate)
def test_group_sum_maintenance_any_state_pair(spark, v0, v1):
    """For ANY (v0, v1) pair, maintaining the SUM/COUNT view with the
    snapshot diff equals the direct aggregate over v1 — migrations,
    cancellations, emptied and newborn groups included."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import incremental_group_sum

    df0, df1 = _gdf(spark, v0), _gdf(spark, v1)
    audit = snapshot_diff(df0, df1, ["pk"], ts=TS)
    got = incremental_group_sum(
        df0, audit, ["pk"], ["g"], F.col("v").cast("decimal(12,2)"))
    want = df1.groupBy("g").agg(
        F.sum(F.col("v").cast("decimal(12,2)")).alias("total"),
        F.count("*").alias("n_rows"))
    gs = sorted((r["g"], float(r["total"]), r["n_rows"])
                for r in got.collect())
    ws = sorted((r["g"], float(r["total"]), r["n_rows"])
                for r in want.collect())
    assert gs == ws


_rstate = st.dictionaries(  # dimension side: pk -> group
    keys=st.integers(min_value=0, max_value=8),
    values=st.sampled_from(["g0", "g1"]),
    max_size=6,
)
_lstate = st.dictionaries(  # fact side: pk -> (fk, value)
    keys=st.integers(min_value=0, max_value=30),
    values=st.tuples(st.integers(min_value=0, max_value=9),
                     st.sampled_from([0.0, 1.5, 4.0])),
    max_size=15,
)


def _ldf(spark, state):
    rows = [(k, v[0], v[1]) for k, v in sorted(state.items())]
    return spark.createDataFrame(rows, "o int, fk int, v double") if rows \
        else spark.createDataFrame([], "o int, fk int, v double")


def _rdf(spark, state):
    rows = [(k, g) for k, g in sorted(state.items())]
    return spark.createDataFrame(rows, "fk int, g string") if rows \
        else spark.createDataFrame([], "fk int, g string")


@pytest.mark.usefixtures("spark")
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(l0=_lstate, l1=_lstate, r0=_rstate, r1=_rstate)
def test_join_view_maintenance_any_state_pairs(spark, l0, l1, r0, r1):
    """The delta-join rule holds for ANY concurrent (fact, dimension)
    transition: maintaining γ(A ⋈ B) with both snapshot diffs equals the
    direct aggregate over the final join — dangling fact keys, dimension
    migrations, and cross-batch interactions included."""
    from pyspark.sql import functions as F

    from cdc_audit_spark.mview import incremental_join_group_sum

    ldf0, ldf1 = _ldf(spark, l0), _ldf(spark, l1)
    rdf0, rdf1 = _rdf(spark, r0), _rdf(spark, r1)
    lb = snapshot_diff(ldf0, ldf1, ["o"], ts=TS)
    rb = snapshot_diff(rdf0, rdf1, ["fk"], ts=TS)
    got = incremental_join_group_sum(
        ldf0, rdf0, lb, rb, ["fk"], ["o"], ["fk"], ["g"],
        F.col("v").cast("decimal(12,2)"))
    want = ldf1.join(rdf1, "fk").groupBy("g").agg(
        F.sum(F.col("v").cast("decimal(12,2)")).alias("total"),
        F.count("*").alias("n_rows"))
    gs = sorted((r["g"], float(r["total"]), r["n_rows"])
                for r in got.collect())
    ws = sorted((r["g"], float(r["total"]), r["n_rows"])
                for r in want.collect())
    assert gs == ws


# ------------------------------------------------------- BM25 index algebra

# doc states from a 4-word alphabet with lengths 0..4: forces shared terms,
# exact tf cancellations, docs emptied to zero tokens, and full overlap
_dstate = st.dictionaries(
    keys=st.integers(min_value=0, max_value=15),
    values=st.lists(st.sampled_from(["cat", "dog", "fish", "owl"]),
                    max_size=4).map(" ".join),
    max_size=10,
)


def _ddf(spark, state):
    rows = [(k, v) for k, v in sorted(state.items())]
    return spark.createDataFrame(rows, "pk int, text string") if rows \
        else spark.createDataFrame([], "pk int, text string")


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(v0=_dstate, v1=_dstate)
def test_bm25_index_maintenance_any_state_pair(spark, v0, v1):
    """For ANY state pair: fold(postings(v0) ∪ delta) == postings(v1),
    the norms delta folds to v1's doc lengths, and the stats delta moves
    (N, total) to v1's — the full serving-state algebra under arbitrary
    insert/update/delete/no-op mixes."""
    from cdc_audit_spark.operators.bm25 import (
        bm25_norms,
        bm25_norms_delta,
        bm25_posting_delta,
        bm25_postings,
        bm25_stats_delta,
        fold_bm25_norms,
        fold_bm25_postings,
    )

    df0, df1 = _ddf(spark, v0), _ddf(spark, v1)
    batch = snapshot_diff(df0, df1, ["pk"], ts=TS)

    boot = bm25_postings(df0, "text", "pk")
    delta = bm25_posting_delta(df0, batch, "text", ["pk"])
    got = {(r["term"], r["pk"]): r["tf"] for r in fold_bm25_postings(
        boot.unionByName(delta), "pk").collect()}
    want = {(r["term"], r["pk"]): r["tf"]
            for r in bm25_postings(df1, "text", "pk").collect()}
    assert got == want

    nd = bm25_norms_delta(delta, "pk")
    norms = {r["pk"]: r["dl"] for r in fold_bm25_norms(
        bm25_norms(boot, "pk").unionByName(nd), "pk").collect()}
    want_norms = {r["pk"]: r["dl"]
                  for r in bm25_norms(bm25_postings(df1, "text", "pk"),
                                      "pk").collect()}
    assert norms == want_norms

    pre_norms = bm25_norms(boot, "pk")
    dn, dt = bm25_stats_delta(pre_norms if v0 else None, nd, "pk")
    n0, t0 = len(want_norms_pre := {
        r["pk"]: r["dl"] for r in pre_norms.collect()}), \
        sum(want_norms_pre.values())
    assert (n0 + dn, t0 + dt) == (len(want_norms),
                                  sum(want_norms.values()))


# --------------------------------------------------------- PCA moment algebra

_vstate = st.dictionaries(
    keys=st.integers(min_value=0, max_value=12),
    values=st.lists(st.sampled_from([0.0, 0.25, -0.5, 1.0]),
                    min_size=3, max_size=3),
    max_size=8,
)


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(v0=_vstate, v1=_vstate)
def test_pca_moments_maintenance_any_state_pair(spark, v0, v1):
    """For ANY vector-state pair: maintained raw second-moment sums are
    integer-equal to recomputing on v1 — including the emptied-corpus
    case, exact cancellations, and sign flips."""
    from cdc_audit_spark.operators.pca import (
        covariance_q,
        fold_moments,
        moments_delta,
    )

    def vdf(state):
        rows = [(k, [float(x) for x in v]) for k, v in sorted(state.items())]
        return spark.createDataFrame(rows, "pk int, v array<float>") if rows \
            else spark.createDataFrame([], "pk int, v array<float>")

    if not v0 and not v1:
        return
    df0, df1 = vdf(v0), vdf(v1)
    batch = snapshot_diff(df0, df1, ["pk"], ts=TS)
    zero = [0.0, 0.0, 0.0]
    boot = covariance_q(df0, "v", zero).withColumnRenamed("cov_q", "s2_q") \
        if v0 else None
    delta = moments_delta(df0, batch, "v", ["pk"]) if (v0 or v1) else None
    stacked = boot.unionByName(delta) if boot is not None else delta
    got = {(r["i"], r["j"]): r["s2_q"]
           for r in fold_moments(stacked).collect()}
    want = {(r["i"], r["j"]): r["cov_q"]
            for r in covariance_q(df1, "v", zero).collect()} if v1 else {}
    # fold keeps explicit zeros; recompute-on-empty has no rows — compare
    # only non-zero mass plus agreement on the zero cells
    assert {k: v for k, v in got.items() if v != 0} == \
        {k: v for k, v in want.items() if v != 0}


# layouts: how the table content lands before the pruned read exercises
# the manifest's skipping decisions against it
_layout = st.sampled_from(["range4", "range1", "appends", "mixed"])
_keys = st.lists(st.integers(min_value=-50, max_value=450),
                 min_size=0, max_size=12)
_content = st.sets(st.integers(min_value=0, max_value=400),
                   min_size=0, max_size=40)


@pytest.mark.usefixtures("spark")
@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(content=_content, keys=_keys, layout=_layout,
       max_points=st.sampled_from([0, 3, 4096]))
def test_read_pruned_for_keys_equals_filtered_scan(spark, tmp_path_factory,
                                                   content, keys, layout,
                                                   max_points):
    """For ANY content, layout (clustered, single-dir, plain appends, or
    a mix), batch key set, and point-vs-range strategy cutover, the
    pruned read returns exactly the rows a full-scan key filter would —
    manifest skipping must never change results, only I/O. (The range
    fallback additionally admits hull rows; both modes are followed by
    the exact residual, so equality is strict.)"""
    from pyspark.sql import functions as F

    from cdc_audit_spark.sinks.manifest import ManifestTable

    tmp = tmp_path_factory.mktemp("prk")
    t = ManifestTable(spark, str(tmp / "t"))
    rows = spark.createDataFrame([(k, k * 3) for k in sorted(content)],
                                 "k long, v long")
    if layout == "range4":
        t.write_range_layout(rows, "k", n_buckets=4)
    elif layout == "range1":
        t.write_range_layout(rows, "k", n_buckets=1)
    elif layout == "appends":
        half = len(content) // 2
        items = sorted(content)
        t.append(spark.createDataFrame(
            [(k, k * 3) for k in items[:half]] or [(-999, 0)],
            "k long, v long"))
        t.append(spark.createDataFrame(
            [(k, k * 3) for k in items[half:]] or [(-998, 0)],
            "k long, v long"))
    else:  # mixed: clustered base + an un-clustered append tail
        t.write_range_layout(rows, "k", n_buckets=4)
        t.append(spark.createDataFrame([(401, 7)], "k long, v long"))

    keys_df = (spark.createDataFrame([(k,) for k in keys], "k long")
               if keys else spark.createDataFrame([], "k long"))
    got = {(r["k"], r["v"])
           for r in t.read_pruned_for_keys(keys_df, "k",
                                           max_points=max_points).collect()}
    kset = set(keys)
    if keys and len(kset) > max_points:
        # range fallback (distinct keys past the cap): the hull residual
        # admits between-keys rows BY DESIGN — callers semi-join exactly
        lo, hi = min(keys), max(keys)
        want = {(r["k"], r["v"]) for r in t.read().collect()
                if lo <= r["k"] <= hi}
    else:
        want = {(r["k"], r["v"]) for r in t.read().collect()
                if r["k"] in kset}
    assert got == want
    # in either mode the result covers every touched key's rows — the
    # contract the maintenance debits rely on
    assert {(r["k"], r["v"]) for r in t.read().collect()
            if r["k"] in kset} <= got | set()
