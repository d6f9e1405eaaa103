"""Z-normalized subsequence search: exact Python-mirror equality, planted
pattern recovery, degenerate-window exclusion, and the windows-only plan."""

from __future__ import annotations

import math

import pytest

from cdc_audit_spark.operators.timeseries import (
    subsequence_topk,
    znorm_distances,
    znormalize,
)

Q = [0.0, 0.0, 1.0, 3.0, 1.0, 0.0, 0.0, 0.0]


def _mirror(series, query):
    """dict window-start-index -> micro distance, same identity/formula."""
    qz, sqz = znormalize(query)
    m = len(query)
    out = {}
    for t in range(len(series) - m + 1):
        w = series[t:t + m]
        sx, sxx = sum(w), sum(x * x for x in w)
        mu = sx / float(m)
        msq = sxx / float(m)
        var = msq - mu * mu
        if not var > msq * 1e-10:  # same guard as the engine
            continue
        sigma = math.sqrt(var)
        dot = sum(q * x for q, x in zip(qz, w))
        d2 = 2.0 * m - 2.0 * (dot - mu * sqz) / sigma
        out[t] = math.floor(d2 * 1e6 + 0.5)
    return out


def _df(spark, series_by_key):
    rows = [(k, i, float(v))
            for k, vals in series_by_key.items()
            for i, v in enumerate(vals)]
    return spark.createDataFrame(rows, "user_id long, ts long, value double")


def test_distances_match_python_mirror_exactly(spark):
    import random

    rng = random.Random(5)
    series = {k: [rng.uniform(-2, 2) for _ in range(30)] for k in range(3)}
    df = _df(spark, series)
    got = {(r["user_id"], r["ts"]): r["dist2_micro"]
           for r in znorm_distances(df, "user_id", "ts", "ts", "value",
                                    Q).collect()}
    want = {(k, t): d for k, s in series.items()
            for t, d in _mirror(s, Q).items()}
    assert got == want


def test_planted_pattern_is_the_top_match(spark):
    import random

    rng = random.Random(11)
    base = [rng.uniform(-0.2, 0.2) for _ in range(60)]
    # plant an exact (scaled + shifted) copy of the query at t=20 in key 1:
    # z-normalized distance to any affine image of the pattern is 0
    planted = base[:]
    for j, q in enumerate(Q):
        planted[20 + j] = 5.0 + 2.5 * q
    series = {0: base, 1: planted}
    top = subsequence_topk(_df(spark, series), "user_id", "ts", "ts",
                           "value", Q, 1).collect()
    assert [(r["user_id"], r["ts"]) for r in top] == [(1, 20)]
    assert top[0]["dist2_micro"] == 0


def test_constant_windows_and_ragged_tails_excluded(spark):
    series = {0: [3.0] * 12 + [1.0, 2.0, 5.0, 2.0, 1.0, 0.0, 0.0, 0.0]}
    out = znorm_distances(_df(spark, series), "user_id", "ts", "ts",
                          "value", Q).collect()
    starts = {r["ts"] for r in out}
    assert all(t <= len(series[0]) - len(Q) for t in starts)  # no ragged
    assert 0 not in starts and 4 not in starts  # all-constant windows gone
    assert len(out) > 0


def test_plan_is_windows_only(spark):
    df = _df(spark, {0: [float(i % 7) for i in range(30)]})
    plan = znorm_distances(df, "user_id", "ts", "ts", "value", Q)._jdf \
        .queryExecution().executedPlan().toString()
    assert "Join" not in plan and "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the per-key sort


def test_degenerate_query_refused(spark):
    with pytest.raises(ValueError):
        znormalize([2.0, 2.0, 2.0])
    with pytest.raises(ValueError):
        znormalize([1.0])


def test_negative_float_variance_constants_never_rank(spark):
    """Constant windows whose float variance computes to a TINY NEGATIVE
    number (sxx/m - mu*mu < 0 for non-representable constants like 0.1)
    used to produce sigma = NaN; Spark orders NaN above every number, so
    NaN > 0 passed the old sigma filter and the NaN->long cast made
    dist2_micro = 0 — constant windows ranked FIRST as perfect matches.
    The guard must filter on the variance itself."""
    # many constant runs over values picked to trip the negative-variance
    # float path, plus one genuine (affine) copy of the query
    consts = [0.1, 1.0 / 3.0, 0.7, 2.3, 1e6 + 0.1]
    series = {}
    for k, c in enumerate(consts):
        series[k] = [c] * 40
    planted = [0.5] * 30
    for j, q in enumerate(Q):
        planted[10 + j] = 1.0 + 0.25 * q
    series[len(consts)] = planted

    dist = znorm_distances(_df(spark, series), "user_id", "ts", "ts",
                           "value", Q).collect()
    const_keys = set(range(len(consts)))
    assert all(r["user_id"] not in const_keys for r in dist), \
        "constant-series windows leaked through the variance guard"

    top = subsequence_topk(_df(spark, series), "user_id", "ts", "ts",
                           "value", Q, 1).collect()
    assert [(top[0]["user_id"], top[0]["ts"])] == [(len(consts), 10)]
    assert top[0]["dist2_micro"] == 0


def test_wide_query_refused(spark):
    df = _df(spark, {0: [float(i % 7) for i in range(30)]})
    wide = [float(i % 13) for i in range(513)]
    with pytest.raises(ValueError, match="512"):
        znorm_distances(df, "user_id", "ts", "ts", "value", wide)


def _mirror_long(series, query):
    """Python mirror of the LONG form: quantized integer dot."""
    qz, sqz = znormalize(query)
    m = len(query)
    out = {}
    for t in range(len(series) - m + 1):
        w = series[t:t + m]
        sx, sxx = sum(w), sum(x * x for x in w)
        mu = sx / float(m)
        msq = sxx / float(m)
        var = msq - mu * mu
        if not var > msq * 1e-10:
            continue
        sigma = math.sqrt(var)
        dotq = sum(math.floor(x * q * 1e9 + 0.5) for q, x in zip(qz, w))
        d2 = 2.0 * m - 2.0 * (dotq / 1e9 - mu * sqz) / sigma
        out[t] = math.floor(d2 * 1e6 + 0.5)
    return out


def test_long_form_matches_python_mirror_exactly(spark):
    import random

    from cdc_audit_spark.operators.timeseries import znorm_distances_long

    rng = random.Random(5)
    series = {k: [rng.uniform(-2, 2) for _ in range(30)] for k in range(3)}
    got = {(r["user_id"], r["ts"]): r["dist2_micro"]
           for r in znorm_distances_long(_df(spark, series), "user_id",
                                         "ts", "ts", "value", Q).collect()}
    want = {(k, t): d for k, s in series.items()
            for t, d in _mirror_long(s, Q).items()}
    assert got == want


def test_long_form_recovers_planted_pattern_past_the_guard(spark):
    """A 600-point query — past the short form's 512 cap — still finds
    its planted affine copy through the constant-width plan."""
    import random

    from cdc_audit_spark.operators.timeseries import subsequence_topk_long

    rng = random.Random(3)
    m = 600
    q = [math.sin(i / 9.0) + 0.05 * ((i * 7) % 13) for i in range(m)]
    base = [rng.uniform(-0.3, 0.3) for _ in range(2000)]
    planted = base[:]
    for j in range(m):
        planted[700 + j] = 2.0 + 1.5 * q[j]
    series = {0: base, 1: planted}
    top = subsequence_topk_long(_df(spark, series), "user_id", "ts", "ts",
                                "value", q, 1).collect()
    assert [(top[0]["user_id"], top[0]["ts"])] == [(1, 700)]
    # affine copy: z-distance 0 up to the nano-dot quantization
    assert abs(top[0]["dist2"]) < 1e-3


def test_long_and_window_forms_agree_on_short_queries(spark):
    """For m within the short form's reach the two plans rank the same
    windows; distances agree within the nano-dot quantization bound."""
    import random

    from cdc_audit_spark.operators.timeseries import znorm_distances_long

    rng = random.Random(11)
    series = {k: [rng.uniform(-2, 2) for _ in range(40)] for k in range(2)}
    df = _df(spark, series)
    short = {(r["user_id"], r["ts"]): r["dist2"]
             for r in znorm_distances(df, "user_id", "ts", "ts",
                                      "value", Q).collect()}
    long_ = {(r["user_id"], r["ts"]): r["dist2"]
             for r in znorm_distances_long(df, "user_id", "ts", "ts",
                                           "value", Q).collect()}
    assert set(short) == set(long_)
    assert all(abs(short[k] - long_[k]) < 1e-4 for k in short)
