import datetime as dt

from cdc_audit_spark.operators.asof import asof_join


def _frames(spark):
    T = dt.datetime
    trades = spark.createDataFrame(
        [
            (1, T(2026, 1, 1, 10, 0, 5), 100.0),
            (1, T(2026, 1, 1, 10, 1, 0), 101.0),
            (2, T(2026, 1, 1, 10, 0, 30), 200.0),
            (3, T(2026, 1, 1, 10, 0, 0), 300.0),   # no quote for key 3
        ],
        "k long, ts timestamp, price double",
    )
    quotes = spark.createDataFrame(
        [
            (1, T(2026, 1, 1, 10, 0, 0), 99.5),
            (1, T(2026, 1, 1, 10, 0, 30), 100.5),
            (1, T(2026, 1, 1, 10, 2, 0), 102.5),
            (2, T(2026, 1, 1, 10, 0, 30), 199.5),  # tie timestamp
        ],
        "k long, ts timestamp, quote double",
    )
    return trades, quotes


def test_asof_backward(spark):
    trades, quotes = _frames(spark)
    out = {(r["k"], r["ts"]): r for r in
           asof_join(trades, quotes, on="ts", by="k").collect()}
    T = dt.datetime
    assert out[(1, T(2026, 1, 1, 10, 0, 5))]["quote"] == 99.5
    assert out[(1, T(2026, 1, 1, 10, 1, 0))]["quote"] == 100.5
    # tie: quote at exactly the same ts matches (<= semantics)
    assert out[(2, T(2026, 1, 1, 10, 0, 30))]["quote"] == 199.5
    # no earlier quote → null
    assert out[(3, T(2026, 1, 1, 10, 0, 0))]["quote"] is None
    assert len(out) == 4  # left join: every trade survives


def test_asof_forward(spark):
    trades, quotes = _frames(spark)
    out = {(r["k"], r["ts"]): r for r in
           asof_join(trades, quotes, on="ts", by="k", direction="forward").collect()}
    T = dt.datetime
    assert out[(1, T(2026, 1, 1, 10, 0, 5))]["quote"] == 100.5   # next at 10:00:30
    assert out[(1, T(2026, 1, 1, 10, 1, 0))]["quote"] == 102.5
    assert out[(2, T(2026, 1, 1, 10, 0, 30))]["quote"] == 199.5  # tie matches
    assert out[(3, T(2026, 1, 1, 10, 0, 0))]["quote"] is None    # no later quote for 3


def test_asof_carries_right_ts(spark):
    trades, quotes = _frames(spark)
    row = asof_join(trades, quotes, on="ts", by="k").filter("k = 1 and price = 101.0").first()
    assert row["ts_right"] == dt.datetime(2026, 1, 1, 10, 0, 30)


def test_asof_single_shuffle_plan(spark):
    trades, quotes = _frames(spark)
    plan = asof_join(trades, quotes, on="ts", by="k")._jdf.queryExecution().executedPlan().toString()
    # union-tag implementation: exactly one exchange (the window partition),
    # and no join operator at all
    assert plan.count("Exchange hashpartitioning") == 1
    assert "Join" not in plan
