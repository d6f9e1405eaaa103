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
