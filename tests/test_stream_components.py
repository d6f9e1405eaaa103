"""Incremental connected components: the maintained labels must equal a
one-shot run at every point, survive crash-replay in both half-committed
windows, stay prunable at the index layer, and flatten under the resolve
maintenance."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.dedup import connected_components
from cdc_audit_spark.operators.text import winnow_overlap_pairs
from cdc_audit_spark.sinks.manifest import ManifestTable
from cdc_audit_spark.streaming.stream_components import (
    apply_components_epoch,
    current_components,
    maybe_cluster_components_index,
    resolve_components_state,
    stream_components_sync,
)

SCH = "doc_id long, text string"

# duplicate families with >= k+w-1 = 8 shared tokens; chain A connects
# 10-20-30 through two different runs; B is an identical pair; 7 is a
# token-starved doc (< 5 tokens -> no fingerprints, singleton by
# construction)
RUN_X = "alpha beta gamma delta epsilon zeta eta theta"
RUN_Y = "one two three four five six seven eight"
DOCS = [
    (10, f"{RUN_X} tail10 filler10a filler10b"),
    (20, f"head20 {RUN_X} mid20 {RUN_Y}"),
    (30, f"{RUN_Y} tail30 filler30a filler30b"),
    (5, "same exact payload tokens here repeated verbatim always"),
    (40, "same exact payload tokens here repeated verbatim always"),
    (50, "unique fifty text with plenty of tokens to fingerprint fine"),
    (7, "too short"),
]


def _one_shot(spark, docs_df):
    edges = winnow_overlap_pairs(
        docs_df, "text", "doc_id", k=5, w=4, min_shared=1
    ).select("id_a", "id_b")
    comp = connected_components(edges)
    return {
        r["id"]: r["c"]
        for r in docs_df.select(F.col("doc_id").alias("id"))
        .join(comp, "id", "left")
        .select("id", F.coalesce("component", "id").alias("c"))
        .collect()
    }


def _tables(spark, tmp_path, tag=""):
    return (ManifestTable(spark, str(tmp_path / f"members{tag}")),
            ManifestTable(spark, str(tmp_path / f"idx{tag}")),
            ManifestTable(spark, str(tmp_path / f"unions{tag}")))


def _apply(tables, batch_df, epoch):
    apply_components_epoch(*tables, batch_df, epoch, "run0",
                           "text", "doc_id")


def _got(tables):
    members, _, unions = tables
    return {r["id"]: r["component"]
            for r in current_components(members, unions).collect()}


def test_components_epochs_match_one_shot_fixture(spark, sf_dir, tmp_path):
    """Three insert epochs over the fixture (global-min ids arrive LAST,
    forcing canonical re-parenting) must resolve to exactly the one-shot
    labeling after every epoch."""
    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    tables = _tables(spark, tmp_path)
    seen = None
    for epoch, residue in enumerate((2, 1, 0)):
        b = docs.filter(F.col("doc_id") % 3 == residue)
        _apply(tables, b, epoch)
        seen = b if seen is None else seen.unionByName(b)
        assert _got(tables) == _one_shot(spark, seen)


def test_components_epoch_replay_both_windows(spark, tmp_path):
    """A replayed epoch is a no-op after full commit, and converges after
    a crash that landed only the members half."""
    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    b0 = docs.filter(F.col("doc_id").isin(20, 30, 40, 50))
    b1 = docs.filter(F.col("doc_id").isin(10, 5, 7))

    _apply(tables, b0, 0)
    want0 = _got(tables)
    vers0 = (members.current_version(), idx.current_version(),
             unions.current_version())
    _apply(tables, b0, 0)  # replay after full commit: no-op
    assert (members.current_version(), idx.current_version(),
            unions.current_version()) == vers0
    assert _got(tables) == want0

    # crash between the members commit and the idx commit
    orig = idx.append
    idx.append = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        _apply(tables, b1, 1)
    assert members.epoch_applied(1, "run0")
    assert not idx.epoch_applied(1, "run0")
    idx.append = orig
    _apply(tables, b1, 1)  # replay commits the missing halves

    want = _one_shot(spark, docs)
    assert _got(tables) == want
    # the merged family re-parented onto the late-arriving smaller ids
    assert want[20] == 10 and want[30] == 10 and want[40] == 5
    assert _got(tables)[7] == 7  # fingerprint-less doc labels itself


def test_resolve_components_state_flattens(spark, tmp_path):
    """The resolve maintenance empties the unions ledger without changing
    the resolved labeling, and later epochs keep working on the flattened
    state."""
    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs.filter(F.col("doc_id").isin(20, 30, 40, 50)), 0)
    _apply(tables, docs.filter(F.col("doc_id").isin(10, 5, 7)), 1)
    before = _got(tables)
    assert unions.read().count() > 0  # merges actually happened

    resolve_components_state(members, idx, unions)
    assert unions.read().count() == 0
    assert _got(tables) == before
    # membership labels are now root-grade (resolution is depth-zero)
    assert {r["label"] for r in members.read().collect()} == set(
        before.values())

    extra = spark.createDataFrame(
        [(3, f"{RUN_Y} three connects the chain again")], SCH)
    _apply(tables, extra, 2)
    assert _got(tables) == _one_shot(
        spark, docs.unionByName(extra))


def test_components_index_read_prunes_dirs(spark, tmp_path):
    """After fp-clustering, a batch's fingerprint lookup must list a
    fraction of the index dirs — the O(delta) read contract."""
    rows = [(i, " ".join(f"tok{i}w{j}" for j in range(10)))
            for i in range(64)]
    docs = spark.createDataFrame(rows, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    for epoch in range(8):
        _apply(tables, docs.filter(F.col("doc_id") % 8 == epoch), epoch)
    assert maybe_cluster_components_index(idx, max_dirs=4, n_dirs=8)
    n_dirs = len(idx.manifest(idx.current_version())["dirs"])
    assert n_dirs >= 8
    from cdc_audit_spark.operators.text import winnow_fingerprints

    one = winnow_fingerprints(
        docs.filter(F.col("doc_id") == 3), "text", "doc_id", 5, 4)
    pts = [r["fp"] for r in one.select("fp").distinct().collect()]
    pruned = idx.dirs_pruned_any("fp", pts)
    assert 0 < len(pruned) < n_dirs
    got = idx.read_pruned_for_keys(one.select("fp"), "fp")
    assert {r["id"] for r in got.collect()} == {3}


def test_stream_components_sync_end_to_end(spark, tmp_path):
    """The foreachBatch drain over a parquet source (one file per
    trigger) must land the one-shot labeling exactly once."""
    docs = spark.createDataFrame(DOCS, SCH)
    src = str(tmp_path / "src")
    for part, ids in enumerate([(20, 30), (40, 50), (10, 5, 7)]):
        docs.filter(F.col("doc_id").isin(*ids)).coalesce(1).write.mode(
            "append").parquet(src)
    q = stream_components_sync(
        spark, src, SCH,
        str(tmp_path / "members"), str(tmp_path / "idx"),
        str(tmp_path / "unions"), str(tmp_path / "ckpt"),
        "text", "doc_id", max_files_per_trigger=1)
    q.awaitTermination(120)
    members = ManifestTable(spark, str(tmp_path / "members"))
    unions = ManifestTable(spark, str(tmp_path / "unions"))
    got = {r["id"]: r["component"]
           for r in current_components(members, unions).collect()}
    assert got == _one_shot(spark, docs)


def test_incremental_components_random_batches(spark):
    """Seeded random corpora arriving in random batch splits/orders: the
    resolved incremental labeling must equal a driver-side union-find over
    the full final edge set, after EVERY batch prefix."""
    import random

    from cdc_audit_spark.operators.dedup import (
        incremental_components,
        resolve_component_labels,
    )

    rng = random.Random(7)
    # shared token runs drawn from a small pool of 8-token sentences →
    # dense, multi-family overlap graphs with plenty of chain merges
    runs = [" ".join(f"r{r}t{j}" for j in range(8)) for r in range(5)]
    for trial in range(3):
        docs = []
        for i in range(24):
            picks = rng.sample(runs, rng.randint(1, 2))
            docs.append((i, " ".join(picks + [f"pad{i}a pad{i}b"])))
        rng.shuffle(docs)
        n_batches = rng.randint(2, 5)
        batches = [docs[j::n_batches] for j in range(n_batches)]

        df_all = spark.createDataFrame(docs, SCH)
        idx = unions = members = None
        seen = []
        for b in batches:
            bdf = spark.createDataFrame(b, SCH)
            m, i_d, u = incremental_components(
                bdf, "text", "doc_id", idx=idx, unions=unions)
            m = m.localCheckpoint(eager=True)
            i_d = i_d.localCheckpoint(eager=True)
            u = u.localCheckpoint(eager=True)
            members = m if members is None else members.unionByName(m)
            idx = i_d if idx is None else idx.unionByName(i_d)
            unions = u if unions is None else unions.unionByName(u)
            seen += b
            got = {r["id"]: r["component"] for r in
                   resolve_component_labels(members, unions).collect()}
            want = _one_shot(spark, spark.createDataFrame(seen, SCH))
            assert got == want, (trial, len(seen))
        # final state also checked against the full corpus directly
        assert got == _one_shot(spark, df_all)


def test_remove_members_and_rebuild(spark, tmp_path):
    """Removal tombstones membership + index rows (labels of survivors
    unchanged — a valid, possibly coarser partition), removed content
    stops witnessing new merges, and the rebuild policy re-derives the
    exact fresh clustering (including splits) from the live index."""
    from cdc_audit_spark.streaming.stream_components import (
        deleted_fraction,
        maybe_rebuild_components,
        remove_components_members,
    )

    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs, 0)
    assert _got(tables) == _one_shot(spark, docs)

    # remove the 10-20-30 bridge: survivors keep their (now coarser)
    # labels; the removed doc disappears from the view
    r = remove_components_members(members, idx, unions, [20])
    assert r["members_deleted"] == 1 and r["index_deleted"] > 0
    got = _got(tables)
    assert 20 not in got
    assert got[30] == 10 and got[10] == 10  # names unchanged, not split

    # removed content cannot witness NEW merges: 50 is unique; a later
    # doc with identical text must come up a singleton
    remove_components_members(members, idx, unions, [50])
    _apply(tables, spark.createDataFrame(
        [(60, DOCS[5][1])], SCH), 1)
    got = _got(tables)
    assert 50 not in got and got[60] == 60

    # under the bar: no rebuild
    assert maybe_rebuild_components(members, idx, unions,
                                    max_deleted_frac=0.9) is None
    frac = deleted_fraction(members)
    assert 0.2 < frac < 0.3  # 2 dead / 8 all-time

    ver = maybe_rebuild_components(members, idx, unions,
                                   max_deleted_frac=0.2)
    assert ver is not None
    got = _got(tables)
    # the bridge removal now SPLITS 10/30, the intact pair keeps its
    # min live label, and the tombstone accounting resets
    assert got[10] == 10 and got[30] == 30
    assert got[40] == 5 and got[5] == 5
    assert deleted_fraction(members) == 0.0
    assert unions.read().count() == 0

    # epochs keep working on the rebuilt state: a smaller id joining the
    # identical-pair family re-parents it
    _apply(tables, spark.createDataFrame(
        [(2, DOCS[3][1])], SCH), 2)
    got = _got(tables)
    assert got[2] == got[5] == got[40] == 2


def test_components_cfg_drift_refused(spark, tmp_path):
    """An epoch applied with a different fingerprint (k, w) than the
    ledgers were built with must fail loudly — mixed configs silently
    stop finding duplicates."""
    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    _apply(tables, docs.filter(F.col("doc_id").isin(20, 30)), 0)
    with pytest.raises(ValueError, match="fingerprint config"):
        apply_components_epoch(*tables, docs.filter(F.col("doc_id") == 10),
                               1, "run0", "text", "doc_id", k=7, w=3)
    # the original config keeps working
    _apply(tables, docs.filter(F.col("doc_id") == 10), 1)
    assert _got(tables)[20] == 10


def test_components_rebuild_crash_windows(spark, tmp_path):
    """A rebuild crash between its three overwrites must not corrupt the
    state. The planted hazard is the ADVICE scenario: the fresh min-live
    label (2) is a CHILD in the stale unions ledger (2 -> 1, with 1 since
    removed), so resolving fresh labels through that ledger would relabel
    a live component onto a removed doc id — and because the members
    overwrite materialized the deletion vectors, the policy would never
    re-fire to self-heal. Reads must self-protect immediately, and the
    next epoch (or the policy itself) must replay the missing overwrites
    idempotently."""
    from cdc_audit_spark.streaming.stream_components import (
        deleted_fraction,
        finish_pending_rebuild,
        maybe_rebuild_components,
        remove_components_members,
    )

    pay = "same exact payload tokens here repeated verbatim always"
    base = [(2, pay),
            (50, "unique fifty text with plenty of tokens to fingerprint"),
            (51, "another singleton document with its own novel words")]

    def build(tag):
        tables = _tables(spark, tmp_path, tag)
        _apply(tables, spark.createDataFrame(base, SCH), 0)
        _apply(tables, spark.createDataFrame([(1, pay)], SCH), 1)
        members, idx, unions = tables
        # the merge re-parented canonical 2 onto 1: the hazard ledger row
        assert {(r["child"], r["parent"])
                for r in unions.read().collect()} == {(2, 1)}
        remove_components_members(members, idx, unions, [1])
        assert deleted_fraction(members) == 0.25
        return tables

    want = {2: 2, 50: 50, 51: 51}  # fresh clustering of the survivors

    # window 1: crash after the members overwrite, before the idx rewrite
    members, idx, unions = t1 = build("w1")
    orig = idx.overwrite_clustered
    idx.overwrite_clustered = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        maybe_rebuild_components(members, idx, unions, max_deleted_frac=0.2)
    idx.overwrite_clustered = orig
    assert unions.read().count() == 1      # stale ledger still present
    assert _got(t1) == want                # reads ignore it (2 != 1!)
    # the next epoch heals before processing, then keeps working
    _apply(t1, spark.createDataFrame(
        [(60, "late arriving document with completely fresh words")], SCH), 2)
    assert not finish_pending_rebuild(members, idx, unions)
    assert unions.read().count() == 0
    assert {r["label"] for r in
            idx.read().filter("id = 2").collect()} == {2}
    assert _got(t1) == {**want, 60: 60}
    # healed state keeps merging correctly: a smaller twin re-parents 2
    _apply(t1, spark.createDataFrame([(0, pay)], SCH), 3)
    assert _got(t1)[2] == 0

    # window 2: crash after the idx rewrite, before the unions overwrite
    members, idx, unions = t2 = build("w2")
    orig_u = unions.overwrite
    unions.overwrite = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        maybe_rebuild_components(members, idx, unions, max_deleted_frac=0.2)
    unions.overwrite = orig_u
    assert _got(t2) == want
    # the policy itself heals on its next (under-the-bar) invocation
    assert maybe_rebuild_components(members, idx, unions,
                                    max_deleted_frac=0.2) is None
    assert unions.read().count() == 0
    assert not finish_pending_rebuild(members, idx, unions)
    assert _got(t2) == want


def test_maybe_resolve_components_fires_mid_drain(spark, tmp_path):
    """A long merge streak (identical docs arriving in DESCENDING id
    order deepen the unions chain by one per epoch) must trip the
    auto-resolve policy unattended mid-drain: the ledger never deepens
    past the bound, resolve_union_closure never hits its 32-step hard
    stop, and the final labeling is the one-shot answer."""
    pay = "identical duplicate payload shared by every document here"
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    resolved_at = []
    for e, doc_id in enumerate(range(100, 80, -1)):
        _apply(tables, spark.createDataFrame([(doc_id, pay)], SCH), e)
        n = unions.row_count()
        # without the policy the ledger would hold e rows after epoch e;
        # the policy caps chain depth at 16
        assert n <= 16, (e, n)
        if e >= 1 and n < e:
            resolved_at.append(e)
    assert resolved_at  # the resolve actually fired, unattended
    assert _got(tables) == {i: 81 for i in range(81, 101)}


def test_maybe_resolve_components_triggers(spark, tmp_path):
    """Unit bounds of the policy: quiet under both bars, firing on the
    row bound even when the shape is shallow."""
    from cdc_audit_spark.streaming.stream_components import (
        maybe_resolve_components,
    )

    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs.filter(F.col("doc_id").isin(20, 30, 40, 50)), 0)
    _apply(tables, docs.filter(F.col("doc_id").isin(10, 5, 7)), 1)
    n = unions.row_count()
    assert n > 0
    before = _got(tables)
    # under both bars: no-op
    assert not maybe_resolve_components(members, idx, unions)
    assert unions.row_count() == n
    # a wide-but-shallow ledger crosses the ROW bar
    assert maybe_resolve_components(members, idx, unions,
                                    max_union_rows=n - 1)
    assert unions.row_count() == 0
    assert _got(tables) == before


def test_remove_members_dataframe_overload(spark, tmp_path):
    """The DataFrame-valued removal matches the list form: left-semi
    join pushdown, same tombstone accounting, same survivor semantics."""
    from cdc_audit_spark.streaming.stream_components import (
        remove_components_members,
    )

    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs, 0)
    purge = spark.createDataFrame([(20,), (50,)], "doc_id long")
    r = remove_components_members(members, idx, unions, purge)
    assert r["members_deleted"] == 2 and r["index_deleted"] > 0
    assert 0.2 < r["deleted_fraction"] < 0.35
    got = _got(tables)
    assert 20 not in got and 50 not in got
    assert got[30] == 10 and got[10] == 10  # labels unchanged, not split


def test_components_unique_id_contract(spark, tmp_path):
    """Re-inserting a live id refuses loudly (the pruned index read
    witnesses re-delivered content), in-batch duplicate ids refuse
    loudly, and a REMOVED id may be re-inserted (tombstoned rows are no
    longer live)."""
    from cdc_audit_spark.streaming.stream_components import (
        remove_components_members,
    )

    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs, 0)
    before = _got(tables)
    with pytest.raises(ValueError, match="already live"):
        _apply(tables, docs.filter(F.col("doc_id") == 20), 1)
    dup = spark.createDataFrame(
        [(70, "fresh unique seventy text tokens aplenty right here"),
         (70, "fresh unique seventy text tokens aplenty right here")], SCH)
    with pytest.raises(ValueError, match="within the batch"):
        _apply(tables, dup, 1)
    assert _got(tables) == before  # refused epochs committed nothing

    remove_components_members(members, idx, unions, [50])
    _apply(tables, spark.createDataFrame([(50, DOCS[5][1])], SCH), 1)
    assert _got(tables)[50] == 50


def test_component_stats_served_from_state(spark, sf_dir, tmp_path):
    """After a multi-epoch drain, the maintained-state duplication
    report (two aggregates over resolved labels, no reclustering) must
    equal the recompute form — including after a removal + rebuild."""
    from cdc_audit_spark.streaming.stream_components import (
        component_stats,
        maybe_rebuild_components,
        remove_components_members,
    )

    docs = (spark.read.parquet(f"{sf_dir}/documents.parquet")
            .select("doc_id", "text"))
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    for epoch, residue in enumerate((2, 1, 0)):
        _apply(tables, docs.filter(F.col("doc_id") % 3 == residue), epoch)

    def recompute(d):
        labels = list(_one_shot(spark, d).values())
        from collections import Counter

        sizes = Counter(Counter(labels).values())
        return {(sz, n, sz * n, (sz - 1) * n) for sz, n in sizes.items()}

    served = {(r["cluster_size"], r["n_clusters"], r["n_docs"],
               r["n_removable"]) for r in
              component_stats(members, unions).collect()}
    assert served == recompute(docs)

    remove_components_members(
        members, idx, unions, docs.filter("doc_id % 5 = 0").select("doc_id"))
    assert maybe_rebuild_components(members, idx, unions,
                                    max_deleted_frac=0.1)
    live = docs.filter("doc_id % 5 != 0")
    served2 = {(r["cluster_size"], r["n_clusters"], r["n_docs"],
                r["n_removable"]) for r in
               component_stats(members, unions).collect()}
    assert served2 == recompute(live)


def test_components_rebuild_crash_then_direct_maintenance(spark, tmp_path):
    """A crashed rebuild followed by a DIRECT maintenance call (resolve,
    or a removal) — not an epoch — must still heal first: both commit to
    members without the rebuild token and would otherwise bury the
    pending marker (resolve would even bake stale-ledger labels into the
    base ledgers)."""
    from cdc_audit_spark.streaming.stream_components import (
        maybe_rebuild_components,
        remove_components_members,
    )

    pay = "same exact payload tokens here repeated verbatim always"
    base = [(2, pay),
            (50, "unique fifty text with plenty of tokens to fingerprint"),
            (51, "another singleton document with its own novel words")]

    def crashed(tag):
        tables = _tables(spark, tmp_path, tag)
        _apply(tables, spark.createDataFrame(base, SCH), 0)
        _apply(tables, spark.createDataFrame([(1, pay)], SCH), 1)
        members, idx, unions = tables
        remove_components_members(members, idx, unions, [1])
        orig = idx.overwrite_clustered
        idx.overwrite_clustered = lambda *a, **k: (_ for _ in ()).throw(
            RuntimeError("simulated crash"))
        with pytest.raises(RuntimeError, match="simulated crash"):
            maybe_rebuild_components(members, idx, unions,
                                     max_deleted_frac=0.2)
        idx.overwrite_clustered = orig
        return tables

    want = {2: 2, 50: 50, 51: 51}

    members, idx, unions = t1 = crashed("m1")
    resolve_components_state(members, idx, unions)
    assert unions.read().count() == 0
    assert _got(t1) == want
    assert {r["label"] for r in members.read().collect()} == {2, 50, 51}

    members, idx, unions = t2 = crashed("m2")
    r = remove_components_members(members, idx, unions, [51])
    assert r["members_deleted"] == 1
    assert unions.read().count() == 0  # the heal ran before the delete
    assert _got(t2) == {2: 2, 50: 50}


def test_components_max_fp_df_cap(spark, tmp_path):
    """The hot-fingerprint cap through both maintained paths: an epoch
    applied with max_fp_df below the family size witnesses no merges
    (everyone a singleton), and a policy rebuild with the corpus-level
    cap splits an over-cap family the same way."""
    from cdc_audit_spark.operators.dedup import incremental_components
    from cdc_audit_spark.streaming.stream_components import (
        maybe_rebuild_components,
        remove_components_members,
    )

    pay = "same exact payload tokens here repeated verbatim always"
    fam = [(i, pay) for i in range(1, 7)]

    # batch-local cap in the kernel: 6 identical docs, cap 5 -> singletons
    m, i_d, u = incremental_components(
        spark.createDataFrame(fam, SCH), "text", "doc_id", max_fp_df=5)
    assert {r["id"]: r["label"] for r in m.collect()} == {
        i: i for i in range(1, 7)}
    assert i_d.count() == 0  # capped fps are not indexed either

    # corpus-level cap on the rebuild: uncapped insert clusters the
    # family; removals cross the bar; the capped rebuild splits it
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, spark.createDataFrame(fam, SCH), 0)
    assert len(set(_got(tables).values())) == 1
    remove_components_members(members, idx, unions, [5, 6])
    assert maybe_rebuild_components(members, idx, unions,
                                    max_deleted_frac=0.2, max_fp_df=3)
    assert _got(tables) == {i: i for i in range(1, 5)}


def test_rebuild_token_survives_generic_maintenance(spark, tmp_path):
    """ADVICE r11: a generic ManifestTable commit on members during a
    rebuild's crash window (here add_constraint — any out-of-band
    maintenance this module never sees) must NOT bury the pending-rebuild
    marker: the token is inherited manifest state, so detection, the
    read-side guard, and the idempotent heal all survive the commit."""
    from cdc_audit_spark.streaming.stream_components import (
        _rebuild_pending,
        finish_pending_rebuild,
        maybe_rebuild_components,
        remove_components_members,
    )

    pay = "same exact payload tokens here repeated verbatim always"
    base = [(2, pay),
            (50, "unique fifty text with plenty of tokens to fingerprint"),
            (51, "another singleton document with its own novel words")]
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, spark.createDataFrame(base, SCH), 0)
    _apply(tables, spark.createDataFrame([(1, pay)], SCH), 1)
    remove_components_members(members, idx, unions, [1])
    orig = idx.overwrite_clustered
    idx.overwrite_clustered = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        maybe_rebuild_components(members, idx, unions, max_deleted_frac=0.2)
    idx.overwrite_clustered = orig
    assert _rebuild_pending(members, idx, unions) is not None

    # the out-of-band commit that used to bury the token
    members.add_constraint("id_nonneg", "id >= 0")
    tok = _rebuild_pending(members, idx, unions)
    assert tok is not None
    assert members.manifest(members.current_version()).get(
        "components_rebuild") == tok  # physically inherited

    want = {2: 2, 50: 50, 51: 51}
    assert _got(tables) == want          # reads still ignore stale ledger
    assert finish_pending_rebuild(members, idx, unions)
    assert unions.read().count() == 0
    assert _got(tables) == want
    assert not finish_pending_rebuild(members, idx, unions)


def test_maintenance_refused_during_half_landed_epoch(spark, tmp_path):
    """ADVICE r11: maintenance injected between an epoch's crash and its
    redelivery reads an inconsistent cross-table state (members holds the
    epoch's docs, idx doesn't) — every maintenance entry point must refuse
    loudly; after redelivery completes the epoch, the same maintenance
    proceeds and the labels are exact."""
    from cdc_audit_spark.streaming.stream_components import (
        maybe_rebuild_components,
        remove_components_members,
    )

    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs.filter(F.col("doc_id").isin(20, 30, 40, 50)), 0)
    b1 = docs.filter(F.col("doc_id").isin(10, 5, 7))
    orig = idx.append
    idx.append = lambda *a, **k: (_ for _ in ()).throw(
        RuntimeError("simulated crash"))
    with pytest.raises(RuntimeError, match="simulated crash"):
        _apply(tables, b1, 1)
    idx.append = orig

    with pytest.raises(RuntimeError, match="half-landed"):
        resolve_components_state(members, idx, unions)
    with pytest.raises(RuntimeError, match="half-landed"):
        maybe_rebuild_components(members, idx, unions)
    with pytest.raises(RuntimeError, match="half-landed"):
        remove_components_members(members, idx, unions, [50])

    _apply(tables, b1, 1)  # redelivery completes the epoch
    resolve_components_state(members, idx, unions)
    assert unions.read().count() == 0
    assert _got(tables) == _one_shot(spark, docs)


def test_version_before_epoch_skips_tagged_maintenance(spark, tmp_path):
    """ADVICE r11 pin: a maintenance overwrite inherits the last epoch
    tag physically, so a replay of that epoch pins the TRUE pre-epoch
    version (not the maintenance rewrite, which already contains the
    epoch's own rows) — the unique-id probe never sees the batch's own
    ids and the delta recompute reads the state attempt 1 read."""
    from cdc_audit_spark.streaming.stream_dedup import _version_before_epoch

    docs = spark.createDataFrame(DOCS, SCH)
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    _apply(tables, docs.filter(F.col("doc_id").isin(20, 30, 40, 50)), 0)
    pre = idx.current_version()
    _apply(tables, docs.filter(F.col("doc_id").isin(10, 5, 7)), 1)
    resolve_components_state(members, idx, unions)  # tagged maintenance
    assert idx.manifest(idx.current_version()).get("epoch") == 1
    assert _version_before_epoch(idx, 1) == pre
    # a replayed epoch 1 after the maintenance is a clean no-op
    vers = (members.current_version(), idx.current_version(),
            unions.current_version())
    _apply(tables, docs.filter(F.col("doc_id").isin(10, 5, 7)), 1)
    assert (members.current_version(), idx.current_version(),
            unions.current_version()) == vers
    assert _got(tables) == _one_shot(spark, docs)


def test_members_unions_fanin_bounded(spark, tmp_path):
    """VERDICT r11: a long drain with few merges and no removals must not
    grow the members/unions dir listing one dir per epoch forever — the
    compaction policy bin-packs the append tail, invisibly to the epoch
    guards and the labeling."""
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    pay = "identical duplicate payload shared by the two twin documents"
    rows = [(1000 + e,
             pay if e in (3, 11) else
             f"unique document number {e} with plenty of distinct words "
             f"w{e}a w{e}b w{e}c w{e}d")
            for e in range(20)]
    seen = []
    for e, row in enumerate(rows):
        seen.append(row)
        apply_components_epoch(*tables, spark.createDataFrame([row], SCH),
                               e, "run0", "text", "doc_id",
                               members_max_dirs=6)
        for t in (members, unions):
            n = len(t.manifest(t.current_version())["dirs"])
            assert n <= 7, (e, t.path, n)
        assert _got(tables) == _one_shot(spark,
                                         spark.createDataFrame(seen, SCH))
    # the twins actually merged (the compacted state kept the index live)
    got = _got(tables)
    assert got[1011] == got[1003] == 1003


def test_maybe_resolve_cyclic_ledger_raises(spark, tmp_path):
    """A corrupt (cyclic) unions ledger must fail the depth walk loudly
    instead of hanging the driver."""
    from cdc_audit_spark.streaming.stream_components import (
        maybe_resolve_components,
    )

    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    unions.append(spark.createDataFrame([(1, 2), (2, 1)],
                                        "child long, parent long"))
    with pytest.raises(RuntimeError, match="cycle"):
        maybe_resolve_components(members, idx, unions)


def test_members_fanin_compacts_through_live_removals(spark, tmp_path):
    """r12: the members fan-in policy packs THROUGH live deletion
    vectors (covers rewrite with the dirs), so a drain with occasional
    removals keeps both bounded dir counts AND the exact tombstone
    fraction the rebuild policy triggers on."""
    from cdc_audit_spark.streaming.stream_components import (
        deleted_fraction,
        maybe_compact_members,
        maybe_rebuild_components,
        remove_components_members,
    )

    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    pay = "same exact payload tokens here repeated verbatim always"
    rows = [(1000 + e, pay if e < 4 else
             f"unique doc {e} with plenty of distinct words "
             f"x{e}a x{e}b x{e}c") for e in range(12)]
    for e, row in enumerate(rows):
        apply_components_epoch(*tables, spark.createDataFrame([row], SCH),
                               e, "run0", "text", "doc_id",
                               members_max_dirs=64)
    remove_components_members(members, idx, unions, [1005, 1006])
    frac = deleted_fraction(members)
    assert frac > 0
    want = _got(tables)
    assert 1005 not in want and 1006 not in want

    v = maybe_compact_members(members, max_dirs=4)
    assert v is not None and members.manifest(v)["action"] == "binpack"
    assert len(members.manifest(v)["dirs"]) <= 4
    assert _got(tables) == want                 # labels exact
    assert deleted_fraction(members) == frac    # trigger metric intact
    # the rebuild policy still fires off the preserved fraction; it
    # renames canonicals to current min live members (and may split),
    # so compare the PARTITION, not the label names
    assert maybe_rebuild_components(members, idx, unions,
                                    max_deleted_frac=frac / 2)

    def parts(labels):
        by = {}
        for i, c in labels.items():
            by.setdefault(c, set()).add(i)
        return {frozenset(g) for g in by.values()}

    assert parts(_got(tables)) == parts(want)


def test_unions_rows_bounded_under_merge_heavy_stream(spark, tmp_path):
    """VERDICT r12 item 6 — the unions row-growth invariant: every
    appended row retires one former canonical FOREVER (no child repeats
    across the ledger's life), so per-epoch growth is bounded by the
    epoch's merge count; the wired resolve trigger flattens the ledger
    and labels survive it; post-resolve epochs start from zero rows."""
    from cdc_audit_spark.streaming.stream_components import (
        maybe_resolve_components,
    )

    fams = [" ".join(f"fam{i}tok{j}" for j in range(8)) for i in range(12)]
    tables = _tables(spark, tmp_path)
    members, idx, unions = tables
    singles = [(100 + i, f"{fams[i]} filler{i}a filler{i}b")
               for i in range(12)]
    _apply(tables, spark.createDataFrame(singles, SCH), 0)
    assert unions.row_count(unions.current_version()) == 0  # no merges yet

    seen = list(singles)
    retired_ever: set = set()
    prev_snapshot: set = set()

    def drain_epoch(epoch, rows):
        seen.extend(rows)
        _apply(tables, spark.createDataFrame(rows, SCH), epoch)
        ledger = [r["child"] for r in unions.read().collect()]
        # no child repeats within the live ledger, and no child ever
        # re-retires across the ledger's whole life (resolves included) —
        # the retire-once fact the row bound rests on
        assert len(ledger) == len(set(ledger))
        new = set(ledger) - prev_snapshot
        assert not (new & retired_ever)
        retired_ever.update(new)
        prev_snapshot.clear()
        prev_snapshot.update(ledger)
        assert _got(tables) == _one_shot(spark,
                                         spark.createDataFrame(seen, SCH))
        return len(ledger)

    # epoch 1: six pairwise merges -> exactly 6 retired canonicals
    n1 = drain_epoch(1, [(200 + j, f"{fams[2 * j]} {fams[2 * j + 1]}")
                         for j in range(6)])
    assert n1 == 6
    # epoch 2: merge the pairs into quads -> 3 more retirements
    n2 = drain_epoch(2, [(300 + m, f"{fams[4 * m]} {fams[4 * m + 2]}")
                         for m in range(3)])
    assert n2 == 9

    # the trigger: over the row bound -> resolve runs, ledger empties,
    # labels unchanged
    before = _got(tables)
    assert maybe_resolve_components(members, idx, unions,
                                    max_union_rows=2) is True
    assert unions.row_count(unions.current_version()) == 0
    assert _got(tables) == before
    prev_snapshot.clear()  # the resolve emptied the ledger

    # post-resolve epochs accumulate only THEIR merges, and the merged
    # root retires a label never retired before (checked in drain_epoch)
    n3 = drain_epoch(3, [(400, f"{fams[0]} {fams[4]}")])
    assert n3 == 1
