"""CDC-maintained IVF index (streaming.stream_ann): incremental
maintenance of the (id, cell, embedding) assignment table from the audit
log, exactly-once via merge_audit's watermark, queried without the
per-call corpus re-assign."""

import pytest
from pyspark.sql import functions as F

from cdc_audit_spark.operators.similarity import (
    ivf_assign,
    ivf_topk_indexed,
    ivf_topk,
    sample_centroids,
)
from cdc_audit_spark.sinks.manifest import CommitConflict, ManifestTable
from cdc_audit_spark.streaming.stream_ann import (
    ann_index_delta,
    bootstrap_ann_index,
    cdc_ann_index_sync,
    stream_ann_index_sync,
)


def _corpus(spark, lo, hi, dim=4):
    # deterministic small-dim embeddings with spread-out directions
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            ((F.col("id") * (i + 3)) % 17 - 8.0).cast("float")
            for i in range(dim)
        ]).alias("embedding"),
    )


def _audit(df, event, pk_base):
    return df.select(
        "vec_id", "embedding",
        F.lit(event).alias("audit_event"),
        (F.col("vec_id") + pk_base).alias("audit_pk"),
    )


def test_incremental_index_equals_full_rebuild(spark, tmp_path):
    """Incremental maintenance (updates + deletes + out-of-range inserts
    past the bootstrap) must leave the index equal to a from-scratch
    assignment of the final corpus state, replay as a no-op, and —
    because the delta touches only a narrow id band — carry the other
    range dirs into the child manifest verbatim (O(touched) merge)."""
    base = _corpus(spark, 0, 200)
    cents = sample_centroids(base, 4)

    idx = ManifestTable(spark, str(tmp_path / "idx"))
    bootstrap_ann_index(idx, base, cents, range_buckets=4)
    v_boot = idx.current_version()
    assert len(idx.manifest(v_boot)["dirs"]) >= 3

    # delta confined to ids < 25, plus new ids past the layout's edge
    upd = _audit(
        base.filter("vec_id < 25 and vec_id % 5 = 0 and vec_id % 7 != 0")
        .withColumn("embedding", F.reverse("embedding")),
        "update", 1001)
    dele = _audit(base.filter("vec_id < 25 and vec_id % 7 = 0"),
                  "delete", 1001)
    ins = _audit(_corpus(spark, 200, 210), "insert", 1001)
    log = upd.unionByName(dele).unionByName(ins)
    r = cdc_ann_index_sync(idx, log, cents)
    assert 0 < r.rows_synced < 50

    grown = _corpus(spark, 0, 210)
    final = grown.filter(
        "vec_id >= 25 or vec_id % 7 != 0").withColumn(
        "embedding",
        F.when((F.col("vec_id") < 25) & (F.col("vec_id") % 5 == 0),
               F.reverse("embedding"))
         .otherwise(F.col("embedding")))
    want = {(r["vec_id"], r["cell"], tuple(r["embedding"]))
            for r in ivf_assign(final, cents).collect()}
    got = {(r["vec_id"], r["cell"], tuple(r["embedding"]))
           for r in idx.read().collect()}
    assert got == want

    # replay: unmoved watermark, no commit
    v = idx.current_version()
    assert cdc_ann_index_sync(idx, log, cents).rows_synced == 0
    assert idx.current_version() == v

    # pruned maintenance reused the untouched middle range dirs
    m = idx.manifest(v)
    assert m["action"] == "merge"
    assert set(m["dirs"]) & set(idx.manifest(v_boot)["dirs"])


def test_indexed_query_paths(spark, tmp_path):
    """ivf_topk_indexed over the maintained index: nprobe=all equals
    exact brute force; small nprobe equals ivf_topk's answer on the same
    corpus+centroids (identical probe ranking and scoring)."""
    from cdc_audit_spark.operators.similarity import cosine_topk

    base = _corpus(spark, 0, 150)
    cents = sample_centroids(base, 4)
    idx = ManifestTable(spark, str(tmp_path / "idx"))
    bootstrap_ann_index(idx, base, cents, range_buckets=4)

    qv = [float(x) for x in
          base.filter("vec_id = 1").first()["embedding"]]
    cand = idx.read().filter("vec_id != 1")

    exact = cosine_topk(base.filter("vec_id != 1"), qv, 10).collect()
    via_index = ivf_topk_indexed(cand, cents, qv, 10,
                                 nprobe=len(cents)).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in via_index] == \
        [(r["vec_id"], r["cos_sim"]) for r in exact]

    approx_op = ivf_topk(base.filter("vec_id != 1"), cents, qv, 10,
                         nprobe=2).collect()
    approx_idx = ivf_topk_indexed(cand, cents, qv, 10, nprobe=2).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in approx_idx] == \
        [(r["vec_id"], r["cos_sim"]) for r in approx_op]


def test_streaming_maintenance_availablenow(spark, tmp_path):
    """The always-on form: audit batches land as parquet files, the
    stream drains them and the index converges to the final state; a
    second drain over the same files is a watermark no-op."""
    base = _corpus(spark, 0, 60)
    cents = sample_centroids(base, 3)
    src = str(tmp_path / "src")
    _audit(base, "insert", 1).write.mode("append").parquet(src)
    _audit(base.filter("vec_id % 3 = 0"), "delete", 101).write.mode(
        "append").parquet(src)

    schema = _audit(base, "insert", 1).schema
    q = stream_ann_index_sync(
        spark, src, schema, str(tmp_path / "idx"), str(tmp_path / "ck"),
        cents, pruned=True)
    q.awaitTermination(120)

    idx = ManifestTable(spark, str(tmp_path / "idx"))
    final = base.filter("vec_id % 3 != 0")
    want = {(r["vec_id"], r["cell"]) for r in ivf_assign(final, cents).collect()}
    got = {(r["vec_id"], r["cell"]) for r in idx.read().collect()}
    assert got == want

    # restart over the same source: replayed/empty batches are no-ops
    v = idx.current_version()
    q2 = stream_ann_index_sync(
        spark, src, schema, str(tmp_path / "idx"),
        str(tmp_path / "ck"), cents)
    q2.awaitTermination(120)
    assert idx.current_version() == v


def test_delta_shapes_and_delete_cells(spark):
    """ann_index_delta: non-delete images get a cell, deletes get NULL;
    column order matches the state-plus-audit contract."""
    base = _corpus(spark, 0, 10)
    cents = sample_centroids(base, 2)
    log = _audit(base.filter("vec_id < 5"), "insert", 1).unionByName(
        _audit(base.filter("vec_id >= 5"), "delete", 1))
    d = ann_index_delta(log, cents)
    assert d.columns == ["vec_id", "cell", "embedding",
                         "audit_event", "audit_pk"]
    rows = {r["vec_id"]: r for r in d.collect()}
    assert all(rows[i]["cell"] is not None for i in range(5))
    assert all(rows[i]["cell"] is None for i in range(5, 10))


def test_streaming_queries_against_maintained_index(spark, tmp_path):
    """Serving composition: a STREAM of query batches answered against
    the CDC-maintained index via foreachBatch + ivf_knn_join (the batch
    df inside the hook is static, so the broadcast join applies).
    Results must equal the batch k-NN join over the same queries."""
    from cdc_audit_spark.operators.similarity import ivf_knn_join

    base = _corpus(spark, 0, 120)
    cents = sample_centroids(base, 4)
    idx = ManifestTable(spark, str(tmp_path / "idx"))
    bootstrap_ann_index(idx, base, cents, range_buckets=4)
    assignments = idx.read().localCheckpoint(eager=True)

    queries = _corpus(spark, 200, 205).select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    src = str(tmp_path / "qsrc")
    queries.write.mode("append").parquet(src)

    out_dir = str(tmp_path / "answers")

    def answer(batch_df, epoch_id):
        if batch_df.isEmpty():
            return
        (ivf_knn_join(batch_df, assignments, cents, k=3,
                      nprobe=len(cents))
         .write.mode("append").parquet(out_dir))

    q = (spark.readStream.schema(queries.schema).parquet(src)
         .writeStream.foreachBatch(answer)
         .option("checkpointLocation", str(tmp_path / "ck"))
         .trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["q_id"], r["vec_id"], r["cos_sim"])
           for r in spark.read.parquet(out_dir).collect()}
    want = {(r["q_id"], r["vec_id"], r["cos_sim"])
            for r in ivf_knn_join(queries, assignments, cents, k=3,
                                  nprobe=len(cents)).collect()}
    assert got == want and len(got) == 15


# ------------------------------------------------------------------
# Cell-clustered SERVING projection (VERDICT r07 item 2): probe-side
# data skipping for the maintained index
# ------------------------------------------------------------------

from cdc_audit_spark.streaming.stream_ann import (  # noqa: E402
    TOMBSTONE_CELL,
    ann_serving_topk,
    cdc_ann_serving_sync,
    compact_ann_serving,
    serving_live_state,
    serving_probe_dirs,
)


def _clustered(spark, lo, hi, k=8, dim=8, shift=0):
    """vec_id's cluster axis is (vec_id + shift) % k, weight 10, with a
    deterministic 0..0.4 jitter on every axis — nearest AXIS centroid is
    exactly the cluster, and shift moves a vector across cells."""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.when(((F.col("id") + shift) % k) == i, 10.0).otherwise(0.0)
             + ((F.col("id") * (i + 2)) % 5).cast("double") * 0.1
             ).cast("float")
            for i in range(dim)
        ]).alias("embedding"))


def _axes(k=8, dim=8):
    return [[1.0 if j == i else 0.0 for j in range(dim)] for i in range(k)]


def test_serving_probe_reads_fraction_of_segments(spark, tmp_path):
    """THE skipping proof: after compaction into 8 cell-range segments,
    a 2-of-8-cell probe's dir list is ~2/8 of the layout (plus the
    empty tombstone tail) — not the whole index — and the probed top-k
    matches brute force over the probed cells."""
    from cdc_audit_spark.operators.similarity import cosine_topk

    cents = _axes()
    base = _clustered(spark, 0, 400)
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    cdc_ann_serving_sync(srv, _audit(base, "insert", 1), cents,
                         cell_buckets=8)
    compact_ann_serving(srv, cell_buckets=8)

    all_dirs = srv.manifest(srv.current_version())["dirs"]
    # ~one segment per cell cluster (an exact-quantile boundary may fold
    # two adjacent cells into one edge segment)
    assert len(all_dirs) >= 7
    probe_dirs = serving_probe_dirs(srv, [2, 5])
    assert len(probe_dirs) == 2        # 2/8 read, tombstones compacted away

    qv = [0.0] * 8
    qv[2] = 10.0
    qv[3] = 1.0
    got = ann_serving_topk(srv, cents, qv, k=5, nprobe=2)
    probed_cells = {r["cell"] for r in
                    serving_live_state(srv, [2, 5]).collect()}
    assert probed_cells <= {2, 5}
    want = cosine_topk(base.filter("vec_id % 8 in (2, 5)"), qv, 5)
    assert [(r["vec_id"], r["cos_sim"]) for r in got.collect()] == \
        [(r["vec_id"], r["cos_sim"]) for r in want.collect()]


def test_serving_sync_lsm_reconcile_and_exactness(spark, tmp_path):
    """Incremental serving maintenance: inserts, cell-MOVING updates and
    deletes land as segments + tombstones; nprobe=all equals brute force
    over the final corpus at every point; replay is a watermark no-op;
    a partial probe of the NEW cell sees the moved vector, and a probe
    of the OLD cell is tombstone-suppressed (no stale row served)."""
    from cdc_audit_spark.operators.similarity import cosine_topk

    cents = _axes()
    base = _clustered(spark, 0, 160)
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    r = cdc_ann_serving_sync(srv, _audit(base, "insert", 1), cents)
    assert r.rows_synced == 160

    # moves: ids with id%8==2 hop to cluster 3; deletes: id%8==7
    moved = _clustered(spark, 0, 160, shift=1).filter("vec_id % 8 = 2")
    log2 = _audit(moved, "update", 1001).unionByName(
        _audit(base.filter("vec_id % 8 = 7"), "delete", 1001))
    full_log = _audit(base, "insert", 1).unionByName(log2)
    r2 = cdc_ann_serving_sync(srv, full_log, cents)
    assert r2.rows_synced == 60        # 20 updates x2 rows + 20 tombs

    # replay: no commit
    v = srv.current_version()
    assert cdc_ann_serving_sync(srv, full_log, cents).rows_synced == 0
    assert srv.current_version() == v

    final = base.filter("vec_id % 8 not in (2, 7)").unionByName(moved)
    qv = [0.3] * 8
    qv[3] = 9.0
    want = cosine_topk(final, qv, 10)
    got = ann_serving_topk(srv, cents, qv, k=10, nprobe=8)
    assert [(r["vec_id"], r["cos_sim"]) for r in got.collect()] == \
        [(r["vec_id"], r["cos_sim"]) for r in want.collect()]

    # moved vectors serve from their NEW cell...
    new_cell = {r["vec_id"] for r in
                serving_live_state(srv, [3]).collect()}
    assert {i for i in range(160) if i % 8 == 2} <= new_cell
    # ...and the OLD cell serves neither the stale image nor deletions
    old_cell = serving_live_state(srv, [2]).collect()
    assert old_cell == []              # cluster 2 emptied by the move
    probe7 = {r["vec_id"] for r in serving_live_state(srv, [7]).collect()}
    assert probe7 == set()             # deletes suppressed

    # compaction folds tombstones away and preserves the exact answer
    compact_ann_serving(srv, cell_buckets=8)
    assert srv.read().filter(f"cell = {TOMBSTONE_CELL}").count() == 0
    assert srv.read().count() == final.count()
    got2 = ann_serving_topk(srv, cents, qv, k=10, nprobe=8)
    assert [(r["vec_id"], r["cos_sim"]) for r in got2.collect()] == \
        [(r["vec_id"], r["cos_sim"]) for r in want.collect()]
    # watermark inherited through the compaction: still a replay no-op
    assert cdc_ann_serving_sync(srv, full_log, cents).rows_synced == 0

    # maintenance continues after compaction
    ins3 = _audit(_clustered(spark, 160, 170), "insert", 5001)
    assert cdc_ann_serving_sync(
        srv, full_log.unionByName(ins3), cents).rows_synced == 10
    assert serving_live_state(srv, None).count() == final.count() + 10


def test_serving_sync_conflict_and_empty_probe(spark, tmp_path):
    """An interleaved writer between a sync's read and its commit
    surfaces as CommitConflict (watermark exactness); probing a cell
    with no recorded segments returns an empty, well-typed frame."""
    cents = _axes()
    base = _clustered(spark, 0, 40)
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    cdc_ann_serving_sync(srv, _audit(base, "insert", 1), cents)

    orig = ManifestTable.append_range_dirs
    racer = ManifestTable(spark, srv.path)

    def racing(self, df, key, **kw):
        racer.append(
            serving_live_state(racer, None).limit(0),
            on_drift="fail")
        return orig(self, df, key, **kw)

    log2 = _audit(base, "insert", 1).unionByName(
        _audit(base.filter("vec_id = 1"), "delete", 1001))
    ManifestTable.append_range_dirs = racing
    try:
        with pytest.raises(CommitConflict):
            cdc_ann_serving_sync(srv, log2, cents)
    finally:
        ManifestTable.append_range_dirs = orig
    # re-run converges
    assert cdc_ann_serving_sync(srv, log2, cents).rows_synced == 1

    empty = serving_live_state(srv, [TOMBSTONE_CELL - 100])
    assert empty.count() == 0
    assert "cell" in empty.columns


# ------------------------------------------------------------------
# CDC-maintained PQ codes (VERDICT r07 item 4) + recall monitor (item 6)
# ------------------------------------------------------------------


def test_maintained_pq_codes_incremental_equals_reencode(spark, tmp_path):
    """With codebooks, the maintained index carries PQ codes that stay
    EXACTLY equal to a from-scratch encode of the final corpus (the
    frozen-codebook contract); the indexed IVFADC query path is exact
    at nprobe=all with expand*k >= corpus, and retains most of the
    exact top-k at a realistic expand."""
    from cdc_audit_spark.operators.similarity import (
        cosine_topk,
        ivf_pq_topk_indexed,
        train_pq_codebooks,
        with_pq_codes,
    )

    base = _corpus(spark, 0, 120)
    cents = sample_centroids(base, 4)
    books = train_pq_codebooks(base, m=2, k=8, sample_n=64)

    idx = ManifestTable(spark, str(tmp_path / "idx"))
    bootstrap_ann_index(idx, base, cents, range_buckets=4,
                        codebooks=books)
    assert idx.read().columns == ["vec_id", "cell", "embedding", "codes"]

    upd = _audit(base.filter("vec_id % 5 = 0 and vec_id % 7 != 0")
                 .withColumn("embedding", F.reverse("embedding")),
                 "update", 1001)
    dele = _audit(base.filter("vec_id % 7 = 0"), "delete", 1001)
    ins = _audit(_corpus(spark, 120, 130), "insert", 1001)
    log = upd.unionByName(dele).unionByName(ins)
    cdc_ann_index_sync(idx, log, cents, codebooks=books)
    # replay no-op with codebooks too
    v = idx.current_version()
    assert cdc_ann_index_sync(idx, log, cents,
                              codebooks=books).rows_synced == 0
    assert idx.current_version() == v

    grown = _corpus(spark, 0, 130)
    final = grown.filter("vec_id >= 120 or vec_id % 7 != 0").withColumn(
        "embedding",
        F.when((F.col("vec_id") < 120) & (F.col("vec_id") % 5 == 0),
               F.reverse("embedding")).otherwise(F.col("embedding")))
    want = {(r["vec_id"], r["cell"], tuple(r["codes"]))
            for r in with_pq_codes(ivf_assign(final, cents),
                                   books).collect()}
    got = {(r["vec_id"], r["cell"], tuple(r["codes"]))
           for r in idx.read().collect()}
    assert got == want

    qv = [float(x) for x in base.filter("vec_id = 1").first()["embedding"]]
    cand = idx.read().filter("vec_id != 1")
    n = cand.count()
    exact = cosine_topk(final.filter("vec_id != 1"), qv, 10).collect()
    served = ivf_pq_topk_indexed(cand, cents, books, qv, k=10,
                                 nprobe=len(cents),
                                 expand=(n // 10) + 1).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in served] == \
        [(r["vec_id"], r["cos_sim"]) for r in exact]

    # realistic expand: the compressed scan's candidates keep most of
    # the true top-10 (deterministic — a fixed dataset pins this)
    approx = ivf_pq_topk_indexed(cand, cents, books, qv, k=10,
                                 nprobe=len(cents), expand=2).collect()
    exact_ids = {r["vec_id"] for r in exact}
    assert len({r["vec_id"] for r in approx} & exact_ids) >= 6


def _diag_clustered(spark, lo, hi, dim=8):
    """Drifted population: clusters sit on DIAGONALS (axes 2c, 2c+1
    both weight 7) that axis-centroids straddle — the hash jitter makes
    each member's nearest AXIS an independent coin flip between the two
    diagonal axes, so a cluster's members (and any query's true
    neighbors) split between two cells and nprobe=1 recall halves.
    (The jitter must be hash-based: a modular id pattern would make
    exact neighbors share the jitter class and hence the cell,
    hiding the drift from the monitor.)"""
    return spark.range(lo, hi).select(
        F.col("id").alias("vec_id"),
        F.array(*[
            (F.when(((F.col("id") % 4) * 2 == i)
                    | ((F.col("id") % 4) * 2 + 1 == i), 7.0).otherwise(0.0)
             + F.pmod(F.xxhash64(F.col("id"), F.lit(i)),
                      F.lit(100)).cast("double") * 0.004
             ).cast("float")
            for i in range(dim)
        ]).alias("embedding"))


def test_recall_monitor_detects_drift_and_rebuild_restores(spark, tmp_path):
    """ann_recall_estimate is the retrain trigger: healthy on the
    bootstrap distribution, degraded after the corpus drifts onto
    cluster directions the frozen centroids straddle, restored by the
    documented retrain + bootstrap_ann_index rebuild loop."""
    from cdc_audit_spark.operators.similarity import ann_recall_estimate

    cents = _axes()
    base = _clustered(spark, 0, 160)
    idx = ManifestTable(spark, str(tmp_path / "idx"))
    bootstrap_ann_index(idx, base, cents, range_buckets=4)
    r0 = ann_recall_estimate(idx.read(), cents, k=5, nprobe=1,
                             sample_n=12)
    assert r0 >= 0.9

    # drift: the whole corpus moves to the diagonal population (the
    # maintained index keeps serving through it — deletes + inserts)
    drifted = _diag_clustered(spark, 1000, 1160)
    log = _audit(base, "delete", 10001).unionByName(
        _audit(drifted, "insert", 10001))
    cdc_ann_index_sync(idx, log, cents)
    assert idx.read().count() == 160
    r1 = ann_recall_estimate(idx.read(), cents, k=5, nprobe=1,
                             sample_n=12)
    assert r1 <= 0.85                # the monitor sees the degradation

    # operator's documented response: retrain centroids on the CURRENT
    # corpus (read straight off the maintained index), rebuild
    new_cents = [[7.0 if j in (2 * c, 2 * c + 1) else 0.0
                  for j in range(8)] for c in range(4)]
    idx2 = ManifestTable(spark, str(tmp_path / "idx2"))
    bootstrap_ann_index(idx2, idx.read().select("vec_id", "embedding"),
                        new_cents, range_buckets=4)
    r2 = ann_recall_estimate(idx2.read(), new_cents, k=5, nprobe=1,
                             sample_n=12)
    assert r2 >= 0.9


def test_serving_knn_join_skips_and_matches(spark, tmp_path):
    """Batch k-NN over the serving projection: the batch's probe-cell
    union drives segment skipping (2 clusters probed → 2 segment dirs
    listed), and results equal ivf_knn_join over the full live state."""
    from cdc_audit_spark.operators.similarity import ivf_knn_join
    from cdc_audit_spark.streaming.stream_ann import ann_serving_knn_join

    cents = _axes()
    base = _clustered(spark, 0, 320)
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    cdc_ann_serving_sync(srv, _audit(base, "insert", 1), cents,
                         cell_buckets=8)
    compact_ann_serving(srv, cell_buckets=8)

    # queries sit squarely in clusters 1 and 4 → nprobe=1 union = {1, 4}
    queries = _clustered(spark, 0, 40).filter(
        "vec_id % 8 in (1, 4)").select(
        F.col("vec_id").alias("q_id"), F.col("embedding").alias("q_vec"))
    assert len(serving_probe_dirs(srv, [1, 4])) == 2

    got = ann_serving_knn_join(srv, queries, cents, k=5, nprobe=1)
    full = serving_live_state(srv, None)
    want = ivf_knn_join(queries, full, cents, k=5, nprobe=1)
    assert sorted((r["q_id"], r["vec_id"], round(r["cos_sim"], 9))
                  for r in got.collect()) == \
        sorted((r["q_id"], r["vec_id"], round(r["cos_sim"], 9))
               for r in want.collect())


def test_stream_serving_maintenance_and_compaction_policy(spark, tmp_path):
    """Always-on serving maintenance: audit batches drain into segment
    appends, the fan-in policy folds the tail mid-stream, the final
    state is exact, and an idle restart commits nothing (no compaction
    churn on replayed/empty batches)."""
    from cdc_audit_spark.streaming.stream_ann import (
        stream_ann_serving_sync,
    )

    cents = _axes()
    base = _clustered(spark, 0, 80)
    src = str(tmp_path / "src")
    # one FILE per audit batch: the watermark contract needs batches to
    # arrive in pk order, and maxFilesPerTrigger=1 feeds files as
    # batches in mtime order — a multi-file write could interleave
    _audit(base, "insert", 1).repartition(1).write.mode(
        "append").parquet(src)
    _audit(base.filter("vec_id % 8 = 3"), "delete", 1001).repartition(
        1).write.mode("append").parquet(src)

    schema = _audit(base, "insert", 1).schema
    q = stream_ann_serving_sync(
        spark, src, schema, str(tmp_path / "srv"), str(tmp_path / "ck"),
        cents, cell_buckets=2, compact_max_dirs=2,
        max_files_per_trigger=1)
    q.awaitTermination(120)

    srv = ManifestTable(spark, str(tmp_path / "srv"))
    live = serving_live_state(srv, None)
    assert {r["vec_id"] for r in live.collect()} == \
        {i for i in range(80) if i % 8 != 3}
    # the policy folded the tail at least once during the drain
    assert any(h["action"] == "overwrite" for h in srv.history())
    assert len(srv.manifest(srv.current_version())["dirs"]) <= 4

    # idle restart: same files, no new commits (sync no-op suppresses
    # the compaction peek too)
    v = srv.current_version()
    q2 = stream_ann_serving_sync(
        spark, src, schema, str(tmp_path / "srv"), str(tmp_path / "ck"),
        cents, cell_buckets=2, compact_max_dirs=2)
    q2.awaitTermination(120)
    assert srv.current_version() == v


def test_serving_projection_with_pq_codes(spark, tmp_path):
    """The serving projection synced with codebooks carries maintained
    PQ codes through appends, cell-moving updates, deletes AND
    compaction; ann_serving_pq_topk at the exact setting equals brute
    force, and its codes equal a from-scratch encode of the live
    state."""
    from cdc_audit_spark.operators.similarity import (
        cosine_topk,
        train_pq_codebooks,
        with_pq_codes,
    )
    from cdc_audit_spark.streaming.stream_ann import ann_serving_pq_topk

    cents = _axes()
    base = _clustered(spark, 0, 160)
    books = train_pq_codebooks(base, m=2, k=8, sample_n=64)
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    cdc_ann_serving_sync(srv, _audit(base, "insert", 1), cents,
                         codebooks=books)
    moved = _clustered(spark, 0, 160, shift=1).filter("vec_id % 8 = 2")
    log = _audit(base, "insert", 1).unionByName(
        _audit(moved, "update", 1001)).unionByName(
        _audit(base.filter("vec_id % 8 = 7"), "delete", 1001))
    cdc_ann_serving_sync(srv, log, cents, codebooks=books)
    compact_ann_serving(srv, cell_buckets=8)

    final = base.filter("vec_id % 8 not in (2, 7)").unionByName(moved)
    live = serving_live_state(srv, None)
    want = {(r["vec_id"], tuple(r["codes"]))
            for r in with_pq_codes(final, books).select(
                "vec_id", "codes").collect()}
    got = {(r["vec_id"], tuple(r["codes"])) for r in live.collect()}
    assert got == want

    qv = [0.3] * 8
    qv[5] = 9.0
    n = final.count()
    exact = cosine_topk(final, qv, 10).collect()
    served = ann_serving_pq_topk(srv, cents, books, qv, k=10,
                                 nprobe=len(cents),
                                 expand=(n // 10) + 1).collect()
    assert [(r["vec_id"], r["cos_sim"]) for r in served] == \
        [(r["vec_id"], r["cos_sim"]) for r in exact]


def test_serving_vacuum_reclaims_superseded_segments(spark, tmp_path):
    """Vacuum after a serving compaction: superseded segment dirs are
    reclaimed (aged, keep_versions=1), probes keep working off the
    compacted layout, and maintenance continues — the full LSM
    lifecycle (append → compact → vacuum → append) on one table."""
    import os

    cents = _axes()
    base = _clustered(spark, 0, 160)
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    cdc_ann_serving_sync(srv, _audit(base, "insert", 1), cents,
                         cell_buckets=4)
    pre_dirs = set(srv.manifest(srv.current_version())["dirs"])
    compact_ann_serving(srv, cell_buckets=8)

    swept = srv.vacuum(keep_versions=1, retain_seconds=0)
    assert swept["data_dirs"] >= 1
    for d in pre_dirs:   # pre-compaction segments physically gone
        assert not os.path.isdir(os.path.join(srv.path, d))

    probe = serving_live_state(srv, [2])
    assert {r["vec_id"] % 8 for r in probe.collect()} == {2}
    # maintenance continues on the vacuumed table
    log2 = _audit(base, "insert", 1).unionByName(
        _audit(base.filter("vec_id % 8 = 5"), "delete", 1001))
    assert cdc_ann_serving_sync(srv, log2, cents).rows_synced == 20
    assert serving_live_state(srv, None).count() == 140


def test_serving_random_walk_matches_model(spark, tmp_path):
    """Model-based: a seeded walk of random insert/update/delete batches
    (updates freely MOVE vectors across cells) with occasional
    compactions and vacuums must keep the serving projection's full
    live state equal to a dict model at every step, and every
    single-cell probe equal to the model members currently assigned to
    that cell (tombstones suppressing stale copies wherever they
    live)."""
    import math
    import os
    import random

    rng = random.Random(11)
    dim = 4
    cents = [[8.0, 0.0, 0.0, 0.0], [0.0, 8.0, 0.0, 0.0],
             [0.0, 0.0, 8.0, 0.0], [0.0, 0.0, 0.0, 8.0]]

    def py_cell(vec):
        # the Python twin of similarity._scored_cells' contract: highest
        # cosine, lowest index on ties — integer-valued vectors make the
        # double arithmetic bit-identical across engines
        best, best_sim = 0, None
        vn = math.sqrt(sum(x * x for x in vec))
        for i, c in enumerate(cents):
            cn = math.sqrt(sum(x * x for x in c))
            sim = sum(a * b for a, b in zip(vec, c)) / (vn * cn)
            if best_sim is None or sim > best_sim:
                best, best_sim = i, sim
        return best

    def rand_vec():
        while True:
            v = [float(rng.randint(-8, 8)) for _ in range(dim)]
            if any(v):
                return v

    model: dict[int, tuple] = {}
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    schema = ("vec_id long, embedding array<float>, "
              "audit_event string, audit_pk long")
    log_rows: list = []
    pk = 0
    next_id = 0

    for step in range(8):
        for _ in range(rng.randint(2, 8)):
            op = rng.choice(["insert", "insert", "update", "delete"])
            if op == "insert" or not model:
                k, v = next_id, rand_vec()
                next_id += 1
                model[k] = tuple(v)
            elif op == "update":
                k, v = rng.choice(sorted(model)), rand_vec()
                model[k] = tuple(v)
            else:
                k = rng.choice(sorted(model))
                v = [0.0] * dim          # image unused on delete
                model.pop(k)
            pk += 1
            log_rows.append((k, v, op if op in ("update", "delete")
                             else "insert", pk))
        log = spark.createDataFrame(log_rows, schema)
        cdc_ann_serving_sync(srv, log, cents, cell_buckets=3)
        if rng.random() < 0.4:
            compact_ann_serving(srv, cell_buckets=3)
        if rng.random() < 0.3:
            srv.vacuum(keep_versions=1, retain_seconds=0)

        live = {(r["vec_id"], tuple(r["embedding"]))
                for r in serving_live_state(srv, None).collect()}
        assert live == set(model.items()), f"step {step}"

        probe_cell = rng.randrange(len(cents))
        probed = {(r["vec_id"], tuple(r["embedding"]))
                  for r in serving_live_state(srv, [probe_cell]).collect()}
        want = {(k, v) for k, v in model.items()
                if py_cell(v) == probe_cell}
        assert probed == want, f"step {step} cell {probe_cell}"


def test_rebuild_policy_recovers_recall_without_intervention(spark, tmp_path):
    """maybe_rebuild_ann wired into the serving drain (VERDICT r08 #4):
    a distribution shift degrades recall at the serving setting, the
    policy fires on its commit cadence — healthy checks leave
    metadata-only ann_recall markers, the dip triggers an in-place
    retrain+rebuild — and serving recovers with NO manual retrain. The
    rebuilt centroids ride in the manifest: current_ann_centroids
    discovers them and a probe against them is healthy again."""
    from cdc_audit_spark.operators.similarity import ann_recall_estimate
    from cdc_audit_spark.streaming.stream_ann import (
        current_ann_centroids,
        maybe_rebuild_ann,
        stream_ann_serving_sync,
    )

    cents = _axes()
    base = _clustered(spark, 0, 160)
    drifted = _diag_clustered(spark, 1000, 1160)
    src = str(tmp_path / "src")
    _audit(base, "insert", 1).repartition(1).write.mode(
        "append").parquet(src)
    # the shift arrives as CDC: the axis population leaves, the diagonal
    # population lands (one file per batch — watermark order)
    _audit(base, "delete", 10001).repartition(1).write.mode(
        "append").parquet(src)
    _audit(drifted, "insert", 20001).repartition(1).write.mode(
        "append").parquet(src)

    schema = _audit(base, "insert", 1).schema
    srv_p = str(tmp_path / "srv")
    q = stream_ann_serving_sync(
        spark, src, schema, srv_p, str(tmp_path / "ck"), cents,
        cell_buckets=4, compact_max_dirs=None, max_files_per_trigger=1,
        recall_threshold=0.85, recall_every_n_commits=1,
        recall_k=5, recall_nprobe=1)
    q.awaitTermination(240)

    srv = ManifestTable(spark, srv_p)
    hist = [srv.manifest(v) for v in srv.versions()]
    # healthy checks left metadata-only markers; the dip left a rebuild
    assert any("ann_recall" in m and not m.get("ann_rebuild")
               for m in hist)
    assert any(m.get("ann_rebuild") for m in hist)
    new_cents = current_ann_centroids(srv, cents)
    assert new_cents != cents
    # serving recovered: recall at the same setting, measured over the
    # live state under the DISCOVERED centroids, is healthy again
    live = serving_live_state(srv, None)
    assert {r["vec_id"] for r in live.select("vec_id").collect()} == \
        set(range(1000, 1160))
    r = ann_recall_estimate(live, new_cents, k=5, nprobe=1, sample_n=12)
    dipped = min(m["ann_recall"] for m in hist if m.get("ann_rebuild"))
    assert dipped < 0.85      # the trigger was a genuine SLO breach
    assert r >= 0.85 and r > dipped   # recovered above the SLO

    # cadence gate: fresh after the rebuild's own marker, a peek is a
    # no-op (no measurement, no commit)
    v0 = srv.current_version()
    assert maybe_rebuild_ann(srv, new_cents, threshold=0.85,
                             every_n_commits=8, k=5, nprobe=1,
                             sample_n=12, cell_buckets=4) is None
    assert srv.current_version() == v0
    # forced check at healthy recall: marker-only commit, no second
    # rebuild (every_n_commits=0 disables the cadence gate)
    out = maybe_rebuild_ann(srv, new_cents, threshold=0.85,
                            every_n_commits=0, k=5, nprobe=1,
                            sample_n=12, cell_buckets=4)
    assert out is None
    m = srv.manifest(srv.current_version())
    assert m["action"] == "analyze" and "ann_recall" in m
    assert srv.current_version() == v0 + 1


def test_ann_centroids_survive_generic_maintenance(spark, tmp_path):
    """The rebuilt centroids are inherited manifest state: generic
    out-of-band commits on the serving table (compact_small,
    add_constraint) after a rebuild can no longer bury them — the newest
    manifest physically carries ann_centroids and
    current_ann_centroids resolves in one metadata read."""
    from cdc_audit_spark.streaming.stream_ann import (
        bootstrap_ann_index,
        current_ann_centroids,
    )

    cents = _axes()
    srv = ManifestTable(spark, str(tmp_path / "srv"))
    bootstrap_ann_index(srv, _clustered(spark, 0, 40), cents)
    # a rebuild-style commit records new centroids
    new_cents = [[float(x) * 2 for x in c] for c in cents]
    srv.write_range_layout(
        srv.read(), "cell", n_buckets=4,
        extra={"ann_rebuild": True, "ann_centroids": new_cents},
        base_version=srv.current_version())
    assert current_ann_centroids(srv, cents) == new_cents
    # generic maintenance commits between the rebuild and the next read
    srv.add_constraint("vec_nonnull", "vec_id IS NOT NULL")
    srv.compact_small(min_group=1)
    newest = srv.manifest(srv.current_version())
    assert "ann_centroids" in newest  # physically inherited, not buried
    assert current_ann_centroids(srv, cents) == new_cents
