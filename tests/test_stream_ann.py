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
