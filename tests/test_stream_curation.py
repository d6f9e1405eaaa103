"""The composed curation drain (streaming.stream_curation): near-dup
rejection against the maintained LSH index + the self-training LM quality
gate, three O(delta) commits per batch, exactly-once under restart and
half-committed replay."""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401

from cdc_audit_spark.sinks.manifest import ManifestTable
from cdc_audit_spark.streaming.stream_curation import (
    apply_curation_epoch,
    stream_curation_sync,
)

SCH = "doc_id long, text string"

# mutually DISTINCT seeds (shared phrases but different shingle sets —
# the LSH must not cross-reject the bootstrap corpus)
SEEDS = [
    "the quick brown fox jumps over the lazy dog",
    "a wise old owl lived in a big oak tree",
    "the rain in spain stays mainly on the plain",
    "every good boy deserves fruit at the school fair",
    "the river flows gently past the green bank today",
    "many hands make light work on the busy farm",
    "a rolling stone gathers no moss in the deep forest",
    "the early bird catches the worm near the tall fence",
]
# fluent probe: seed BIGRAMS recombined, but no long shared runs
# (a long run would make it a genuine near-dup the index must reject)
FLUENT = "the quick brown fox catches the worm near the green bank today"
JUNK = "zxqv wrbl kpth znorg vlmx qwpt brzn gflm xorv plz qnt wrv"


def _seed(i):
    return (i, SEEDS[i % len(SEEDS)])


def test_curation_stream_filters_dups_and_junk(spark, tmp_path):
    """Batch 1 seeds index+model (pass-through); batch 2's exact near-dup
    of a seed doc is rejected by the index, its junk doc by the gate, and
    its fresh fluent doc lands; a restarted drain appends nothing."""
    batches = [
        [_seed(i) for i in range(8)],
        [(100, _seed(2)[1]),            # exact dup of seed 2 -> index reject
         (101, JUNK),                   # all-OOV -> gate reject
         (102, FLUENT)],                # fresh + fluent -> accepted
    ]
    src = str(tmp_path / "src")
    for rows in batches:
        spark.createDataFrame(rows, SCH).coalesce(1).write.mode(
            "append").parquet(src)

    paths = {k: str(tmp_path / k) for k in ("idx", "acc", "counts")}
    ck = str(tmp_path / "ck")
    schema = spark.read.parquet(src).schema
    q = stream_curation_sync(
        spark, src, schema, paths["idx"], paths["acc"], paths["counts"],
        ck, "text", "doc_id", max_avg_neg_log10=2.3,
        max_files_per_trigger=1)
    q.awaitTermination(240)

    acc = ManifestTable(spark, paths["acc"])
    got = {r["doc_id"] for r in acc.read().select("doc_id").collect()}
    assert set(range(8)) <= got      # bootstrap passed through
    assert 102 in got                # fresh fluent doc accepted
    assert 100 not in got            # near-dup rejected by the index
    assert 101 not in got            # junk rejected by the gate

    # the model learned from accepted docs only: junk grams absent
    counts_t = ManifestTable(spark, paths["counts"])
    from cdc_audit_spark.operators.ngram_lm import fold_ngram_count_deltas

    grams = {r["gram"] for r in fold_ngram_count_deltas(
        counts_t.read()).filter("order = 1").collect()}
    assert "zxqv" not in grams and "jumps" in grams

    # restart: no new input -> no new commits, no duplicates
    n0 = acc.read().count()
    vs = (ManifestTable(spark, paths["idx"]).current_version(),
          acc.current_version(), counts_t.current_version())
    q2 = stream_curation_sync(
        spark, src, schema, paths["idx"], paths["acc"], paths["counts"],
        ck, "text", "doc_id", max_avg_neg_log10=2.3)
    q2.awaitTermination(120)
    assert acc.read().count() == n0
    assert (ManifestTable(spark, paths["idx"]).current_version(),
            acc.current_version(), counts_t.current_version()) == vs


def test_curation_epoch_half_committed_replay(spark, tmp_path):
    """Crash between the three commits: any prefix landed. The replay's
    pinned pre-epoch reads recompute the identical accept set; landed
    tables skip, lagging tables catch up, full replay is a no-op."""
    idx_t = ManifestTable(spark, str(tmp_path / "idx"))
    acc_t = ManifestTable(spark, str(tmp_path / "acc"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts"))

    b0 = spark.createDataFrame([_seed(i) for i in range(6)], SCH)
    apply_curation_epoch(idx_t, acc_t, counts_t, b0, 0, "r1",
                         "text", "doc_id", 2.3)

    b1 = spark.createDataFrame(
        [(50, _seed(1)[1]), (51, FLUENT)], SCH)  # 50 = exact dup of seed 1
    # simulate the crash: only the INDEX half of epoch 1 lands (the
    # first commit in the hook's order)
    from cdc_audit_spark.operators.dedup import incremental_lsh_dedup

    _ids, entries = incremental_lsh_dedup(b1, idx_t.read(), "text", "doc_id")
    idx_t.append(entries, extra={"epoch": 1, "run_id": "r1"})

    apply_curation_epoch(idx_t, acc_t, counts_t, b1, 1, "r1",
                         "text", "doc_id", 2.3)
    got = {r["doc_id"] for r in acc_t.read().select("doc_id").collect()}
    assert 51 in got and 50 not in got
    snap = (idx_t.current_version(), acc_t.current_version(),
            counts_t.current_version())
    # full replay: durable no-op on all three tables
    apply_curation_epoch(idx_t, acc_t, counts_t, b1, 1, "r1",
                         "text", "doc_id", 2.3)
    assert (idx_t.current_version(), acc_t.current_version(),
            counts_t.current_version()) == snap


def test_curation_decontam_stage_blocks_benchmark_overlap(spark, tmp_path):
    """With a benchmark set wired in, a doc sharing an 8-gram with it is
    rejected between the dedup filter and the gate — it never reaches the
    curated table or the model — while its LSH entries still land in the
    index (same adjudicated-content rule as gate-rejected docs), so a
    later copy of it is index-rejected, not re-litigated."""
    idx_t = ManifestTable(spark, str(tmp_path / "idx"))
    acc_t = ManifestTable(spark, str(tmp_path / "acc"))
    counts_t = ManifestTable(spark, str(tmp_path / "counts"))
    bench = spark.createDataFrame(
        [(0, "the secret benchmark answer sequence nobody should train "
             "on ever")], SCH)

    contaminated = ("a web page quoting the secret benchmark answer "
                    "sequence nobody should train on ever plus more text")
    b0 = spark.createDataFrame([_seed(i) for i in range(6)], SCH)
    apply_curation_epoch(idx_t, acc_t, counts_t, b0, 0, "r1",
                         "text", "doc_id", 2.3, benchmark_df=bench)

    b1 = spark.createDataFrame(
        [(60, contaminated), (61, FLUENT)], SCH)
    apply_curation_epoch(idx_t, acc_t, counts_t, b1, 1, "r1",
                         "text", "doc_id", 2.3, benchmark_df=bench)

    got = {r["doc_id"] for r in acc_t.read().select("doc_id").collect()}
    assert 61 in got and 60 not in got
    # model never saw the contaminated text
    from cdc_audit_spark.operators.ngram_lm import fold_ngram_count_deltas

    grams = {r["gram"] for r in fold_ngram_count_deltas(
        counts_t.read()).filter("order = 1").collect()}
    assert "benchmark" not in grams

    # ...but the index adjudicated it: an exact copy is a dedup reject
    b2 = spark.createDataFrame([(70, contaminated)], SCH)
    from cdc_audit_spark.operators.dedup import incremental_lsh_dedup

    ids, _ = incremental_lsh_dedup(b2, idx_t.read(), "text", "doc_id")
    assert ids.count() == 0
