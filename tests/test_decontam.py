"""Decontamination operator: planted-copy detection, n-gram window math,
and short-doc edge cases."""

from __future__ import annotations

from pyspark.sql import functions as F

from cdc_audit_spark.operators.decontam import benchmark_overlap, ngram_exposure


def _docs(spark, rows):
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_ngram_window_count(spark):
    """m tokens yield m-n+1 sliding windows (distinct text → no collapsing)."""
    words = " ".join(f"w{i}" for i in range(20))
    g = ngram_exposure(_docs(spark, [(1, words)]), "text", "doc_id", n=8)
    assert g.count() == 20 - 8 + 1
    first = g.orderBy("gram").first()["gram"]
    assert len(first.split(" ")) == 8


def test_short_doc_yields_no_grams(spark):
    g = ngram_exposure(_docs(spark, [(1, "only three words")]), "text", "doc_id", n=8)
    assert g.count() == 0


def test_planted_copy_detected_others_clean(spark):
    bench = _docs(spark, [(100, "the quick brown fox jumps over the lazy dog tonight")])
    corpus = _docs(
        spark,
        [
            # verbatim copy
            (1, "the quick brown fox jumps over the lazy dog tonight"),
            # contains the benchmark as a substring → contaminated
            (2, "intro words then the quick brown fox jumps over the lazy dog tonight and more"),
            # same vocabulary, different order → clean at n=8
            (3, "dog lazy the over jumps fox brown quick the tonight"),
            (4, "a completely unrelated document about spark shuffles and parquet footers"),
        ],
    )
    hits = benchmark_overlap(corpus, bench, "text", "doc_id", n=8)
    flagged = sorted(r["id"] for r in hits.select("id").distinct().collect())
    assert flagged == [1, 2]


def test_tokenization_is_case_and_punct_insensitive(spark):
    bench = _docs(spark, [(100, "Alpha beta GAMMA delta epsilon zeta eta theta")])
    corpus = _docs(spark, [(1, "alpha, beta; gamma! delta epsilon ZETA eta... theta")])
    hits = benchmark_overlap(corpus, bench, "text", "doc_id", n=8)
    assert hits.select("id").distinct().count() == 1


def test_fixture_overlap_matches_unhashed_join(spark, sf_dir):
    """The xxhash64 join path must agree with a plain string-equality join
    (no collisions at fixture scale — the operator's correctness claim)."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    corpus = docs.filter(F.col("source") != "src0")
    bench = docs.filter(F.col("source") == "src0")

    hashed = benchmark_overlap(corpus, bench, "text", "doc_id", n=8)
    cg = ngram_exposure(corpus, "text", "doc_id", n=8)
    bg = ngram_exposure(bench, "text", "doc_id", n=8).select("gram").distinct()
    plain = cg.join(bg, "gram")

    assert sorted(map(tuple, hashed.select("id", "gram").collect())) == sorted(
        map(tuple, plain.select("id", "gram").collect())
    )


def test_streaming_decontamination_matches_batch(spark, sf_dir, tmp_path):
    """The operator is stateless map + broadcast stream-static join, so the
    SAME code decontaminates a stream of incoming documents: readStream →
    benchmark_overlap(static benchmark) → append sink, no watermark or state
    needed. Result must equal the batch run over the same files."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    src = str(tmp_path / "docs")
    docs.filter(F.col("source") != "src0").write.parquet(src)
    bench = docs.filter(F.col("source") == "src0")

    stream = spark.readStream.schema(docs.schema).parquet(src)
    hits = benchmark_overlap(stream, bench, "text", "doc_id", n=8, keep=("source",))
    q = (
        hits.writeStream.format("memory").queryName("decontam_out")
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(120)

    batch = benchmark_overlap(
        docs.filter(F.col("source") != "src0"), bench, "text", "doc_id", n=8,
        keep=("source",),
    )
    got = sorted(map(tuple, spark.sql(
        "select id, source, gram from decontam_out").collect()))
    want = sorted(map(tuple, batch.select("id", "source", "gram").collect()))
    assert got == want
