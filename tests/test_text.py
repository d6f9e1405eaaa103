from cdc_audit_spark.operators.text import (
    fingerprint,
    language_id,
    quality_stats,
    token_stats,
)


def _docs(spark):
    rows = [
        (1, "the cat and the dog and the bird", "en"),
        (2, "der Hund und die Katze und das Haus ist", "de"),
        (3, "le chat et le chien et la maison est", "fr"),
        (4, "xyzzy plugh qwerty", "und"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_stats(spark):
    out = {r["doc_id"]: r for r in token_stats(_docs(spark), "text", "doc_id").collect()}
    assert out[1]["n_tokens"] == 8
    assert out[1]["n_distinct"] == 5  # the, cat, and, dog, bird
    assert out[1]["n_stopwords"] == 5  # 3×the + 2×and
    assert out[1]["n_chars"] == len("the cat and the dog and the bird")


def test_quality_stats(spark):
    out = {r["doc_id"]: r for r in
           quality_stats(_docs(spark), "text", "doc_id", min_tokens=5).collect()}
    assert float(out[1]["stopword_ratio"]) == 0.625
    assert not out[4]["passes"]  # too short
    assert not out[1]["passes"]  # stopword ratio 0.625 > 0.5
    assert out[2]["passes"] or float(out[2]["stopword_ratio"]) < 0.5


def test_fingerprint_normalizes_whitespace_and_case(spark):
    df = spark.createDataFrame(
        [(1, "Hello  World"), (2, "hello world"), (3, "other text")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["fingerprint"] for r in fingerprint(df, "text", "doc_id").collect()}
    assert out[1] == out[2]
    assert out[1] != out[3]


def test_language_id_heuristic(spark):
    out = {r["doc_id"]: r["lang_pred"] for r in language_id(_docs(spark), "text", "doc_id").collect()}
    assert out[1] == "en"
    assert out[2] == "de"
    assert out[3] == "fr"
    assert out[4] == "und"


def test_language_id_on_fixture_mostly_en(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = language_id(docs, "text", "doc_id")
    en = out.filter("lang_pred = 'en'").count()
    # fixture text is english-ish word salad containing 'the'/'a'
    assert en > docs.count() * 0.5


def test_compression_ratio_orders_repetition_below_prose(spark):
    from cdc_audit_spark.operators.text import compression_ratio

    import random

    rng = random.Random(7)
    prose_words = ["".join(rng.choice("abcdefghijklmnop") for _ in range(6))
                   for _ in range(200)]
    rows = [
        (1, "spam " * 400),                        # pure repetition
        (2, " ".join(prose_words)),                # high-entropy prose-ish
        (3, None),                                 # null text
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["id"]: r for r in compression_ratio(df, "text", "doc_id").collect()}
    assert out[1]["zlib_ratio"] < 0.1                     # repetition crushes
    assert out[2]["zlib_ratio"] > 3 * out[1]["zlib_ratio"]  # prose ≫ spam
    assert out[3]["n_bytes"] == 0                         # null-safe
    # deterministic across runs
    again = {r["id"]: r["zlib_ratio"]
             for r in compression_ratio(df, "text", "doc_id").collect()}
    assert all(abs(out[i]["zlib_ratio"] - again[i]) < 1e-12 for i in out)


# --------------------------------------------------------- winnowing


def test_winnow_detection_guarantee_and_noise_floor(spark):
    """Schleimer's two winnowing guarantees, on planted data: a shared
    token run of >= k + w - 1 tokens MUST yield a shared fingerprint;
    disjoint vocabularies share nothing."""
    from cdc_audit_spark.operators.text import (
        winnow_fingerprints,
        winnow_overlap_pairs,
    )

    k, w = 5, 4
    run = " ".join(f"tok{i}" for i in range(k + w - 1))  # 8 tokens
    rows = [
        (1, f"alpha beta {run} gamma delta"),
        (2, f"zeta eta {run} theta iota"),       # shares the run with 1
        (3, "completely different words here entirely novel text"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    pairs = winnow_overlap_pairs(docs, "text", "doc_id", k=k, w=w,
                                 min_shared=1).collect()
    got = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in got
    assert not any(3 in p for p in got)

    # short docs: < k tokens -> no fingerprints; >= k but < k+w-1
    # hashes -> exactly the global-min boundary rule
    tiny = spark.createDataFrame(
        [(10, "a b c"), (11, "one two three four five six")],
        "doc_id long, text string")
    fps = winnow_fingerprints(tiny, "text", "doc_id", k=k, w=w)
    per = {r["id"]: r["fp"] for r in fps.collect()}
    assert 10 not in per          # 3 tokens < k
    assert 11 in per              # 6 tokens -> 2 hashes -> 1 global min


def test_winnow_fingerprints_deterministic(spark, sf_dir):
    from cdc_audit_spark.operators.text import winnow_fingerprints

    sub = (spark.read.parquet(f"{sf_dir}/documents.parquet")
           .filter("doc_id < 32"))
    a = winnow_fingerprints(sub, "text", "doc_id")
    b = winnow_fingerprints(sub, "text", "doc_id")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_gopher_quality_rules_planted_docs(spark):
    from cdc_audit_spark.operators.text import gopher_quality_flags

    good = ("the quick brown fox jumps over that lazy dog and then runs "
            "to have some water with the other animals near of a river")
    rows = [
        (1, good),                                   # passes every rule
        (2, "too short to have words"),              # word-count band
        (3, " ".join(["spam"] * 40)),                # dup frac 39/40, no stopwords
        (4, " ".join(["12345 67890"] * 10) + " the of and extra"),  # alpha frac low
        (5, " ".join(f"w{i}" for i in range(40))),   # mean len 2.x + 0 stopword hits
        (6, good + " " + " ".join(
            "antidisestablishmentarianism" for _ in range(200))),  # mean len > 10
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in
           gopher_quality_flags(df, "text", "doc_id").collect()}

    assert out[1]["gopher_pass"]
    assert out[1]["stopword_hits"] >= 5
    assert out[1]["dup_word_frac"] < 0.2

    assert not out[2]["gopher_pass"] and out[2]["n_words"] < 15
    assert not out[3]["gopher_pass"]
    assert out[3]["dup_word_frac"] > 0.9
    assert not out[4]["gopher_pass"]
    assert out[4]["alpha_word_frac"] < 0.8
    assert not out[5]["gopher_pass"]
    assert out[5]["stopword_hits"] == 0
    assert not out[6]["gopher_pass"]
    assert out[6]["mean_word_len"] > 10.0


def test_gopher_quality_rules_zero_shuffle_plan(spark):
    from cdc_audit_spark.operators.text import gopher_quality_flags

    df = spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    plan = gopher_quality_flags(df, "text", "doc_id")._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_chunk_text_windows_boundaries(spark):
    """Window semantics: starts every stride, slices of exactly `size`
    tokens (short tails at the end), 1 short doc -> 1 chunk, empty doc ->
    no chunks, reassembling stride-aligned chunks recovers the doc."""
    import pytest as _pytest

    from cdc_audit_spark.operators.text import chunk_text_windows

    toks = [f"t{i}" for i in range(10)]
    df = spark.createDataFrame(
        [(1, " ".join(toks)), (2, "only three tokens"), (3, "  ")],
        "doc_id long, text string")
    out = chunk_text_windows(df, "text", "doc_id", size=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]):
            (r["start_tok"], r["n_tokens"], r["chunk_text"])
            for r in out.collect()}
    # doc 1: starts 0,2,4,6,8 -> 4-token windows, 2-token tail at 8
    assert rows[(1, 0)] == (0, 4, "t0 t1 t2 t3")
    assert rows[(1, 1)] == (2, 4, "t2 t3 t4 t5")
    assert rows[(1, 4)] == (8, 2, "t8 t9")
    assert len([k for k in rows if k[0] == 1]) == 5
    # doc 2: one short chunk; doc 3: tokenless -> absent
    assert rows[(2, 0)] == (0, 3, "only three tokens")
    assert not [k for k in rows if k[0] == 3]
    # overlap=0 stride-aligned chunks reassemble the doc exactly
    flat = chunk_text_windows(df.filter("doc_id = 1"), "text", "doc_id",
                              size=4, overlap=0)
    joined = " ".join(r["chunk_text"] for r in
                      flat.orderBy("chunk_id").collect())
    assert joined == " ".join(toks)
    with _pytest.raises(ValueError):
        chunk_text_windows(df, "text", "doc_id", size=4, overlap=4)


def test_winnow_overlap_pairs_max_fp_df(spark):
    """The document-frequency cap drops boilerplate fingerprints before
    the pair join: pairs witnessed only by a hot (over-cap) run vanish,
    pairs witnessed by a rare run survive with their counts intact."""
    from cdc_audit_spark.operators.text import winnow_overlap_pairs

    k, w = 5, 4
    rare = " ".join(f"rare{i}" for i in range(k + w - 1))
    hot = " ".join(f"hot{i}" for i in range(k + w - 1))
    rows = [(1, f"alpha beta {rare} gamma {hot} delta"),
            (2, f"zeta {rare} eta {hot} theta"),
            (3, f"{hot} filler3a filler3b filler3c filler3d"),
            (4, f"{hot} filler4a filler4b filler4c filler4d"),
            (5, f"{hot} filler5a filler5b filler5c filler5d"),
            (6, f"{hot} filler6a filler6b filler6c filler6d")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    uncapped = {(r["id_a"], r["id_b"]) for r in winnow_overlap_pairs(
        docs, "text", "doc_id", k=k, w=w, min_shared=1).collect()}
    assert (3, 4) in uncapped and (1, 2) in uncapped
    capped = {(r["id_a"], r["id_b"]) for r in winnow_overlap_pairs(
        docs, "text", "doc_id", k=k, w=w, min_shared=1,
        max_fp_df=3).collect()}
    assert capped == {(1, 2)}
