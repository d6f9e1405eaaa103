import pytest

from cdc_audit_spark.operators.multimodal import (
    attach_payload,
    decode_real,
    extract_features,
    payload_stats,
)


def _docs(spark):
    return spark.createDataFrame(
        [(1, "hello world"), (2, ""), (3, "binary payload plumbing test")],
        "doc_id long, text string",
    )


def test_attach_payload_schema(spark):
    out = attach_payload(_docs(spark), "text")
    media = out.schema["media"].dataType
    names = [f.name for f in media.fields]
    assert names == ["payload", "modality", "mime", "n_bytes", "digest"]
    row = out.filter("doc_id = 1").first()["media"]
    assert bytes(row["payload"]) == b"hello world"
    assert row["n_bytes"] == 11


def test_payload_stats(spark):
    out = {r["doc_id"]: r for r in payload_stats(_docs(spark), "text", "doc_id").collect()}
    assert out[1]["payload_bytes"] == 11
    assert out[2]["payload_bytes"] == 0
    assert out[1]["n_chunks"] == 1


def test_extract_features_arrow_path(spark):
    df = attach_payload(_docs(spark), "text").select("doc_id", "media.payload")
    feats = extract_features(df, "doc_id", "payload")
    rows = {r["id"]: r for r in feats.collect()}
    assert len(rows[1]["features"]) == 8
    assert rows[1]["n_bytes"] == 11
    assert rows[2]["features"] == [0.0] * 8  # empty payload → zero vector
    # deterministic
    again = {r["id"]: r["features"] for r in extract_features(df, "doc_id", "payload").collect()}
    assert again[1] == rows[1]["features"]


def test_extract_features_distributed_partitions(spark):
    df = attach_payload(_docs(spark), "text").select("doc_id", "media.payload").repartition(3)
    assert extract_features(df, "doc_id", "payload").count() == 3


def test_decode_real_is_stubbed(spark):
    """No codec library exists in this sandbox (verified import failure),
    so the PIL-backed path must refuse loudly, pointing at the injectable
    extract_features(decode=...) alternative."""
    with pytest.raises(NotImplementedError, match="decode="):
        decode_real(_docs(spark), "doc_id", "text")


def test_chunk_payload_reassembles(spark):
    from cdc_audit_spark.operators.multimodal import chunk_payload
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [(1, "a" * 100), (2, "xyz"), (3, ""), (4, "日本語テキスト")],
        "doc_id long, text string",
    )
    chunks = chunk_payload(df, "text", "doc_id", chunk_bytes=32)
    rows = chunks.orderBy("doc_id", "chunk_idx").collect()
    # byte-level chunking: utf-8 payload reassembles exactly
    by_id = {}
    for r in rows:
        by_id.setdefault(r["doc_id"], []).append(bytes(r["chunk"]))
    assert b"".join(by_id[1]) == b"a" * 100
    assert [len(c) for c in by_id[1]] == [32, 32, 32, 4]
    assert b"".join(by_id[2]) == b"xyz"
    assert by_id[3] == [b""]  # empty payload → single empty chunk
    assert b"".join(by_id[4]).decode("utf-8") == "日本語テキスト"
    # chunk_idx is dense from 0 per id
    for doc, pieces in by_id.items():
        idxs = [r["chunk_idx"] for r in rows if r["doc_id"] == doc]
        assert idxs == list(range(len(pieces)))


def test_frame_sample_every_k(spark):
    from cdc_audit_spark.operators.multimodal import chunk_payload, frame_sample

    df = spark.createDataFrame([(1, "b" * 300)], "doc_id long, text string")
    all_chunks = chunk_payload(df, "text", "doc_id", chunk_bytes=32).collect()
    sampled = frame_sample(df, "text", "doc_id", every_k=3, chunk_bytes=32).collect()
    assert len(all_chunks) == 10
    assert sorted(r["chunk_idx"] for r in sampled) == [0, 3, 6, 9]


def test_resize_payloads_contract(spark):
    """Resize plumbing: binary in → binary out over Arrow, exact output
    size, deterministic, content-dependent."""
    from cdc_audit_spark.operators.multimodal import attach_payload, resize_payloads

    docs = spark.createDataFrame(
        [(1, "abcdefghij" * 30), (2, "zyx"), (3, "")],
        "doc_id long, text string")
    payloads = attach_payload(docs, "text").select("doc_id", "media.payload")
    out = resize_payloads(payloads, "doc_id", "payload", 16, 8)
    rows = {r["id"]: r for r in out.collect()}
    assert set(rows) == {1, 2, 3}
    for r in rows.values():
        assert (r["width"], r["height"]) == (16, 8)
        assert len(r["resized"]) == 16 * 8
    # deterministic and content-dependent
    again = {r["id"]: bytes(r["resized"])
             for r in resize_payloads(payloads, "doc_id", "payload", 16, 8).collect()}
    assert {k: bytes(v["resized"]) for k, v in rows.items()} == again
    assert again[1] != again[2]


def test_resize_payloads_null_passthrough(spark):
    """A NULL payload (MEDIA_SCHEMA declares it nullable) must yield a
    NULL resized cell, not a NoneType TypeError in the executor."""
    from cdc_audit_spark.operators.multimodal import resize_payloads

    df = spark.createDataFrame(
        [(1, b"hello"), (2, None)], "doc_id long, payload binary")
    rows = {r["id"]: r for r in
            resize_payloads(df, "doc_id", "payload", 4, 4).collect()}
    assert len(rows[1]["resized"]) == 16
    assert rows[2]["resized"] is None
    assert (rows[2]["width"], rows[2]["height"]) == (4, 4)


def test_injected_codec_through_arrow_path(spark):
    """The codec is an API, not a comment (VERDICT r04 item 5): a
    user-supplied decode/resample callable must flow through the same
    Arrow mapInPandas path as the stub — values prove the injected codec
    ran, per row, with the raw payload bytes."""
    from cdc_audit_spark.operators.multimodal import (
        attach_payload,
        extract_features,
        resize_payloads,
    )

    df = attach_payload(_docs(spark), "text").select("doc_id", "media.payload")

    def my_decode(buf: bytes) -> list[float]:
        head = float(buf[0]) if len(buf) else -1.0
        return [float(len(buf)), head, 0.0, 0.0]

    feats = {r["id"]: r for r in
             extract_features(df, "doc_id", "payload", decode=my_decode).collect()}
    texts = {r["doc_id"]: r["text"].encode() for r in _docs(spark).collect()}
    for i, raw in texts.items():
        head = float(raw[0]) if len(raw) else -1.0
        assert feats[i]["features"][:2] == [float(len(raw)), head]
        assert feats[i]["n_bytes"] == len(raw)

    def my_resample(buf):
        return None if buf is None else buf[:4].ljust(4, b"\x00")

    rows = {r["id"]: bytes(r["resized"]) for r in
            resize_payloads(df, "doc_id", "payload", 2, 2,
                            resample=my_resample).collect()}
    for i, raw in texts.items():
        assert rows[i] == raw[:4].ljust(4, b"\x00")
