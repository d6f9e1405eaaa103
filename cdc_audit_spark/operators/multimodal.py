"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct (modality, mime, byte length, digest). The Spark-side
plumbing — schema, partition sizing, Arrow batch shape through mapInPandas —
is real and tested; the actual codec step is STUBBED (the image/audio
libraries are not in this environment): ``decode_stub`` produces a
deterministic fake feature vector, and ``decode_real`` raises
NotImplementedError with the integration point documented.

Scale notes: payload columns dominate row size, so operators here avoid
shuffling payloads — metadata extraction is a narrow map; feature extraction
yields small vectors and drops the payload before any wide transformation.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

__all__ = [
    "resize_payloads",
    "MEDIA_SCHEMA",
    "attach_payload",
    "payload_stats",
    "chunk_payload",
    "frame_sample",
    "extract_features",
    "decode_real",
]

#: Canonical media-column schema: payload + typed metadata.
MEDIA_SCHEMA = StructType([
    StructField("payload", BinaryType(), True),
    StructField("modality", StringType(), False),
    StructField("mime", StringType(), True),
    StructField("n_bytes", LongType(), False),
    StructField("digest", StringType(), False),
])


def attach_payload(df: DataFrame, text_col: str, modality: str = "text") -> DataFrame:
    """Wrap a column into the canonical media struct (UTF-8 payload).

    For real media the payload would come from a binaryFile read
    (``spark.read.format('binaryFiles')``) — same struct shape.
    """
    payload = F.encode(F.col(text_col), "UTF-8")
    return df.withColumn(
        "media",
        F.struct(
            payload.alias("payload"),
            F.lit(modality).alias("modality"),
            F.lit("text/plain; charset=utf-8").alias("mime"),
            F.octet_length(payload).cast("long").alias("n_bytes"),
            F.md5(F.col(text_col)).alias("digest"),
        ),
    )


def payload_stats(df: DataFrame, text_col: str, id_col: str, chunk_bytes: int = 65536) -> DataFrame:
    """Byte length / digest / chunk count per payload — the partition-sizing
    input for a media pipeline (all JVM-side)."""
    payload = F.encode(F.col(text_col), "UTF-8")
    nbytes = F.octet_length(payload).cast("long")
    return df.select(
        F.col(id_col),
        nbytes.alias("payload_bytes"),
        F.md5(F.col(text_col)).alias("payload_digest"),
        ((nbytes + F.lit(chunk_bytes - 1)) / F.lit(chunk_bytes)).cast("long").alias("n_chunks"),
    )


def chunk_payload(
    df: DataFrame,
    text_col: str,
    id_col: str,
    chunk_bytes: int = 65536,
) -> DataFrame:
    """Explode each payload into fixed-size byte chunks:
    (id, chunk_idx, chunk, chunk_bytes) — the shard step before parallel
    decode of large media (JVM-side substring, no Python, no payload
    shuffle beyond the explode itself).

    Row count multiplies by ceil(n_bytes/chunk_bytes); at scale write the
    result partitioned by a hash of id so one giant file cannot skew a
    partition.
    """
    from cdc_audit_spark.operators.exprs import bind

    def chunks_of(payload):
        # payload is let-bound: captured inline, the UTF-8 encode would
        # re-run per chunk (O(bytes^2 / chunk) per doc)
        nbytes = F.octet_length(payload)
        n_chunks = ((nbytes + F.lit(chunk_bytes - 1))
                    / F.lit(chunk_bytes)).cast("int")
        idx = F.sequence(F.lit(0), F.greatest(n_chunks, F.lit(1)) - F.lit(1))
        return F.transform(
            idx, lambda i: F.struct(
                i.cast("long").alias("chunk_idx"),
                F.substring(payload, i * chunk_bytes + 1,
                            chunk_bytes).alias("chunk"),
            )
        )

    chunks = bind(F.encode(F.col(text_col), "UTF-8"), chunks_of)
    return (
        df.select(F.col(id_col), F.explode(chunks).alias("c"))
        .select(
            id_col,
            F.col("c.chunk_idx").alias("chunk_idx"),
            F.col("c.chunk").alias("chunk"),
            F.octet_length("c.chunk").cast("long").alias("chunk_bytes"),
        )
    )


def frame_sample(
    df: DataFrame,
    text_col: str,
    id_col: str,
    every_k: int = 4,
    chunk_bytes: int = 65536,
) -> DataFrame:
    """Deterministic every-k-th-chunk sample — the frame-sampling shape for
    video (decode only sampled frames). Pure filter over chunk_payload, so
    the pruning happens before any decode cost."""
    return chunk_payload(df, text_col, id_col, chunk_bytes).filter(
        F.col("chunk_idx") % every_k == 0
    )


_FEATURE_DIM = 8

_FEATURES_SCHEMA = StructType([
    StructField("id", LongType(), False),
    StructField("features", ArrayType(FloatType()), False),
    StructField("n_bytes", LongType(), False),
])


def extract_features(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    batch_size_hint: int = 1024,
    decode=None,
) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads via mapInPandas.

    ``decode`` is the codec: a picklable callable ``bytes -> list[float]``
    run per payload inside the Arrow batches (a user with PIL/torchaudio
    plugs theirs in here — no module edit needed; ``decode_real`` builds
    one from PIL when it is importable). The default is a deterministic
    byte-histogram stub (this environment has no codec libraries), so the
    full distributed path — Arrow transfer of binary columns, per-batch
    compute, payload dropped before return — is exercised end-to-end
    either way.
    """
    import numpy as np
    import pandas as pd

    id_name, payload_name = id_col, payload_col

    def _fake_decode(buf: bytes) -> list[float]:
        arr = np.frombuffer(buf, dtype=np.uint8)
        if arr.size == 0:
            return [0.0] * _FEATURE_DIM
        hist = np.bincount(arr % _FEATURE_DIM, minlength=_FEATURE_DIM).astype("float32")
        return (hist / max(arr.size, 1)).tolist()

    codec = decode if decode is not None else _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_name].astype("int64"),
                "features": [codec(b) for b in pdf[payload_name]],
                "n_bytes": [len(b) for b in pdf[payload_name]],
            })

    return df.select(id_col, payload_col).mapInPandas(run, _FEATURES_SCHEMA)


def resize_payloads(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    target_w: int,
    target_h: int,
    resample=None,
) -> DataFrame:
    """Arrow-batched image resize over binary payloads via mapInPandas:
    (id, width, height, resized) with ``len(resized) == target_w*target_h``.

    ``resample`` is the codec: a picklable callable
    ``bytes | None -> bytes | None`` (receives the raw payload, returns
    the resized image bytes; NULL payloads must pass through as NULL) —
    inject a PIL/cv2-backed one without editing the module. The default
    stub resamples the payload's bytes with nearest-neighbor index
    arithmetic onto a ``target_w × target_h`` grid — deterministic and
    shape-correct, so the distributed plumbing (binary in/binary out over
    Arrow, per-batch vectorized compute, output size contract) is
    exercised end-to-end either way.
    """
    import numpy as np
    import pandas as pd

    id_name, payload_name = id_col, payload_col
    out_len = target_w * target_h
    schema = StructType([
        StructField("id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("resized", BinaryType(), True),
    ])

    def _fake_resize(buf: bytes | None) -> bytes | None:
        # MEDIA_SCHEMA declares payload nullable; a NULL payload (e.g. a
        # row with no media) must pass through as NULL, not kill the task.
        if buf is None:
            return None
        if len(buf) == 0:
            return b"\x00" * out_len
        arr = np.frombuffer(buf, dtype=np.uint8)
        idx = (np.arange(out_len, dtype=np.int64) * arr.size) // out_len
        return arr[idx].tobytes()

    codec = resample if resample is not None else _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame({
                "id": pdf[id_name].astype("int64"),
                "width": np.full(len(pdf), target_w, dtype="int32"),
                "height": np.full(len(pdf), target_h, dtype="int32"),
                "resized": [codec(b) for b in pdf[payload_name]],
            })

    return df.select(id_col, payload_col).mapInPandas(run, schema)


def decode_real(
    df: DataFrame,
    id_col: str,
    payload_col: str,
    size: tuple[int, int] = (16, 16),
) -> DataFrame:
    """Feature extraction with a REAL image codec, when one is importable.

    Builds a PIL-backed decoder (grayscale → ``size`` → normalized pixel
    vector) and delegates to ``extract_features(..., decode=...)`` — the
    same Arrow path the stub exercises. Raises NotImplementedError when no
    codec library exists (this sandbox has neither PIL nor cv2); inject
    any other codec directly via ``extract_features(decode=...)``.
    """
    try:
        from PIL import Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "real media decoding requires a codec library (PIL/cv2/"
            "torchaudio), none of which is installed here; pass your own "
            "callable via extract_features(..., decode=...) instead"
        ) from e

    w, h = size

    def _pil_decode(buf: bytes) -> list[float]:
        import io

        import numpy as np
        from PIL import Image

        im = Image.open(io.BytesIO(buf)).convert("L").resize((w, h))
        return (np.asarray(im, dtype="float32").ravel() / 255.0).tolist()

    return extract_features(df, id_col, payload_col, decode=_pil_decode)
