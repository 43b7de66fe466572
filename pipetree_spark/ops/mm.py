"""Multimodal column operators (SURVEY §2.12).

Model: media payloads are opaque ``BinaryType`` columns plus a typed
metadata struct — the 100 TB-safe layout (payload bytes never leave the
executors; metadata is columnar and prunable).

The container has no image/audio libraries, so the *decode* step is a
clearly-marked stub behind an import-try (``NotImplementedError`` when a
real decoder is requested but unavailable) with a deterministic fake
decoder for tests. Everything Spark-side — schema, batching, partition
behavior, mapInPandas signatures — is real and tested.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: Typed metadata carried next to every payload.
MEDIA_META_SCHEMA = T.StructType(
    [
        T.StructField("kind", T.StringType()),  # image | audio | video | text
        T.StructField("mime", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_frames", T.IntegerType()),
    ]
)

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("byte_len", T.IntegerType()),
        T.StructField("content_sha", T.StringType()),
        T.StructField("feat_mean", T.DoubleType()),
        T.StructField("feat_std", T.DoubleType()),
    ]
)


def with_payload(df: DataFrame, text_col: str = "text", key_col: str = "doc_id") -> DataFrame:
    """Manufacture a binary payload column from text (testdata has no
    binary column — FIXTURES.md) plus a typed metadata struct."""
    return df.select(
        F.col(key_col),
        F.col(text_col).cast("binary").alias("content"),
        F.struct(
            F.lit("text").alias("kind"),
            F.lit("text/plain").alias("mime"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def payload_stats(df: DataFrame, content_col: str = "content") -> DataFrame:
    """Cheap JVM-side payload facts: byte length + sha2 fingerprint —
    the dedup/integrity pass that needs no decoding at all."""
    return df.withColumns(
        {
            "byte_len": F.length(F.col(content_col)),
            "content_sha": F.sha2(F.col(content_col), 256),
        }
    )


def stub_decoder(payload: bytes, meta: dict[str, Any] | None = None) -> dict[str, float]:
    """Deterministic fake decode: derives pseudo-pixel statistics from the
    byte content. Stands in for PIL/libav so the batch plumbing is
    exercisable offline."""
    if not payload:
        return {"feat_mean": 0.0, "feat_std": 0.0}
    digest = hashlib.sha256(payload).digest()
    vals = list(digest)
    mean = sum(vals) / len(vals)
    var = sum((v - mean) ** 2 for v in vals) / (len(vals) - 1)
    return {"feat_mean": mean, "feat_std": var**0.5}


def real_decoder(payload: bytes, meta: dict[str, Any] | None = None) -> dict[str, float]:
    """Real media decode — requires an image/audio stack that is NOT in
    this container. Kept as the explicit extension point."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "media decoding requires an image/audio library (e.g. Pillow); "
            "not available in this environment — use stub_decoder or plug "
            "a decoder into extract_features(decoder=...)"
        ) from exc
    raise NotImplementedError("wire a concrete decode here when libs exist")


def extract_features(
    df: DataFrame,
    decoder: Callable[[bytes, dict | None], dict[str, float]] = stub_decoder,
    content_col: str = "content",
    key_col: str = "doc_id",
) -> DataFrame:
    """Batched feature extraction over payloads via mapInPandas.

    Arrow streams partition-sized record batches into Python; the
    decoder runs per payload inside the batch — the exact shape a GPU/
    codec stage needs (swap ``decoder``; batch size is controlled by
    ``spark.sql.execution.arrow.maxRecordsPerBatch``). The schema is
    fixed (FEATURE_SCHEMA) so downstream pruning works."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [decoder(p, None) for p in pdf[content_col]]
            out = pd.DataFrame(
                {
                    "doc_id": pdf[key_col].astype("int64"),
                    "byte_len": [len(p) if p is not None else 0 for p in pdf[content_col]],
                    "content_sha": [
                        hashlib.sha256(p).hexdigest() if p is not None else None
                        for p in pdf[content_col]
                    ],
                    "feat_mean": [f["feat_mean"] for f in feats],
                    "feat_std": [f["feat_std"] for f in feats],
                }
            )
            yield out

    return df.mapInPandas(run, schema=FEATURE_SCHEMA)


def stub_embedder(texts: "pd.Series", dim: int = 64) -> list[list[float]]:
    """Deterministic fake embedding model: seeds a PRNG from each text's
    sha256 → unit vector. Stands in for a GPU model server so the batch
    plumbing (Arrow batch in, vector batch out) is exercisable offline."""
    import numpy as np

    out = []
    for t in texts:
        seed = int.from_bytes(hashlib.sha256(str(t).encode()).digest()[:4], "big")
        v = np.random.RandomState(seed).standard_normal(dim)
        out.append((v / np.linalg.norm(v)).astype("float32").tolist())
    return out


def embed_stage(
    df: DataFrame,
    embedder: Callable[..., list[list[float]]] = stub_embedder,
    text_col: str = "text",
    key_col: str = "doc_id",
    dim: int = 64,
) -> DataFrame:
    """Batched embedding / LLM-call stage via mapInPandas — the shape a
    model-server stage needs: Arrow streams partition-sized batches into
    Python, ``embedder`` sees a whole batch (amortizing model/RPC setup),
    and the output schema is fixed so downstream ANN ops compose.
    Batch size knob: ``spark.sql.execution.arrow.maxRecordsPerBatch``."""
    schema = T.StructType(
        [
            T.StructField(key_col, T.LongType()),
            T.StructField("embedding", T.ArrayType(T.FloatType())),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {key_col: pdf[key_col].astype("int64"), "embedding": embedder(pdf[text_col], dim)}
            )

    return df.mapInPandas(run, schema=schema)


def frame_sample(df: DataFrame, frames_col: str = "frames", every_n: int = 10) -> DataFrame:
    """Sample every n-th frame from an ``array<binary>`` video column —
    pure column expression (no decode): the cheap pre-filter before any
    per-frame model stage."""
    return df.withColumn(
        "sampled_frames",
        F.filter(F.col(frames_col), lambda _f, i: i % every_n == 0),
    )


RESIZE_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("orig_bytes", T.LongType()),
    ]
)


def stub_resizer(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic fake resize: emits a pseudo-pixel buffer of exactly
    width·height bytes derived from the payload digest (sha256 counter
    mode) — stands in for a real scaler so the batch plumbing, output
    schema, and size accounting are exercisable offline."""
    if not payload:
        return b""
    need = width * height
    out = bytearray()
    counter = 0
    base = hashlib.sha256(payload).digest()
    while len(out) < need:
        out += hashlib.sha256(base + counter.to_bytes(4, "big")).digest()
        counter += 1
    return bytes(out[:need])


def resize_stage(
    df: DataFrame,
    width: int = 64,
    height: int = 64,
    resizer: Callable[[bytes, int, int], bytes] = stub_resizer,
    content_col: str = "content",
    key_col: str = "doc_id",
) -> DataFrame:
    """Batched image/video-frame resize via mapInPandas — the remaining
    member of the decode / feature-extract / resize / frame-sample
    multimodal family. Payload bytes stay executor-side (Arrow batches,
    never the driver); swap ``resizer`` for a real scaler (PIL/libav —
    not in this container, see :func:`real_decoder`) without touching
    the plan. Output schema is fixed (RESIZE_SCHEMA) so downstream
    stages prune columns normally."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = [
                resizer(p, width, height) if p is not None else None
                for p in pdf[content_col]
            ]
            yield pd.DataFrame(
                {
                    "doc_id": pdf[key_col].astype("int64"),
                    "content": resized,
                    "width": width,
                    "height": height,
                    "orig_bytes": [len(p) if p is not None else 0 for p in pdf[content_col]],
                }
            )

    return df.mapInPandas(run, schema=RESIZE_SCHEMA)
