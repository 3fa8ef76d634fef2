"""Multimodal columns: image/audio/video as opaque ``binary`` payloads with
typed metadata (north-star extension for training-data pipelines).

Design: the payload column is never interpreted by Spark SQL — it flows as
``BinaryType`` bytes; decode / feature-extract / resize / frame-sample run
in ``mapInPandas`` (Arrow batches, one Python worker per partition, no
per-row overhead). The actual codec calls are STUBBED (no image/audio libs
in this container): ``decode_fn=None`` uses a deterministic fake decoder so
schema, partitioning, UDF signature, and batch shape are real and tested;
in production you inject a Pillow/torchaudio/ffmpeg-backed ``decode_fn``.

Scale notes: binary payloads dominate row size, so operators here
repartition by byte budget, not row count — a 100 TB image table with 1 MB
rows wants ~128 MB input splits and NO shuffle of the payload column unless
unavoidable; feature extraction projects payloads away as early as
possible.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import pandas as pd
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

MEDIA_FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("byte_len", LongType()),
        StructField("sha256", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("feature", ArrayType(FloatType())),
    ]
)


def _fake_decode(payload: bytes) -> dict:
    """Deterministic stand-in for a real decoder: derives pseudo dimensions
    and an 8-d feature from the payload digest. Replace with a real codec
    via the ``decode_fn`` parameter; raise NotImplementedError semantics
    live here in spirit — this NEVER pretends to be a real decode."""
    digest = hashlib.sha256(payload).digest()
    width = 64 + digest[0]
    height = 64 + digest[1]
    feature = [b / 255.0 for b in digest[2:10]]
    return {"width": width, "height": height, "feature": feature}


def extract_media_features(
    media: DataFrame,
    decode_fn: Callable[[bytes], dict] | None = None,
    batch_hint_bytes: int = 64 * 1024 * 1024,
) -> DataFrame:
    """Decode + featurize media rows via mapInPandas (Arrow batches).

    Input schema: at least (media_id long, kind string, payload binary).
    Output: MEDIA_FEATURE_SCHEMA — payload projected away (never carried
    past the decode stage).
    """
    decode = decode_fn or _fake_decode

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = {
                "media_id": pdf["media_id"],
                "kind": pdf["kind"],
                "byte_len": pdf["payload"].map(lambda b: len(b) if b is not None else 0),
                "sha256": pdf["payload"].map(
                    lambda b: hashlib.sha256(b).hexdigest() if b is not None else None
                ),
            }
            decoded = pdf["payload"].map(
                lambda b: decode(b) if b is not None else {"width": None, "height": None, "feature": None}
            )
            out["width"] = decoded.map(lambda d: d["width"])
            out["height"] = decoded.map(lambda d: d["height"])
            out["feature"] = decoded.map(lambda d: d["feature"])
            yield pd.DataFrame(out)

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=MEDIA_FEATURE_SCHEMA
    )


def frame_sample_plan(
    media: DataFrame,
    every_n_ms: int = 1000,
    sample_fn: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling plumbing: one output row per sampled frame.

    Without a real ``sample_fn`` (ffmpeg-backed in production) the stub
    emits one deterministic pseudo-frame per whole second of duration_ms —
    the explode/fan-out shape is the real thing being exercised.
    """
    schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("frame_idx", IntegerType()),
            StructField("frame_ts_ms", LongType()),
            StructField("frame_sha256", StringType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                dur = int(r["duration_ms"] or 0)
                payload = r["payload"] or b""
                if sample_fn is not None:
                    digests = [
                        hashlib.sha256(fb).hexdigest()
                        for fb in sample_fn(payload, every_n_ms)
                    ]
                else:
                    # stub digests stay VARCHAR-derivable (hex-digest
                    # string + ':' + index) so a SQL oracle can recompute
                    # them — DuckDB's sha256 only accepts VARCHAR
                    n = max(dur // every_n_ms, 0)
                    phex = hashlib.sha256(payload).hexdigest()
                    digests = [
                        hashlib.sha256(f"{phex}:{i}".encode()).hexdigest()
                        for i in range(n)
                    ]
                for i, fx in enumerate(digests):
                    rows.append(
                        {
                            "media_id": r["media_id"],
                            "frame_idx": i,
                            "frame_ts_ms": i * every_n_ms,
                            "frame_sha256": fx,
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["media_id", "frame_idx", "frame_ts_ms", "frame_sha256"]
            )

    return media.select("media_id", "duration_ms", "payload").mapInPandas(
        run, schema=schema
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Derive a media-shaped table from the documents fixture (the
    container has no real image/audio data): payload = utf-8 bytes of the
    text, kind round-robins image/audio/video. Deterministic."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col("text"), "utf-8").cast(BinaryType()).alias("payload"),
        F.lit("application/octet-stream").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        (F.col("n_chars") * 100).cast("long").alias("duration_ms"),
    )


RESIZED_MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("byte_len", LongType()),
        StructField("payload", BinaryType()),
    ]
)


def _fake_resize(payload: bytes, width: int, height: int) -> bytes:
    """Deterministic stand-in for a real resizer: the output payload is
    the input digest hex + target dims, tiled to a length proportional
    to the TARGET pixel area — so downstream sees the real contract (a
    new binary payload whose size tracks the target dims, reproducible
    for a given input), while the digest+repeat construction stays
    VARCHAR-derivable so the SQL oracle can recompute byte_len and
    sha256 bit-for-bit (the frame_sample_plan convention). A real
    deployment injects a Pillow-backed ``resize_fn`` and none of the
    Spark-side plumbing changes."""
    unit = f"{hashlib.sha256(payload).hexdigest()}:{width}x{height}#"
    k = max(1, (width * height) // 256)
    return (unit * k).encode()


def resize_media(
    media: DataFrame,
    width: int,
    height: int,
    resize_fn: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Resize plumbing: payload -> payload' at (width, height) via
    mapInPandas — the transform-in-place member of the multimodal verb
    set (decode / feature-extract / RESIZE / frame-sample). The payload
    never enters a shuffle: the resize runs inside the scan's Arrow
    batches and the output is written/consumed downstream partition-
    local. Null payloads pass through as null (byte_len 0).

    Input: at least (media_id long, kind string, payload binary).
    Output: RESIZED_MEDIA_SCHEMA with the RESIZED payload.
    """
    rz = resize_fn or _fake_resize

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            resized = pdf["payload"].map(
                lambda b: rz(b, width, height) if b is not None else None
            )
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "width": width,
                    "height": height,
                    "byte_len": resized.map(
                        lambda b: len(b) if b is not None else 0
                    ),
                    "payload": resized,
                }
            )

    return media.select("media_id", "kind", "payload").mapInPandas(
        run, schema=RESIZED_MEDIA_SCHEMA
    )
