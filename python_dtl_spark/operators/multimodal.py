"""Multimodal column handling: images/audio/video as opaque binary
columns with typed metadata.

The heavy decode/transform steps run as Arrow-batched ``mapInPandas``
stages — the correct Spark shape for per-asset Python work: data moves
executor→Python in Arrow record batches, partitions process
independently, nothing touches the driver.  The actual codec libraries
are not installed in this environment, so decode is STUBBED: by default
it raises ``NotImplementedError``; ``fake=True`` swaps in a
deterministic fake (hash-derived pixels/samples) so the plumbing —
schemas, batch iteration, partitioning — is fully testable.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

ASSET_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("kind", T.StringType()),  # image | audio | video
        T.StructField("payload", T.BinaryType()),
        T.StructField("mime", T.StringType()),
        T.StructField("meta", T.StringType()),  # JSON sidecar
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("mean_luma", T.DoubleType()),
        T.StructField("phash", T.LongType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)

FRAME_SAMPLE_SCHEMA = T.StructType(
    [
        T.StructField("asset_id", T.LongType()),
        T.StructField("frame_index", T.IntegerType()),
        T.StructField("frame", T.BinaryType()),
    ]
)


def _fake_u64(payload: bytes) -> int:
    # deterministic stand-in for decoded content: FNV-1a over the payload
    h = 0xCBF29CE484222325
    for b in payload[:4096]:
        h = ((h ^ b) * 0x100000001B3) & 0xFFFFFFFFFFFFFFFF
    return h


def extract_image_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    """Decode images and emit (dims, luma, perceptual hash).

    Real decode requires an image library (not in this container) —
    stubbed behind ``fake``; the Spark plumbing is real.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image decode requires an image library (e.g. Pillow); "
                    "not available in this environment — use fake=True"
                )
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                h = _fake_u64(bytes(payload or b""))
                rows.append(
                    {
                        "asset_id": asset_id,
                        "width": 64 + (h & 0xFF),
                        "height": 64 + ((h >> 8) & 0xFF),
                        "mean_luma": ((h >> 16) & 0xFFFF) / 65535.0,
                        "phash": (h >> 1),  # keep in signed-long range
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_FEATURES_SCHEMA])

    return df.select("asset_id", "payload").mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def extract_audio_features(df: DataFrame, *, fake: bool = False) -> DataFrame:
    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "audio decode requires an audio library; not available "
                    "in this environment — use fake=True"
                )
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                h = _fake_u64(bytes(payload or b""))
                rows.append(
                    {
                        "asset_id": asset_id,
                        "sample_rate": 8000 * (1 + (h & 3)),
                        "duration_s": ((h >> 2) & 0xFFFF) / 1000.0,
                        "rms": ((h >> 18) & 0xFFFF) / 65535.0,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA])

    return df.select("asset_id", "payload").mapInPandas(run, AUDIO_FEATURES_SCHEMA)


def sample_frames(df: DataFrame, every_n: int = 10, *, fake: bool = False) -> DataFrame:
    """Video → sampled frames (1:N fan-out inside mapInPandas)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "video decode requires a codec library; not available "
                    "in this environment — use fake=True"
                )
            rows = []
            for asset_id, payload in zip(pdf["asset_id"], pdf["payload"]):
                payload = bytes(payload or b"")
                h = _fake_u64(payload)
                n_frames = 1 + (h & 0x1F)
                for i in range(0, n_frames, every_n):
                    rows.append(
                        {
                            "asset_id": asset_id,
                            "frame_index": i,
                            "frame": payload[:16] + i.to_bytes(4, "big"),
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SAMPLE_SCHEMA])

    return df.select("asset_id", "payload").mapInPandas(run, FRAME_SAMPLE_SCHEMA)


def image_near_dup_pairs(
    assets: DataFrame,
    max_hamming: int = 6,
    blocks: int | None = None,
    *,
    fake: bool = False,
) -> DataFrame:
    """Image-grain near-duplicate pairs (staged r16 → r17): perceptual
    hash from :func:`extract_image_features` fed through the shared
    pigeonhole Hamming core
    (:func:`~python_dtl_spark.operators.dedup.hamming_near_pairs`) —
    the image sibling of text SimHash dedup.  Re-encoded, resized and
    re-compressed copies of one image land within a small Hamming
    radius of each other under a real perceptual hash; with
    ``fake=True`` the deterministic FNV stand-in gives exact-payload
    copies distance 0 (and the DuckDB replay can brute-force the whole
    pair set, so the composition is fully oracle-able).

    Scale shape: ONE Arrow-batched decode pass, then bucket equi-joins
    on (block, chunk) — never all-pairs; compose with
    ``dedup.keep_one_from_pairs`` for keep-one semantics.  Emits
    ``(id_a, id_b, hamming)`` with ``id_a < id_b``."""
    from python_dtl_spark.operators import dedup as dedup_mod

    feats = extract_image_features(assets, fake=fake)
    return dedup_mod.hamming_near_pairs(
        feats.select("asset_id", "phash"),
        "asset_id",
        "phash",
        max_hamming=max_hamming,
        blocks=blocks,
    )


def synth_assets(spark, n: int = 64, kind: str = "image") -> DataFrame:
    """Deterministic synthetic asset table for tests (no real codecs)."""
    df = spark.range(n).select(
        F.col("id").alias("asset_id"),
        F.lit(kind).alias("kind"),
        F.sha2(F.col("id").cast("string"), 256).cast("binary").alias("payload"),
        F.lit(f"{kind}/fake").alias("mime"),
        F.to_json(F.struct(F.col("id").alias("source_id"))).alias("meta"),
    )
    return df
