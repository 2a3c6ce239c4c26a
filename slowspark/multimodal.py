"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas. The actual codec calls (PIL/ffmpeg/torchaudio) are NOT in
this container, so the decode kernels are STUBBED: by default a clearly
marked deterministic fake derives metadata from the bytes themselves
(stable across reruns, good enough to test schema/partitioning/batch
shape); pass real_decode=True to get the NotImplementedError marking where
the real library call goes. The Spark-side plumbing — schemas, batching,
UDF signatures, partition sizing — is real and tested.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("kind", T.StringType(), False),  # image|audio|video
    T.StructField("payload", T.BinaryType(), True),
    T.StructField("mime", T.StringType(), True),
])

IMAGE_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("width", T.IntegerType(), True),
    T.StructField("height", T.IntegerType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("sha256", T.StringType(), True),
    T.StructField("feature", T.ArrayType(T.FloatType()), True),
])


def _fake_decode(payload: bytes) -> tuple[int, int, int]:
    """DETERMINISTIC FAKE decode: metadata derived from a hash of the bytes.
    Replace with PIL.Image.open(io.BytesIO(payload)) in production."""
    h = hashlib.blake2b(payload or b"", digest_size=8).digest()
    width = 64 + h[0] % 192
    height = 64 + h[1] % 192
    return width, height, 3


def _real_image_decode(payload: bytes) -> tuple[int, int, int]:
    """The real-decode wire-in point: uses PIL when the executor image has
    it, raises the documented NotImplementedError otherwise (pinned by
    tests/test_multimodal_streaming.py::test_real_decode_gate — green on
    either path, so a cluster image WITH PIL exercises the real kernel
    with no code change)."""
    try:
        from PIL import Image
    except ImportError as exc:
        raise NotImplementedError(
            "real image decode requires PIL/libvips — not in this "
            "container; wire PIL.Image.open here"
        ) from exc
    import io

    with Image.open(io.BytesIO(payload)) as im:
        w, h = im.size
        return w, h, len(im.getbands())


def decode_images(
    media: DataFrame, feature_dim: int = 8, real_decode: bool = False
) -> DataFrame:
    """binary payload -> typed metadata + a feature vector.

    Batch shape: one Arrow batch in, one pandas frame out — payloads never
    leave the executor, only the (small) metadata crosses the shuffle. At
    100 TB, partition sizing must bound payload bytes per batch:
    set spark.sql.execution.arrow.maxRecordsPerBatch so that
    batch_rows x median_payload fits in worker memory.
    """

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                w, h, c = _real_image_decode(b) if real_decode else _fake_decode(b)
                digest = hashlib.sha256(b).hexdigest()
                # deterministic fake embedding from content hash
                seed = int.from_bytes(hashlib.blake2b(b, digest_size=4).digest(), "big")
                rng = np.random.RandomState(seed)
                feat = rng.standard_normal(feature_dim).astype(np.float32)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "n_channels": c,
                        "sha256": digest,
                        "feature": feat.tolist(),
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(
        fn, schema=IMAGE_META_SCHEMA
    )


FRAME_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("frame_index", T.IntegerType(), False),
    T.StructField("frame_sha256", T.StringType(), True),
])


def sample_frames(media: DataFrame, every_n: int = 10, max_frames: int = 5) -> DataFrame:
    """Video frame sampling (UDTF-shaped: 1 video row -> N frame rows).
    STUB: frame count derived deterministically from payload bytes; replace
    the inner loop with an ffmpeg/pyav demux in production."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                n_frames = 1 + (hashlib.blake2b(b, digest_size=1).digest()[0] % 100)
                for i, f_idx in enumerate(range(0, n_frames, every_n)):
                    if i >= max_frames:
                        break
                    fh = hashlib.sha256(b + f_idx.to_bytes(4, "big")).hexdigest()
                    rows.append(
                        {"media_id": int(mid), "frame_index": f_idx, "frame_sha256": fh}
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in FRAME_SCHEMA.fields])

    return media.filter(F.col("kind") == "video").select("media_id", "payload").mapInPandas(
        fn, schema=FRAME_SCHEMA
    )


AUDIO_META_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("sample_rate", T.IntegerType(), True),
    T.StructField("duration_s", T.FloatType(), True),
    T.StructField("n_channels", T.IntegerType(), True),
    T.StructField("mel_means", T.ArrayType(T.FloatType()), True),
])


def extract_audio_features(
    media: DataFrame, n_mel: int = 16, real_decode: bool = False
) -> DataFrame:
    """binary audio payload -> typed metadata + mel-band mean features.
    STUB decode (deterministic fake from byte hash — wire torchaudio/
    soundfile here in production); the Spark plumbing (Arrow batching,
    kind filter, metadata-only shuffle) is real, mirroring decode_images."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = hashlib.blake2b(b, digest_size=8).digest()
                if real_decode:
                    # wire-in point: soundfile when the executor image has
                    # it, loud refusal otherwise (same gate pattern as
                    # _real_image_decode; test_real_decode_gate pins the
                    # message)
                    try:
                        import soundfile as sf_mod
                    except ImportError as exc:
                        raise NotImplementedError(
                            "real audio decode requires soundfile/torchaudio "
                            "— not in this container; wire "
                            "sf.read(io.BytesIO) here"
                        ) from exc
                    import io

                    info = sf_mod.info(io.BytesIO(b))
                    sr = int(info.samplerate)
                    duration = float(info.duration)
                    n_ch = int(info.channels)
                else:
                    sr = (8000, 16000, 22050, 44100)[h[0] % 4]
                    duration = 0.5 + (int.from_bytes(h[1:3], "big") % 6000) / 100.0
                    n_ch = 1 + h[3] % 2
                # mel means stay content-hash-derived even under
                # real_decode: a real mel filterbank needs an FFT pass the
                # plumbing test does not require; swap in
                # librosa.feature.melspectrogram here for production
                seed = int.from_bytes(h[4:8], "big")
                rng = np.random.RandomState(seed)
                mel = rng.standard_normal(n_mel).astype(np.float32)
                rows.append({
                    "media_id": int(mid),
                    "sample_rate": sr,
                    "duration_s": float(duration),
                    "n_channels": n_ch,
                    "mel_means": mel.tolist(),
                })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        fn, schema=AUDIO_META_SCHEMA
    )


AUDIO_CHUNK_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType(), False),
    T.StructField("chunk_index", T.IntegerType(), False),
    T.StructField("chunk_start_s", T.FloatType(), False),
    T.StructField("chunk_sha256", T.StringType(), True),
])


def chunk_audio(
    media: DataFrame, window_s: float = 30.0, max_chunks: int = 8
) -> DataFrame:
    """Fixed-window audio chunking (UDTF-shaped: 1 audio row -> N chunk
    rows) — the ASR-pipeline pre-step. Chunk COUNT comes from the (stubbed)
    duration; chunk ids are content-derived so reruns are identical."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                h = hashlib.blake2b(b, digest_size=8).digest()
                duration = 0.5 + (int.from_bytes(h[1:3], "big") % 6000) / 100.0
                n_chunks = min(max_chunks, 1 + int(duration // window_s))
                for i in range(n_chunks):
                    ch = hashlib.sha256(b + i.to_bytes(4, "big")).hexdigest()
                    rows.append({
                        "media_id": int(mid),
                        "chunk_index": i,
                        "chunk_start_s": float(i * window_s),
                        "chunk_sha256": ch,
                    })
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_CHUNK_SCHEMA.fields]
            )

    return media.filter(F.col("kind") == "audio").select("media_id", "payload").mapInPandas(
        fn, schema=AUDIO_CHUNK_SCHEMA
    )


def gen_media(spark, n: int) -> DataFrame:
    """Deterministic fake media table for tests."""
    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        kinds = ["image", "image", "image", "video", "audio"]
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                payload = hashlib.blake2b(
                    f"media{i}".encode(), digest_size=32
                ).digest() * (1 + i % 4)
                rows.append(
                    {
                        "media_id": i,
                        "url": f"https://media.example.com/{i}",
                        "kind": kinds[i % len(kinds)],
                        "payload": payload,
                        "mime": "application/octet-stream",
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in MEDIA_SCHEMA.fields])

    return spark.range(n).mapInPandas(fn, schema=MEDIA_SCHEMA)
