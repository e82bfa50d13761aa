"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched ``mapInPandas`` (beyond-reference surface).

Images/audio/video are treated as ``binary`` columns with a metadata
struct. The Spark-side machinery — schema, batch iteration, partition
sizing, UDF signatures — is real and tested; the actual media decoding is
STUBBED (this container ships no image/audio libraries): ``decode_image``
raises ``NotImplementedError`` unless PIL is importable, and the default
feature extractor computes deterministic content-derived pseudo-features
(byte length, md5 content hash, md5-derived fake dimensions) so the
pipeline is exercisable and oracle-checkable end-to-end.

At 100 TB: binary payloads dominate row size — the partition knobs that
matter are ``spark.sql.files.maxPartitionBytes`` (keep scan partitions
bounded by payload size, not row count) and Arrow batch size
(``spark.sql.execution.arrow.maxRecordsPerBatch``) so a batch of decoded
frames fits executor memory. Feature extraction is embarrassingly parallel
— no shuffle at all until the downstream aggregate.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("payload", T.BinaryType()),
        T.StructField("meta", T.StructType([
            T.StructField("mime", T.StringType()),
            T.StructField("source", T.StringType()),
        ])),
    ]
)

FEATURE_SCHEMA = (
    "media_id long, n_bytes long, content_hash string, fake_width int, fake_height int"
)


def to_media_table(df: DataFrame, id_col: str, bytes_col: str, mime: str) -> DataFrame:
    """Wrap any (id, binary-like) projection into the media schema."""
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        F.col(bytes_col).cast("binary").alias("payload"),
        F.struct(F.lit(mime).alias("mime"), F.lit("fixture").alias("source")).alias("meta"),
    )


def _extract_batch(batch: pd.DataFrame) -> pd.DataFrame:
    """Deterministic pseudo-decode of one Arrow batch (the stub 'codec').

    Real deployments replace the body with PIL/torchvision/ffmpeg calls;
    the signature, batch shape, and output schema stay identical.
    """
    payloads = batch["payload"]
    hashes = [hashlib.md5(bytes(p)).hexdigest() for p in payloads]
    return pd.DataFrame(
        {
            "media_id": batch["media_id"],
            "n_bytes": payloads.map(len).astype("int64"),
            "content_hash": hashes,
            # fake dimensions carved out of the content hash — deterministic,
            # mirrored in the SQL oracle
            "fake_width": [int(h[:4], 16) % 1920 for h in hashes],
            "fake_height": [int(h[4:8], 16) % 1080 for h in hashes],
        }
    )


def extract_features(media: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction over the payload column."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            yield _extract_batch(batch)

    return media.mapInPandas(run, schema=FEATURE_SCHEMA)


def decode_image(payload: bytes):  # pragma: no cover - stub
    """Decode an image payload. STUB: requires PIL, absent in this image."""
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decoding requires PIL/Pillow, which is not installed; "
            "the Spark-side plumbing (schema, mapInPandas batching) is "
            "exercised via the deterministic pseudo-decoder instead"
        ) from exc
    import io

    from PIL import Image

    return Image.open(io.BytesIO(payload))


AUDIO_FEATURE_SCHEMA = (
    "media_id long, sample_rate int, n_channels int, n_samples long, "
    "duration_sec double, rms double, peak double"
)


def synth_wav(freq_hz: float, duration_s: float, rate: int = 8000, amp: float = 0.5) -> bytes:
    """Deterministic 16-bit mono sine WAV — the test fixture generator
    (stdlib ``wave`` writer, no external codec)."""
    import io
    import wave

    import numpy as np

    t = np.arange(int(rate * duration_s), dtype=np.float64) / rate
    samples = (amp * np.sin(2 * np.pi * freq_hz * t) * 32767.0).astype("<i2")
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(samples.tobytes())
    return buf.getvalue()


def _decode_wav(payload: bytes) -> dict:
    """REAL audio decode: RIFF/WAV via stdlib ``wave`` + numpy features.

    Unlike the image path there is no missing dependency to stub around —
    PCM WAV needs no codec. 16-bit PCM assumed for the sample math (the
    fixture format); RMS/peak are computed on [-1, 1]-normalized samples.
    """
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(bytes(payload)), "rb") as w:
        rate, n_ch, n_frames = w.getframerate(), w.getnchannels(), w.getnframes()
        raw = w.readframes(n_frames)
    x = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    return {
        "sample_rate": rate,
        "n_channels": n_ch,
        "n_samples": n_frames,
        "duration_sec": n_frames / float(rate),
        "rms": float(np.sqrt(np.mean(x * x))) if x.size else 0.0,
        "peak": float(np.max(np.abs(x))) if x.size else 0.0,
    }


def extract_audio_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL feature extraction for WAV payloads — the same
    ``mapInPandas`` shape as ``extract_features``, with a working codec."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = [_decode_wav(p) for p in batch["payload"]]
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", batch["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=AUDIO_FEATURE_SCHEMA)


def frame_sample(media: DataFrame, every_n: int = 10) -> DataFrame:  # pragma: no cover
    """Frame-sampling stub for video payloads: real implementations emit one
    row per sampled frame from ``mapInPandas``; here the deterministic stand-
    in emits one pseudo-frame row per payload (frame_no = media_id % n)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            out = _extract_batch(batch)
            out["frame_no"] = (out["media_id"] % every_n).astype("int32")
            yield out

    return media.mapInPandas(run, schema=FEATURE_SCHEMA + ", frame_no int")
