"""Multimodal column plumbing: opaque binary payloads + typed metadata,
processed through Arrow-batched ``mapInPandas`` (beyond-reference surface).

Images/audio/video are treated as ``binary`` columns with a metadata
struct. The Spark-side machinery — schema, batch iteration, partition
sizing, UDF signatures — is real and tested. Codec status is per-FORMAT:
PCM WAV (``extract_audio_features``) and binary P6 PPM
(``extract_image_features``) decode for REAL with stdlib+numpy only;
compressed formats (PNG/JPEG/...) raise through the honest PIL gate
(``decode_image``) since this container ships no imaging library. The
generic ``extract_features`` keeps the deterministic content-derived
pseudo-features (byte length, md5 hash, md5-derived fake dimensions) so
the format-agnostic pipeline stays oracle-checkable end-to-end.

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


IMAGE_FEATURE_SCHEMA = (
    "media_id long, width int, height int, "
    "mean_r double, mean_g double, mean_b double, brightness double"
)


def synth_ppm(width: int, height: int, r_slope: bool = True, g_const: int = 128,
              b_value: int = 0) -> bytes:
    """Deterministic P6 PPM image: horizontal red gradient (0..255 across
    the row when ``r_slope``), constant green, constant blue — closed-form
    channel means for the analytic tests. Pure numpy, no imaging lib."""
    import numpy as np

    x = np.arange(width, dtype=np.float64)
    r = (np.rint(x * 255.0 / (width - 1)).astype(np.uint8) if width > 1 and r_slope
         else np.zeros(width, dtype=np.uint8))
    img = np.empty((height, width, 3), dtype=np.uint8)
    img[:, :, 0] = r[None, :]
    img[:, :, 1] = g_const
    img[:, :, 2] = b_value
    header = f"P6\n{width} {height}\n255\n".encode("ascii")
    return header + img.tobytes()


def _decode_ppm(payload: bytes) -> dict:
    """REAL image decode for binary P6 PPM (the classic uncompressed RGB
    format — needs no codec library, exactly like PCM WAV needs none).
    Parses the whitespace/comment-tolerant header, reshapes the raw RGB
    plane with numpy, and emits per-channel means plus Rec.601 luma."""
    import numpy as np

    buf = bytes(payload)
    if buf[:2] != b"P6":
        raise ValueError("not a binary P6 PPM payload")
    # header = magic + 3 decimal fields, '#' comments allowed between them
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(buf) and buf[pos:pos + 1].isspace():
            pos += 1
        if buf[pos:pos + 1] == b"#":
            while pos < len(buf) and buf[pos:pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(buf) and not buf[pos:pos + 1].isspace():
            pos += 1
        fields.append(int(buf[start:pos]))
    pos += 1  # exactly one whitespace byte separates header from raster
    width, height, maxval = fields
    if maxval != 255:
        raise ValueError(f"only 8-bit PPM supported, maxval={maxval}")
    raster = np.frombuffer(buf, dtype=np.uint8, count=width * height * 3, offset=pos)
    img = raster.reshape(height, width, 3).astype(np.float64)
    mean_r, mean_g, mean_b = (float(img[:, :, c].mean()) for c in range(3))
    return {
        "width": width,
        "height": height,
        "mean_r": mean_r,
        "mean_g": mean_g,
        "mean_b": mean_b,
        "brightness": 0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b,
    }


def extract_image_features(media: DataFrame) -> DataFrame:
    """Arrow-batched REAL image feature extraction: P6 PPM decodes
    natively (numpy only); other formats raise through the PIL gate
    (``decode_image``) — the honest-stub boundary is per-format, not
    per-modality."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for batch in batches:
            feats = []
            for p in batch["payload"]:
                if bytes(p)[:2] == b"P6":
                    feats.append(_decode_ppm(p))
                else:  # non-PPM: PIL gate (raises NotImplementedError here)
                    img = decode_image(bytes(p))
                    import numpy as np

                    arr = np.asarray(img.convert("RGB"), dtype=np.float64)
                    feats.append({
                        "width": arr.shape[1], "height": arr.shape[0],
                        "mean_r": float(arr[:, :, 0].mean()),
                        "mean_g": float(arr[:, :, 1].mean()),
                        "mean_b": float(arr[:, :, 2].mean()),
                        "brightness": float(
                            0.299 * arr[:, :, 0].mean()
                            + 0.587 * arr[:, :, 1].mean()
                            + 0.114 * arr[:, :, 2].mean()
                        ),
                    })
            out = pd.DataFrame(feats)
            out.insert(0, "media_id", batch["media_id"].values)
            yield out

    return media.mapInPandas(run, schema=IMAGE_FEATURE_SCHEMA)


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
