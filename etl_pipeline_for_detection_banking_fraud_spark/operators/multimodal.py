"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the warehouse as ``binary`` columns
with a media_type tag. The Spark-side contract — schema, partitioning,
Arrow batch shape through mapInPandas — is real and tested. The codec
seam now has one REAL end-to-end decoder: ``audio/wav`` (pure-stdlib
RIFF/WAVE PCM parse + numpy sample stats, no external codec library),
driven by ``wav_features``. Other media types still raise
NotImplementedError from ``decode_media`` (PIL/ffmpeg are not in this
image) — the same signature a real image/video codec drops into.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, first_byte int, media_type string"

WAV_FEATURE_SCHEMA = (
    "doc_id bigint, channels int, sample_rate int, n_frames bigint, "
    "duration_ms bigint, peak int, rms double"
)


def to_binary_table(documents: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Adapter: a text table posing as a binary media table (utf-8
    payloads) so the plumbing is exercised end-to-end without codecs."""
    return documents.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_wav(content: bytes) -> dict:
    """Pure-stdlib RIFF/WAVE PCM decode: header via the ``wave`` module,
    sample statistics via numpy over the raw frame buffer. Supports the
    8-bit-unsigned and 16-bit-signed PCM encodings the WAV container
    standardizes; returns container metadata + peak/RMS amplitude (the
    features an audio-curation pipeline filters on: silence, clipping,
    duration outliers)."""
    import io
    import wave

    import numpy as np

    with wave.open(io.BytesIO(content), "rb") as w:
        channels = w.getnchannels()
        sampwidth = w.getsampwidth()
        rate = w.getframerate()
        n_frames = w.getnframes()
        frames = w.readframes(n_frames)
    if sampwidth == 2:
        samples = np.frombuffer(frames, dtype="<i2").astype(np.int64)
    elif sampwidth == 1:
        # 8-bit WAV is unsigned with a 128 midpoint
        samples = np.frombuffer(frames, dtype=np.uint8).astype(np.int64) - 128
    else:
        raise NotImplementedError(f"unsupported PCM sample width {sampwidth}")
    peak = int(np.abs(samples).max()) if samples.size else 0
    rms = float(np.sqrt(np.mean(np.square(samples)))) if samples.size else 0.0
    return {
        "channels": channels,
        "sample_rate": rate,
        "n_frames": n_frames,
        "duration_ms": (n_frames * 1000) // rate if rate else 0,
        "peak": peak,
        "rms": rms,
    }


def decode_ppm(content: bytes) -> dict:
    """Pure-stdlib binary PPM (Netpbm P6) decode: header parse per the
    Netpbm spec (whitespace-separated width/height/maxval, '#' comments
    allowed between tokens), then numpy over the raw interleaved RGB
    plane. Returns dimensions + per-channel means + Rec.601 luma — the
    features an image-curation pipeline filters on (resolution floors,
    blank/overexposed frames)."""
    import numpy as np

    if not content.startswith(b"P6"):
        raise ValueError("not a P6 binary PPM")
    # tokenize the header: P6, width, height, maxval; '#' starts a
    # comment running to end-of-line; ONE whitespace byte ends the
    # maxval token and the pixel plane follows immediately
    pos, fields = 2, []
    while len(fields) < 3:
        while pos < len(content) and content[pos : pos + 1].isspace():
            pos += 1
        if content[pos : pos + 1] == b"#":
            while pos < len(content) and content[pos : pos + 1] != b"\n":
                pos += 1
            continue
        start = pos
        while pos < len(content) and not content[pos : pos + 1].isspace():
            pos += 1
        fields.append(int(content[start:pos]))
    pos += 1  # the single whitespace after maxval
    width, height, maxval = fields
    if maxval != 255:
        raise NotImplementedError("only 8-bit-per-channel PPM supported")
    n_pixels = width * height
    plane = content[pos : pos + 3 * n_pixels]
    if len(plane) != 3 * n_pixels:
        raise ValueError("truncated PPM pixel plane")
    px = np.frombuffer(plane, dtype=np.uint8).astype(np.float64).reshape(-1, 3)
    mean_r, mean_g, mean_b = (float(m) for m in px.mean(axis=0)) if n_pixels else (
        0.0, 0.0, 0.0)
    return {
        "width": width,
        "height": height,
        "n_pixels": n_pixels,
        "mean_r": mean_r,
        "mean_g": mean_g,
        "mean_b": mean_b,
        "luma": 0.299 * mean_r + 0.587 * mean_g + 0.114 * mean_b,
    }


def decode_media(content: bytes, media_type: str):
    """Codec dispatch. ``audio/wav`` (stdlib RIFF/PCM) and ``image/ppm``
    (Netpbm P6) decode for real; other media types need codec libraries
    (PIL/ffmpeg) not present in this image and keep the
    NotImplementedError seam."""
    if media_type in ("audio/wav", "audio/x-wav", "audio/wave"):
        return decode_wav(content)
    if media_type in ("image/ppm", "image/x-portable-pixmap"):
        return decode_ppm(content)
    raise NotImplementedError(
        f"decoding {media_type} requires codec libraries (PIL/ffmpeg) not "
        "present in this environment; extract_features uses a "
        "deterministic stub for such types"
    )


def wav_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL feature extraction for ``audio/wav`` payloads:
    the same mapInPandas shape as ``extract_features``, but the codec
    step is the genuine RIFF/PCM decode. Rows whose media_type is not a
    WAV variant are passed through with null features (schema-stable;
    filter on ``channels IS NOT NULL`` downstream)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        wav_types = {"audio/wav", "audio/x-wav", "audio/wave"}
        for pdf in batches:
            out = {
                "doc_id": pdf[id_col],
                "channels": [], "sample_rate": [], "n_frames": [],
                "duration_ms": [], "peak": [], "rms": [],
            }
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                if mt in wav_types:
                    d = decode_media(bytes(content), mt)
                else:
                    d = dict.fromkeys(
                        ("channels", "sample_rate", "n_frames",
                         "duration_ms", "peak", "rms")
                    )
                for k in ("channels", "sample_rate", "n_frames",
                          "duration_ms", "peak", "rms"):
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return media.mapInPandas(featurize, schema=WAV_FEATURE_SCHEMA)


IMAGE_FEATURE_SCHEMA = (
    "doc_id bigint, width int, height int, n_pixels bigint, "
    "mean_r double, mean_g double, mean_b double, luma double"
)


def image_features(media: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Arrow-batched REAL feature extraction for ``image/ppm`` payloads —
    same mapInPandas shape as ``wav_features``, codec step is the
    genuine Netpbm P6 parse. Non-image rows pass through with null
    features (schema-stable)."""

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ppm_types = {"image/ppm", "image/x-portable-pixmap"}
        keys = ("width", "height", "n_pixels", "mean_r", "mean_g", "mean_b", "luma")
        for pdf in batches:
            out: dict[str, list] = {"doc_id": pdf[id_col]}
            out.update({k: [] for k in keys})
            for content, mt in zip(pdf["content"], pdf["media_type"]):
                d = (
                    decode_media(bytes(content), mt)
                    if mt in ppm_types
                    else dict.fromkeys(keys)
                )
                for k in keys:
                    out[k].append(d[k])
            yield pd.DataFrame(out)

    return media.mapInPandas(featurize, schema=IMAGE_FEATURE_SCHEMA)


def synth_ppm_table(documents: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic synthetic P6 payloads keyed off the doc id — the
    image-side analog of ``to_binary_table``: real PPM bytes (header +
    interleaved RGB plane) whose pixel values follow a pinned integer
    recurrence, so an oracle can compute the decoded features
    arithmetically and the encode->decode round trip through the REAL
    parser is fully checkable. Byte k of doc d's plane is
    (d*7 + k*11) % 256; width = 1 + d%4, height = 1 + d%3."""

    def synth(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        import numpy as np

        for pdf in batches:
            payloads = []
            for d in pdf[id_col]:
                d = int(d)
                w, h = 1 + d % 4, 1 + d % 3
                k = np.arange(3 * w * h, dtype=np.int64)
                plane = ((d * 7 + k * 11) % 256).astype(np.uint8).tobytes()
                payloads.append(b"P6\n# synthetic\n%d %d\n255\n" % (w, h) + plane)
            yield pd.DataFrame(
                {
                    "doc_id": pdf[id_col],
                    "content": payloads,
                    "media_type": ["image/ppm"] * len(payloads),
                }
            )

    return documents.select(id_col).mapInPandas(
        synth, schema="doc_id bigint, content binary, media_type string"
    )


def extract_features(media: DataFrame, batch_size_hint: int = 1024) -> DataFrame:
    """Arrow-batched feature extraction over binary payloads.

    mapInPandas keeps payloads columnar end-to-end (no per-row pickling)
    and is the exact call shape a real image/audio featurizer would use;
    the stub emits (n_bytes, first_byte) which the oracle can verify.
    """

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    # STUB features — a real decoder would call decode_media
                    "n_bytes": content.map(len).astype("int32"),
                    "first_byte": content.map(lambda b: b[0] if len(b) else -1).astype("int32"),
                    "media_type": pdf["media_type"],
                }
            )

    return media.mapInPandas(featurize, schema=FEATURE_SCHEMA)
