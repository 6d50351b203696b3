"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the warehouse as ``binary`` columns
with a media_type tag. The Spark-side contract — schema, partitioning,
Arrow batch shape through mapInPandas — is real and tested; the actual
codec step is STUBBED (decode libraries are not in this image): the
default feature extractor is a clearly-marked deterministic fake, and
``decode_media`` raises NotImplementedError so a real codec can be
dropped in behind the same signature.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEATURE_SCHEMA = "doc_id bigint, n_bytes int, first_byte int, media_type string"


def to_binary_table(documents: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """Adapter: a text table posing as a binary media table (utf-8
    payloads) so the plumbing is exercised end-to-end without codecs."""
    return documents.select(
        F.col(id_col),
        F.encode(F.col(text_col), "utf-8").alias("content"),
        F.lit("text/plain").alias("media_type"),
    )


def decode_media(content: bytes, media_type: str):
    """Real codec hook — intentionally unimplemented in this image."""
    raise NotImplementedError(
        "media decoding requires codec libraries (PIL/ffmpeg) not present "
        "in this environment; extract_features uses a deterministic stub"
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
