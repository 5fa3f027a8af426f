"""Multimodal column plumbing: images/audio/video as opaque binary
columns with typed metadata.

The decode step itself is STUBBED (image/audio libraries are not in
this container): `decode_image_meta` tries Pillow and otherwise derives
deterministic fake dimensions from the bytes, so the Spark-side
plumbing — schema, partition-preserving mapInPandas, Arrow batch shape —
is real and tested while the codec is swappable.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_META_SCHEMA = (
    "doc_id long, n_bytes int, sha256_prefix string, width int, height int, codec string"
)


def attach_binary(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic fake media bytes: the utf-8 text itself. In
    production this column comes from the lake (parquet BINARY)."""
    return df.withColumn("media", F.col(text_col).cast("binary"))


def _decode_one(buf: bytes) -> tuple[int, int, str]:
    try:  # real decoder if available
        import io

        from PIL import Image  # noqa: PLC0415

        img = Image.open(io.BytesIO(buf))
        return img.width, img.height, img.format or "unknown"
    except Exception:
        # deterministic fake: dims derived from content hash
        h = hashlib.sha256(buf).digest()
        return 64 + h[0] % 192, 64 + h[1] % 192, "stub"


def decode_image_meta(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """mapInPandas over (id, media): emits typed metadata per blob.
    Partition-preserving, Arrow-batched; the per-blob Python is the
    decode itself (unavoidable for codecs)."""

    def op(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = []
            for buf in pdf["media"]:
                b = bytes(buf) if buf is not None else b""
                w, h, codec = _decode_one(b)
                metas.append(
                    (
                        len(b),
                        hashlib.sha256(b).hexdigest()[:16],
                        w,
                        h,
                        codec,
                    )
                )
            meta = pd.DataFrame(
                metas, columns=["n_bytes", "sha256_prefix", "width", "height", "codec"]
            )
            yield pd.concat(
                [pdf[[id_col]].reset_index(drop=True), meta], axis=1
            )

    return df.select(id_col, "media").mapInPandas(op, schema=MEDIA_META_SCHEMA)
