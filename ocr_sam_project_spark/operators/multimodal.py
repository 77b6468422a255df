"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns with typed metadata, processed by Arrow-batched stages.

The decode step itself is STUBBED (this container ships no image/audio
libraries): `decode_image` raises NotImplementedError unless
`fake=True`, in which case it derives small deterministic pseudo-features
from the bytes (so the Spark-side plumbing — schema, batching, partitioning,
UDF signatures — is real and fully tested).

At scale these stages follow the same rules as extraction: narrow
mapInPandas over Arrow batches, binary column pruned everywhere it isn't
needed, no shuffle.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_FEATURES_SCHEMA = StructType(
    [
        StructField("media_id", StringType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("feature", ArrayType(DoubleType()), True),
        StructField("error", StringType(), True),
    ]
)

FEATURE_DIM = 8


def decode_image(data: bytes, fake: bool = False) -> dict:
    """STUB: a real deployment plugs Pillow/ffmpeg here.  fake=True returns
    deterministic pseudo-features derived from the byte content (md5-seeded)
    so tests exercise the full Arrow round-trip."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "environment; run with fake=True for deterministic pseudo-features"
        )
    h = hashlib.md5(data).digest()
    width = 1 + h[0] % 64
    height = 1 + h[1] % 64
    feature = [round(b / 255.0, 6) for b in h[:FEATURE_DIM]]
    return {"width": width, "height": height, "feature": feature}


def _feature_batches(batches: Iterator[pd.DataFrame], fake: bool) -> Iterator[pd.DataFrame]:
    for pdf in batches:
        out = []
        for mid, blob in zip(pdf["media_id"].tolist(), pdf["media"].tolist()):
            rec = {
                "media_id": mid,
                "n_bytes": len(blob) if blob is not None else 0,
                "digest": hashlib.md5(blob).hexdigest() if blob is not None else None,
                "width": None,
                "height": None,
                "feature": None,
                "error": None,
            }
            try:
                if blob:
                    d = decode_image(bytes(blob), fake=fake)
                    rec.update(d)
                else:
                    rec["error"] = "empty_media"
            except NotImplementedError as e:
                rec["error"] = f"decode_unavailable: {e}"
            except Exception as e:  # quarantine, never throw
                rec["error"] = f"decode_error: {e}"
            out.append(rec)
        if out:
            yield pd.DataFrame.from_records(out, columns=[f.name for f in MEDIA_FEATURES_SCHEMA.fields])


def media_features(df: DataFrame, id_col: str, media_col: str, fake: bool = True) -> DataFrame:
    """binary media column -> (n_bytes, digest, width, height, feature) via
    one narrow Arrow stage.  Input is column-pruned to (id, media) so no
    other payload rides through Python."""
    slim = df.select(
        F.col(id_col).cast("string").alias("media_id"), F.col(media_col).alias("media")
    )
    return slim.mapInPandas(lambda it: _feature_batches(it, fake), schema=MEDIA_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, id_col: str, n_frames_col: str, every_k: int = 30) -> DataFrame:
    """Video frame-sampling *plan* (pure metadata, native ops): one row per
    sampled frame index — the explode that precedes a per-frame decode stage.
    Demonstrates the 1->N multimodal explode without needing a codec."""
    return df.select(
        F.col(id_col).cast("string").alias("media_id"),
        F.explode(
            F.sequence(F.lit(0), F.greatest(F.col(n_frames_col) - 1, F.lit(0)), F.lit(every_k))
        ).alias("frame_idx"),
    )
