"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride through the engine as ``binary`` columns with a
metadata struct; decode / feature-extraction runs as Arrow-batched
``mapInPandas`` so the heavy per-item work is amortized per batch and
never crosses the driver.

The decode libraries (PIL/ffmpeg/librosa) are NOT in this image, so the
real decoders are import-gated stubs (NotImplementedError); the
deterministic fallback featurizer (byte histogram) keeps the Spark-side
plumbing — schema, partitioning, UDF signature, batch shape — real and
testable, per the build brief.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

FEATURE_SCHEMA = T.StructType(
    [
        T.StructField("id", T.LongType(), False),
        T.StructField("n_bytes", T.IntegerType(), False),
        T.StructField("features", T.ArrayType(T.DoubleType()), False),
    ]
)


def _decode_image(payload: bytes):  # pragma: no cover - env-gated
    try:
        from PIL import Image  # noqa: F401
    except ImportError as exc:
        raise NotImplementedError(
            "image decode requires PIL; not available in this image — "
            "byte_histogram_features is the deterministic stand-in"
        ) from exc
    raise NotImplementedError("real decode path: Image.open(BytesIO(payload))")


def byte_histogram(payload: bytes, bins: int = 16) -> list[float]:
    """Deterministic fake 'feature extraction': normalized byte histogram."""
    import numpy as np

    if not payload:
        return [0.0] * bins
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist = np.bincount(arr >> 4, minlength=bins).astype("float64")
    return (hist / hist.sum()).tolist()


def extract_features(
    df: DataFrame, id_col: str, payload_col: str, bins: int = 16
) -> DataFrame:
    """(id, payload binary) -> (id, n_bytes, features array<double>)."""
    src = df.select(F.col(id_col).alias("id"), F.col(payload_col).alias("payload"))

    def featurize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = [bytes(p) if p is not None else b"" for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "id": pdf["id"].astype("int64"),
                    "n_bytes": [len(p) for p in payloads],
                    "features": [byte_histogram(p, bins) for p in payloads],
                }
            )

    return src.mapInPandas(featurize, schema=FEATURE_SCHEMA)
