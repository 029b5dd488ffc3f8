"""Distributed U-Net page-segmentation inference.

The reference applies its trained CNN *inside* the extraction pipeline
(reference ``Styling/src/lib/extractors/cnn.py:96-126``,
``CNNExtractor.apply``: render the page, forward the net, vote each
token's class over its box pixels). This module is that stage over a
token DataFrame:

- ``applyInPandas`` grouped by ``(url, page)`` — pages are independent,
  so parallelism is the page count and no page's raster ever crosses an
  executor boundary; there is exactly ONE shuffle (the group-by hash of
  the token table on (url, page)), and at cluster scale that exchange
  is the minimum any page-local computation needs.
- the raster is ``ml.unet.rasterize_page`` — the SAME function the
  trainer consumes, so training and inference cannot drift.
- the shipped weights (ml/artifacts/unet_full.npz, ~1 MB) ride to
  executors once via ``SparkContext.broadcast`` and are rebuilt into a
  net once per python worker (module cache), never per task and never
  re-read from a driver-local path executors may not share.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
import pyspark.sql.types as T
from pyspark.sql import DataFrame

SEG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("line", T.IntegerType(), False),
        T.StructField("word", T.IntegerType(), False),
        T.StructField("seg_class", T.IntegerType(), False),
    ]
)

# one rebuilt net per (python worker, artifact identity)
_NET_CACHE: dict = {}


def default_weights_path() -> str:
    from .. import ml

    return os.path.join(os.path.dirname(ml.__file__), "artifacts", "unet_full.npz")


def segment_tokens(tokens: DataFrame, weights_path: str | None = None) -> DataFrame:
    """tokens (extract.TOKEN_SCHEMA) -> (url, page, line, word,
    seg_class) with seg_class in {0 background, 1 result-statement,
    2 proof} from the shipped U-Net's box vote."""
    spark = tokens.sparkSession
    path = weights_path or default_weights_path()
    with np.load(path) as z:
        arrs = [z[k] for k in sorted(z.files)]
    bc = spark.sparkContext.broadcast(arrs)
    cache_key = (path, os.path.getmtime(path))

    def run(pdf: pd.DataFrame) -> pd.DataFrame:
        from ..functions.text import RESULT_LABELS, get_pattern
        from ..ml.unet import net_from_params, rasterize_page, vote_decode

        net = _NET_CACHE.get(cache_key)
        if net is None:
            net = _NET_CACHE[cache_key] = net_from_params(bc.value)
        label_set = frozenset(RESULT_LABELS)
        # TOKEN_SCHEMA marks these nullable; a null must degrade to the
        # empty box / plain style, never crash (int(nan)) or silently
        # set a channel (bool(nan) is True)
        pdf = pdf.fillna(
            {"hpos": 0.0, "vpos": 0.0, "width": 0.0, "height": 0.0,
             "bold": False, "italic": False, "text": ""}
        )
        pats = [get_pattern(t) for t in pdf["text"]]
        geom = [
            (x, y, w, h, bool(b), bool(it), p in label_set, p == "proof")
            for x, y, w, h, b, it, p in zip(
                pdf["hpos"], pdf["vpos"], pdf["width"], pdf["height"],
                pdf["bold"], pdf["italic"], pats,
            )
        ]
        img, boxes = rasterize_page(geom)
        cls = vote_decode(net.forward(img[None])[0], boxes)
        return pd.DataFrame(
            {
                "url": pdf["url"].to_numpy(),
                "page": pdf["page"].to_numpy(),
                "line": pdf["line"].to_numpy(),
                "word": pdf["word"].to_numpy(),
                "seg_class": np.asarray(cls, dtype=np.int32),
            }
        )

    cols = ["url", "page", "line", "word", "text",
            "hpos", "vpos", "width", "height", "bold", "italic"]
    # explicit REPARTITION_BY_NUM on the group keys: the stage is
    # CPU-bound (~37 ms/page forward) on BYTE-tiny data, so AQE's
    # post-shuffle coalesce folds an ENSURE_REQUIREMENTS exchange to ~1
    # partition and serializes every page onto one core (measured 12 s
    # for 275 pages at 16 cores; 2.1 s with the pinned width). The
    # group-by reuses this partitioning — still exactly one exchange.
    npart = spark.sparkContext.defaultParallelism
    return (
        tokens.select(*cols)
        .repartition(npart, "url", "page")
        .groupBy("url", "page")
        .applyInPandas(run, SEG_SCHEMA)
    )
