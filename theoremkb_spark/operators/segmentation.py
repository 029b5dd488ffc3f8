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
import pyspark.sql.functions as F
import pyspark.sql.types as T
from pyspark.sql import DataFrame, Window

SEG_SCHEMA = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("page", T.IntegerType(), False),
        T.StructField("block", T.IntegerType(), False),
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
    """tokens (extract.TOKEN_SCHEMA) -> (url, page, block, line, word,
    seg_class) with seg_class in {0 background, 1 result-statement,
    2 proof} from the shipped U-Net's box vote. (block rides along
    because line/word numbering restarts per block — (page, line, word)
    alone does not key a token.)"""
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
                "block": pdf["block"].to_numpy(),
                "line": pdf["line"].to_numpy(),
                "word": pdf["word"].to_numpy(),
                "seg_class": np.asarray(cls, dtype=np.int32),
            }
        )

    cols = ["url", "page", "block", "line", "word", "text",
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


def segments_to_spans(seg: DataFrame) -> DataFrame:
    """Per-token classes -> contiguous annotation spans, the reference's
    ``_labels_to_annots`` completion (cnn.py:113-126: successive tokens
    of one predicted class merge into one annotation box).

    Gaps-islands in ONE pass: a lag-based boundary flag and its running
    sum share the (url, page) window partitioning, and the final rollup
    groups on a superset of the same keys, so the whole operator adds
    exactly ONE exchange on top of its input (the window's — grouped-
    Pandas output does not advertise partitioning, so Catalyst cannot
    prove segment_tokens' identical hash reusable; the aggregate itself
    adds none). Background (class 0) is dropped after numbering so
    island ids stay aligned with the token stream.

    Reading order is (block, line, word) — line/word numbering restarts
    per block, so ordering by line alone would interleave blocks.
    Returns (url, page, seg_class, block_start, line_start, word_start,
    block_end, line_end, word_end, n_tokens); spans may cross block
    boundaries (a proof spans multiple paragraphs)."""
    w = Window.partitionBy("url", "page").orderBy("block", "line", "word")
    is_new = (
        F.col("seg_class") != F.lag("seg_class").over(w)
    ) | F.lag("seg_class").over(w).isNull()
    return (
        seg.withColumn("_isl", F.sum(is_new.cast("int")).over(w))
        .filter(F.col("seg_class") != 0)
        .groupBy("url", "page", "seg_class", "_isl")
        .agg(
            F.min(F.struct("block", "line", "word")).alias("_s"),
            F.max(F.struct("block", "line", "word")).alias("_e"),
            F.count(F.lit(1)).alias("n_tokens"),
        )
        .select(
            "url",
            "page",
            "seg_class",
            F.col("_s.block").alias("block_start"),
            F.col("_s.line").alias("line_start"),
            F.col("_s.word").alias("word_start"),
            F.col("_e.block").alias("block_end"),
            F.col("_e.line").alias("line_end"),
            F.col("_e.word").alias("word_end"),
            "n_tokens",
        )
    )
