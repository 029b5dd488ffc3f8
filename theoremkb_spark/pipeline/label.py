"""Stage 2 — LABEL: token stream -> (label, group) result spans.

Two interchangeable implementations of the same frozen semantics (the
reference's naive rule extractor, ``Styling/src/lib/extractors/results/
naive_extractor.py:20-55``, and its BIO-decode group numbering,
``extractors/crf.py:113-131``):

* ``label_tokens`` — pure DataFrame/window functions, fully JVM-side
  (whole-stage codegen, zero Python): the production path.
* ``label_tokens_arrow`` — ``applyInPandas`` grouped by url, the
  Arrow-batched sequence-inference pattern of the north star (model
  loaded once per executor; here the "model" is the deterministic rule
  scorer — CRF apply-parity is the gate, not train-parity, SURVEY §2.9 M2).

Span-open rule: a line-initial token whose word-pattern (get_pattern,
misc/__init__.py:32-43) is a result label and whose font is bold or
italic opens a span; a block-initial line that does not open closes the
current span. Group = running count of opens per document in reading
order — derived from ordinal windows, never monotonically_increasing_id
(SURVEY §7.4.3).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import RESULT_LABELS

ORDER = ["page", "block", "line", "word"]


def _pattern_col(col):
    """get_pattern as JVM expressions: strip non-alnum, digits->@, lower."""
    return F.lower(
        F.regexp_replace(F.regexp_replace(col, r"[^a-zA-Z0-9 ]", ""), r"[0-9]", "@")
    )


def label_tokens(tokens: DataFrame) -> DataFrame:
    """Window-function labeler. One shuffle (hash by url), then two
    running windows over the same sort — Catalyst collapses them into a
    single Window node."""
    w = Window.partitionBy("url").orderBy(*ORDER)
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)

    pattern = _pattern_col(F.col("text"))
    opens = (
        (F.col("word") == 0)
        & pattern.isin(*RESULT_LABELS)
        & (F.coalesce(F.col("bold"), F.lit(False)) | F.coalesce(F.col("italic"), F.lit(False)))
    )
    closes = (F.col("word") == 0) & (F.col("line") == 0)

    event = F.when(opens, F.concat(F.lit("open:"), pattern)).when(closes, F.lit("close"))
    state = F.last(event, ignorenulls=True).over(run)
    group_counter = F.sum(opens.cast("long")).over(run)

    return (
        tokens.withColumn("_state", state)
        .withColumn("_n", group_counter)
        .withColumn(
            "label",
            F.when(
                F.col("_state").startswith("open:"), F.substring(F.col("_state"), 6, 64)
            ).otherwise(F.lit("O")),
        )
        .withColumn(
            "group",
            F.when(F.col("label") == "O", F.lit(0)).otherwise(F.col("_n")),
        )
        .drop("_state", "_n")
    )


# --- Arrow-batched inference variant -------------------------------------

_MODEL = None  # loaded once per executor process (SURVEY §7.3)


def _get_model():
    """Stand-in for a broadcast CRF artifact: a deterministic sequence
    scorer implementing the same frozen rule semantics, vectorized over
    the whole document (the Arrow batch)."""
    global _MODEL
    if _MODEL is None:
        import re

        not_alnum = re.compile(r"[^a-zA-Z0-9 ]")
        digit = re.compile(r"[0-9]")
        labels = set(RESULT_LABELS)

        def predict(pdf: pd.DataFrame) -> pd.DataFrame:
            pdf = pdf.sort_values(ORDER, kind="mergesort").reset_index(drop=True)
            pat = (
                pdf["text"]
                .str.replace(not_alnum, "", regex=True)
                .str.replace(digit, "@", regex=True)
                .str.lower()
            )
            styled = pdf["bold"].fillna(False) | pdf["italic"].fillna(False)
            opens = (pdf["word"] == 0) & styled & pat.isin(labels)
            closes = (pdf["word"] == 0) & (pdf["line"] == 0)
            event = pd.Series(pd.NA, index=pdf.index, dtype="object")
            event[closes] = "O"
            event[opens] = pat[opens]
            label = event.ffill().fillna("O")
            group = opens.cumsum().astype("int64")
            pdf["label"] = label.where(label != "O", "O")
            pdf["group"] = group.where(label != "O", 0)
            return pdf

        _MODEL = predict
    return _MODEL


def label_tokens_arrow(tokens: DataFrame) -> DataFrame:
    """applyInPandas-by-url labeler: the CRF-style Arrow inference stage.

    Sequence semantics stay sequential-per-document inside the UDF
    (SURVEY §7.4.2); parallelism comes from document-level grouping.
    """
    from pyspark.sql import types as T

    # copy — StructType.add mutates in place, which would corrupt the
    # DataFrame's cached client-side schema
    out_schema = T.StructType(
        list(tokens.schema.fields)
        + [
            T.StructField("label", T.StringType(), False),
            T.StructField("group", T.LongType(), False),
        ]
    )

    def infer(pdf: pd.DataFrame) -> pd.DataFrame:
        return _get_model()(pdf)

    return tokens.groupBy("url").applyInPandas(infer, schema=out_schema)
