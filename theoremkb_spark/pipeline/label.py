"""Stage 2 — LABEL: token stream -> (label, group) result spans.

Two interchangeable implementations of the same frozen semantics (the
reference's naive rule extractor, ``Styling/src/lib/extractors/results/
naive_extractor.py:20-55``, and its BIO-decode group numbering,
``extractors/crf.py:113-131``):

* ``label_tokens`` — pure DataFrame/window functions, fully JVM-side
  (whole-stage codegen, zero Python): the cross-check path.
* ``label_tokens_arrow`` — ``applyInPandas`` grouped by url, the
  Arrow-batched sequence-inference pattern of the north star (model
  loaded once per executor; here the "model" is the deterministic rule
  scorer — CRF apply-parity is the gate, not train-parity, SURVEY §2.9 M2).

The PRODUCTION path fuses this labeling into the extract Arrow pass
(``extract.extract_spans``) so the token stream never crosses a shuffle;
all three implementations are tested to emit identical spans/triples.

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

_MODEL_CACHE: dict = {}  # one model per (executor process, artifact)


def export_model_artifact(path: str) -> None:
    """Write the sequence-labeler parameters as a JSON artifact — the
    shippable stand-in for a trained CRF file. On a cluster the artifact
    travels via ``spark.sparkContext.addFile(path)`` / ``spark-submit
    --files`` and every executor loads it exactly once (M1 pattern,
    SURVEY §2.9); a pickled sklearn-crfsuite model would ship the same
    way (apply-parity is the gate, not train-parity — M2)."""
    import json

    with open(path, "w") as f:
        json.dump(
            {
                "kind": "rule-sequence-labeler",
                "version": 1,
                "result_labels": list(RESULT_LABELS),
                "require_style": ["bold", "italic"],
            },
            f,
        )


def _resolve_artifact(name: str) -> str:
    """Absolute path, or a name registered through SparkContext.addFile
    (resolved per-executor via SparkFiles)."""
    import os

    if os.path.exists(name):
        return name
    from pyspark import SparkFiles

    return SparkFiles.get(name)


def _get_model(artifact: str | None = None):
    """Per-executor-memoized sequence scorer.

    Three artifact kinds behind one interface (predict: pdf -> pdf with
    label/group), each loaded ONCE per executor process (M1):

    * ``None`` — the builtin deterministic rule scorer;
    * ``*.json`` — rule parameters (label vocabulary) from a shipped file;
    * ``*.pkl`` — a TRAINED linear-chain sequence model
      (ml/crf.py ChainPerceptron): featurize, Viterbi-tag, BIO-decode to
      (label, group) exactly as the reference CRF apply does
      (Styling/src/lib/extractors/crf.py:89-132).
    """
    key = artifact or "__builtin__"
    if key not in _MODEL_CACHE:
        import re

        if artifact is not None and artifact.endswith(".pkl"):
            import numpy as np

            from ..ml.crf import decode_bio, load_artifact, predict_tags

            ml_model = load_artifact(_resolve_artifact(artifact))

            def predict_ml(pdf: pd.DataFrame) -> pd.DataFrame:
                pdf = pdf.sort_values(ORDER, kind="mergesort").reset_index(drop=True)
                tags = predict_tags(
                    ml_model,
                    pdf["text"].tolist(),
                    pdf["bold"].fillna(False).tolist(),
                    pdf["italic"].fillna(False).tolist(),
                    pdf["word"].tolist(),
                    pdf["line"].tolist(),
                    pdf["block"].tolist(),
                )
                labels, groups = decode_bio(tags)
                pdf["label"] = labels
                pdf["group"] = np.asarray(groups, dtype="int64")
                return pdf

            _MODEL_CACHE[key] = predict_ml
            return _MODEL_CACHE[key]

        if artifact is not None:
            import json

            with open(_resolve_artifact(artifact)) as f:
                params = json.load(f)
            labels = set(params["result_labels"])
        else:
            labels = set(RESULT_LABELS)

        not_alnum = re.compile(r"[^a-zA-Z0-9 ]")
        digit = re.compile(r"[0-9]")

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

        _MODEL_CACHE[key] = predict
    return _MODEL_CACHE[key]


def label_tokens_arrow(tokens: DataFrame, model_file: str | None = None) -> DataFrame:
    """applyInPandas-by-url labeler: the CRF-style Arrow inference stage.

    Sequence semantics stay sequential-per-document inside the UDF
    (SURVEY §7.4.2); parallelism comes from document-level grouping.
    ``model_file``: artifact name registered via ``sc.addFile`` (or an
    absolute path) — loaded once per executor, memoized across batches.
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
        return _get_model(model_file)(pdf)

    return tokens.groupBy("url").applyInPandas(infer, schema=out_schema)
