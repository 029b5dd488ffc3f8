"""Span-level precision/recall evaluation.

The reference's test harness compares predicted vs gold labels per token
and prints a classification report (``Styling/src/cli.py:169-198``).
This is the same harness as a distributed operator: join predicted and
gold span tables on their identity, roll up true/false positives and
negatives per label, and emit per-label + micro-average P/R/F1 rows.
Used for regression-grading any labeler variant against gold (or
against another variant — the agreement diff M9 is the two-way case).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

DEFAULT_KEYS = ["url", "group", "label", "own_name"]


def span_pr_report(
    pred: DataFrame, gold: DataFrame, keys: list[str] | None = None
) -> DataFrame:
    """-> (label, tp, fp, fn, precision, recall, f1) + a ``__micro__``
    row aggregating over all labels. Exact-match semantics on ``keys``
    (cli.py:169-177 compares per-token labels; span identity is our
    granularity — FIXTURES.md §6)."""
    keys = keys or DEFAULT_KEYS
    p = pred.select(*keys).distinct().withColumn("_p", F.lit(1))
    g = gold.select(*keys).distinct().withColumn("_g", F.lit(1))
    # null-safe key equality: an unnamed span (own_name NULL) on both
    # sides is a true positive, not a simultaneous fp+fn
    cond = [p[k].eqNullSafe(g[k]) for k in keys]
    j = p.join(g, cond, "full_outer").select(
        F.coalesce(p["label"], g["label"]).alias("label"),
        p["_p"].alias("_p"),
        g["_g"].alias("_g"),
    )

    per = j.groupBy("label").agg(
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("tp"),
        F.sum(F.when(F.col("_p").isNotNull() & F.col("_g").isNull(), 1).otherwise(0)).alias("fp"),
        F.sum(F.when(F.col("_p").isNull() & F.col("_g").isNotNull(), 1).otherwise(0)).alias("fn"),
    )
    micro = per.groupBy(F.lit("__micro__").alias("label")).agg(
        F.sum("tp").alias("tp"), F.sum("fp").alias("fp"), F.sum("fn").alias("fn")
    )
    out = per.unionByName(micro)
    prec = F.when(F.col("tp") + F.col("fp") > 0, F.col("tp") / (F.col("tp") + F.col("fp"))).otherwise(F.lit(0.0))
    rec = F.when(F.col("tp") + F.col("fn") > 0, F.col("tp") / (F.col("tp") + F.col("fn"))).otherwise(F.lit(0.0))
    return (
        out.withColumn("precision", F.round(prec, 6))
        .withColumn("recall", F.round(rec, 6))
        .withColumn(
            "f1",
            F.round(
                F.when(
                    F.col("precision") + F.col("recall") > 0,
                    2 * F.col("precision") * F.col("recall") / (F.col("precision") + F.col("recall")),
                ).otherwise(F.lit(0.0)),
                6,
            ),
        )
        .orderBy("label")
    )
