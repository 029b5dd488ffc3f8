"""Per-token ML feature frame — the ``tokens -> features`` stage.

Re-expresses the reference's feature pipeline
(``Styling/src/lib/paper/features.py:82-178``) as pure DataFrame
operations over the long token table:

* hierarchy roll-ups (STEP 2 / A1-A3): per-line and per-block
  count/min/max/mean/std aggregates of the numeric token columns,
  attached to every token — all windows partition by a url-prefixed
  key, so Catalyst plans ONE url-hash Exchange and per-partition sorts;
* context deltas (STEP 3 / W1-W2): prev/next geometry differences in
  reading order (lag/lead);
* per-document standardization (STEP 4 ``_standardize``): z-score of
  the token width over the document.

Cross-engine float discipline (the DuckDB oracle must reproduce every
value bit-for-bit): width/geometry values carry <= 2 decimals, so all
SUMS run through DECIMAL (exact); mean/variance are then scalar double
expressions over exact inputs — identical IEEE ops on identical inputs
on both engines. stddev uses the explicit sum-of-squares formula
instead of engine-native stddev_samp (whose accumulation order is
engine-dependent), with the n==1 case pinned to 0 (the reference's
``.fillna(0)``).

Everything is JVM expressions — no Python in the path. This frame is
the input surface for learned sequence models (M1/M2):
``theoremkb_spark.ml`` trains on exactly these columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

ORDER = ["page", "block", "line", "word"]


def _r(col, nd: int = 6):
    return F.round(col, nd)


def _sum_stats(col, w):
    """(n, sum, sum-of-squares) over window ``w`` with exact DECIMAL
    accumulation, returned as doubles."""
    d = col.cast("decimal(18,2)")
    n = F.count(F.lit(1)).over(w)
    s = F.sum(d).over(w).cast("double")
    s2 = F.sum(d * d).over(w).cast("double")
    return n, s, s2


def _std_expr(n, s, s2):
    """Sample stddev from exact sums; 0 when n <= 1."""
    var = (s2 - s * s / n) / (n - 1)
    return F.when(n > 1, F.sqrt(F.greatest(var, F.lit(0.0)))).otherwise(F.lit(0.0))


def token_features(tokens: DataFrame) -> DataFrame:
    """Long token table -> per-token feature row (keys + features).

    One shuffle: every window partitions by url (or a url-prefixed
    hierarchy key), so the plan is a single url-hash Exchange plus
    within-partition sorts — at cluster scale, the partitioning the
    extract stage already produced.
    """
    line_w = Window.partitionBy("url", "page", "block", "line")
    block_w = Window.partitionBy("url", "page", "block")
    doc_w = Window.partitionBy("url")
    seq_w = Window.partitionBy("url").orderBy(*ORDER)

    right = F.col("hpos") + F.col("width")

    ln, ls, ls2 = _sum_stats(F.col("width"), line_w)
    bn, bs, _ = _sum_stats(F.col("width"), block_w)
    dn, ds, ds2 = _sum_stats(F.col("width"), doc_w)
    doc_std = _std_expr(dn, ds, ds2)

    out = (
        tokens.withColumn("line_n_tokens", ln)
        .withColumn("line_hpos_min", _r(F.min("hpos").over(line_w)))
        .withColumn("line_right_max", _r(F.max(right).over(line_w)))
        .withColumn("line_w_mean", _r(ls / ln))
        .withColumn("line_w_std", _r(_std_expr(ln, ls, ls2)))
        .withColumn("block_n_tokens", bn)
        .withColumn(
            "block_n_lines",
            (F.max("line").over(block_w) - F.min("line").over(block_w) + F.lit(1)).cast(
                "long"
            ),
        )
        .withColumn("block_w_mean", _r(bs / bn))
        .withColumn("is_line_first", (F.col("word") == 0))
        .withColumn("is_line_last", (F.col("word") == F.max("word").over(line_w)))
        .withColumn("dv_prev", _r(F.col("vpos") - F.lag("vpos").over(seq_w)))
        .withColumn("dh_next", _r(F.lead("hpos").over(seq_w) - right))
        .withColumn(
            "width_z",
            F.round(
                F.when(doc_std == 0.0, F.lit(0.0)).otherwise(
                    (F.col("width") - ds / dn) / doc_std
                ),
                4,
            ),
        )
    )
    return out.select(
        "url",
        *ORDER,
        "line_n_tokens",
        "line_hpos_min",
        "line_right_max",
        "line_w_mean",
        "line_w_std",
        "block_n_tokens",
        "block_n_lines",
        "block_w_mean",
        "is_line_first",
        "is_line_last",
        "dv_prev",
        "dh_next",
        "width_z",
    )
