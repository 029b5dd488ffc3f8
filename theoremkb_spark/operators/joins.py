"""Skew-mitigated joins.

The citation-dictionary join (SURVEY §2.3 J5) has hot keys by
construction — one highly-cited paper can appear in a large fraction of
mention rows. When the dimension side fits in memory we broadcast (no
shuffle, skew-immune). When it does not, ``salted_join`` spreads each hot
key over ``salt`` shuffle partitions: the fact side gets a random-but-
deterministic salt from its row content, the dimension side is exploded
x ``salt``. AQE skew-join stays on as belt-and-braces (session.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    ts: str = "ts",
    right_cols: list[str] | None = None,
    suffix: str = "_r",
) -> DataFrame:
    """As-of join: each left row picks the LATEST right row with
    ``right.ts <= left.ts`` within the same ``on`` key (left join — rows
    with no prior right row keep nulls).

    Spark has no native as-of join; the naive range join explodes
    quadratically per key. This is the scalable union+window form: tag
    both sides, union, and forward-fill the right side's payload with
    ``last(..., ignorenulls)`` over (key, ts, side) — ONE shuffle on the
    key, linear work per row, no pair enumeration. Ties on ts resolve
    inclusively (a right row at exactly left.ts matches), matching
    DuckDB/pandas ``ASOF JOIN`` semantics.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, ts)]
    from pyspark.sql import Window

    l_tag = left.withColumn("_side", F.lit(1))
    r_tag = right.select(
        F.col(on),
        F.col(ts),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_cols],
    ).withColumn("_side", F.lit(0))
    for c in left.columns:
        if c not in (on, ts) and c not in r_tag.columns:
            r_tag = r_tag.withColumn(c, F.lit(None))
    for c in r_tag.columns:
        if c not in l_tag.columns:
            l_tag = l_tag.withColumn(c, F.lit(None))

    unioned = l_tag.unionByName(r_tag.select(*l_tag.columns))
    # side=0 sorts before side=1 at equal ts -> inclusive match; the
    # right payload columns break ties among right rows sharing
    # (key, ts), so the winner is deterministic (max payload tuple)
    # instead of partition-order luck
    w = (
        Window.partitionBy(on)
        .orderBy(
            F.col(ts).asc(),
            F.col("_side").asc(),
            *[F.col(f"{c}{suffix}").asc_nulls_first() for c in right_cols],
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # forward-fill ONE struct of the whole right payload, not each column
    # independently: a matched right row with a NULL in one payload column
    # must yield that NULL, not a back-fill from an older right row (the
    # per-column form fabricated rows mixing columns of different matches)
    payload = F.when(
        F.col("_side") == 0,
        F.struct(*[F.col(f"{c}{suffix}").alias(c) for c in right_cols]),
    )
    filled = unioned.select(
        *[c for c in l_tag.columns if not c.endswith(suffix) and c != "_side"],
        F.col("_side"),
        F.last(payload, ignorenulls=True).over(w).alias("_rpay"),
    )
    return (
        filled.filter(F.col("_side") == 1)
        .select(
            *[c for c in l_tag.columns if not c.endswith(suffix) and c != "_side"],
            *[F.col(f"_rpay.{c}").alias(f"{c}{suffix}") for c in right_cols],
        )
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    on: list[str],
    how: str = "left",
    salt: int = 8,
) -> DataFrame:
    """Equi-join fact with dim on `on`, salting the key to defeat skew.

    The salt on the fact side is derived from xxhash64 of all fact
    columns (deterministic, no rand()); the dim side is exploded `salt`
    times. Result columns = fact columns + dim's non-key columns.
    """
    fact_cols = fact.columns
    dim_extra = [c for c in dim.columns if c not in on]

    salted_fact = fact.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in fact_cols]), F.lit(salt))
    )
    salted_dim = dim.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    joined = salted_fact.join(salted_dim, on=on + ["_salt"], how=how)
    return joined.select(*fact_cols, *dim_extra)
