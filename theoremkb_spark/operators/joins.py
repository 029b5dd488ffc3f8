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
