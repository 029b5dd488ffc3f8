"""Stage 4 — LINK: mention tags -> entity ids via the citation dictionary.

The dictionary join is the skew hot spot (one hot paper is cited by ~30%
of documents). Two physical strategies behind one logical operator:

* ``strategy="broadcast"`` (default): the dictionary is a dimension
  table — broadcast hash join, zero shuffle, skew-immune
  (SURVEY §2.3 J5).
* ``strategy="salted"``: for dictionaries too large to broadcast —
  deterministic salting via operators.joins.salted_join, with AQE skew
  join as the runtime backstop.

Unresolved tags degrade to ``unresolved:<tag>`` ids instead of dropping
rows (lineage must reconcile counts across stages, FIXTURES.md §8).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.joins import salted_join


def _resolve(df: DataFrame, dico: DataFrame, strategy: str, salt: int) -> DataFrame:
    """Left-join df(url, tag, ...) against dico(url, tag, pdf_to_canon)."""
    if strategy == "broadcast":
        return df.join(F.broadcast(dico), ["url", "tag"], "left")
    if strategy == "salted":
        return salted_join(df, dico, on=["url", "tag"], how="left", salt=salt)
    raise ValueError(f"unknown join strategy: {strategy}")


def link_extra_mentions(
    mentions: DataFrame, dico: DataFrame, strategy: str = "broadcast", salt: int = 8
) -> DataFrame:
    """extra-kind mention rows -> + resolved `target` column."""
    extra = mentions.filter(F.col("kind") == "extra").withColumn(
        "tag", F.col("ref_tag")
    )
    resolved = _resolve(extra, dico, strategy, salt)
    return resolved.withColumn(
        "target",
        F.coalesce(F.col("pdf_to_canon"), F.concat(F.lit("unresolved:"), F.col("tag"))),
    ).drop("pdf_to_canon", "tag")


def link_paper_citations(
    citations: DataFrame, dico: DataFrame, strategy: str = "broadcast", salt: int = 8
) -> DataFrame:
    """(url, tag) anchors -> (url, target)."""
    resolved = _resolve(citations, dico, strategy, salt)
    return resolved.select(
        "url",
        F.coalesce(
            F.col("pdf_to_canon"), F.concat(F.lit("unresolved:"), F.col("tag"))
        ).alias("target"),
    )
