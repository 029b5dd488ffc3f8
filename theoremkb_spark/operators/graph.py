"""Connected components as iterative DataFrame joins.

GraphFrames is not on the classpath (import-gated), so the default is a
minimum-label-propagation loop: every vertex repeatedly adopts the
smallest component id among itself and its neighbours. Converges in
O(diameter) rounds — alias clusters here are stars (diameter 2), so 2-3
rounds in practice. ``localCheckpoint`` every round breaks lineage so the
plan does not grow exponentially (SURVEY §7.4.5).

Replaces the reference's driver-side dict/union-find canonicalization
(citation dictionary, Styling/tools/theoremdb/db.py:13-26) with a fully
distributed equivalent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _driver_cc(edge_rows) -> list[tuple[str, str]]:
    """Union-find on the driver for small graphs (same semantics as the
    distributed loop; avoids ~6 tiny Spark jobs of pure scheduling
    overhead when the edge set is dictionary-sized)."""
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return sorted((v, find(v)) for v in list(parent))


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    driver_threshold: int = 100_000,
) -> DataFrame:
    """edges(src, dst) -> (id, component); component = min id in cluster.

    Deterministic: component ids are data values (lexicographic min),
    never generated ids. Graphs under `driver_threshold` edges are
    solved with a driver-side union-find (identical result, none of the
    per-iteration job overhead); larger graphs run the distributed
    min-label-propagation loop.
    """
    raw = edges.selectExpr(f"{src} as id", f"{dst} as nbr").filter(
        F.col("id") != F.col("nbr")
    )

    if driver_threshold > 0:
        # union-find dedups and symmetrizes for free — collect the raw
        # edge list without paying a distinct shuffle first
        sample = raw.limit(driver_threshold + 1).collect()
        if len(sample) <= driver_threshold:
            spark = edges.sparkSession
            return spark.createDataFrame(
                _driver_cc([(r.id, r.nbr) for r in sample]) or [("", "")],
                "id string, component string",
            ).filter(F.col("id") != "")

    sym = raw.unionByName(
        edges.selectExpr(f"{dst} as id", f"{src} as nbr")
    )
    sym = sym.filter(F.col("id") != F.col("nbr")).distinct()

    sym = sym.localCheckpoint()

    comp = (
        sym.select("id")
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )

    changed = 0
    for _ in range(max_iter):
        # candidate = min(own component, min over neighbours' components)
        nbr_comp = comp.select(
            F.col("id").alias("nbr"), F.col("component").alias("_nc")
        )
        nbr_min = (
            sym.join(nbr_comp, "nbr", "inner")
            .groupBy("id")
            .agg(F.min("_nc").alias("nbr_component"))
        )
        updated = (
            comp.join(nbr_min, "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.coalesce(F.col("nbr_component"), F.col("component")) < F.col("component"))
                .cast("long")
                .alias("_changed"),
            )
        )
        changed = updated.agg(F.sum("_changed")).first()[0] or 0
        comp = updated.drop("_changed").localCheckpoint()
        if changed == 0:
            break
    if changed:
        # silent non-convergence would be a wrong result for general
        # graphs (alias clusters here are stars — diameter 2 — but this
        # operator is reusable); surface it loudly.
        import warnings

        warnings.warn(
            f"connected_components did not converge in {max_iter} iterations "
            f"({changed} labels still changing); results may be incorrect — "
            "raise max_iter for graphs of larger diameter",
            RuntimeWarning,
            stacklevel=2,
        )
    return comp
