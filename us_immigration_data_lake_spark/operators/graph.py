"""Graph operators over edge-list DataFrames.

Connected components (min-label propagation) live in
operators/dedup.py where dedup clustering needs them; this module
holds the counting-shaped graph ops.

Triangle counting — the standard two-join formulation over a
CANONICALIZED edge list (src < dst, distinct): a triangle a<b<c is
found exactly once as edges (a,b), (b,c), (a,c), so no per-triangle
dedup pass is needed. Cost: one self-join on the shared endpoint plus
one membership join — both equi-joins that shuffle on node ids. This
is the plan GraphX/GraphFrames lower to as well; the quadratic risk
is high-degree hubs (a node of degree d contributes O(d²) wedge
candidates), capped here the same way basket.py caps group size:
``max_degree`` drops hub nodes' edges before the join, a declared
semantic for the adversarial tail, not silent truncation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def canonical_edges(
    df: DataFrame, src: str, dst: str, max_degree: int | None = None
) -> DataFrame:
    """Undirected edge list → canonical (a < b) distinct edges, with
    self-loops dropped and optional hub capping."""
    e = (
        df.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .filter(F.col("a") < F.col("b"))
        .distinct()
    )
    if max_degree is not None:
        deg = (
            e.select(F.explode(F.array("a", "b")).alias("n"))
            .groupBy("n")
            .agg(F.count(F.lit(1)).alias("__d"))
            .filter(F.col("__d") > max_degree)
            .select("n")
        )
        e = e.join(
            deg.select(F.col("n").alias("a")), "a", "left_anti"
        ).join(deg.select(F.col("n").alias("b")), "b", "left_anti")
    return e.select("a", "b")


def triangle_count(
    edges: DataFrame,
    src: str = "a",
    dst: str = "b",
) -> DataFrame:
    """Per-node triangle participation over a canonical (src<dst,
    distinct) edge list: (node, n_triangles). Nodes in no triangle
    emit nothing.

    Wedges (a,b)+(b,c) with a<b<c close into triangles via one
    membership join on (a,c); each triangle contributes exactly one
    (a,b,c) row, then explodes to its three corners for the count.
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    wedge = e.alias("x").join(
        e.select(
            F.col("a").alias("b"), F.col("b").alias("c")
        ).alias("y"),
        "b",
    )
    tri = wedge.join(
        e.select(F.col("a"), F.col("b").alias("c")).withColumn(
            "__closed", F.lit(1)
        ),
        ["a", "c"],
    )
    corners = tri.select(
        F.explode(F.array("a", "b", "c")).alias("node")
    )
    return corners.groupBy("node").agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles")
    )
