"""Iterative graph algorithms as DataFrame plans.

The reference has no graph surface; this extends the engine the same
way the dedup/ANN families do — label propagation / connected
components live in operators/curation (dedup_clusters); this module
adds damped PageRank, the canonical fixed-point join-agg iteration
(the GraphX/Pregel shape re-expressed as plain shuffles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: decimal grid every rank is quantized to after each update — the
#: same cross-engine determinism trick as kmeans_train (quantized
#: Lloyd's): quantized ranks make the per-iteration SUM an exact,
#: order-independent decimal sum, so an oracle replaying the same
#: recurrence lands on the identical values. A double can never sit
#: exactly on a half-point of a base-10 grid (no finite binary
#: expansion), so both engines' double→decimal rounding agrees.
RANK_DECIMAL = "decimal(18,12)"


def pagerank(edges: DataFrame, iterations: int = 3,
             damping: float = 0.85) -> DataFrame:
    """Damped PageRank over a directed edge list `(src, dst)`, run
    for a FIXED number of iterations (oracle-replayable, same policy
    as dedup_clusters' gate entry; convergence loops belong to the
    caller — each iteration is a plain DataFrame stage, so a
    while-change loop composes trivially).

    Plan shape per iteration: contributions = ranks ⋈ edges equi-join
    on src (one hash shuffle on the edge key) → groupBy dst SUM (one
    agg shuffle with map-side partials). State is one O(nodes) ranks
    table; the only driver-side value is the node count — at 100 TB
    this is the textbook Pregel super-step as two shuffles, with the
    edges DataFrame persisted once and reused by every iteration.

    No special dangling-node redistribution: sinks keep only the
    teleport share (documented contract; feed symmetric edges if you
    need every node to emit). The damping literal is combined
    in-engine (``1 - damping`` as a double expression, never a Python
    constant) so an oracle writing the same literal reproduces the
    identical IEEE value."""
    d = F.lit(damping).cast("double")
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
    )
    n = nodes.count()
    base = (F.lit(1).cast("double") - d) / F.lit(n)
    outdeg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("od"))
    ranks = nodes.select(
        "node",
        (F.lit(1).cast("double") / F.lit(n)).cast(RANK_DECIMAL)
        .alias("rank"),
    )
    for _ in range(iterations):
        contrib = (
            edges.join(ranks, edges["src"] == ranks["node"])
            .join(outdeg, "src")
            .select(
                F.col("dst"),
                (F.col("rank").cast("double") * d
                 / F.col("od").cast("double"))
                .cast(RANK_DECIMAL).alias("c"),
            )
        )
        summed = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        ranks = (
            nodes.join(summed, nodes["node"] == summed["dst"], "left")
            .select(
                "node",
                (base + F.coalesce(F.col("s"), F.lit(0))
                 .cast("double")).cast(RANK_DECIMAL).alias("rank"),
            )
        )
    return ranks
