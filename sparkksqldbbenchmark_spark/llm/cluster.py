"""Near-duplicate clustering: connected components over the dedup pair
graph, so each group of mutually-similar documents collapses to one
canonical id (min id in the component) — the step after pair generation
in a real dedup pipeline (keep one doc per cluster).

Algorithm: iterative min-label propagation (the standard distributed CC
approach — each round every node adopts the smallest label among itself
and its neighbors; converges in O(diameter) rounds). Each round is one
join + one aggregation — fully distributed; the driver only checks the
convergence counter. Dedup components are tiny (near-dup groups), so
diameter is small and rounds are few.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components_min_label(
    nodes: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    check_every: int = 3,
) -> DataFrame:
    """(id) × (src, dst) → (id, component) with component = min node id
    reachable. Iterates until a fixpoint or max_iter.

    The convergence check is a driver-side action (a count over the
    changed labels); running it only every ``check_every`` rounds trades
    ≤ check_every-1 idempotent extra rounds for check_every× fewer
    driver round-trips — the right trade at cluster scale where each
    action is a scheduling barrier."""
    # undirected: propagate both ways
    fwd = edges.select(F.col(src_col).alias("a"), F.col(dst_col).alias("b"))
    bwd = edges.select(F.col(dst_col).alias("a"), F.col(src_col).alias("b"))
    adj = fwd.unionByName(bwd)

    labels = nodes.select(
        F.col(id_col).alias("id"), F.col(id_col).alias("component")
    )
    # iterative lineage must be truncated each round (localCheckpoint) or
    # every convergence-check action re-executes all previous rounds —
    # quadratic re-execution. Checkpointing keeps each round O(1) jobs.
    #
    # r18 (guide §2.4, the pagerank/pregel recipe): both checkpoints pin
    # a partitioning aligned with every per-round operation — adj on the
    # gather key b, labels on id. The gather join (labels.id == adj.b)
    # is then co-partitioned (ZERO exchange), the neighbor_min aggregate
    # output (hash(a)) feeds the update join on id exchange-free, and
    # `updated` inherits hash(id) for the next round and the convergence
    # join. The only per-round exchange left is groupBy(a) — the one
    # shuffle label propagation fundamentally needs. Previously the
    # unpartitioned adj checkpoint was re-exchanged by b EVERY round.
    adj = adj.repartition(F.col("b")).localCheckpoint(eager=True)
    labels = labels.repartition(F.col("id")).localCheckpoint(eager=True)
    for i in range(max_iter):
        neighbor_min = (
            labels.join(adj.hint("shuffle_hash"), labels.id == adj.b)
            .groupBy(F.col("a").alias("id"))
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min.hint("shuffle_hash"), "id", "left")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce("nbr_component", "component")
                ).alias("component"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        if (i + 1) % check_every == 0 or i == max_iter - 1:
            changed = (
                updated.alias("u")
                .join(labels.alias("l"), "id")
                .where(F.col("u.component") != F.col("l.component"))
                .count()
            )
            if changed == 0:
                return updated
        labels = updated
    return labels
