"""Connected components over a pair list — dedup clustering.

Near-duplicate detection yields PAIRS; keeping one representative per
duplicate CLUSTER needs the transitive closure: connected components.
Implemented as iterative min-label propagation in pure DataFrame ops:
every vertex starts labeled with its own id; each round, every vertex
takes the min label among itself and its neighbors; converged when no
label changes.

Scale notes: each round is one join + one aggregation (shuffle on
vertex id); rounds needed = graph diameter, and near-dup clusters are
small and dense (diameter 2-3), so the loop converges in a handful of
rounds. Labels are checkpointed per round via localCheckpoint to stop
the lineage growing linearly with iterations — the classic iterative-
algorithm trap on Spark.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    *,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 20,
) -> DataFrame:
    """Label every vertex with its component = min vertex id reachable
    through ``edges`` (undirected). Output: (id, component).

    ``vertices``: one row per vertex id. ``edges``: pair rows; treated
    as undirected. Vertices absent from ``edges`` keep their own id.
    """
    undirected = edges.select(
        F.col(src_col).alias("src"), F.col(dst_col).alias("dst")
    ).unionAll(
        edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
    ).distinct()
    # materialize once: the edge list joins into EVERY propagation
    # round; without this its upstream plan (possibly an expensive
    # similarity self-join) re-executes per iteration
    undirected = undirected.localCheckpoint(eager=True)

    # NOTE: a pointer-jumping (label-of-label) variant was measured and
    # REJECTED: the extra self-join per round costs more than the saved
    # rounds on near-dup cluster graphs (diameter 2-4, small vertex
    # count — per-round Spark overhead dominates, 43s vs 25s at sf0.1).
    # Revisit only for graphs with large diameters.
    labels = vertices.select(F.col(id_col).alias("id"), F.col(id_col).alias("component"))
    for _ in range(max_iterations):
        neighbor_min = (
            undirected.join(labels, undirected["dst"] == labels["id"])
            .groupBy("src")
            .agg(F.min("component").alias("nbr_component"))
        )
        updated = (
            labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left_outer")
            .select(
                "id",
                F.least(
                    F.col("component"), F.coalesce(F.col("nbr_component"), F.col("component"))
                ).alias("component"),
                (F.col("nbr_component") < F.col("component")).alias("_changed"),
            )
        )
        updated = updated.localCheckpoint(eager=True)
        n_changed = updated.filter(F.col("_changed")).count()
        labels = updated.drop("_changed")
        if n_changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge within {max_iterations} "
        "iterations (graph diameter exceeds the cap); raise max_iterations — "
        "returning partial labels would be silently wrong"
    )
