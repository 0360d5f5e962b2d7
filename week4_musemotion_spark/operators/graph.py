"""Connected components — turning near-dup PAIRS into dup CLUSTERS.

Pair output (doc_a ~ doc_b) undercounts duplication: if A~B and B~C,
all three are one duplicate cluster even when A~C itself fell below
threshold.  Canonical dedup keeps min-id per component, which needs
connected components over the similarity graph — the one genuinely
iterative algorithm in the dedup pipeline.

Implementation: min-label propagation.  Each node starts labeled with
its own id; every round each node takes the min label over itself and
its neighbors; converges in O(component diameter) rounds (dup
clusters are small-diameter by construction).  Each round is one
join + aggregate — fully distributed, with the driver only checking
the scalar convergence count.  For planet-scale graphs swap in the
large-star/small-star contraction (same operator contract).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    max_iterations: int = 20,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the minimum node id of its component.

    Raises if not converged within ``max_iterations`` (diameter
    bound exceeded — for adversarial chain-shaped graphs use the
    star-contraction variant instead).
    """
    # undirected: symmetrize once
    fwd = edges.select(F.col(src).alias("u"), F.col(dst).alias("v"))
    sym = fwd.unionByName(fwd.select(F.col("v").alias("u"), F.col("u").alias("v"))).distinct()
    sym = sym.persist()
    labels = sym.select(F.col("u").alias("node")).distinct().withColumn("comp", F.col("node"))

    prev = None
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(labels, sym.v == labels.node)
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("comp").alias("nbr_comp"))
            )
            updated = (
                labels.join(neighbor_min, "node", "left")
                .select(
                    "node",
                    F.least(F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))).alias("comp"),
                    (F.col("nbr_comp") < F.col("comp")).alias("_changed"),
                )
            ).persist()
            changed = updated.filter(F.col("_changed")).count()  # materializes `updated`
            if prev is not None:
                prev.unpersist()  # superseded round, safe now that `updated` is cached
            prev = updated
            labels = updated.drop("_changed")
            if changed == 0:
                # keep the final round cached for the caller; later
                # eviction just recomputes through `sym`'s lineage
                return labels
        raise RuntimeError(f"connected_components did not converge in {max_iterations} iterations")
    finally:
        sym.unpersist()


def dedup_clusters(pairs: DataFrame, src: str = "doc_a", dst: str = "doc_b") -> DataFrame:
    """Duplicate clusters from near-dup pairs: every clustered doc
    with its canonical keeper (the component's min id)."""
    comp = connected_components(pairs, src, dst)
    return comp.select(
        F.col("node").alias("doc_id"),
        F.col("comp").alias("keep_id"),
    )
