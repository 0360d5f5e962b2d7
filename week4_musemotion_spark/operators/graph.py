"""Connected components — turning near-dup PAIRS into dup CLUSTERS.

Pair output (doc_a ~ doc_b) undercounts duplication: if A~B and B~C,
all three are one duplicate cluster even when A~C itself fell below
threshold.  Canonical dedup keeps min-id per component, which needs
connected components over the similarity graph — the one genuinely
iterative algorithm in the dedup pipeline.

Implementation: min-label propagation with pointer jumping.  Each
node starts labeled with its own id; every round each node takes the
min label over itself and its neighbors, then SHORTCUTS through its
label's own label (comp ← comp(comp), path doubling).  Propagation
alone converges in O(component diameter) rounds — fine for compact
dup clusters, but a chain-shaped component of length L needs L
rounds.  The shortcut halves remaining path lengths each round, so
convergence is O(log L) for any shape — the property that matters
when a 100 TB near-dup graph contains adversarial chains.  Each
round is one join + aggregate + one self-join — fully distributed,
with the driver only checking the scalar convergence count.
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

    prev_sum = None
    try:
        for _ in range(max_iterations):
            neighbor_min = (
                sym.join(labels, sym.v == labels.node)
                .groupBy(F.col("u").alias("node"))
                .agg(F.min("comp").alias("nbr_comp"))
            )
            propagated = labels.join(neighbor_min, "node", "left").select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nbr_comp"), F.col("comp"))
                ).alias("comp"),
            )
            # pointer jumping: comp ← comp(comp).  Labels only ever
            # decrease toward the component min, so shortcutting is
            # always sound; it collapses long chains exponentially
            # faster than propagation alone (chain of length L:
            # O(log L)-ish rounds instead of O(L)).
            hop = propagated.select(
                F.col("node").alias("_hn"), F.col("comp").alias("_hc")
            )
            labels = propagated.join(
                hop, propagated.comp == hop._hn, "left"
            ).select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("_hc"), F.col("comp"))
                ).alias("comp"),
            )
            # truncate lineage each round: the round references its own
            # intermediate twice (the pointer-jump self-join), so carrying
            # logical plans across rounds would grow the tree 2^rounds —
            # localCheckpoint materializes the round and resets the plan.
            # Superseded rounds' checkpoint storage is released by the
            # ContextCleaner once the rebind drops the last reference.
            labels = labels.localCheckpoint(eager=True)
            # convergence via the monotone invariant: every comp only
            # ever decreases, so sum(comp) strictly decreases until the
            # fixed point — one tiny aggregate, no extra join against
            # the previous round.  decimal(38,0) so planet-scale id
            # sums cannot overflow long.
            cur_sum = labels.agg(
                F.sum(F.col("comp").cast("decimal(38,0)")).alias("s")
            ).first().s
            if cur_sum == prev_sum:
                return labels
            prev_sum = cur_sum
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
