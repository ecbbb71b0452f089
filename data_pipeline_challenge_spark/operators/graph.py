"""Connected components over a DataFrame edge list.

The training-data use case: near-duplicate *pairs* (MinHash/SimHash/cosine)
must become duplicate *clusters* so exactly one canonical document per
cluster survives dedup. That grouping is a connected-components problem on
the pair graph.

Algorithm: iterative min-label propagation expressed as DataFrame joins —
each vertex repeatedly adopts the smallest component id among itself and
its neighbors. Labels only ever decrease, so the fixpoint (no label
changed) is exact and deterministic: every vertex ends with the minimum
vertex id reachable from it, independent of partitioning or join order.

100 TB notes:
- Each iteration is one shuffle join (edges × labels on vertex id) plus one
  map-side-combinable min-aggregation; rounds needed = graph diameter.
  Duplicate clusters are short chains / dense blobs (diameter ~ a few), so
  this converges in 3-5 rounds in practice. For adversarial long-chain
  graphs, swap the propagation body for the large-star/small-star rewrite
  (Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC'14)
  which converges in O(log n) rounds over the same join primitive.
- ``localCheckpoint`` after every round truncates the lineage so the plan
  does not grow with iteration count (on a cluster, prefer a reliable
  ``checkpoint`` dir so recomputation-on-failure does not cascade).
- The convergence test piggybacks on the same pass: labels only decrease,
  so ``min(new) == min(old)`` per vertex with zero strict decreases means
  the fixpoint was reached.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 25,
) -> DataFrame:
    """Return (vertex, component) with component = min reachable vertex id.

    Vertices are the union of edge endpoints (isolated vertices never
    appear in an edge list; callers wanting singletons can union them in
    afterwards with component = their own id).
    """
    # Symmetric edge list: propagate along both directions of each edge.
    fwd = edges.select(F.col(src).alias("v"), F.col(dst).alias("w"))
    sym = fwd.union(fwd.select(F.col("w").alias("v"), F.col("v").alias("w"))).distinct()
    sym = sym.localCheckpoint(eager=True)

    # The loop operates on the *pair graph*, which is orders of magnitude
    # smaller than the corpus. When it fits comfortably in one task, run the
    # iteration single-partition — per-round cost becomes one task instead
    # of a full shuffle round-trip. Above the threshold, keep the session's
    # shuffle parallelism (the joins below all key on vertex id).
    if sym.count() < 1_000_000:
        sym = sym.coalesce(1).localCheckpoint(eager=True)

    labels = (
        sym.select("v").distinct().withColumn("component", F.col("v")).localCheckpoint(eager=True)
    )

    # Labels only ever decrease, so sum(component) is strictly decreasing
    # until the fixpoint: an unchanged sum IS convergence (no join needed).
    def _label_sum(df: DataFrame) -> object:
        return df.agg(F.sum(F.col("component").cast("decimal(38,0)"))).collect()[0][0]

    prev_sum = _label_sum(labels)
    for _ in range(max_iter):
        # Neighbor labels flow along edges; keep own label in the running min.
        neighbor = sym.join(labels.withColumnRenamed("v", "w"), "w").select("v", "component")
        new_labels = (
            neighbor.union(labels)
            .groupBy("v")
            .agg(F.min("component").alias("component"))
            .localCheckpoint(eager=True)
        )
        new_sum = _label_sum(new_labels)
        labels.unpersist()
        labels = new_labels
        if new_sum == prev_sum:
            break
        prev_sum = new_sum

    return labels.select(F.col("v").alias("vertex"), "component")
