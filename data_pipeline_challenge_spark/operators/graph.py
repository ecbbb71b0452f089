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
    small_graph_threshold: int = 1_000_000,
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
    # smaller than the corpus. When it fits comfortably in one task, skip
    # the iteration entirely: a partition-local union-find over the
    # single-partition edge list computes the exact fixpoint in ONE job,
    # versus diameter-many join+agg+collect rounds (each a scheduler
    # round-trip even at one task). The result is identical — component =
    # min reachable vertex id — and order-independent, because the final
    # partition structure of union-find does not depend on union order.
    # Above the threshold, fall through to the distributed iteration.
    if sym.count() < small_graph_threshold:
        return _union_find_single_task(sym)

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


def _union_find_single_task(sym: DataFrame) -> DataFrame:
    """Exact components of a small symmetric edge list in one Spark job:
    coalesce to one partition, run union-find with path compression inside
    ``mapInPandas`` (Arrow batches in, one labels batch out). The worker
    function is a nested closure so cloudpickle ships it by value (repo
    convention, see sources/json_ingest.py docstring)."""

    def make_uf():
        def run(batches):
            import pandas as pd

            parent: dict[int, int] = {}

            def find(x: int) -> int:
                root = x
                while parent[root] != root:
                    root = parent[root]
                while parent[x] != root:  # path compression
                    parent[x], x = root, parent[x]
                return root

            for pdf in batches:
                for v, w in zip(pdf["v"], pdf["w"]):
                    v, w = int(v), int(w)
                    parent.setdefault(v, v)
                    parent.setdefault(w, w)
                    rv, rw = find(v), find(w)
                    if rv != rw:
                        parent[rw] = rv
            # component = min member id, independent of union order.
            comp_min: dict[int, int] = {}
            for v in parent:
                r = find(v)
                if r not in comp_min or v < comp_min[r]:
                    comp_min[r] = v
            if parent:
                yield pd.DataFrame(
                    {
                        "vertex": list(parent.keys()),
                        "component": [comp_min[find(v)] for v in parent],
                    }
                )

        return run

    return sym.coalesce(1).mapInPandas(
        make_uf(), schema="vertex bigint, component bigint"
    )
