"""Similarity search over embedding columns (north-star capability).

Two tiers:

- :func:`knn_bruteforce` — exact top-k cosine. The baseline; at scale this
  is a broadcast of the (small) query set against a partitioned scan of the
  embedding table: no shuffle of the big side at all, one TakeOrdered.
- :func:`lsh_bucket_candidates` / :func:`ann_topk` — random-hyperplane LSH.
  Signatures are computed with a deterministic seeded numpy projection in an
  Arrow-batched pandas UDF (the one place Python earns its keep: a matrix
  multiply per batch). Candidate generation joins on bucket id — linear
  scan becomes bucket-local, the 100 TB path.

Embedding-cosine near-dup detection (:func:`cosine_near_pairs`) rides the
same primitives.
"""

from __future__ import annotations

import pandas as pd
import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.functions import pandas_udf

from ..functions.vectorfn import as_double, cosine

_LSH_SEED = 42


def knn_bruteforce(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact top-k cosine neighbors of a single-row ``query`` DataFrame
    (column ``embedding``). Returns (vec_id, sim) — sim in double, computed
    as a sequential left-fold (oracle-reproducible)."""
    q = F.broadcast(query.select(as_double(F.col(vec_col)).alias("q_vec")))
    sims = embeddings.crossJoin(q).select(
        F.col(id_col),
        cosine(as_double(F.col(vec_col)), F.col("q_vec")).alias("sim"),
    )
    return sims.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def with_lsh_bucket(
    embeddings: DataFrame,
    dim: int,
    n_planes: int = 12,
    vec_col: str = "embedding",
    out_col: str = "bucket",
) -> DataFrame:
    """Add a random-hyperplane LSH bucket id (int, 2**n_planes buckets).

    Arrow-batched: each batch is one (batch_size × dim) @ (dim × n_planes)
    matmul — vectorized, no per-row Python."""

    seed = _LSH_SEED

    @pandas_udf("long")
    def bucket_udf(vecs: pd.Series) -> pd.Series:
        # self-contained (stdlib/numpy only): ships by value to executors
        import numpy as _np
        import pandas as _pd

        planes = _np.random.RandomState(seed).standard_normal((dim, n_planes))
        mat = _np.stack(vecs.to_numpy()).astype(_np.float64)
        bits = (mat @ planes) > 0
        weights = (1 << _np.arange(n_planes)).astype(_np.int64)
        return _pd.Series(bits @ weights)

    return embeddings.withColumn(out_col, bucket_udf(F.col(vec_col)))


def ann_topk(
    embeddings: DataFrame,
    query: DataFrame,
    dim: int,
    k: int = 10,
    n_planes: int = 12,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: probe only the query's LSH bucket, then exact
    cosine within it. Recall is tunable via n_planes (fewer planes → bigger
    buckets → higher recall, more compute)."""
    bucketed = with_lsh_bucket(embeddings, dim, n_planes, vec_col)
    q_bucketed = with_lsh_bucket(query.select(F.col(vec_col)), dim, n_planes, vec_col).select(
        F.col("bucket").alias("q_bucket"), as_double(F.col(vec_col)).alias("q_vec")
    )
    cand = bucketed.join(
        F.broadcast(q_bucketed), F.col("bucket") == F.col("q_bucket"), "inner"
    )
    sims = cand.select(F.col(id_col), cosine(as_double(F.col(vec_col)), F.col("q_vec")).alias("sim"))
    return sims.orderBy(F.col("sim").desc(), F.col(id_col)).limit(k)


def cosine_near_pairs(
    embeddings: DataFrame,
    threshold: float,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """All pairs with cosine >= threshold (embedding near-dup detection).

    Implemented as a self cross-join at test scale; at 100 TB the identical
    verification runs after LSH candidate generation (join the bucketed
    table to itself on bucket instead of crossJoin) — see
    :func:`with_lsh_bucket`."""
    a = embeddings.select(F.col(id_col).alias("id1"), as_double(F.col(vec_col)).alias("v1"))
    b = embeddings.select(F.col(id_col).alias("id2"), as_double(F.col(vec_col)).alias("v2"))
    return (
        a.join(b, F.col("id1") < F.col("id2"))
        .select("id1", "id2", cosine(F.col("v1"), F.col("v2")).alias("sim"))
        .filter(F.col("sim") >= threshold)
    )


def centroids_by_label(
    embeddings: DataFrame,
    label_col: str = "label",
    vec_col: str = "embedding",
) -> DataFrame:
    """Per-label elementwise mean as (label, pos, centroid_val) rows —
    posexplode + groupBy, fully JVM-side, one shuffle keyed on
    (label, position)."""
    exploded = embeddings.select(
        F.col(label_col), F.posexplode(as_double(F.col(vec_col))).alias("pos0", "x")
    )
    return (
        exploded.groupBy(label_col, (F.col("pos0") + 1).cast("int").alias("pos"))
        .agg(F.avg("x").alias("centroid_val"))
    )
