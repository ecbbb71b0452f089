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


def ivf_fit_centroids(
    embeddings: DataFrame,
    n_clusters: int = 16,
    sample_size: int = 4096,
    n_iters: int = 10,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Fit IVF coarse centroids: spherical k-means on a driver-side sample.

    The sample (few thousand rows) is the only data that ever leaves the
    executors; at 100 TB this is exactly how IVF indexes are built — train
    the coarse quantizer on a sample, then assign the full table
    distributed. Deterministic: the sample is an order-stable seeded
    hash-sample on the id column (xxhash64 of id + seed, take the smallest
    ``sample_size``) — independent of partition/scan order, uniform over
    ids; then seeded init, fixed iterations, Lloyd updates on L2-normalized
    vectors (cosine geometry).
    Returns an (n_clusters × dim) float64 numpy array."""
    import numpy as np

    rows = (
        embeddings.select(
            vec_col, F.xxhash64(F.col(id_col), F.lit(seed)).alias("__h")
        )
        .orderBy("__h", id_col)
        .limit(sample_size)
        .select(vec_col)
        .collect()
    )
    mat = np.array([r[0] for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
    rng = np.random.RandomState(seed)
    centroids = mat[rng.choice(len(mat), size=min(n_clusters, len(mat)), replace=False)]
    for _ in range(n_iters):
        assign = (mat @ centroids.T).argmax(axis=1)
        for c in range(len(centroids)):
            members = mat[assign == c]
            if len(members):
                m = members.mean(axis=0)
                centroids[c] = m / max(np.linalg.norm(m), 1e-12)
    return centroids


def ivf_assign(
    embeddings: DataFrame,
    centroids,
    vec_col: str = "embedding",
    out_col: str = "cluster",
) -> DataFrame:
    """Assign each vector to its nearest centroid (Arrow-batched matmul)."""
    cents = [list(map(float, c)) for c in centroids]  # plain lists: pickle-safe

    @pandas_udf("int")
    def assign_udf(vecs: pd.Series) -> pd.Series:
        import numpy as _np
        import pandas as _pd

        C = _np.array(cents, dtype=_np.float64)
        mat = _np.stack(vecs.to_numpy()).astype(_np.float64)
        mat /= _np.linalg.norm(mat, axis=1, keepdims=True).clip(min=1e-12)
        return _pd.Series((mat @ C.T).argmax(axis=1).astype("int32"))

    return embeddings.withColumn(out_col, assign_udf(F.col(vec_col)))


def ivf_topk(
    embeddings: DataFrame,
    query: DataFrame,
    k: int = 10,
    n_clusters: int = 16,
    n_probe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF approximate top-k: exact cosine over only the ``n_probe``
    clusters nearest to the query — the scan shrinks by ~n_probe/n_clusters.

    At scale the assigned table is written partitioned by cluster so a
    probe reads only those partitions (partition pruning does the work)."""
    import numpy as np

    centroids = ivf_fit_centroids(
        embeddings, n_clusters=n_clusters, id_col=id_col, vec_col=vec_col
    )
    qvec = np.array(query.select(vec_col).first()[0], dtype=np.float64)
    qvec /= max(np.linalg.norm(qvec), 1e-12)
    probe = np.argsort(-(centroids @ qvec))[:n_probe].tolist()

    assigned = ivf_assign(embeddings, centroids, vec_col)
    q = F.broadcast(query.select(as_double(F.col(vec_col)).alias("q_vec")))
    cand = assigned.filter(F.col("cluster").isin([int(p) for p in probe]))
    sims = cand.crossJoin(q).select(
        F.col(id_col), cosine(as_double(F.col(vec_col)), F.col("q_vec")).alias("sim")
    )
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
