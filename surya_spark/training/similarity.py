"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; the IVF variant
(centroid bucketing) is the scale path — it turns the O(Q·N) cross join
into an equi-join on cluster id, which is how ANN survives 10^12 rows.
Dot products are higher-order column expressions (zip_with + aggregate),
JVM-side — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column) -> Column:
    d = norm(a) * norm(b)
    return F.when(d > 0, dot(a, b) / d).otherwise(F.lit(0.0))


def knn_bruteforce(vectors: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id: str = "query_id") -> DataFrame:
    """Exact top-k neighbors per query by cosine. queries is expected to be
    small → broadcast, so the 'cross join' is a map-side nested loop with
    no shuffle of the big side; ranking is one window per query id."""
    q = queries.select(
        F.col(query_id), F.col(vec_col).alias("q_vec")
    )
    v = vectors.select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("v_vec")
    )
    scored = v.crossJoin(F.broadcast(q)).select(
        query_id,
        "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("v_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy(query_id).orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def assign_clusters(vectors: DataFrame, centroids: DataFrame,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    cent_id: str = "centroid_id") -> DataFrame:
    """IVF coarse quantization: nearest centroid per vector (centroids
    broadcast; argmin via window over the small per-vector candidate set)."""
    c = centroids.select(
        F.col(cent_id), F.col(vec_col).alias("c_vec")
    )
    scored = vectors.select(id_col, vec_col).crossJoin(F.broadcast(c)).select(
        id_col, vec_col, cent_id,
        F.round(cosine(F.col(vec_col), F.col("c_vec")), 6).alias("c_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_cos").desc(), F.col(cent_id)
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(id_col, vec_col, F.col(cent_id).alias("cluster"))
    )


def knn_ivf(vectors: DataFrame, centroids: DataFrame, k: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    """Approximate within-cluster top-k neighbors for every vector: assign
    clusters, then self-join equi on cluster. The pairwise work is bounded
    per bucket — the LSH/IVF analogue for embeddings."""
    assigned = assign_clusters(vectors, centroids, id_col, vec_col)
    a = assigned.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        "cluster",
    )
    b = assigned.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        "cluster",
    )
    scored = a.join(b, "cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id",
        F.round(cosine(F.col("q_vec"), F.col("v_vec")), 6).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def cosine_near_dup(vectors: DataFrame, threshold: float = 0.95,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    block_col: str | None = None) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold. With a block
    column (e.g. coarse cluster or label) the join is equi-keyed; without
    one it degenerates to a cross join — only acceptable for small N."""
    a = vectors.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = vectors.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    if block_col:
        pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    return pairs.select(
        "id_a", "id_b",
        F.round(cosine(F.col("vec_a"), F.col("vec_b")), 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
