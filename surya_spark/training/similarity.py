"""Similarity search over an embedding column (array<float>).

Brute-force cosine top-k is the correctness baseline; the IVF variant
(centroid bucketing) is the scale path — it turns the O(Q·N) cross join
into an equi-join on cluster id, which is how ANN survives 10^12 rows.
Dot products are column expressions — explicit element_at sums when the
dimension is known (whole-stage codegen), higher-order fold otherwise.
No Python in the hot path either way.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..plans import caching


def dot(a: Column | str, b: Column | str, dim: int | None = None) -> Column:
    """Dot product. With `dim` given, expands to an explicit left-associated
    sum of element_at terms — stays inside whole-stage codegen and runs
    ~10× faster than the higher-order aggregate/zip_with fold, which Spark
    evaluates interpreted. Identical float semantics (same addition order).
    When both operands are column NAMES, the expansion is built as one SQL
    string (F.expr) — composing 64-term Column trees through py4j costs
    real driver time per call (CLAUDE.md round-2 note). Without dim, falls
    back to the fold (any-length arrays)."""
    if dim is not None and isinstance(a, str) and isinstance(b, str):
        terms = " + ".join(
            f"CAST(element_at({a}, {i}) AS DOUBLE)"
            f" * CAST(element_at({b}, {i}) AS DOUBLE)"
            for i in range(1, dim + 1))
        return F.expr(f"({terms})")
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            acc = acc + F.element_at(a, i).cast("double") * F.element_at(
                b, i
            ).cast("double")
        return acc
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column | str, dim: int | None = None) -> Column:
    if dim is not None and isinstance(a, str):
        terms = " + ".join(
            f"CAST(element_at({a}, {i}) AS DOUBLE)"
            f" * CAST(element_at({a}, {i}) AS DOUBLE)"
            for i in range(1, dim + 1))
        return F.sqrt(F.expr(f"({terms})"))
    if dim is not None:
        acc = F.lit(0.0)
        for i in range(1, dim + 1):
            e = F.element_at(a, i).cast("double")
            acc = acc + e * e
        return F.sqrt(acc)
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine(a: Column, b: Column, dim: int | None = None) -> Column:
    d = norm(a, dim) * norm(b, dim)
    return F.when(d > 0, dot(a, b, dim) / d).otherwise(F.lit(0.0))


def with_norm(df: DataFrame, vec_col: str, out_col: str,
              dim: int | None = None) -> DataFrame:
    """Materialize the vector norm as a column BEFORE any pairwise join:
    n norms instead of n² recomputations, and it keeps the per-pair
    expression (just the dot product) under the JVM's 64 KB codegen method
    limit — the fused 3-reduction cosine expression falls back to
    interpreted evaluation."""
    return df.withColumn(out_col, norm(vec_col, dim))


def knn_bruteforce(vectors: DataFrame, queries: DataFrame, k: int = 5,
                   id_col: str = "vec_id", vec_col: str = "embedding",
                   query_id: str = "query_id",
                   dim: int | None = None) -> DataFrame:
    """Exact top-k neighbors per query by cosine. CONTRACT: queries MUST
    be small (it is driver-broadcast — the deliberate exception to the
    no-data-derived-broadcast rule, valid only because the query set is
    bounded by the caller, e.g. a pushed filter); anyone re-wiring this
    with a corpus-derived query side reintroduces the serial
    driver-collect the rule exists to prevent — use knn_ivf instead.
    The 'cross join' is then a map-side nested loop with no shuffle of
    the big side; ranking is one window per query id."""
    from ..plans import partitioning

    q = with_norm(
        queries.select(F.col(query_id), F.col(vec_col).alias("q_vec")),
        "q_vec", "q_n", dim)
    # r7: the map-side nested loop evaluates |Q| dot expressions per
    # vector row — on a single-row-group embeddings file that ran on 2 of
    # 32 cores (5.9 s at sf1.0); spread first (no-op on real partitioned
    # inputs)
    v = with_norm(
        partitioning.spread_small_input(vectors).select(
            F.col(id_col).alias("neighbor_id"),
            F.col(vec_col).alias("v_vec")),
        "v_vec", "v_n", dim)
    d = F.col("q_n") * F.col("v_n")
    cos = F.when(d > 0, dot("q_vec", "v_vec", dim) / d) \
        .otherwise(F.lit(0.0))
    scored = v.crossJoin(F.broadcast(q)).select(
        query_id,
        "neighbor_id",
        F.round(cos, 6).alias("cosine"),
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
                    cent_id: str = "centroid_id",
                    dim: int | None = None,
                    nprobe: int = 1) -> DataFrame:
    """IVF coarse quantization: the nprobe nearest centroids per vector
    (centroids broadcast; ranking via window over the small per-vector
    candidate set). Output carries (cluster, probe_rank, c_cos) — rank 1
    is the primary assignment used to index a vector; ranks 2..nprobe are
    the extra probes a *query* visits (standard IVF nprobe recall lever)."""
    from ..plans import partitioning

    c = with_norm(
        centroids.select(F.col(cent_id), F.col(vec_col).alias("c_vec")),
        "c_vec", "c_n", dim)
    # r7: spread on the vector id BEFORE the per-vector×centroid dot
    # expressions (single-row-group scans are one task); the probe_rank
    # window partitions by the same id and reuses this exchange
    vv = with_norm(
        partitioning.spread_small_input(vectors, id_col)
        .select(id_col, vec_col), vec_col, "v_n", dim)
    d = F.col("v_n") * F.col("c_n")
    cos = F.when(d > 0, dot(vec_col, "c_vec", dim) / d) \
        .otherwise(F.lit(0.0))
    scored = vv.crossJoin(F.broadcast(c)).select(
        id_col, vec_col, cent_id,
        F.round(cos, 6).alias("c_cos"),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("c_cos").desc(), F.col(cent_id)
    )
    return (
        scored.withColumn("probe_rank", F.row_number().over(w))
        .filter(F.col("probe_rank") <= nprobe)
        .select(id_col, vec_col, F.col(cent_id).alias("cluster"),
                "probe_rank", "c_cos")
    )


def knn_ivf(vectors: DataFrame, centroids: DataFrame, k: int = 3,
            id_col: str = "vec_id", vec_col: str = "embedding",
            dim: int | None = None, nprobe: int = 1,
            cluster_cap: int | None = None) -> DataFrame:
    """Approximate top-k neighbors for every vector: assign clusters, then
    join queries' probed clusters against the primary-cluster index. The
    pairwise work is bounded per bucket — the LSH/IVF analogue for
    embeddings.

    nprobe > 1 is the recall lever: queries visit their nprobe nearest
    centroids while every vector is indexed only under its primary cluster
    (no index duplication). cluster_cap is the hot-cluster skew guard: an
    unbalanced quantizer can put m vectors in one cluster and make the
    self-join m² on that key; with a cap, each cluster's INDEX side keeps
    only the cap vectors closest to the centroid (documented recall trade;
    per-cluster pair work becomes |queries∩cluster| × cap)."""
    # one scored pass serves both sides (index = probe_rank 1, queries =
    # all probes); without persist Spark re-executes the assignment per
    # branch (different projections → no exchange reuse) — measured 2×.
    # caching.scope: the cache is released by the first action on the
    # returned top-k (persist-lifecycle ownership, plans/caching.py).
    with caching.scope() as (handles, is_owner):
        return caching.owned(
            _knn_ivf_body(vectors, centroids, k, id_col, vec_col, dim,
                          nprobe, cluster_cap),
            handles, is_owner)


def _knn_ivf_body(vectors, centroids, k, id_col, vec_col, dim, nprobe,
                  cluster_cap):
    probes = caching.managed(
        assign_clusters(vectors, centroids, id_col, vec_col,
                        dim=dim, nprobe=nprobe))
    index = probes.filter(F.col("probe_rank") == 1)
    if cluster_cap is not None:
        w_cap = Window.partitionBy("cluster").orderBy(
            F.col("c_cos").desc(), F.col(id_col))
        index = (
            index.withColumn("_cr", F.row_number().over(w_cap))
            .filter(F.col("_cr") <= cluster_cap).drop("_cr")
        )
    if dim is not None:
        scored = _cluster_topk_kernel(probes, index, k, id_col, vec_col,
                                      dim)
    else:
        scored = _cluster_score_sql(probes, index, id_col, vec_col, dim)
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
    )


def _cluster_score_sql(probes, index, id_col, vec_col, dim):
    """Pre-r7 pairwise scoring: cluster equi-join + per-pair codegen dot.
    Kept for unknown dim and as the kernel's pytest equivalence anchor.
    Quadratic-per-cluster through ROW-AT-A-TIME expressions — at sf1.0
    (20k vectors, 8 clusters, nprobe 2) the driver measured 305 s."""
    withn_q = with_norm(probes, vec_col, "_n", dim)
    withn_i = with_norm(index, vec_col, "_n", dim)
    a = withn_q.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        F.col("_n").alias("q_n"),
        "cluster",
    )
    b = withn_i.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("v_vec"),
        F.col("_n").alias("v_n"),
        "cluster",
    )
    d = F.col("q_n") * F.col("v_n")
    cos = F.when(d > 0, dot("q_vec", "v_vec", dim) / d) \
        .otherwise(F.lit(0.0))
    return a.join(b, "cluster").filter(
        F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id", "neighbor_id",
        F.round(cos, 6).alias("cosine"),
    )


def _cluster_topk_kernel(probes, index, k, id_col, vec_col, dim,
                         n_chunks: int = 16,
                         q_block_elems: int = 4_000_000):
    """Per-cluster top-k scoring as a COGROUP numpy kernel (r7): the same
    per-cluster pairwise cosines as _cluster_score_sql, evaluated as
    vectorized array ops instead of per-row codegen expressions.

    Bit-exactness: the SQL dot/norm are LEFT-ASSOCIATED double sums over
    elements 1..dim; the kernel accumulates one outer-product slice per
    element in the same order (acc = (…(q₁v₁ + q₂v₂) + …) elementwise),
    so every dot, norm, product and quotient is the identical IEEE-754
    operation sequence — same doubles out, pytest-pinned against the SQL
    path.

    Per-(query,cluster) the kernel emits only a top-k candidate SUPERSET:
    rows with raw cosine ≥ (k-th largest raw cosine) − 2e-6. The final
    ranking happens downstream in SQL on round(cosine,6) with the
    neighbor-id tie-break; a candidate outside the margin cannot enter
    the global top-k because any x, y with x − y > 1e-6 satisfy
    round6(x) > round6(y), so ≥ k candidates strictly precede it in its
    own cluster regardless of id ties. Queries are salted into n_chunks
    groups per cluster (index side replicated per chunk) so 8 clusters
    still fill 32 cores; q_block_elems bounds the accumulator matrix."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    # distinct key names per side: both frames share the `probes` lineage
    # (index is a filter of it), and cogroup key resolution is ambiguous
    # on self-derived column references
    qside = probes.select(
        F.col(id_col).alias("qid"), F.col(vec_col).alias("vec"),
        F.col("cluster").alias("q_cl"),
        F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_chunks)).alias("q_ck"),
    )
    iside = index.select(
        F.col(id_col).alias("nid"), F.col(vec_col).alias("vec"),
        F.col("cluster").alias("i_cl"),
    ).withColumn(
        # bigint to MATCH q_ck's type: cogroup aligns groups by key VALUE
        # AND TYPE — int literals against pmod's bigint silently produce
        # disjoint group sets (measured: 64% of queries lost)
        "i_ck",
        F.explode(F.array(*[F.lit(i).cast("bigint")
                            for i in range(n_chunks)])),
    )

    id_type = probes.schema[id_col].dataType
    out_schema = T.StructType([
        T.StructField("query_id", id_type, False),
        T.StructField("neighbor_id", id_type, False),
        T.StructField("cosine_raw", T.DoubleType(), False),
    ])

    def _norms(M: "np.ndarray") -> "np.ndarray":
        acc = M[:, 0] * M[:, 0]
        for d in range(1, M.shape[1]):
            acc = acc + M[:, d] * M[:, d]
        return np.sqrt(acc)

    def topk(qdf: pd.DataFrame, idf: pd.DataFrame) -> pd.DataFrame:
        cols = ["query_id", "neighbor_id", "cosine_raw"]
        if not len(qdf) or not len(idf):
            return pd.DataFrame(columns=cols)
        Q = np.stack(qdf["vec"].to_numpy()).astype(np.float64)
        I = np.stack(idf["vec"].to_numpy()).astype(np.float64)
        qid = qdf["qid"].to_numpy()
        nid = idf["nid"].to_numpy()
        qn = _norms(Q)
        inn = _norms(I)
        ni = len(idf)
        step = max(1, q_block_elems // max(ni, 1))
        frames = []
        for s in range(0, len(qdf), step):
            e = min(len(qdf), s + step)
            acc = np.multiply.outer(Q[s:e, 0], I[:, 0])
            for d in range(1, Q.shape[1]):
                acc += np.multiply.outer(Q[s:e, d], I[:, d])
            denom = np.multiply.outer(qn[s:e], inn)
            cos = np.divide(acc, denom, out=np.zeros_like(acc),
                            where=denom > 0)
            self_mask = qid[s:e, None] == nid[None, :]
            sortable = np.where(self_mask, -np.inf, cos)
            if ni > k:
                kth = np.partition(sortable, ni - k, axis=1)[:, ni - k]
                keep = sortable >= (kth - 2e-6)[:, None]
            else:
                keep = ~self_mask
            r, c = np.nonzero(keep)
            frames.append(pd.DataFrame({
                "query_id": qid[s:e][r], "neighbor_id": nid[c],
                "cosine_raw": cos[r, c],
            }))
        return pd.concat(frames, ignore_index=True) if frames else \
            pd.DataFrame(columns=cols)

    cand = (
        qside.groupBy("q_cl", "q_ck")
        .cogroup(iside.groupBy("i_cl", "i_ck"))
        .applyInPandas(topk, schema=out_schema)
    )
    return cand.select(
        "query_id", "neighbor_id",
        F.round(F.col("cosine_raw"), 6).alias("cosine"),
    )


def train_centroids(vectors: DataFrame, k: int = 8,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    seed: int = 42, max_iter: int = 10) -> DataFrame:
    """IVF coarse quantizer training: k-means|| over the embedding column
    (distributed MLlib implementation — the scale path for building the
    index, not just probing it). Returns (centroid_id, embedding) in the
    same shape assign_clusters/knn_ivf consume."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector, vector_to_array

    feat = vectors.select(
        F.col(id_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=k, seed=seed, maxIter=max_iter).fit(feat)
    centers = model.clusterCenters()
    sdf = vectors.sparkSession.createDataFrame(
        [(i, [float(v) for v in c]) for i, c in enumerate(centers)],
        f"centroid_id int, {vec_col} array<float>",
    )
    return sdf


def cosine_near_dup(vectors: DataFrame, threshold: float = 0.95,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    block_col: str | None = None,
                    dim: int | None = None,
                    allow_cross_join: bool = False) -> DataFrame:
    """Embedding near-duplicate pairs: cosine ≥ threshold. With a block
    column (e.g. coarse cluster or label) the join is equi-keyed; without
    one the only possible plan is an O(n²) cross join, which silently
    melting down at corpus scale is worse than an error — so blockless
    calls RAISE unless allow_cross_join=True (small fixtures, tests).
    For label-free near-dup at scale use embedding_lsh_pairs, which
    replaces the block column with sign-bit LSH bucketing."""
    if block_col is None and not allow_cross_join:
        raise ValueError(
            "cosine_near_dup without block_col is an O(n^2) cross join; "
            "pass allow_cross_join=True for small inputs, or use "
            "embedding_lsh_pairs for label-free near-dup at scale")
    withn = with_norm(vectors, vec_col, "_n", dim)
    a = withn.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        F.col("_n").alias("n_a"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    b = withn.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        F.col("_n").alias("n_b"),
        *( [F.col(block_col).alias("blk")] if block_col else [] ),
    )
    if block_col:
        pairs = a.join(b, "blk").filter(F.col("id_a") < F.col("id_b"))
    else:
        pairs = a.crossJoin(b).filter(F.col("id_a") < F.col("id_b"))
    d = F.col("n_a") * F.col("n_b")
    cos = F.when(d > 0, dot("vec_a", "vec_b", dim) / d) \
        .otherwise(F.lit(0.0))
    return pairs.select(
        "id_a", "id_b",
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)


def random_hyperplanes(n_planes: int, dim: int,
                       seed: int = 20240816) -> list[list[int]]:
    """Deterministic random-hyperplane coefficients (small integers in
    [-3, 3]): float32 embedding × small int products are EXACT in double,
    so the sign bits — the only thing that matters — are bit-reproducible
    by the DuckDB oracle summing in the same element order."""
    import random

    rng = random.Random(seed)
    return [[rng.randint(-3, 3) for _ in range(dim)]
            for _ in range(n_planes)]


def embedding_lsh_pairs(vectors: DataFrame, threshold: float = 0.8,
                        n_planes: int = 32, bands: int = 4,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        dim: int = 64,
                        seed: int = 20240816) -> DataFrame:
    """Label-free cosine near-dup at scale: random-hyperplane LSH
    (sign-bit SimHash over embeddings) replaces cosine_near_dup's
    block_col requirement — bucket = a band of sign bits, candidates =
    equi-join on (band, bucket), verified with exact cosine ≥ threshold.
    Two vectors at angle θ agree on one plane with prob 1−θ/π; a 4-bit
    b-bit band matches with that to the b-th power; bands multiply the
    chances. Band WIDTH is the blocking/recall dial: the 8-bit default
    gives 256 buckets per band (bounded candidate fan-out — 4-bit bands
    collapse 15k vectors into 16 buckets and go near-quadratic, measured
    12.1 s → 2.8 s at sf0.1 when widened); more/narrower bands buy recall
    at candidate cost. The shuffle key is the bucket. No cross join
    anywhere."""
    planes = random_hyperplanes(n_planes, dim, seed)
    per_band = n_planes // bands
    with caching.scope() as (handles, is_owner):
        return caching.owned(
            _embedding_lsh_body(vectors, threshold, bands, per_band,
                                planes, id_col, vec_col, dim),
            handles, is_owner)


def _banded_signs_kernel(vectors: DataFrame, id_col: str, vec_col: str,
                         planes: list[list[int]], bands: int,
                         per_band: int) -> DataFrame:
    """(id, band, bucket) rows: per-band sign-bit bucket strings from the
    random-hyperplane projection, computed batchwise in numpy.

    The pre-r7 form evaluated 32 ~50-term SQL sum expressions per row —
    past the codegen method limit, so INTERPRETED (~2.5 s of the query at
    sf1.0 even spread across the cluster). The kernel accumulates each
    plane's sum left-associated over its NONZERO coefficients in index
    order — the identical IEEE sequence as the old `t1 + t2 + …` F.expr
    (zero terms skipped there too) — so every sign bit, bucket string and
    candidate pair is unchanged (oracle-pinned)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        vectors.schema[id_col],
        T.StructField("band", T.IntegerType(), False),
        T.StructField("bucket", T.StringType(), False),
    ])
    nonzero = [[(i, float(wi)) for i, wi in enumerate(w) if wi]
               for w in planes]

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {f.name: pd.Series([], dtype=object)
                     for f in out_schema})
                continue
            V = np.stack(pdf[vec_col].to_numpy()).astype(np.float64)
            n = len(pdf)
            bits = np.zeros((n, len(nonzero)), dtype=bool)
            for p, nz in enumerate(nonzero):
                i0, w0 = nz[0]
                acc = V[:, i0] * w0
                for i, wi in nz[1:]:
                    acc = acc + V[:, i] * wi
                bits[:, p] = acc > 0
            chars = np.where(bits, "1", "0")
            ids = pdf[id_col]
            frames = []
            for b in range(len(nonzero) // per_band):
                seg = chars[:, b * per_band:(b + 1) * per_band]
                frames.append(pd.DataFrame({
                    id_col: ids, "band": b,
                    "bucket": ["".join(r) for r in seg],
                }))
            yield pd.concat(frames, ignore_index=True)

    return vectors.select(id_col, vec_col).mapInPandas(
        run, schema=out_schema)


def _embedding_lsh_body(vectors, threshold, bands, per_band, planes,
                        id_col, vec_col, dim):
    from ..plans import partitioning

    # single-row-group embedding files scan as 1-2 tasks; the sign
    # projection (and the norm projection below) must not run serially —
    # spread once, reuse for both consumers (r7)
    vectors = partitioning.spread_small_input(vectors, id_col)
    # banded feeds both sides of the self-join — persist the tiny
    # (id, band, bucket) table so the projection runs exactly once
    banded = caching.managed(_banded_signs_kernel(
        vectors, id_col, vec_col, planes, bands, per_band))
    a, b = banded.alias("a"), banded.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")),
        )
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .distinct()
    )
    cand = caching.managed(cand)  # feeds both sides of the verify join
    withn = with_norm(vectors.select(id_col, vec_col), vec_col, "_n", dim)
    va = withn.select(F.col(id_col).alias("id_a"),
                      F.col(vec_col).alias("va"), F.col("_n").alias("na"))
    vb = withn.select(F.col(id_col).alias("id_b"),
                      F.col(vec_col).alias("vb"), F.col("_n").alias("nb"))
    paired = cand.join(va, "id_a").join(vb, "id_b")
    # per-pair cosine as a vectorized Arrow kernel: the 64-term per-row
    # SQL dot over millions of candidate pairs was the query's dominant
    # cost (11.6 of 17 s at sf1.0). The kernel accumulates LEFT-ASSOCIATED
    # per element — the identical IEEE op sequence as dot(va, vb, dim) —
    # and reuses the SQL-computed norms, so the doubles are bit-equal
    # (pytest-pinned); round+threshold stay in SQL.
    scored = _pair_cosine_kernel(paired, "va", "vb", "na", "nb", dim)
    return (
        scored.select("id_a", "id_b",
                      F.round(F.col("cosine_raw"), 6).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )


def _pair_cosine_kernel(paired: DataFrame, va: str, vb: str,
                        na: str, nb: str, dim: int) -> DataFrame:
    """(…, id_a, id_b, va, vb, na, nb) → (id_a, id_b, cosine_raw), the
    cosine computed batchwise in numpy with left-associated accumulation
    (bit-equal to the dot()/norm-product SQL expression)."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = T.StructType([
        paired.schema["id_a"],
        paired.schema["id_b"],
        T.StructField("cosine_raw", T.DoubleType(), False),
    ])

    def run(batches):
        for pdf in batches:
            if not len(pdf):
                yield pd.DataFrame(
                    {f.name: pd.Series([], dtype=object)
                     for f in out_schema})
                continue
            A = np.stack(pdf[va].to_numpy()).astype(np.float64)
            B = np.stack(pdf[vb].to_numpy()).astype(np.float64)
            acc = A[:, 0] * B[:, 0]
            for d in range(1, dim):
                acc = acc + A[:, d] * B[:, d]
            den = pdf[na].to_numpy() * pdf[nb].to_numpy()
            cos = np.divide(acc, den, out=np.zeros_like(acc),
                            where=den > 0)
            yield pd.DataFrame({
                "id_a": pdf["id_a"], "id_b": pdf["id_b"],
                "cosine_raw": cos,
            })

    return paired.select("id_a", "id_b", va, vb, na, nb).mapInPandas(
        run, schema=out_schema)
