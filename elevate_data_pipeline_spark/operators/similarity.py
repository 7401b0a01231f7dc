"""Similarity search over embedding columns.

- ``brute_force_topk``: exact cosine top-k — the correctness baseline.
  One shuffle (the query-side broadcast is free when queries are few).
- ``ivf_topk``: IVF-style two-stage search — assign each query to its
  nearest coarse cell, then search only that cell. The scale path: at
  100 TB the corpus is bucketed once (by cluster assignment), queries
  probe a handful of buckets, and each bucket scan is an embarrassingly
  parallel partition-local job.

Cosine math matches :func:`..operators.dedup.cosine` — double-precision
left-to-right folds, deterministic and oracle-matchable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .util import spread

from .dedup import cosine

def _norm(vec_col: str):
    """Vector L2 norm, computed once per row (same fold as dedup.cosine)."""
    return F.expr(
        f"sqrt(aggregate(transform({vec_col}, x -> double(x) * double(x)), "
        f"double(0), (acc, v) -> acc + v))"
    )


def _dot(a: str, b: str):
    return F.expr(
        f"aggregate(zip_with({a}, {b}, (x, y) -> double(x) * double(y)), "
        f"double(0), (acc, v) -> acc + v)"
    )



def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact top-k neighbors per query by cosine (excluding self).

    Returns (query_id, neighbor_id, rank, cos). Ties broken by neighbor
    id for determinism.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"),
        _norm(vec_col).alias("_qn"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_cv"),
        _norm(vec_col).alias("_cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cos")
    )


def hard_negative_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    label_col: str = "label",
) -> DataFrame:
    """Hard-negative mining: per query, the top-k most-similar corpus
    vectors with a DIFFERENT label (contrastive-training negatives that
    are hard precisely because they score high despite the label
    mismatch).

    Same distributed shape as :func:`brute_force_topk` — the query side
    broadcasts, the corpus streams, the label inequality is part of the
    join condition so same-class rows are dropped before scoring. At
    index scale, pre-bucket with LSH/IVF and apply the same label filter
    inside each probed bucket.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(label_col).alias("_ql"),
        F.col(vec_col).alias("_qv"),
        _norm(vec_col).alias("_qn"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(label_col).alias("_cl"),
        F.col(vec_col).alias("_cv"),
        _norm(vec_col).alias("_cn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("_ql") != F.col("_cl"))
        .select(
            "query_id",
            "neighbor_id",
            F.col("_cl").alias("neg_label"),
            (_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "neg_label", "rank", "cos")
    )


# Random-hyperplane LSH: N_PLANES deterministic integer hyperplanes
# (affine PRNG over the dimension index, centered on 0). Deterministic so
# index build and SQL oracle reproduce the buckets bit-for-bit.
N_PLANES = 6
_PLANE_SEEDS = (
    (2128164061, 797605564),
    (596987483, 1944694864),
    (116450323, 582439801),
    (430979122, 468068949),
    (1406942088, 1848070633),
    (1172698796, 805278811),
)


def plane_coeffs(dim: int) -> list[list[int]]:
    """Integer hyperplane coefficients in [-1000, 1000], one row per plane."""
    return [
        [((a * (d + 1) + b) % 2001) - 1000 for d in range(dim)]
        for a, b in _PLANE_SEEDS[:N_PLANES]
    ]


def lsh_bucket(vec_col: str, dim: int) -> F.Column:
    """Sign-of-dot-product bucket id in [0, 2^N_PLANES): bit j is the sign
    of the query against hyperplane j. All math is a left-to-right double
    fold, identical in the SQL oracle."""
    bits = []
    for j, row in enumerate(plane_coeffs(dim)):
        dot = F.expr(
            f"aggregate(zip_with({vec_col}, array({', '.join(str(float(c)) + 'D' for c in row)}), "
            f"(x, c) -> double(x) * c), 0D, (a, b) -> a + b)"
        )
        bits.append(F.when(dot >= 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("int")


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """LSH-bucketed ANN: exact top-k within the query's own hyperplane
    bucket. The corpus shuffles once on the bucket key (or is bucketed at
    rest); each bucket self-scan is partition-local — the alternative
    scale path to :func:`ivf_topk` when no cluster structure exists.
    """
    c = spread(corpus).select(
        lsh_bucket(vec_col, dim).alias("bucket"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(vec_col).alias("_cn"),
    )
    q = queries.select(
        lsh_bucket(vec_col, dim).alias("bucket"),
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("_qv"),
        _norm(vec_col).alias("_qn"),
    )
    scored = (
        F.broadcast(q)
        .join(c, "bucket")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "bucket", "neighbor_id",
            (_dot("_qv", "_cv") / (F.col("_qn") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= k)
        .select("query_id", "bucket", "neighbor_id", "rank", "cos")
    )


def ivf_centroids(
    corpus: DataFrame,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Deterministic cell representatives: the embedding of the minimum
    ID per cell (a medoid proxy — no floating-point averaging, so the
    index build is reproducible bit-for-bit). ``min_by`` aggregate, not
    a per-cell ranking window: one partial-agg shuffle, and a popular
    cell never funnels through a single window task."""
    return corpus.groupBy(F.col(cell_col).alias("cell")).agg(
        F.min_by(vec_col, id_col).alias("centroid")
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    cell_col: str = "label",
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF two-stage ANN: route each query to its best cell (max cosine
    to the cell representative, ties -> smaller cell id), then exact
    top-k within that cell only.

    Returns (query_id, cell, neighbor_id, rank, cos). Approximate:
    recall < 1 when true neighbors live outside the probed cell —
    that's the intended trade; probe more cells for higher recall.
    """
    cents = ivf_centroids(corpus, cell_col, vec_col, id_col)
    q = queries.select(F.col(id_col).alias("query_id"), F.col(vec_col).alias("_qv"))

    routed = (
        F.broadcast(q)
        .crossJoin(F.broadcast(cents))
        .select("query_id", "_qv", "cell", cosine("_qv", "centroid").alias("_ccos"))
    )
    wr = Window.partitionBy("query_id").orderBy(F.desc("_ccos"), F.asc("cell"))
    best = (
        routed.withColumn("_rn", F.row_number().over(wr))
        .filter(F.col("_rn") == 1)
        .select("query_id", "_qv", "cell")
    )

    c = spread(corpus).select(
        F.col(cell_col).alias("cell"),
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("_cv"),
        _norm(vec_col).alias("_cn"),
    )
    scored = (
        F.broadcast(best)
        .join(c, "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id", "cell", "neighbor_id",
            (_dot("_qv", "_cv") / (_norm("_qv") * F.col("_cn"))).alias("cos"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "cell", "neighbor_id", "rank", "cos")
    )


def normalize(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "unit"
) -> DataFrame:
    """Unit-L2-normalize an embedding column (JVM higher-order exprs,
    no Python in the path). Adds ``norm`` (double) and ``out_col``
    (array<double>); zero vectors get null elements (nullif guard)
    rather than NaN/Inf. Normalizing once at ingest turns every
    downstream cosine into a plain dot product — at 100 TB that halves
    the ANN scan's flop count and lets the stored vector be the unit
    one."""
    return df.withColumn("norm", _norm(vec_col)).withColumn(
        out_col,
        F.expr(f"transform({vec_col}, v -> double(v) / nullif(norm, double(0)))"),
    )


def quantize_int8(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "q"
) -> DataFrame:
    """Symmetric per-vector int8 quantization: scale = max|v| / 127,
    q_i = floor(v_i / scale + 0.5) (explicit half-up — identical math
    in any engine, unlike round()'s per-engine tie rules). Adds
    ``scale`` (double) and ``out_col`` (array<int> in [-127, 127]).
    4× smaller vectors and int-SIMD dot products downstream; dequant is
    q_i * scale."""
    scale = F.expr(
        f"array_max(transform({vec_col}, v -> abs(double(v)))) / double(127)"
    )
    return df.withColumn("scale", scale).withColumn(
        out_col,
        F.expr(
            f"transform({vec_col}, "
            f"v -> cast(floor(double(v) / nullif(scale, double(0)) + 0.5) as int))"
        ),
    )


def pq_encode(
    df: DataFrame,
    m: int = 4,
    k: int = 8,
    n_iter: int = 1,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Product quantization encode: split each vector into ``m``
    contiguous subvectors, train an independent deterministic k-means
    codebook per subspace (operators/cluster.kmeans — min-id init,
    decimal-exact means), and emit each vector's code word
    ``(code_0..code_{m-1})`` — the nearest centroid per subspace.

    PQ is the memory tier below int8 quantization: m=4, k=8 stores a
    64-float vector in 4 small ints (codebooks are k*dim floats total,
    broadcast-sized at any corpus scale). Each subspace's training is
    the same declarative Lloyd plan kmeans uses; the m chains share the
    corpus scan and join back on the id — no iteration touches the
    driver. ADC search then scans codes with a broadcast
    distance-lookup table instead of raw vectors.
    """
    from .cluster import kmeans

    sub = dim // m
    out = None
    for s in range(m):
        sl = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("embedding"),
        )
        codes = kmeans(sl, k=k, n_iter=n_iter, vec_col="embedding", id_col=id_col)
        codes = codes.select(
            id_col, F.col("cluster").alias(f"code_{s}")
        )
        out = codes if out is None else out.join(codes, id_col)
    return out


def pq_adc_topk(
    df: DataFrame,
    n_queries: int = 5,
    topk: int = 5,
    m: int = 4,
    k: int = 8,
    n_iter: int = 1,
    dim: int = 64,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Asymmetric-distance (ADC) top-k over PQ codes.

    The search tier on top of :func:`pq_encode`: instead of scanning raw
    vectors, each query precomputes an m x k distance-lookup table
    (exact squared-L2 from its subvector to every subspace centroid),
    and a candidate's approximate distance is the SUM of m table
    lookups keyed by its code word. The corpus-side scan touches only
    the code columns (m small ints per vector); the lookup tables are
    (n_queries * k) rows per subspace — broadcast joins at any corpus
    scale. The final per-query sum is associated left-to-right so the
    DuckDB replay is bit-identical.
    """
    from .cluster import kmeans_centroids

    sub = dim // m
    d2 = F.expr(
        "aggregate(zip_with(qv, centroid, (x, y) -> "
        "(double(x) - double(y)) * (double(x) - double(y))), "
        "double(0), (acc, t) -> acc + t)"
    )
    d2e = F.expr(
        "aggregate(zip_with(embedding, centroid, (x, y) -> "
        "(double(x) - double(y)) * (double(x) - double(y))), "
        "double(0), (acc, t) -> acc + t)"
    )
    total = None
    for s in range(m):
        sl = df.select(
            F.col(id_col),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("embedding"),
        )
        cents = kmeans_centroids(sl, k=k, n_iter=n_iter, id_col=id_col)
        # assign codes against the SAME codebook with one broadcast
        # cross + min_by aggregate (ties to the smaller cluster id, the
        # kmeans order) — no second Lloyd loop, no per-vector window
        codes = (
            sl.crossJoin(F.broadcast(cents))
            .select(id_col, "cluster", d2e.alias("_d"))
            .groupBy(id_col)
            .agg(
                F.min_by(
                    "cluster", F.struct(F.col("_d"), F.col("cluster"))
                ).alias("_code")
            )
        )
        qs = df.filter(F.col(id_col) < n_queries).select(
            F.col(id_col).alias("query_id"),
            F.slice(F.col(vec_col), s * sub + 1, sub).alias("qv"),
        )
        dtab = (
            qs.crossJoin(F.broadcast(cents))
            .select("query_id", F.col("cluster").alias("_code"), d2.alias(f"_d{s}"))
        )
        part = codes.join(F.broadcast(dtab), "_code").select(
            id_col, "query_id", f"_d{s}"
        )
        total = part if total is None else total.join(part, [id_col, "query_id"])

    adc = F.expr("((_d0 + _d1) + _d2) + _d3") if m == 4 else sum(
        [F.col(f"_d{s}") for s in range(m)]
    )
    scored = total.filter(F.col(id_col) != F.col("query_id")).select(
        "query_id", F.col(id_col).alias("neighbor_id"), adc.alias("adc_dist")
    )
    w = Window.partitionBy("query_id").orderBy("adc_dist", "neighbor_id")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("int"))
        .filter(F.col("rank") <= topk)
        .select("query_id", "neighbor_id", "rank", "adc_dist")
    )
