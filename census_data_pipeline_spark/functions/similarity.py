"""Vector similarity search (SURVEY.md §2.11 ⊕; north-star requirement).

Over an ``array<float>`` embedding column:

- **Brute-force cosine top-k** — the exact baseline: broadcast the (small)
  query set, score every corpus vector with a pure-expression dot product
  (``zip_with`` + ``aggregate``), take top-k per query with a window. Scan
  shape: one pass over the corpus, no corpus-side shuffle except the
  per-query top-k (tiny). This is the oracle-checkable path.
- **Sign-LSH (random-hyperplane-style) bucketed top-k** — the scale path:
  bucket vectors by the sign pattern of the first ``nbits`` dimensions
  (axis-aligned hyperplanes — deterministic, engine-reproducible), equi-join
  queries to corpus on bucket, score only within buckets. Recall trades off
  against nbits; an IVF upgrade would learn centroids instead of using
  axis-aligned planes (pyspark.ml KMeans) — same join shape.

All arithmetic in double precision with index-ordered summation so results
are bit-reproducible across engines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from census_data_pipeline_spark.operators.topk import top_k_per_group
from census_data_pipeline_spark.sources.catalog import ensure_parallelism


def _as_double(col: Column) -> Column:
    return col.cast("array<double>")


def dot(a: Column, b: Column) -> Column:
    """Index-ordered dot product: sum(zip_with(a, b, *))."""
    return F.aggregate(
        F.zip_with(_as_double(a), _as_double(b), lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))



def _ranked_topk(scored, k: int):
    """Shared tail for every knn variant: rank scored candidates per query
    (rounded cosine, neighbor-id tiebreak) and project the contract columns.
    One definition keeps the exact baseline and the approximate paths
    emitting identical shapes/rounding."""
    return (
        top_k_per_group(
            scored, ["query_id"], by="cosine_sim", k=k,
            tiebreak=["neighbor_id"], rank_col="rank",
        )
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def knn_bruteforce(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k: for each query vector, the k nearest corpus
    vectors (self-matches excluded). Output:
    (query_id, neighbor_id, rank, cosine_sim).

    The query side is broadcast — the corpus is scanned once with no
    shuffle; only (n_queries × k) rows move afterwards."""
    q = queries.select(
        F.col(id_col).alias("query_id"), F.col(vec_col).alias("__qvec")
    )
    scored = (
        ensure_parallelism(
            corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("__cvec"))
        )
        .join(F.broadcast(q), F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
    )
    return _ranked_topk(scored, k)


def embedding_dup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: (id_a, id_b, cosine_sim) for
    all pairs with cosine >= threshold — the dedup analog of knn search.

    Exact all-pairs similarity is O(n²·d) dense arithmetic: per-pair
    Catalyst expressions (zip_with + aggregate) pay higher-order-function
    overhead per element (~40x slower measured), so this is the one place
    the engine deliberately drops to Arrow + numpy: the corpus matrix is
    L2-normalized and broadcast, and each Arrow batch computes a
    (batch × corpus) BLAS matmul, emitting only threshold-passing pairs.

    The broadcast bounds this to corpora that fit in executor memory
    (~1M x 64 floats = 256 MB) — which is inherent to exact all-pairs
    anyway; beyond that, prefilter candidates with sign-LSH buckets
    (``knn_lsh``'s join) or block both sides."""
    import numpy as np
    import pandas as pd

    spark = df.sparkSession
    rows = df.select(id_col, vec_col).collect()
    ids = np.array([r[0] for r in rows], dtype=np.int64)
    mat = np.array([list(r[1]) for r in rows], dtype=np.float64)
    mat /= np.linalg.norm(mat, axis=1, keepdims=True)
    b = spark.sparkContext.broadcast((ids, mat))

    def block(batches):
        bids, bmat = b.value
        for pdf in batches:
            if not len(pdf):
                continue
            x = np.array([list(v) for v in pdf[vec_col]], dtype=np.float64)
            x /= np.linalg.norm(x, axis=1, keepdims=True)
            scores = np.round(x @ bmat.T, 6)
            xids = pdf[id_col].to_numpy()
            ii, jj = np.nonzero(
                (scores >= threshold) & (xids[:, None] < bids[None, :])
            )
            yield pd.DataFrame(
                {
                    "id_a": xids[ii],
                    "id_b": bids[jj],
                    "cosine_sim": scores[ii, jj],
                }
            )

    # no repartition here: the matmul wants few LARGE Arrow batches —
    # splitting 2k rows across 32 partitions costs a shuffle and per-batch
    # numpy overhead for no parallel win (BLAS saturates a core per block)
    return df.select(id_col, vec_col).mapInPandas(
        block, schema="id_a long, id_b long, cosine_sim double"
    )


def sign_bucket(vec_col: Column | str, nbits: int = 8) -> Column:
    """Deterministic LSH bucket: concatenated sign bits of the first
    ``nbits`` dimensions (axis-aligned hyperplane family)."""
    v = F.col(vec_col) if isinstance(vec_col, str) else vec_col
    return F.concat(
        *[
            F.when(v[i] >= 0, F.lit("1")).otherwise(F.lit("0"))
            for i in range(nbits)
        ]
    )


def knn_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors in the query's sign
    bucket. Same output schema as knn_bruteforce; recall < 1 by design.

    Scale: corpus is pre-bucketed once (could be written bucketed-by
    bucket key); each query touches ~corpus/2^nbits vectors via an
    equi-join — no cross join anywhere."""
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        sign_bucket(vec_col, nbits).alias("__bucket"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        sign_bucket(vec_col, nbits).alias("__bucket"),
    )
    scored = (
        c.join(F.broadcast(q), on="__bucket")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
    )
    return _ranked_topk(scored, k)


def knn_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_centroids: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style approximate top-k: learn coarse centroids with KMeans
    (pyspark.ml), assign every vector to its nearest centroid, and score
    queries only against their own cell — the learned-partition upgrade of
    the axis-aligned ``knn_lsh`` (same equi-join shape, better-balanced
    cells). Probing more cells trades latency for recall; this single-probe
    form is the baseline."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    featurized = ensure_parallelism(corpus).select(
        F.col(id_col), F.col(vec_col),
        array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
    )
    model = KMeans(k=n_centroids, seed=42, featuresCol="features").fit(featurized)
    c = model.transform(featurized).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cvec"),
        F.col("prediction").alias("__cell"),
    )
    q = model.transform(
        queries.select(
            F.col(id_col), F.col(vec_col),
            array_to_vector(F.col(vec_col).cast("array<double>")).alias("features"),
        )
    ).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qvec"),
        F.col("prediction").alias("__cell"),
    )
    scored = (
        c.join(F.broadcast(q), on="__cell")
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .withColumn("cosine_sim", F.round(cosine(F.col("__qvec"), F.col("__cvec")), 6))
    )
    return _ranked_topk(scored, k)
