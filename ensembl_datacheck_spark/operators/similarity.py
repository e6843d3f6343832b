"""Approximate-nearest-neighbor search over an embedding column
(`array<float>`), for near-dup mining and retrieval over training data.

Tiers:

* **brute-force top-k** — the exactness baseline: broadcast the (small)
  query set, JVM-side dot products (`zip_with` + `aggregate`), window
  top-k.  Cost O(|corpus| × |queries|) but embarrassingly parallel and
  shuffle-free until the final per-query top-k (tiny).
* **LSH (random hyperplanes)** — sign-bit signatures bucket the corpus;
  queries probe only their bucket (+ multiprobe neighbors).  Recall/cost
  dialed by n_planes.
* **IVF (inverted file)** — deterministic centroid selection, assignment
  = argmax centroid dot product, search restricted to nprobe nearest
  lists.  The 100-TB path: the corpus is shuffled once by list id
  (bucketed layout), each query touches nprobe partitions.

All distance math is JVM-or-Arrow vectorized; no per-row Python.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ensembl_datacheck_spark.functions.arrays import cosine_similarity, l2_norm


def _norm_col(vec):
    return F.transform(vec, lambda x: x / F.nullif(l2_norm(vec), F.lit(0.0)))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
) -> DataFrame:
    """Exact cosine top-k: (query_id, neighbor_id, cosine, rank).
    Ties broken by neighbor id for full determinism."""
    q = F.broadcast(
        queries.select(
            F.col(id_col).alias("query_id"), F.col(vec_col).alias("q_vec")
        )
    )
    c = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("c_vec"))
    scored = (
        c.crossJoin(q)
        .filter(F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def hyperplane_signature(vec, planes: np.ndarray):
    """Sign-bit signature as a long: bit_j = (vec · plane_j) > 0.
    Planes are embedded as literals (broadcast with the plan)."""
    bits = []
    for j, p in enumerate(planes):
        dot = F.aggregate(
            F.zip_with(
                vec,
                F.array(*[F.lit(float(x)) for x in p]),
                lambda a, b: a * b,
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
        bits.append(F.when(dot > 0, F.lit(1 << j)).otherwise(F.lit(0)))
    out = bits[0]
    for b in bits[1:]:
        out = out + b
    return out.cast("long")


def random_planes(dim: int, n_planes: int = 16, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_planes: int = 12,
    seed: int = 42,
) -> DataFrame:
    """LSH-bucketed ANN: corpus and queries hashed into 2^n_planes sign
    buckets; candidates = same-bucket pairs, reranked exactly.  Recall is
    tunable via n_planes (fewer planes → bigger buckets → higher recall);
    multiprobe left for the scale path (IVF below covers it)."""
    planes = random_planes(dim, n_planes, seed)
    sig_c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("c_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    sig_q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("q_vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    cand = sig_c.join(F.broadcast(sig_q), "bucket").filter(
        F.col("neighbor_id") != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        "neighbor_id",
        cosine_similarity(F.col("q_vec"), F.col("c_vec")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_assign(
    corpus: DataFrame,
    centroids: np.ndarray,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Assign each vector to its best centroid (argmax dot product) —
    centroid matrix embedded as literals, evaluated JVM-side.  At scale
    the output is written bucketed by `list_id` so probes prune files."""
    dots = F.array(
        *[
            F.aggregate(
                F.zip_with(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in c]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, v: acc + v,
            )
            for c in centroids
        ]
    )
    return corpus.select(
        F.col(id_col),
        F.col(vec_col),
        (F.array_position(dots, F.array_max(dots)) - 1).cast("int").alias("list_id"),
    )


def deterministic_centroids(
    corpus: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Deterministic centroid seed: the n_lists lowest-id normalized
    vectors (k-means init left as a refinement; determinism matters more
    for validation reproducibility)."""
    rows = (
        corpus.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_lists)
        .collect()
    )
    m = np.array([r[vec_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(m, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    return m / norms


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """IVF ANN: search only the nprobe lists whose centroids are closest
    to each query.  Exact rerank within probed lists."""
    cents = deterministic_centroids(corpus, n_lists, id_col, vec_col)
    assigned = ivf_assign(corpus, cents, id_col, vec_col)

    # driver-side probe-list computation for the (small) query set
    qrows = queries.select(id_col, vec_col).collect()
    qids, probes = [], []
    for r in qrows:
        v = np.asarray(r[vec_col], dtype=np.float64)
        n = np.linalg.norm(v) or 1.0
        sims = cents @ (v / n)
        top = np.argsort(-sims)[:nprobe]
        for lid in top:
            probes.append((r[id_col], int(lid), [float(x) for x in v]))
    spark = corpus.sparkSession
    qdf = F.broadcast(
        spark.createDataFrame(
            probes, f"query_id long, list_id int, q_vec array<double>"
        )
    )
    cand = assigned.join(qdf, "list_id").filter(
        F.col(id_col) != F.col("query_id")
    )
    scored = cand.select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        cosine_similarity(
            F.col("q_vec"), F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def embedding_near_duplicates(
    corpus: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    min_cosine: float = 0.9,
    n_planes: int = 10,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-dup pairs via LSH self-join: same sign-bucket
    pairs with cosine ≥ threshold.  (id_a < id_b, cosine)."""
    planes = random_planes(dim, n_planes, seed)
    sig = corpus.select(
        F.col(id_col).alias("id"),
        F.col(vec_col).alias("vec"),
        hyperplane_signature(F.col(vec_col), planes).alias("bucket"),
    )
    a = sig.select(F.col("id").alias("id_a"), F.col("vec").alias("vec_a"), "bucket")
    b = sig.select(F.col("id").alias("id_b"), F.col("vec").alias("vec_b"), "bucket")
    return (
        a.join(b, "bucket")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine_similarity(F.col("vec_a"), F.col("vec_b")).alias("cosine"),
        )
        .filter(F.col("cosine") >= min_cosine)
    )
