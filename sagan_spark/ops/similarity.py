"""Similarity search over embedding columns (array<float>).

- cosine(): pure Column-expression dot/norm via zip_with + aggregate —
  JVM-side, no Python. Computed in double for cross-engine stability.
- brute_topk(): baseline exact top-k vs one query vector. Scale shape:
  broadcast the query (a literal array), one narrow pass + a k-row
  global top-k (TakeOrderedAndProject — no full sort, no shuffle of the
  data, only of k-row per-partition heads).
- lsh_bucketed_topk(): the scale path — random-hyperplane LSH signature
  per vector (sign of dot with h fixed seeded hyperplanes); candidates
  share the query's bucket (multi-probe: allow ≤1 differing bit), exact
  cosine re-rank inside. At 10^9 vectors the bucket prune replaces a
  full scan with a hash-partition lookup.
- ivf_topk(): IVF-style alternative — k-means-lite centroids sampled
  deterministically, vectors assigned to nearest centroid (one pass);
  query probes the nearest ``nprobe`` centroids only.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x.cast("double") * x.cast("double"))
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def _qlit(q: list[float]) -> Column:
    return F.array(*[F.lit(float(x)) for x in q])


def brute_topk(
    emb: DataFrame, q: list[float], k: int = 10, id_col: str = "vec_id", vec_col: str = "embedding"
) -> DataFrame:
    """Exact cosine top-k vs a query vector. (vec_id, sim) — deterministic
    tiebreak on id so results are stable across engines."""
    sim = F.round(cosine(F.col(vec_col), _qlit(q)), 6).alias("sim")
    return (
        emb.select(F.col(id_col), sim)
        .orderBy(F.desc("sim"), F.col(id_col))
        .limit(k)
    )


def _hyperplanes(dim: int, nbits: int, seed: int = 42) -> np.ndarray:
    return np.random.default_rng(seed).standard_normal((nbits, dim))


def lsh_signature(vec_col: Column, planes: np.ndarray) -> Column:
    """Bit i = sign(dot(v, plane_i)); packed into a long."""
    sig = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        d = dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        sig = sig.bitwiseOR(
            F.when(d >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(F.lit(0).cast("long"))
        )
    return sig


def lsh_bucketed_topk(
    emb: DataFrame,
    q: list[float],
    k: int = 10,
    nbits: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Approximate top-k: prune to vectors whose LSH bucket is within
    hamming distance 1 of the query's bucket, exact re-rank inside."""
    planes = _hyperplanes(len(q), nbits)
    qsig = 0
    for i, p in enumerate(planes):
        if float(np.dot(q, p)) >= 0:
            qsig |= 1 << i
    with_sig = emb.withColumn("_sig", lsh_signature(F.col(vec_col), planes))
    pruned = with_sig.where(F.bit_count(F.col("_sig").bitwiseXOR(F.lit(qsig))) <= 1)
    return brute_topk(pruned.drop("_sig"), q, k, id_col, vec_col)


def ivf_topk(
    emb: DataFrame,
    q: list[float],
    k: int = 10,
    ncentroids: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF-style ANN: centroids = deterministic sample of the corpus
    (vec_id hash order); assign each vector to its nearest centroid via a
    broadcasted centroid literal; probe the nprobe centroids nearest the
    query; exact re-rank within probed cells."""
    cent_rows = (
        emb.select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string")))
        .limit(ncentroids)
        .collect()
    )
    cents = [list(map(float, r[vec_col])) for r in cent_rows]
    qsims = [
        float(np.dot(q, c) / (np.linalg.norm(q) * np.linalg.norm(c) + 1e-12)) for c in cents
    ]
    probe = sorted(range(len(cents)), key=lambda i: -qsims[i])[:nprobe]

    assign = F.lit(0)
    best = F.lit(-2.0)
    for i, c in enumerate(cents):
        s = cosine(F.col(vec_col), _qlit(c))
        assign = F.when(s > best, F.lit(i)).otherwise(assign)
        best = F.greatest(best, s)
    cell = emb.withColumn("_cell", assign)
    pruned = cell.where(F.col("_cell").isin(probe)).drop("_cell")
    return brute_topk(pruned, q, k, id_col, vec_col)
