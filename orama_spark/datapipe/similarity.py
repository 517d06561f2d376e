"""Similarity search over embedding columns (array<float/double>).

  * brute_force_topk — exact cosine top-k (the correctness baseline;
    scan + TakeOrdered, no shuffle — scan-bound at any scale)
  * ivf_build / ivf_topk — IVF-style sublinear path: k-means-ish
    centroids from a deterministic sample, vectors bucketed by nearest
    centroid; queries probe the ``nprobe`` nearest partitions only.
    At 10^12 vectors this turns a full scan into a partition-pruned
    scan (centroid id is a partition column of the written index).
  * hyperplane_topk — LSH alternative: Hamming-ranked candidate pool by
    random-hyperplane sketch, exact cosine re-rank of the pool.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
from pyspark.sql import DataFrame, functions as F

from ..query.vector import cosine_sim


def brute_force_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k: one scan, per-partition heaps (TakeOrdered)."""
    return (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.round(cosine_sim(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def _norm_rows(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    n[n == 0] = 1.0
    return m / n


def ivf_build(
    embeddings: DataFrame,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample: int = 2048,
    iters: int = 5,
    seed: int = 3,
    init: str = "kmeans",
):
    """Centroids + bucketed assignment; returns (assigned_df with a
    'centroid' column, centroids ndarray). The assignment is a pure
    expression (argmax of cosines), so the bucketed index can be
    written partitionBy('centroid') and queries prune partitions.

    init='kmeans' (default): mini k-means on a RANDOM driver-side
    sample — df.sample() spans all partitions (a limit().collect()
    would take the first partition's rows and learn one shard's
    distribution at scale). init='by_id': centroids are the embeddings
    of the n_centroids smallest ids — fully deterministic AND
    reproducible in plain SQL, which is what gives the ANN driver query
    a value-level DuckDB oracle (k-means quality is better; the scale
    structure — bucketed index, pruned probe — is identical)."""
    if init == "by_id":
        rows = (
            embeddings.select(id_col, vec_col)
            .orderBy(id_col)
            .limit(n_centroids)
            .collect()
        )
        cents = np.array([r[1] for r in rows], dtype=np.float64)
    else:
        n_total = embeddings.count()
        frac = min(1.0, (sample * 1.25) / max(n_total, 1))
        rows = (
            embeddings.select(vec_col)
            .sample(fraction=frac, seed=seed)
            .limit(sample)
            .collect()
        )
        x = _norm_rows(np.array([r[0] for r in rows], dtype=np.float64))
        rng = np.random.default_rng(seed)
        cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
        for _ in range(iters):
            assign = np.argmax(x @ cents.T, axis=1)
            for c in range(len(cents)):
                members = x[assign == c]
                if len(members):
                    v = members.mean(axis=0)
                    nv = np.linalg.norm(v)
                    if nv > 0:
                        cents[c] = v / nv
    sims = [
        F.struct(
            cosine_sim(F.col(vec_col), cents[c]).alias("sim"),
            F.lit(c).alias("c"),
        )
        for c in range(len(cents))
    ]
    assigned = embeddings.withColumn("centroid", F.array_max(F.array(*sims))["c"])
    return assigned, cents


def ivf_topk(
    assigned: DataFrame,
    centroids: np.ndarray,
    query: Sequence[float],
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Probe the nprobe nearest centroid buckets, exact re-rank inside.
    Centroids are row-normalized before ranking so the probe order is
    by COSINE regardless of init (by_id centroids are unnormalized);
    ties break on centroid id asc (argsort is stable)."""
    q = np.asarray(query, dtype=np.float64)
    qn = q / (np.linalg.norm(q) or 1.0)
    order = np.argsort(-(_norm_rows(np.asarray(centroids, dtype=np.float64)) @ qn))
    probe = [int(c) for c in order[:nprobe]]
    return (
        assigned.where(F.col("centroid").isin(probe))
        .select(
            F.col(id_col).alias("id"),
            F.round(cosine_sim(F.col(vec_col), query), 6).alias("cosine"),
        )
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )


def ivf_write(
    assigned: DataFrame,
    centroids: np.ndarray,
    out_dir: str,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> None:
    """Persist the IVF index partitioned BY CENTROID: a probe query then
    scans only nprobe/#centroids of the data — the partition-pruned
    sublinear path at 10^12 vectors (directory-level pruning, no file
    even opened for unprobed buckets)."""
    import json
    import os

    assigned.select(id_col, vec_col, "centroid").write.mode(
        "overwrite"
    ).partitionBy("centroid").parquet(os.path.join(out_dir, "ivf"))
    with open(os.path.join(out_dir, "centroids.json"), "w") as f:
        json.dump([[float(x) for x in c] for c in centroids], f)


def ivf_load(spark, out_dir: str):
    """(assigned_df, centroids) back from ivf_write."""
    import json
    import os

    with open(os.path.join(out_dir, "centroids.json")) as f:
        cents = np.array(json.load(f), dtype=np.float64)
    return spark.read.parquet(os.path.join(out_dir, "ivf")), cents


def hyperplane_topk(
    embeddings: DataFrame,
    query: Sequence[float],
    k: int = 10,
    n_planes: int = 16,
    pool: int = 200,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 11,
) -> DataFrame:
    """LSH candidate pool by sketch Hamming distance to the query's
    sketch, exact cosine re-rank of the pool (approximate recall)."""
    rng = np.random.default_rng(seed)
    first = embeddings.select(F.size(vec_col).alias("d")).first()
    planes = rng.standard_normal((n_planes, first["d"]))
    q = np.asarray(query, dtype=np.float64)

    def sketch_bits(vec_expr):
        bits = F.lit(0).cast("long")
        for j in range(n_planes):
            dot = F.aggregate(
                F.zip_with(
                    vec_expr,
                    F.array(*[F.lit(float(x)) for x in planes[j]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            bits = bits.bitwiseOR(
                F.when(dot >= 0, F.lit(1 << j).cast("long")).otherwise(F.lit(0).cast("long"))
            )
        return bits

    q_bits = 0
    for j in range(n_planes):
        if float(planes[j] @ q) >= 0:
            q_bits |= 1 << j
    cand = (
        embeddings.select(
            F.col(id_col).alias("id"),
            F.col(vec_col).alias("v"),
            F.bit_count(sketch_bits(F.col(vec_col)).bitwiseXOR(F.lit(q_bits))).alias("ham"),
        )
        .orderBy(F.asc("ham"), F.asc("id"))
        .limit(pool)
    )
    return (
        cand.select("id", F.round(cosine_sim(F.col("v"), query), 6).alias("cosine"))
        .orderBy(F.desc("cosine"), F.asc("id"))
        .limit(k)
    )
