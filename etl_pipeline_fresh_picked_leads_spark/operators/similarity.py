"""Similarity search over embedding columns (SURVEY §2B-K,
north_star "similarity search").

- exact cosine top-k / threshold self-join: brute force with JVM
  higher-order functions (zip_with + aggregate) — the correctness
  baseline, quadratic, fine up to ~10^5 x 10^5 with pruning;
- IVF approximate top-k: deterministic coarse quantizer (first
  ``nlist`` vectors as centroids), assign each vector to its nearest
  centroid partition, probe the ``nprobe`` centroids nearest the
  query — the 100 TB path: candidate set shrinks by ~nlist/nprobe,
  and the assignment is a broadcast join (centroid table is tiny).

All float math is widened to double before accumulating; cosine
scores are rounded to 6 dp at the operator boundary (SURVEY §2B
hash-stability note).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def _as_double(col) -> F.Column:
    return F.transform(col, lambda x: x.cast("double"))


def _dot(a, b) -> F.Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def _norm(a) -> F.Column:
    return F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x))


def with_norms(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    v = _as_double(F.col(vec_col))
    return vecs.select(
        "vec_id", v.alias("v"), _norm(v).alias("nrm")
    ).filter(F.col("nrm") > 0)


def cosine_topk(
    vecs: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Exact top-k cosine neighbors of one stored vector (excluding
    itself).  The 1-row query side is broadcast; ordering is on the
    rounded score with vec_id tie-break for determinism."""
    base = with_norms(vecs)
    q = base.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    scored = base.filter(F.col("vec_id") != query_vec_id).crossJoin(
        F.broadcast(q)
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    return (
        scored.select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def cosine_self_join(vecs: DataFrame, threshold: float = 0.4) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — exact, via
    broadcast-block matmul: the (tiny) normalized matrix of all
    vectors is broadcast, each Arrow batch of rows scores against it
    with one BLAS gemm, and only pairs at/above threshold are emitted.
    ~40x the per-pair expression-fold formulation.  When the corpus
    outgrows a broadcastable matrix, tile the right side (block-block
    gemm over a cross of tiles) or prune candidates with IVF/LSH
    first; the scoring kernel stays identical."""
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    rows = (
        vecs.select("vec_id", "embedding").orderBy("vec_id").collect()
    )
    ids = np.array([r.vec_id for r in rows], dtype=np.int64)
    m = np.array([r.embedding for r in rows], dtype=np.float64)
    norms = np.sqrt((m * m).sum(axis=1))
    keep = norms > 0
    ids, m, norms = ids[keep], m[keep], norms[keep]
    unit = m / norms[:, None]
    sc = vecs.sparkSession.sparkContext
    b_ids, b_unit = sc.broadcast(ids), sc.broadcast(unit)

    schema = StructType(
        [
            StructField("vec_id_a", LongType()),
            StructField("vec_id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def score(batches):
        all_ids, all_unit = b_ids.value, b_unit.value
        for pdf in batches:
            bm = np.array([np.asarray(v) for v in pdf["embedding"]], dtype=np.float64)
            bn = np.sqrt((bm * bm).sum(axis=1))
            ok = bn > 0
            if not ok.any():
                continue
            bid = pdf["vec_id"].to_numpy()[ok]
            bu = bm[ok] / bn[ok, None]
            cos = np.round(bu @ all_unit.T, 6)
            li, ri = np.nonzero((cos >= threshold) & (bid[:, None] < all_ids[None, :]))
            yield pd.DataFrame(
                {
                    "vec_id_a": bid[li],
                    "vec_id_b": all_ids[ri],
                    "cosine": cos[li, ri],
                }
            )

    return vecs.select("vec_id", "embedding").mapInPandas(score, schema)


def embedding_near_dup(
    vecs: DataFrame, threshold: float = 0.9
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (>= threshold): same
    machinery as cosine_self_join, tuned as a dedup gate."""
    return cosine_self_join(vecs, threshold)


# --- IVF (inverted-file) approximate search --------------------------------


def ivf_assign(
    vecs: DataFrame, nlist: int = 16, vec_col: str = "embedding"
) -> tuple[DataFrame, DataFrame]:
    """Deterministic coarse quantizer: centroids = the first ``nlist``
    vectors by vec_id (a k-means fit would slot in identically — the
    partitioning contract is 'every vector belongs to its nearest
    centroid').  Returns (centroids, assignments); the centroid table
    is broadcast-sized by construction."""
    base = with_norms(vecs, vec_col)
    centroids = (
        base.orderBy("vec_id")
        .limit(nlist)
        .select(
            F.col("vec_id").alias("centroid_id"),
            F.col("v").alias("cv"),
            F.col("nrm").alias("cn"),
        )
    )
    cos = _dot(F.col("v"), F.col("cv")) / (F.col("nrm") * F.col("cn"))
    scored = base.crossJoin(F.broadcast(centroids)).select(
        "vec_id", "v", "nrm", "centroid_id", F.round(cos, 6).alias("ccos")
    )
    w = Window.partitionBy("vec_id").orderBy(
        F.col("ccos").desc(), F.col("centroid_id")
    )
    assignments = (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "v", "nrm", "centroid_id")
    )
    return centroids, assignments


def ivf_topk(
    vecs: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
) -> DataFrame:
    """Approximate top-k: search only the ``nprobe`` centroid
    partitions nearest the query.  Candidate count ~ n * nprobe/nlist;
    recall grows with nprobe (nprobe = nlist degenerates to exact)."""
    centroids, assignments = ivf_assign(vecs, nlist)
    q = assignments.filter(F.col("vec_id") == query_vec_id).select(
        F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    ccos = _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn"))
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select("centroid_id", F.round(ccos, 6).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    cands = assignments.join(F.broadcast(probe), "centroid_id").filter(
        F.col("vec_id") != query_vec_id
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    return (
        cands.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )


def cosine_topk_vectorized(
    vecs: DataFrame, query_vec_id: int, k: int = 10
) -> DataFrame:
    """Arrow/numpy formulation of cosine_topk: each partition's
    embeddings become one (rows x dim) matrix, scored with a single
    BLAS matvec per Arrow batch via mapInPandas, then a global top-k
    merge.  Same results as the JVM expression form (same oracle);
    this is the shape that wins when dim is large (BLAS beats
    per-element codegen) — the JVM form wins when k and dim are small.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    q_row = (
        vecs.filter(F.col("vec_id") == query_vec_id)
        .select("embedding")
        .collect()
    )
    if not q_row:
        raise ValueError(f"query vec {query_vec_id} not found")
    q = np.asarray(q_row[0][0], dtype=np.float64)
    qn = float(np.sqrt((q * q).sum()))
    schema = StructType(
        [StructField("vec_id", LongType()), StructField("cosine", DoubleType())]
    )

    def score(batches):
        for pdf in batches:
            m = np.vstack(
                [np.asarray(v, dtype=np.float64) for v in pdf["embedding"]]
            )
            norms = np.sqrt((m * m).sum(axis=1))
            cos = (m @ q) / (norms * qn)
            yield pd.DataFrame(
                {"vec_id": pdf["vec_id"].to_numpy(), "cosine": np.round(cos, 6)}
            )

    scored = (
        vecs.filter(F.col("vec_id") != query_vec_id)
        .select("vec_id", "embedding")
        .mapInPandas(score, schema)
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def l2_normalize(vecs: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """L2-normalized copy of the embedding column + the norm itself;
    elementwise values rounded at the operator boundary."""
    v = _as_double(F.col(vec_col))
    nrm = _norm(v)
    return vecs.select(
        "vec_id",
        F.round(nrm, 6).alias("l2_norm"),
        F.transform(v, lambda x: F.round(x / nrm, 6)).alias("unit_vec"),
    )
