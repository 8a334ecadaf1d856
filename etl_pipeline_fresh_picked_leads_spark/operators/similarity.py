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


def cosine_self_join(
    vecs: DataFrame, threshold: float = 0.4, tile_rows: int = 4096
) -> DataFrame:
    """All pairs (a < b) with cosine >= threshold — exact, fully
    distributed blocked matmul (no driver materialization of the
    corpus, ever):

    1. every vector gets a deterministic tile id ``xxhash64(vec_id) %
       B`` where ``B = ceil(n / tile_rows)``;
    2. each side replicates its rows to the block-pair keys it
       participates in (left tile i -> keys (i, i..B-1); right tile j
       -> keys (0..j, j)) via ``explode(sequence(...))`` — pure JVM;
    3. ``cogroup().applyInPandas`` receives the two tiles of each
       (i, j) key and scores them with one BLAS gemm, emitting only
       pairs at/above threshold (output-sensitive).

    Cost: shuffle is n*B rows (= n^2/tile_rows — the unavoidable
    blocked all-pairs footprint), per-task memory is two tiles plus a
    sub-chunked score matrix, independent of corpus size.  At 100 TB
    the same plan holds: tiles stream through executors; nothing is
    ever collected.  Prune candidates with IVF/LSH first when even
    n^2/tile_rows shuffles too much; the scoring kernel is unchanged.
    """
    import numpy as np
    import pandas as pd

    from pyspark.sql.types import (
        DoubleType,
        LongType,
        StructField,
        StructType,
    )

    n = vecs.count()  # aggregate only — no row data reaches the driver
    n_tiles = max(1, -(-n // tile_rows))

    base = vecs.select("vec_id", "embedding").withColumn(
        "blk", F.pmod(F.xxhash64("vec_id"), F.lit(n_tiles)).cast("int")
    )
    left = base.withColumn(
        "bj", F.explode(F.sequence(F.col("blk"), F.lit(n_tiles - 1)))
    ).withColumnRenamed("blk", "bi")
    # distinct column names on the right side: a self-cogroup reuses the
    # left side's attribute exprIds otherwise and Catalyst silently drops
    # the duplicated vec_id/embedding columns from the right groups
    right = base.select(
        F.col("vec_id").alias("rvec_id"),
        F.col("embedding").alias("rembedding"),
        F.explode(F.sequence(F.lit(0), F.col("blk"))).alias("bi"),
        F.col("blk").alias("bj"),
    )

    schema = StructType(
        [
            StructField("vec_id_a", LongType()),
            StructField("vec_id_b", LongType()),
            StructField("cosine", DoubleType()),
        ]
    )

    def _unit(pdf, id_col, vec_col):
        ids = pdf[id_col].to_numpy(dtype=np.int64)
        m = np.array([np.asarray(v) for v in pdf[vec_col]], dtype=np.float64)
        nrm = np.sqrt((m * m).sum(axis=1))
        ok = nrm > 0
        return ids[ok], m[ok] / nrm[ok, None]

    def score(key, lpdf, rpdf):
        if lpdf.empty or rpdf.empty:
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cosine": []})
        lid, lu = _unit(lpdf, "vec_id", "embedding")
        rid, ru = _unit(rpdf, "rvec_id", "rembedding")
        if not len(lid) or not len(rid):
            return pd.DataFrame({"vec_id_a": [], "vec_id_b": [], "cosine": []})
        out = []
        # sub-chunk the left tile so the score matrix stays ~32 MB
        step = max(1, (4 << 20) // max(1, len(rid)))
        for s in range(0, len(lid), step):
            cos = np.round(lu[s : s + step] @ ru.T, 6)
            li, ri = np.nonzero(
                (cos >= threshold) & (lid[s : s + step, None] != rid[None, :])
            )
            la, rb = lid[s + li], rid[ri]
            out.append(
                pd.DataFrame(
                    {
                        "vec_id_a": np.minimum(la, rb),
                        "vec_id_b": np.maximum(la, rb),
                        "cosine": cos[li, ri],
                    }
                )
            )
        res = pd.concat(out, ignore_index=True) if out else pd.DataFrame(
            {"vec_id_a": [], "vec_id_b": [], "cosine": []}
        )
        if key[0] == key[1]:
            # diagonal tile sees each unordered pair twice (x,y)+(y,x)
            res = res[res["vec_id_a"] < res["vec_id_b"]].drop_duplicates(
                ["vec_id_a", "vec_id_b"]
            )
        return res

    return (
        left.groupBy("bi", "bj")
        .cogroup(right.groupBy("bi", "bj"))
        .applyInPandas(score, schema)
    )


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
            # mask zero-norm rows (cosine undefined): NaN sorts ABOVE
            # every double in Spark's descending order and would hijack
            # the top-k; cosine_topk filters nrm > 0 — mirror it here.
            ok = norms > 0
            if not ok.any():
                continue
            cos = (m[ok] @ q) / (norms[ok] * qn)
            yield pd.DataFrame(
                {
                    "vec_id": pdf["vec_id"].to_numpy()[ok],
                    "cosine": np.round(cos, 6),
                }
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
