"""Similarity search over embedding columns (SURVEY §2B-K,
north_star "similarity search").

- exact cosine top-k: brute force with JVM higher-order functions
  (zip_with + aggregate) or Arrow/BLAS matvec — the correctness
  baselines;
- exact threshold self-join: distributed blocked matmul over
  cogrouped tiles (no driver materialization — see
  ``cosine_self_join``);
- IVF approximate top-k: seeded spherical k-means coarse quantizer
  (fit on a hash-deterministic sample), multi-cell assignment, probe
  the ``nprobe`` centroids nearest the query — the 100 TB path:
  candidate set shrinks by ~nlist/(nprobe*replicas), and cell
  selection is a map-only JVM expression (centroids are plan
  literals).

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

# Centroid side index: the k-means fit is the dominant cost of
# ivf_topk/ivf_self_join and is a pure function of (corpus content,
# nlist, seed, sample_cap) — so it is cached at two levels, keyed by a
# corpus fingerprint:
#
# 1. in-process dict (same session, zero I/O);
# 2. a TxTable under the scratch root (survives sessions; concurrent
#    writers are safe — the index is append-only and a lost race just
#    re-fits).
#
# The fingerprint is one cheap aggregate scan (count + decimal sum of
# xxhash64(vec_id, embedding)) — content-sensitive, order-insensitive,
# and ~free next to a 20-iteration k-means.  At 100 TB the same shape
# holds: any mutation changes the fingerprint, so a stale index can
# never be silently reused.
_IVF_CENTER_CACHE: dict[tuple, list[list[float]]] = {}
IVF_FIT_COUNTER = {"fits": 0}  # observable by tests/benchmarks
# hierarchical-fit switch point: below this the flat Spark-ML k-means
# is at parity or faster (measured — see ivf_assign); tests patch it
IVF_HIER_FIT_MIN_NLIST = 256


def _ivf_index_root() -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), "fpl_spark_scratch", "ivf_index"
    )


def _corpus_fingerprint(vecs: DataFrame, vec_col: str) -> tuple[int, int]:
    row = (
        vecs.select(F.xxhash64("vec_id", F.col(vec_col)).alias("h"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("h").cast("decimal(38,0)")).alias("s"),
        )
        .collect()[0]
    )
    return int(row.n), int(row.s or 0)


def _load_cached_centers(spark, key: tuple) -> list[list[float]] | None:
    from ..sources.txtable import TxTable

    if key in _IVF_CENTER_CACHE:
        return _IVF_CENTER_CACHE[key]
    root = _ivf_index_root()
    if not TxTable.is_table(root):
        return None
    fp_n, fp_s, nlist, seed, sample_cap = key
    rows = (
        TxTable(spark, root)
        .read()
        .filter(
            (F.col("fp_n") == fp_n)
            & (F.col("fp_s") == str(fp_s))
            & (F.col("nlist") == nlist)
            & (F.col("seed") == seed)
            & (F.col("sample_cap") == sample_cap)
        )
        .select("centroid_id", "cv")
        .collect()  # nlist x dim — broadcast-sized by construction
    )
    if len(rows) != nlist:
        return None
    centers = [list(map(float, r.cv)) for r in sorted(rows, key=lambda r: r.centroid_id)]
    _IVF_CENTER_CACHE[key] = centers
    return centers


def _store_cached_centers(spark, key: tuple, centers: list[list[float]]) -> None:
    from ..sources.txtable import TxConflictError, TxTable

    _IVF_CENTER_CACHE[key] = centers
    fp_n, fp_s, nlist, seed, sample_cap = key
    df = spark.createDataFrame(
        [
            (fp_n, str(fp_s), nlist, seed, sample_cap, i, c)
            for i, c in enumerate(centers)
        ],
        "fp_n long, fp_s string, nlist int, seed int, sample_cap long, "
        "centroid_id int, cv array<double>",
    )
    root = _ivf_index_root()
    try:
        if TxTable.is_table(root):
            # idempotent: a txn tag for this key is committed once even
            # if two sessions race to index the same corpus
            TxTable(spark, root).append(df, txn=f"ivf-{fp_n}-{fp_s}-{nlist}-{seed}-{sample_cap}")
        else:
            TxTable.create(spark, root, df)
    except (TxConflictError, OSError):  # best-effort: losing the race
        pass  # just means the other writer's identical fit landed


_IVF_FIT_N: dict[tuple, int] = {}  # key -> corpus size at LAST k-means
# fit (drift accounting for ivf_append; carried forward on appends)


def _meta_index_root() -> str:
    import os
    import tempfile

    return os.path.join(
        tempfile.gettempdir(), "fpl_spark_scratch", "ivf_index_meta"
    )


def _load_fit_n(spark, key: tuple) -> "int | None":
    from ..sources.txtable import TxTable

    if key in _IVF_FIT_N:
        return _IVF_FIT_N[key]
    root = _meta_index_root()
    if not TxTable.is_table(root):
        return None
    fp_n, fp_s, nlist, seed, sample_cap = key
    rows = (
        TxTable(spark, root)
        .read()
        .filter(
            (F.col("fp_n") == fp_n)
            & (F.col("fp_s") == str(fp_s))
            & (F.col("nlist") == nlist)
            & (F.col("seed") == seed)
            & (F.col("sample_cap") == sample_cap)
        )
        .select("fit_n")
        .collect()
    )
    if not rows:
        return None
    _IVF_FIT_N[key] = int(rows[0].fit_n)
    return _IVF_FIT_N[key]


def _store_fit_n(spark, key: tuple, fit_n: int) -> None:
    from ..sources.txtable import TxConflictError, TxTable

    _IVF_FIT_N[key] = fit_n
    fp_n, fp_s, nlist, seed, sample_cap = key
    df = spark.createDataFrame(
        [(fp_n, str(fp_s), nlist, seed, sample_cap, fit_n)],
        "fp_n long, fp_s string, nlist int, seed int, sample_cap long, "
        "fit_n long",
    )
    root = _meta_index_root()
    try:
        if TxTable.is_table(root):
            TxTable(spark, root).append(
                df, txn=f"ivfm-{fp_n}-{fp_s}-{nlist}-{seed}-{sample_cap}"
            )
        else:
            TxTable.create(spark, root, df)
    except (TxConflictError, OSError):
        pass  # losing the race means the twin's identical row landed


def _nearest_cell_expr(centers: list, vec_col: str):
    """Map-only nearest-centroid expression (single nested literals,
    zero Py4J-per-coordinate cost — see ivf_assign's plan note)."""
    cvs = F.lit([[float(x) for x in c] for c in centers])
    cns = F.lit(
        [float(sum(x * x for x in c) ** 0.5) or 1.0 for c in centers]
    )
    scores = F.transform(
        cvs,
        lambda cv, i: _dot(_as_double(F.col(vec_col)), cv)
        / (
            F.greatest(_norm(_as_double(F.col(vec_col))), F.lit(1e-12))
            * F.element_at(cns, i + 1)
        ),
    )
    return F.array_position(scores, F.array_max(scores)).cast("int") - 1


def _local_split_merge(
    spark,
    corpus: DataFrame,
    centers: list,
    hot: int,
    vec_col: str,
    seed: int,
    cell_cap: int = 20_000,
) -> "list | None":
    """Split the HOT cell into two centers and merge the closest
    OTHER pair — center count stays exactly nlist (the cache
    contract).  One map-only assignment pass over the corpus finds
    the cell members and per-cell weights; the Lloyd iterations run
    driver-side numpy on ONLY the hot cell's (capped) vectors — the
    textbook IVF maintenance move (split-merge), at cell cost instead
    of a full k-means over the corpus.  None = not splittable
    (degenerate cell); caller falls back to recommending a full
    refit."""
    import numpy as np

    cell = _nearest_cell_expr(centers, vec_col)
    assigned = corpus.select(
        cell.alias("cell"), _as_double(F.col(vec_col)).alias("v")
    )
    counts = {
        r.cell: r["count"]
        for r in assigned.groupBy("cell").count().collect()
    }
    pts = np.asarray(
        [
            r.v
            for r in assigned.filter(F.col("cell") == hot)
            .limit(cell_cap)
            .collect()
        ],
        dtype=np.float64,
    )
    if len(pts) < 2:
        return None
    # unit-normalize (spherical k-means geometry, like the main fit)
    pts = pts / np.maximum(np.linalg.norm(pts, axis=1, keepdims=True), 1e-12)
    rng = np.random.RandomState(seed)
    # seeded 2-means on the cell
    c = pts[rng.choice(len(pts), 2, replace=False)]
    for _ in range(20):
        d = pts @ c.T  # cosine similarity on unit vectors
        lab = d.argmax(axis=1)
        if len(set(lab.tolist())) < 2:
            lab[d[:, 0].argsort()[: len(pts) // 2]] = 0
            lab[d[:, 0].argsort()[len(pts) // 2:]] = 1
        new = np.stack([pts[lab == j].mean(axis=0) for j in (0, 1)])
        if np.allclose(new, c):
            break
        c = new
    # closest pair among the OTHER centers merges (weighted mean) —
    # the least-resolution-loss victim
    others = [i for i in range(len(centers)) if i != hot]
    if len(others) < 2:
        return None
    arr = np.asarray([centers[i] for i in others], dtype=np.float64)
    u = arr / np.maximum(np.linalg.norm(arr, axis=1, keepdims=True), 1e-12)
    sim = u @ u.T
    np.fill_diagonal(sim, -np.inf)
    a, b = np.unravel_index(np.argmax(sim), sim.shape)
    va, vb = others[a], others[b]
    wa = counts.get(va, 1) or 1
    wb = counts.get(vb, 1) or 1
    merged = (
        np.asarray(centers[va]) * wa + np.asarray(centers[vb]) * wb
    ) / (wa + wb)
    out = [
        list(map(float, centers[i]))
        for i in range(len(centers))
        if i not in (hot, va, vb)
    ]
    out += [list(map(float, merged)), list(map(float, c[0])), list(map(float, c[1]))]
    return sorted(out)  # value-sorted, the fit's determinism convention


def ivf_append(
    spark,
    batch: DataFrame,
    base_fp: tuple,
    nlist: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = 100_000,
    drift_frac: float = 0.2,
    hot_cell_factor: float = 8.0,
    refit_with: "DataFrame | None" = None,
    local_refit: bool = False,
) -> dict:
    """INDEX MAINTENANCE for a growing corpus (r10, VERDICT r9 #6):
    register the existing centroids under the APPENDED corpus's
    fingerprint so the next ivf query skips the k-means — cost ∝ the
    batch, never the corpus.  The corpus fingerprint (count + summed
    xxhash64) is ADDITIVE, so the grown corpus's key is computed from
    ``base_fp`` + the batch's own fingerprint without touching the
    base data; pre-r10 ANY append refit from scratch (a full k-means
    per day for <1% drift on a daily-append embedding table).

    Drift accounting: ``fit_n`` (corpus size at the last real fit)
    rides every append; a refit is triggered when EITHER
    - total appended since the fit exceeds ``drift_frac * fit_n``, or
    - the batch is hot-spotted: one cell absorbs more than
      ``hot_cell_factor`` times the average batch share (per-cell
      assignment counts over the batch — a new data mode is pouring
      into one cell, where recall degrades first).
    With ``refit_with`` (the full grown corpus) the refit runs
    immediately and resets the accounting; without it NOTHING is
    registered under the grown key (stale centers must not serve a
    drifted corpus) — ``refit_recommended`` is returned for the
    maintenance job, and the next ivf query on the grown corpus
    refits implicitly via its cache miss.

    ``local_refit`` (r11, VERDICT r10 #6): a HOT-ONLY trigger (new
    data mode pouring into one cell, volume drift still under
    ``drift_frac``) is repaired by SPLIT-MERGE instead of a full
    k-means — the hot cell splits in two (seeded Lloyd on only that
    cell's capped vectors) and the closest other pair merges
    count-weighted, keeping exactly nlist centers (the cache
    contract).  Cost: one map-only assignment pass over
    ``refit_with`` plus a driver-side 2-means on the cell — no
    corpus-scale k-means iterations.  The volume-drift clock (fit_n)
    keeps running, so accumulated growth still forces a real refit
    later.  Degenerate cells (nothing to split) fall back to
    ``refit_recommended``.

    Returns {"fp", "batch_rows", "appended_since_fit", "refit",
    "refit_local", "refit_recommended", "hot_cell_frac"}."""
    key_old = (base_fp[0], base_fp[1], nlist, seed, sample_cap)
    centers = _load_cached_centers(spark, key_old)
    if centers is None:
        raise ValueError(
            "ivf_append: no cached index for base_fp — run "
            "ivf_assign/ivf_topk on the base corpus first"
        )
    nb, sb = _corpus_fingerprint(batch, vec_col)
    new_fp = (base_fp[0] + nb, base_fp[1] + sb)
    key_new = (new_fp[0], new_fp[1], nlist, seed, sample_cap)
    fit_n = _load_fit_n(spark, key_old) or base_fp[0]
    appended = new_fp[0] - fit_n
    # per-cell drift: assign the BATCH (map-only, batch-sized) and
    # look for a hot cell
    hot_frac, hot_cell = 0.0, None
    if nb > 0:
        cell = _nearest_cell_expr(centers, vec_col)
        top = (
            batch.select(cell.alias("cell"))
            .groupBy("cell")
            .count()
            .orderBy(F.desc("count"), "cell")
            .first()
        )
        if top is not None:
            hot_cell = int(top.cell)
            hot_frac = float(top["count"]) / nb
    hot = nb > 0 and hot_frac > min(1.0, hot_cell_factor / len(centers))
    drifted = appended > drift_frac * fit_n
    recommend = drifted or hot
    if recommend:
        if (
            hot
            and not drifted
            and local_refit
            and refit_with is not None
            and nlist >= 3
        ):
            # split-merge repair at cell cost (see docstring)
            new_centers = _local_split_merge(
                spark, refit_with, centers, hot_cell, vec_col, seed
            )
            if new_centers is not None and len(new_centers) == nlist:
                _store_cached_centers(spark, key_new, new_centers)
                # the volume clock keeps running: only a REAL fit
                # resets fit_n
                _store_fit_n(spark, key_new, fit_n)
                return {
                    "fp": new_fp,
                    "batch_rows": nb,
                    "appended_since_fit": appended,
                    "refit": False,
                    "refit_local": True,
                    "refit_recommended": False,
                    "hot_cell_frac": hot_frac,
                }
        if refit_with is not None:
            # full refit on the grown corpus: ivf_assign misses the
            # cache under key_new and fits fresh, resetting fit_n
            ivf_assign(
                refit_with,
                nlist=nlist,
                vec_col=vec_col,
                seed=seed,
                sample_cap=sample_cap,
            )
            return {
                "fp": new_fp,
                "batch_rows": nb,
                "appended_since_fit": 0,
                "refit": True,
                "refit_local": False,
                "refit_recommended": False,
                "hot_cell_frac": hot_frac,
            }
        # drifted and no corpus handle: register NOTHING (stale
        # centers must not serve a drifted corpus) — the next query
        # refits implicitly via its cache miss
        return {
            "fp": new_fp,
            "batch_rows": nb,
            "appended_since_fit": appended,
            "refit": False,
            "refit_local": False,
            "refit_recommended": True,
            "hot_cell_frac": hot_frac,
        }
    _store_cached_centers(spark, key_new, centers)
    _store_fit_n(spark, key_new, fit_n)
    return {
        "fp": new_fp,
        "batch_rows": nb,
        "appended_since_fit": appended,
        "refit": False,
        "refit_local": False,
        "refit_recommended": False,
        "hot_cell_frac": hot_frac,
    }


def _coarse_groups(centers: list, kc: int, seed: int = 7):
    """Tiny driver-side Lloyd k-means over the FINE centroids (nlist
    points, numpy) — builds the two-level routing table.  Deterministic
    (seeded init by hash order); cost is O(nlist * kc * dim * iters)
    on nlist points, microscopic next to any data pass."""
    import numpy as np

    pts = np.asarray(centers, dtype=np.float64)
    rng = np.random.RandomState(seed)
    reps = pts[rng.permutation(len(pts))[:kc]].copy()
    for _ in range(15):
        d = ((pts[:, None, :] - reps[None, :, :]) ** 2).sum(axis=2)
        lab = d.argmin(axis=1)
        for g in range(kc):
            m = pts[lab == g]
            if len(m):
                reps[g] = m.mean(axis=0)
    groups = [[int(j) for j in np.where(lab == g)[0]] for g in range(kc)]
    # an empty coarse group contributes an empty candidate list — keep
    # it (expressions handle zero-length arrays)
    return reps.tolist(), groups


def _fit_centers_hierarchical(
    fit_df: DataFrame, nlist: int, seed: int
) -> list[list[float]]:
    """Two-level centroid fit with a bounded compute budget: ONE
    Spark-ML k-means at kc = ceil(sqrt(nlist)) partitions the sample
    into coarse groups, then every group fits its share of the fine
    centers IN PARALLEL (numpy Lloyd inside applyInPandas, one task
    per group).  Total compute ~ 2 * sample * sqrt(nlist) * dim *
    iters vs the flat fit's sample * nlist * dim * iters; wall-clock
    divides further by the task parallelism.  Fine-center allocation
    is proportional to group size (largest remainder) and capped at
    the group's row count with the deficit redistributed, so exactly
    ``nlist`` centers come back — the center cache requires it.
    Deterministic: seeded coarse fit on the hash-deterministic
    sample, per-group seeded init, and a value-sort of the collected
    centers (collect order is partition-dependent)."""
    import math

    from pyspark.ml.clustering import KMeans

    spark = fit_df.sparkSession
    kc = max(2, math.isqrt(nlist - 1) + 1)
    coarse = KMeans(
        k=kc,
        seed=seed,
        maxIter=10,
        featuresCol="features",
        predictionCol="gid",
    ).fit(fit_df.select("features"))
    assigned = coarse.transform(fit_df).select("gid", "uv")
    sizes = {
        r.gid: r["count"]
        for r in assigned.groupBy("gid").count().collect()
    }
    total = sum(sizes.values())
    # proportional allocation, largest remainder, capacity-capped
    quotas = {g: nlist * c / total for g, c in sizes.items()}
    alloc = {g: min(int(q), sizes[g]) for g, q in quotas.items()}
    deficit = nlist - sum(alloc.values())
    by_remainder = sorted(
        sizes, key=lambda g: (quotas[g] - int(quotas[g])), reverse=True
    )
    while deficit > 0:
        progressed = False
        for g in by_remainder:
            if deficit == 0:
                break
            if alloc[g] < sizes[g]:
                alloc[g] += 1
                deficit -= 1
                progressed = True
        if not progressed:  # sample smaller than nlist: impossible here
            raise ValueError(
                f"cannot place {deficit} centers in a "
                f"{total}-row sample"
            )

    def fit_group(key, pdf):
        import numpy as np
        import pandas as pd

        gid = int(key[0])
        kg = alloc.get(gid, 0)
        if kg == 0 or pdf.empty:
            # dtype=object: a float64-typed empty column trips Arrow's
            # NumPyConverter on the list<double> output schema
            return pd.DataFrame({"cv": pd.Series([], dtype=object)})
        X = np.stack(pdf["uv"].to_numpy())
        kg = min(kg, len(X))
        rng = np.random.RandomState(seed * 1_000_003 + gid)
        C = X[rng.choice(len(X), size=kg, replace=False)].copy()
        for _ in range(15):
            a = (X @ C.T).argmax(axis=1)  # unit vectors: dot == cosine
            for j in range(kg):
                m = X[a == j]
                if len(m):
                    C[j] = m.mean(axis=0)
        return pd.DataFrame({"cv": [c.tolist() for c in C]})

    rows = (
        assigned.groupBy("gid")
        .applyInPandas(fit_group, "cv array<double>")
        .collect()
    )
    centers = sorted([float(x) for x in r.cv] for r in rows)
    assert len(centers) == nlist, (len(centers), nlist)
    return centers


def ivf_assign(
    vecs: DataFrame,
    nlist: int = 16,
    vec_col: str = "embedding",
    seed: int = 42,
    sample_cap: int = 100_000,
    replicas: int = 4,
    use_index: bool = True,
    two_level: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Coarse quantizer: seeded spherical k-means (Spark ML KMeans on
    L2-normalized vectors — Euclidean on the unit sphere is monotone
    in cosine, so the fit clusters by the same geometry the search
    ranks by).  At scale the fit runs on a hash-deterministic sample
    (``xxhash64(vec_id) % mod == 0``, capped at ``sample_cap`` rows —
    k-means quality saturates long before that); the full-corpus
    assignment is one JVM ``model.transform`` pass, no cross join.
    Returns (centroids, assignments); the centroid table is
    nlist x dim — broadcast-sized by construction.

    With ``use_index`` (default) the fitted centroids are reused
    across calls AND sessions via the fingerprint-keyed side index
    (see module comment above): the second ivf query on an unchanged
    corpus skips the k-means entirely and goes straight to the
    map-only assignment pass.

    ``two_level=kc`` routes assignment hierarchically: score ``kc``
    coarse representatives (a driver-side k-means over the FINE
    centroids), probe the best 4 coarse groups, and score only their
    fine members — per-row compute drops from nlist*dim to
    ~(kc + 4*nlist/kc)*dim, which at ``kc ~ sqrt(nlist)`` turns the
    nlist ∝ n assignment from the quadratic term of the 100 TB
    capacity model into ~sqrt(n).  Routing is approximate at coarse-
    group boundaries (the standard IVF-of-IVF trade; recall vs flat
    is pinned in tests); still map-only, still zero Python."""
    spark = vecs.sparkSession
    unit = with_norms(vecs, vec_col)

    centers = None
    key = None
    if use_index:
        fp_n, fp_s = _corpus_fingerprint(vecs, vec_col)
        key = (fp_n, fp_s, nlist, seed, sample_cap)
        centers = _load_cached_centers(spark, key)

    if centers is None:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        fit_df = unit.withColumn(
            "uv", F.transform(F.col("v"), lambda x: x / F.col("nrm"))
        ).withColumn("features", array_to_vector(F.col("uv")))
        n = unit.count()  # aggregate only
        if n > sample_cap:
            mod = n // sample_cap + 1
            fit_df = fit_df.filter(
                F.pmod(F.xxhash64("vec_id"), F.lit(mod)) == 0
            )

        IVF_FIT_COUNTER["fits"] += 1
        n_fit = fit_df.count()
        if nlist >= IVF_HIER_FIT_MIN_NLIST and n_fit >= 4 * nlist:
            # Fit-budget cap (r9, VERDICT r8 #5): a flat k-means is
            # O(sample * nlist * dim * iters) — with nlist ∝ n that is
            # the capacity model's superlinear term (16 s -> 50 s at
            # the 8x probe, hours at 100 M vectors).  The hierarchical
            # fit is O(sample * sqrt(nlist)) coarse + the same again
            # distributed across the fine groups — sub-linear in
            # nlist (measured at the 100k-row sample cap: 9.9 s vs
            # flat 15.1 s at nlist=724, 3.1 s vs 31.7 s at 2048;
            # parity at 256, hence the threshold), same recall regime
            # (pinned in tests).
            centers = _fit_centers_hierarchical(
                fit_df.select("uv", "features"), nlist, seed
            )
        else:
            model = KMeans(
                k=nlist,
                seed=seed,
                maxIter=20,
                featuresCol="features",
                predictionCol="centroid_id",
            ).fit(fit_df.select("features"))
            centers = [
                [float(x) for x in c] for c in model.clusterCenters()
            ]
        if use_index and key is not None:
            _store_cached_centers(spark, key, centers)
            # drift accounting for ivf_append: this IS a real fit, so
            # the corpus size at fit == the fingerprint count
            _store_fit_n(spark, key, key[0])
    centroids = spark.createDataFrame(
        [(i, c) for i, c in enumerate(centers)],
        "centroid_id int, cv array<double>",
    ).withColumn("cn", _norm(F.col("cv")))

    # Multi-assignment: each vector is indexed under its ``replicas``
    # nearest cells (index is replicas x larger; recall no longer caps
    # near nprobe/nlist on isotropic corpora — the standard IVF
    # replication tradeoff).  The centroid matrix is nlist x dim and
    # lives in the plan as TWO nested-array literals (single
    # Literal each — building it from nlist*dim scalar F.lit calls
    # costs one Py4J round-trip per coordinate and at nlist=250/dim=64
    # spent ~19 s constructing the expression before any data moved),
    # so cell selection is a map-only JVM expression: per row, score
    # all centroids, sort, slice top-r, explode.  No shuffle, no
    # window, no Python.
    norms = [float(sum(x * x for x in c) ** 0.5) or 1.0 for c in centers]
    if two_level and two_level < len(centers):
        # hierarchical routing: coarse reps + per-group fine members,
        # all as single nested literals; per-row cost ~(kc + 4*nlist/kc)*dim
        reps, groups = _coarse_groups(centers, two_level)
        rep_lit = F.lit([[float(x) for x in r] for r in reps])
        rep_cn = F.lit(
            [float(sum(x * x for x in r) ** 0.5) or 1.0 for r in reps]
        )
        gid_lit = F.lit(groups)
        gcv_lit = F.lit([[centers[j] for j in g] for g in groups])
        gcn_lit = F.lit([[norms[j] for j in g] for g in groups])

        def rep_score(i):
            rv = F.element_at(rep_lit, i + 1)
            cos = _dot(F.col("v"), rv) / (
                F.col("nrm") * F.element_at(rep_cn, i + 1)
            )
            return F.struct((-cos).alias("negcos"), i.alias("gid"))

        probed = F.slice(
            F.sort_array(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(reps) - 1)), rep_score
                )
            ),
            1,
            min(4, two_level),
        )

        def fine_scores(g):
            ids = F.element_at(gid_lit, g + 1)
            cvs = F.element_at(gcv_lit, g + 1)
            cns = F.element_at(gcn_lit, g + 1)
            # 2-param transform lambda receives (element, 0-based index)
            return F.transform(
                cvs,
                lambda cv, i: F.struct(
                    (
                        -(
                            _dot(F.col("v"), cv)
                            / (F.col("nrm") * F.element_at(cns, i + 1))
                        )
                    ).alias("negcos"),
                    F.element_at(ids, i + 1).alias("cid"),
                ),
            )

        cells = F.slice(
            F.sort_array(
                F.flatten(
                    F.transform(probed, lambda st: fine_scores(st["gid"]))
                )
            ),
            1,
            min(replicas, nlist),
        )
    else:
        cent_lit = F.lit([[float(x) for x in c] for c in centers])
        cn_lit = F.lit(norms)

        def cell_score(i):
            cv = F.element_at(cent_lit, i + 1)
            cos = _dot(F.col("v"), cv) / (
                F.col("nrm") * F.element_at(cn_lit, i + 1)
            )
            return F.struct((-cos).alias("negcos"), i.alias("cid"))

        cells = F.slice(
            F.sort_array(
                F.transform(
                    F.sequence(F.lit(0), F.lit(len(centers) - 1)),
                    cell_score,
                )
            ),
            1,
            min(replicas, nlist),
        )

    assignments = unit.withColumn("cells", cells).select(
        "vec_id",
        "v",
        "nrm",
        F.explode(F.col("cells.cid")).alias("centroid_id"),
    )
    return centroids, assignments


def ivf_topk(
    vecs: DataFrame,
    query_vec_id: int,
    k: int = 10,
    nlist: int = 16,
    nprobe: int = 4,
    replicas: int = 4,
    two_level: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Approximate top-k: search only the ``nprobe`` centroid
    partitions nearest the query.  Candidate count ~ n * nprobe *
    replicas / nlist; recall grows with nprobe and replicas
    (nprobe = nlist degenerates to exact).

    Cache lifetime (r14): the persisted assignments frame (corpus ×
    replicas rows) follows the pins protocol — pin-less calls
    checkpoint the k-row result and release it in ``finally``; before
    r14 every call LEAKED it for the session (the r7 hygiene rule:
    a leaked persist subsidizes the next same-plan run and lies to
    the bench).  Pass ``pins`` to keep the returned plan lazy (the
    plan-fingerprint probe in q_sim_ann_ivf needs it)."""
    centroids, assignments = ivf_assign(
        vecs, nlist, replicas=replicas, two_level=two_level
    )
    # the assignment pipeline (norms + model.transform) feeds both the
    # query-row lookup and the candidate scan — persist so it computes
    # once, not once per branch (the dedup.py:116 recompute trap)
    assignments = assignments.persist()
    # multi-assignment emits one row per (vector, cell): collapse the
    # query back to a single row or every downstream crossJoin(q)
    # multiplies by `replicas` (duplicate probes, duplicate top-k rows)
    q = (
        assignments.filter(F.col("vec_id") == query_vec_id)
        .select(F.col("v").alias("qv"), F.col("nrm").alias("qn"))
        .limit(1)
    )
    ccos = _dot(F.col("cv"), F.col("qv")) / (F.col("cn") * F.col("qn"))
    probe = (
        centroids.crossJoin(F.broadcast(q))
        .select("centroid_id", F.round(ccos, 6).alias("qcos"))
        .orderBy(F.col("qcos").desc(), F.col("centroid_id"))
        .limit(nprobe)
        .select("centroid_id")
    )
    cands = (
        assignments.join(F.broadcast(probe), "centroid_id")
        .filter(F.col("vec_id") != query_vec_id)
        # multi-assignment can land a vector in several probed cells —
        # score each candidate once
        .dropDuplicates(["vec_id"])
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    out = (
        cands.crossJoin(F.broadcast(q))
        .select("vec_id", F.round(cos, 6).alias("cosine"))
        .orderBy(F.col("cosine").desc(), F.col("vec_id"))
        .limit(k)
    )
    if pins is not None:  # caller owns the cache lifetime
        pins.append(assignments)
        return out
    from . import checkpoint_release

    return checkpoint_release(out, [assignments])


def ivf_self_join(
    vecs: DataFrame,
    threshold: float = 0.4,
    nlist: int | None = None,
    replicas: int = 4,
    two_level: int | None = None,
    pins: list | None = None,
) -> DataFrame:
    """Approximate cosine threshold self-join, IVF-pruned: candidates
    are pairs sharing at least one of their ``replicas`` nearest
    cells; only candidates pay the exact cosine (computed in-join,
    JVM fold) and pairs below ``threshold`` drop.  This is the scale
    tier above ``cosine_self_join``: the blocked-matmul shuffle is
    n·B rows, this one is ~n·replicas rows plus the per-cell
    self-join fan-out — at 100 TB you pick it whenever missing a
    cross-cell pair is acceptable (recall vs exact is pinned in
    tests; raise ``replicas`` to trade shuffle for recall).  Same
    pattern as minhash_lsh_pairs: band/cell key join for candidates,
    exact verify on candidates only.

    ``nlist`` defaults to ``max(16, n/64)``: candidate count within a
    cell is quadratic in cell size, so the cell size — not the cell
    COUNT — must stay constant as the corpus grows (nlist ∝ n keeps
    expected cell size ≈ 64·replicas and total candidates ~linear in
    n; a fixed nlist would silently go quadratic at 100×).
    """
    if nlist is None:
        nlist = max(16, vecs.count() // 64)
    _, assignments = ivf_assign(
        vecs, nlist, replicas=replicas, two_level=two_level
    )
    assignments = assignments.persist()
    assignments.count()  # materialize before self-join (dedup.py:116 trap)
    if pins is not None:  # caller releases once downstream materialized
        pins.append(assignments)
    right = assignments.select(
        F.col("centroid_id"),
        F.col("vec_id").alias("rvec_id"),
        F.col("v").alias("rv"),
        F.col("nrm").alias("rnrm"),
    )
    cands = (
        assignments.join(right, "centroid_id")
        .filter(F.col("vec_id") < F.col("rvec_id"))
        .dropDuplicates(["vec_id", "rvec_id"])
    )
    cos = _dot(F.col("v"), F.col("rv")) / (F.col("nrm") * F.col("rnrm"))
    out = cands.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("rvec_id").alias("vec_id_b"),
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
    if pins is not None:
        return out  # caller owns the cache lifetime
    from . import checkpoint_release

    return checkpoint_release(out, [assignments])


def srp_lsh_self_join(
    vecs: DataFrame,
    threshold: float = 0.9,
    planes: int = 96,
    bands: int = 12,
    seed: int = 7,
    pins: list | None = None,
) -> DataFrame:
    """Signed-random-projection (hyperplane) LSH cosine self-join —
    the second sub-quadratic ANN tier next to ``ivf_self_join``, for
    the near-duplicate regime (cosine >= ~0.85) where SRP banding is
    sharp: candidates are pairs agreeing on ALL ``planes/bands`` sign
    bits of at least one band (P[bit match] = 1 - theta/pi, so an
    8-bit band fires at ~77% per band for cosine 0.995 clones but
    ~0.4% for orthogonal noise); only candidates pay the exact cosine
    and pairs below ``threshold`` drop — no false positives, recall
    pinned by tests and the query contract (12 bands of 8 bits:
    measured 0.96/1.00 recall on the planted 0.9-boundary clones at
    sf0.01/sf0.1 vs 0.85/0.92 at 8 bands, same wall cost).  Same
    band-key join shape as minhash_lsh_pairs/ivf_self_join: shuffle
    is n·bands signature rows (~tens of bytes each), never n².

    Hyperplanes are seeded and ship as ONE nested plan literal; the
    signature is a JVM higher-order fold (planes·dim multiplies per
    row, inside whole-stage codegen — at very high dim move the
    signature to a mapInArrow gemm, the verify join is unchanged).
    The signature frame is persisted BEFORE the band explode
    (Generate re-evaluates an inline expensive child per output row)
    and released via ``pins`` or internally when called pin-less.
    """
    import numpy as np

    first = vecs.select("embedding").first()
    if first is None:
        return vecs.sparkSession.createDataFrame(
            [], "vec_id_a long, vec_id_b long, cosine double"
        )
    dim = len(first[0])
    r = planes // bands
    hyper = np.random.default_rng(seed).standard_normal((planes, dim))
    planes_lit = F.lit([[float(x) for x in row] for row in hyper])

    v = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    base = vecs.select("vec_id", v.alias("v"))
    dot_p = lambda p: F.aggregate(  # noqa: E731
        F.zip_with(F.col("v"), p, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    sig = F.transform(
        planes_lit,
        lambda p: F.when(dot_p(p) >= 0, F.lit(1)).otherwise(F.lit(0)),
    )
    sigged = base.select(
        "vec_id", "v", _norm(F.col("v")).alias("nrm"), sig.alias("sig")
    ).persist()
    sigged.count()  # materialize before explode + self-join (dedup traps)
    if pins is not None:
        pins.append(sigged)

    band_structs = F.array(
        *[
            F.struct(
                F.lit(j).alias("band_id"),
                F.aggregate(
                    F.slice(F.col("sig"), j * r + 1, r),
                    F.lit(0),
                    lambda acc, b: acc * 2 + b,
                ).alias("band_key"),
            )
            for j in range(bands)
        ]
    )
    keyed = sigged.select(
        "vec_id", "v", "nrm", F.explode(band_structs).alias("bk")
    ).select("vec_id", "v", "nrm", "bk.band_id", "bk.band_key")
    right = keyed.select(
        F.col("band_id"),
        F.col("band_key"),
        F.col("vec_id").alias("rvec_id"),
        F.col("v").alias("rv"),
        F.col("nrm").alias("rnrm"),
    )
    cands = (
        keyed.join(right, ["band_id", "band_key"])
        .filter(F.col("vec_id") < F.col("rvec_id"))
        .dropDuplicates(["vec_id", "rvec_id"])
    )
    cos = _dot(F.col("v"), F.col("rv")) / (F.col("nrm") * F.col("rnrm"))
    out = cands.select(
        F.col("vec_id").alias("vec_id_a"),
        F.col("rvec_id").alias("vec_id_b"),
        F.round(cos, 6).alias("cosine"),
    ).filter(F.col("cosine") >= threshold)
    if pins is not None:
        return out  # caller owns the cache lifetime
    from . import checkpoint_release

    return checkpoint_release(out, [sigged])


def similarity_join_auto(
    vecs: DataFrame,
    threshold: float = 0.4,
    tile_rows: int = 4096,
    exact_cap: int = 2_000_000,
    n: int | None = None,
    pins: list | None = None,
) -> tuple[DataFrame, str]:
    """Cost-based strategy selection for the similarity self-join —
    the Spark-idiomatic realization of SURVEY §4.3's ``similarity_join``
    optimizer rule.  A Catalyst extension would pick the physical
    strategy from input cardinality statistics; lacking a Python hook
    into the planner, this router makes the SAME decision from the
    same statistic, before the plan is built:

    - estimated exact-tier shuffle is ``n · ceil(n / tile_rows)`` rows
      (the blocked-matmul replication footprint, cosine_self_join);
    - at or under ``exact_cap`` rows the exact tier wins (no recall
      loss, one cogroup); above it the IVF tier is chosen (shuffle
      ~n·replicas assignment rows, recall contract pinned in tests).

    Returns ``(df, route)`` with ``route`` in {"exact", "ivf"} so
    callers (and the oracle, which re-derives the decision from
    ``COUNT(*)`` with the same arithmetic) can observe the choice.
    ``n`` may be passed from a catalog statistic to skip the count
    scan — at 100 TB the row count comes from table metadata, not a
    pre-pass over the data.
    """
    if n is None:
        n = vecs.count()
    est = n * ((n + tile_rows - 1) // tile_rows)
    if est <= exact_cap:
        return cosine_self_join(vecs, threshold, tile_rows), "exact"
    return ivf_self_join(vecs, threshold, pins=pins), "ivf"


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


def quantize_embeddings_int8(
    vecs: DataFrame, vec_col: str = "embedding"
) -> DataFrame:
    """Per-dimension affine int8 quantization: bucket = least(255,
    floor((x - min_d) * 256 / (max_d - min_d))), the standard 4x
    storage/bandwidth shrink for embedding columns at scale (recall
    cost is negligible for coarse search; re-rank on the float
    originals).

    Plan shape: one stats pass (posexplode -> groupBy(dim) min/max —
    map-side partial agg, shuffle carries dim x partitions rows, and
    the result is dim x 2 doubles regardless of corpus size) feeds two
    nested-array plan literals; the quantize pass is then a map-only
    JVM transform — no second shuffle, no Python.  floor (not round)
    keeps the arithmetic bit-identical across engines for the oracle.
    """
    ex = vecs.select(
        F.posexplode(_as_double(F.col(vec_col))).alias("pos", "x")
    )
    stats = (
        ex.groupBy("pos")
        .agg(F.min("x").alias("mn"), F.max("x").alias("mx"))
        .orderBy("pos")
        .collect()  # dim rows — driver-safe at any corpus size
    )
    mns = F.lit([float(r.mn) for r in stats])
    mxs = F.lit([float(r.mx) for r in stats])

    # two-param higher-order lambda ON PURPOSE: pyspark binds (element,
    # index) — here the index is exactly what we need to look up the
    # per-dimension bounds (contrast the dedup.py seed-capture trap,
    # where the index SHADOWED a captured default)
    def q(x, i):
        mn = F.element_at(mns, i + 1)
        mx = F.element_at(mxs, i + 1)
        return F.when(
            mx > mn,
            F.least(
                F.lit(255.0), F.floor((x - mn) * 256.0 / (mx - mn))
            ),
        ).otherwise(F.lit(0.0)).cast("int")

    return vecs.select(
        "vec_id",
        F.transform(_as_double(F.col(vec_col)), q).alias("qvec"),
    )


def cosine_topk_batch(
    vecs: DataFrame, query_ids: list[int], k: int = 10
) -> DataFrame:
    """Multi-query exact top-k — the SERVING shape (a batch of query
    vectors against the corpus), vs ``cosine_topk``'s single probe.
    All query vectors broadcast as one small table; ONE corpus pass
    scores every (vector, query) pair and a per-query row_number trims
    to k — Spark inserts WindowGroupLimit, so each mapper ships at
    most k rows per query, not the scored corpus.  Corpus-side cost is
    nq·dim per row; at 100 TB you batch the day's queries and pay one
    scan for all of them instead of one scan each."""
    from pyspark.sql.window import Window

    base = with_norms(vecs)
    q = base.filter(F.col("vec_id").isin(list(query_ids))).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = _dot(F.col("v"), F.col("qv")) / (F.col("nrm") * F.col("qn"))
    scored = (
        base.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", F.round(cos, 6).alias("cosine"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .drop("rn")
    )
