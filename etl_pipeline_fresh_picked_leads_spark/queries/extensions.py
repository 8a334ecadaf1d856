"""§2B-K + training-data-pipeline extension queries.

The documents corpus ships with natural near-duplicates (shingle
Jaccard up to ~0.99), so the dedup operators verify against real
structure.  SQL-oracle entries reproduce the exact math in DuckDB
(positions + double sums, rounded 6 dp per the §2B note); hash-family
operators (MinHash/SimHash/IVF) are rows-only with recall invariants
in tests/test_extensions.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.dedup import (
    content_hash_dedup,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from ..operators.multimodal import (
    extract_features,
    payload_metadata,
    with_planted_images,
)
from ..operators.similarity import (
    cosine_self_join,
    cosine_topk,
    embedding_near_dup,
    ivf_topk,
    l2_normalize,
)
from ..operators.text import (
    doc_stats,
    fingerprints,
    language_id,
    quality_scores,
    term_frequencies,
    token_counts,
)
from ..sources.readers import read_table
from .registry import query

# ---------------------------------------------------------------- dedup ----


# The LSH candidate set depends on the xxhash64 family, so the oracle
# (promoted r6, after the r5 IVF pattern) pins the exact ground truth
# plus the detection CONTRACT instead: rows are the exact 3-gram
# Jaccard >= 0.5 pairs (DuckDB-recomputable), and recall_hi_ok
# certifies every pair with Jaccard >= 0.9 was surfaced by the LSH —
# at 8x2 banding the miss probability of a 0.9 pair is
# (1-0.9^2)^8 ~ 2e-7 per pair, and the corpus-level floor is pinned
# 256/256 at sf0.1 in tests.  A broken hash family, banding bug, or
# dropped candidate join flips the flag on every row.
_FUZZY_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
)
SELECT doc_id_a, doc_id_b, jaccard, TRUE AS recall_hi_ok FROM (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         len(list_intersect(a.s, b.s)) * 1.0
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.5
"""


def _lsh_recall_contract(
    exact: DataFrame, lsh_pairs: DataFrame, pins: list | None = None
) -> DataFrame:
    """exact >= 0.5 pairs + a single recall flag: every exact pair at
    Jaccard >= 0.9 must appear in the LSH output (broadcast 1-row
    join; no driver collect).  0.9 band: per-pair miss probability is
    (1-0.81)^8 ~ 2e-7 for the 8x2 banding (~1e-8 for the 8-table ML
    family), so the flag cannot flake on sampling luck; at 0.8 a
    hypothetical [0.8, 0.9) pair would carry ~3e-4 — a visible-red
    risk over many driver rounds.  This corpus's organic pairs are
    all >= 0.9 anyway (measured sf0.01: 25/25).

    Cache lifetime (ADVICE r6): the contract frame is eagerly
    localCheckpoint-ed (pair-count-sized, tiny vs the whole-corpus
    shingle caches) and every upstream pin — the exact-pairs persist
    here plus whatever the caller collected in ``pins`` — is released
    before returning, so a multi-query session (the 50-query oracle
    gate) doesn't accumulate four corpora of cached shingles."""
    exact = exact.persist()
    exact.count()  # the flag's anti-join and the output rows both
    # branch off the expensive gram self-join — without the pin it
    # runs twice (CLAUDE.md persist-before-branching rule)
    keys = ["doc_id_a", "doc_id_b"]
    missed = (
        exact.filter(F.col("jaccard") >= 0.9)
        .select(*keys)
        .join(lsh_pairs.select(*keys), keys, "left_anti")
        .agg((F.count(F.lit(1)) == 0).alias("recall_hi_ok"))
    )
    try:
        return exact.crossJoin(F.broadcast(missed)).localCheckpoint(
            eager=True
        )
    finally:  # a failed materialization must not leak the pins either
        for p in [exact, *(pins or [])]:
            p.unpersist()


def _release_after(df: DataFrame, pins: list) -> DataFrame:
    """Eagerly materialize ``df`` (localCheckpoint — result-sized,
    small) and release the whole-corpus caches collected in ``pins``
    — the companion to the operators' ``pins`` parameter, so a
    multi-query session (the 50-query oracle gate) never accumulates
    dead shingle/signature caches (ADVICE r6).  Release runs in
    ``finally``: a failed materialization must not leak the pins
    either (r7 review)."""
    try:
        return df.localCheckpoint(eager=True)
    finally:
        for p in pins:
            p.unpersist()


def _assert_planted_offset(df: DataFrame, id_col: str, offset: int) -> None:
    """Planted-clone queries re-id clones at ``id + offset`` assuming
    organic ids never reach the offset.  On regenerated/larger driver
    data that assumption could silently break (duplicate ids in the
    union, oracle divergence) — fail loudly instead (ADVICE r6; the
    q_txtable_delete assert pattern).  Scalar agg only — never
    corpus-sized driver traffic."""
    mx = df.agg(F.max(id_col)).collect()[0][0]
    if mx is not None and mx >= offset:
        raise AssertionError(
            f"planted-clone offset {offset} <= max({id_col}) = {mx}: "
            "regenerated corpus outgrew the id headroom — raise the "
            "offset (and its oracle twin) before trusting this contract"
        )


_FUZZY_PLAN_ORACLE = _FUZZY_ORACLE.replace(
    "TRUE AS recall_hi_ok FROM (",
    "TRUE AS recall_hi_ok, TRUE AS plan_band_ok FROM (",
)


def _band_plan_ok(docs: DataFrame) -> bool:
    """Plan fingerprint of the LSH banding stage (r14, VERDICT r13
    #8): compile — never execute — the band-candidate plan over a
    rep-shaped signatures frame (the exact ``_band_candidates``
    composition the query runs) and pin the scale-critical
    invariants: candidates come from a KEY-partitioned equi-join
    (never a cartesian/nested-loop all-pairs plan), within the
    operator's shuffle budget, all-JVM.  Explain-only: no job runs;
    a de-optimization now fails the DRIVER gate, not just pytest."""
    from ..operators.dedup import _band_candidates, minhash_signatures
    from ..plans import formatted_plan, n_exchanges_in

    reps = (
        minhash_signatures(docs, 3)
        .filter(F.size("shingles") > 0)
        .select("doc_id", F.array_sort("shingles").alias("sh"), "sig")
    )
    cand = _band_candidates(reps)
    # ONE plan compile feeds every fingerprint (r15: n_exchanges(df)
    # re-ran formatted_plan — a second full driver-side compile of the
    # 64-hash signature tree)
    plan = formatted_plan(cand)
    return (
        "CartesianProduct" not in plan
        and "BroadcastNestedLoopJoin" not in plan
        and n_exchanges_in(plan) <= 4
        and "ArrowEval" not in plan
        and "BatchEvalPython" not in plan
    )


@query("q_dedup_fuzzy", oracle=_FUZZY_PLAN_ORACLE)
def q_dedup_fuzzy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup pairs at Jaccard >= 0.5, contract-oracle
    form (rows-only history: r1-r5; recall vs the exact q_dedup_ngram
    ground truth additionally asserted in tests).  Both sides branch
    off ONE persisted shingle pass (dedup.lsh_pairs_with_exact) — the
    corpus is tokenized once, not twice.  ``plan_band_ok`` (r14)
    rides every row: the banding stage's plan fingerprint (no
    all-pairs join, bounded shuffles, all-JVM) is TRUE on the oracle
    side, so a plan regression fails the hash gate."""
    from ..operators.dedup import lsh_pairs_with_exact

    docs = read_table(spark, sf_dir, "documents")
    plan_ok = _band_plan_ok(docs)
    pins: list = []
    exact, lsh = lsh_pairs_with_exact(docs, threshold=0.5, pins=pins)
    return _lsh_recall_contract(exact, lsh, pins).withColumn(
        "plan_band_ok", F.lit(bool(plan_ok))
    )


_NGRAM_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
)
SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
       len(list_intersect(a.s, b.s)) * 1.0
         / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) AS jaccard
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE len(list_intersect(a.s, b.s)) * 1.0
        / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35
"""


@query("q_dedup_ngram", oracle=_NGRAM_ORACLE)
def q_dedup_ngram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs word-3-gram Jaccard >= 0.35 — ground truth for
    the LSH variant, SQL-oracle-checked."""
    docs = read_table(spark, sf_dir, "documents")
    pins: list = []
    return _release_after(
        ngram_jaccard_pairs(docs, threshold=0.35, pins=pins), pins
    )


@query("q_dedup_fuzzy_ml", oracle=_FUZZY_ORACLE)
def q_dedup_fuzzy_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark ML MinHashLSH variant (library-parity cross-check of
    q_dedup_fuzzy; seeded), same contract-oracle form (promoted r6):
    with 8 OR-amplified hash tables a 0.9-Jaccard pair is missed with
    probability (1-0.9)^8 ~ 1e-8, so the recall_hi_ok contract holds
    for the library family too (rows-only history: r1-r5)."""
    from ..operators.dedup import lsh_pairs_with_exact

    docs = read_table(spark, sf_dir, "documents")
    pins: list = []
    exact, ml = lsh_pairs_with_exact(docs, threshold=0.5, family="ml", pins=pins)
    return _lsh_recall_contract(exact, ml, pins)


# The simhash signature family (xxhash64) has no DuckDB twin, so the
# oracle pins a PLANTED-pair contract instead (VERDICT r5 item 4):
# clone docs 0-49 verbatim under doc_id+200000 — identical text means
# hamming 0, so chunk banding MUST surface every planted pair — and
# hash the recovered planted set.  One missed pair drops a row and
# fails the row-count gate; organic corpus pairs still get computed
# but are excluded from the hashed surface (they stay pinned by
# tests/test_extensions.py cluster invariants).
# The planted base mirrors simhash_signatures' own eligibility filter
# (length(trim(text)) > 0): a doc_id < 50 with empty/NULL text can
# never produce a signature, so planting it would leave the oracle
# expecting a pair Spark cannot emit on regenerated data.
_SIMHASH_ORACLE = """
SELECT doc_id AS doc_id_a, doc_id + 200000 AS doc_id_b, TRUE AS found
FROM documents
WHERE doc_id < 50 AND length(trim(text)) > 0
"""


@query("q_dedup_simhash", oracle=_SIMHASH_ORACLE)
def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash-64 near-dup pairs at hamming <= 3 via 16-bit chunk
    banding, planted-pair contract form (rows-only history: r1-r5)."""
    docs = read_table(spark, sf_dir, "documents")
    _assert_planted_offset(docs, "doc_id", 200000)
    base = docs.filter(
        (F.col("doc_id") < 50) & (F.length(F.trim(F.col("text"))) > 0)
    )
    clones = base.withColumn("doc_id", F.col("doc_id") + 200000)
    pairs = simhash_pairs(docs.unionByName(clones), max_hamming=3)
    planted = base.select(
        F.col("doc_id").alias("doc_id_a"),
        (F.col("doc_id") + 200000).alias("doc_id_b"),
    )
    return planted.join(
        pairs.select("doc_id_a", "doc_id_b"), ["doc_id_a", "doc_id_b"], "left_semi"
    ).withColumn("found", F.lit(True))


_CONTENT_HASH_ORACLE = """
SELECT md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
         AS content_md5,
       MIN(doc_id) AS survivor_doc_id,
       COUNT(*) AS n_copies
FROM documents
GROUP BY 1
"""


@query("q_dedup_content_hash", oracle=_CONTENT_HASH_ORACLE)
def q_dedup_content_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-hash exact dedup: md5-of-normalized-text survivor table
    (cheapest dedup tier, always first at 100 TB)."""
    docs = read_table(spark, sf_dir, "documents")
    return content_hash_dedup(docs)


# The embedding near-dup gate needs actual near-dupes; the corpus has
# none above 0.52, so the query plants deterministic perturbed clones
# (vec_id + 100000, v -> 0.9v + 0.05) — reproducible on both sides.
_EMBED_DUP_ORACLE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings WHERE vec_id < 50
),
corpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 100000, list_transform(v, x -> 0.9 * x + 0.05) FROM base
),
flat AS (
  SELECT vec_id, i, v[i] AS x
  FROM corpus CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, SUM(a.x * b.x) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_id_a, vec_id_b,
       round(dot / (x.nrm * y.nrm), 6) AS cosine
FROM dots
JOIN norms x ON vec_id_a = x.vec_id
JOIN norms y ON vec_id_b = y.vec_id
WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.9
"""


@query("q_dedup_embed", oracle=_EMBED_DUP_ORACLE)
def q_dedup_embed(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = read_table(spark, sf_dir, "embeddings")
    _assert_planted_offset(emb, "vec_id", 100000)
    base = emb.filter(F.col("vec_id") < 50)
    clones = base.select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(
            F.col("embedding"), lambda x: x.cast("double") * 0.9 + 0.05
        ).alias("embedding"),
    )
    corpus = base.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    ).unionByName(clones)
    return embedding_near_dup(corpus, threshold=0.9)


# SRP-LSH variant over the FULL corpus + the same planted clones: the
# hashed rows stay the exact 0.9 pair set (DuckDB-recomputable);
# recall_ok certifies the hyperplane-banded candidate generation
# recovered >= 80% of them (seeded planes -> deterministic; measured
# 0.96/1.00 at sf0.01/sf0.1 with the 96-plane/12-band default).  On
# regenerated data the planted slice may empty out — both sides then
# degrade to zero rows together.
_EMBED_LSH_ORACLE = """
WITH base AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
corpus AS (
  SELECT vec_id, v FROM base
  UNION ALL
  SELECT vec_id + 100000, list_transform(v, x -> 0.9 * x + 0.05)
  FROM base WHERE vec_id < 50
),
flat AS (
  SELECT vec_id, i, v[i] AS x
  FROM corpus CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, SUM(a.x * b.x) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_id_a, vec_id_b,
       round(dot / (x.nrm * y.nrm), 6) AS cosine,
       TRUE AS recall_ok
FROM dots
JOIN norms x ON vec_id_a = x.vec_id
JOIN norms y ON vec_id_b = y.vec_id
WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.9
"""


@query("q_dedup_embed_lsh", oracle=_EMBED_LSH_ORACLE)
def q_dedup_embed_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding near-dup via signed-random-projection LSH
    (operators/similarity.py srp_lsh_self_join) — the LSH-bucketed
    ANN scale path next to IVF: hyperplane sign-bit bands generate
    candidates (n·bands rows shuffle, never n²), exact cosine verifies
    them.  Runs on the FULL corpus plus q_dedup_embed's planted
    perturbed clones; rows are the exact pair set, recall_ok the
    contract flag."""
    from ..operators.similarity import srp_lsh_self_join

    emb = read_table(spark, sf_dir, "embeddings")
    _assert_planted_offset(emb, "vec_id", 100000)
    base = emb.select(
        "vec_id",
        F.transform(F.col("embedding"), lambda x: x.cast("double")).alias(
            "embedding"
        ),
    )
    clones = base.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 100000).alias("vec_id"),
        F.transform(F.col("embedding"), lambda x: x * 0.9 + 0.05).alias(
            "embedding"
        ),
    )
    corpus = base.unionByName(clones).persist()
    corpus.count()  # two consumers (exact + LSH) — scan once
    pins: list = [corpus]
    # three consumers (rows + both recall aggregates): one matmul, not 3
    exact = cosine_self_join(corpus, threshold=0.9).persist()
    exact.count()
    pins.append(exact)
    lsh = srp_lsh_self_join(corpus, threshold=0.9, pins=pins).select(
        "vec_id_a", "vec_id_b"
    )
    keys = ["vec_id_a", "vec_id_b"]
    rec = (
        exact.select(*keys)
        .join(lsh, keys, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_tot")))
        .select((F.col("n_hit") * 10 >= F.col("n_tot") * 8).alias("recall_ok"))
    )
    return _release_after(exact.crossJoin(F.broadcast(rec)), pins)


# ----------------------------------------------------------- similarity ----

_TOPK_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
q AS (SELECT i, x FROM flat WHERE vec_id = 0),
dots AS (
  SELECT f.vec_id, SUM(f.x * q.x) AS dot
  FROM flat f JOIN q ON f.i = q.i
  WHERE f.vec_id <> 0
  GROUP BY 1
)
SELECT d.vec_id,
       round(d.dot / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = 0)), 6)
         AS cosine
FROM dots d JOIN norms n ON d.vec_id = n.vec_id
ORDER BY cosine DESC, d.vec_id
LIMIT 10
"""


@query("q_sim_topk", oracle=_TOPK_ORACLE)
def q_sim_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-10 neighbors of vec 0 (brute force baseline)."""
    return cosine_topk(read_table(spark, sf_dir, "embeddings"), 0, k=10)


_SIM_JOIN_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, SUM(a.x * b.x) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_id_a, vec_id_b,
       round(dot / (x.nrm * y.nrm), 6) AS cosine
FROM dots
JOIN norms x ON vec_id_a = x.vec_id
JOIN norms y ON vec_id_b = y.vec_id
WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4
"""


@query("q_sim_join", oracle=_SIM_JOIN_ORACLE)
def q_sim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine similarity self-join (pairs >= 0.4)."""
    return cosine_self_join(
        read_table(spark, sf_dir, "embeddings"), threshold=0.4
    )


@query("q_sim_topk_vectorized", oracle=_TOPK_ORACLE)
def q_sim_topk_vectorized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow/numpy (BLAS matvec per batch) formulation of exact top-k
    — same oracle as q_sim_topk; the winning shape for high-dim
    embeddings.  The operator raises on a missing query vector (right
    for an API); the CONTRACT must instead degrade symmetrically with
    its oracle (empty result) if regenerated data lacks vec 0 —
    r7 robustness sweep's one finding."""
    from ..operators.similarity import cosine_topk_vectorized

    emb = read_table(spark, sf_dir, "embeddings")
    try:  # one scan: the operator's own collect doubles as the probe
        return cosine_topk_vectorized(emb, 0, k=10)
    except ValueError:  # "query vec 0 not found"
        return spark.createDataFrame([], "vec_id long, cosine double")


_ANN_IVF_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
q AS (SELECT i, x FROM flat WHERE vec_id = 0),
dots AS (
  SELECT f.vec_id, SUM(f.x * q.x) AS dot
  FROM flat f JOIN q ON f.i = q.i
  WHERE f.vec_id <> 0
  GROUP BY 1
),
topk AS (
  SELECT d.vec_id,
         round(d.dot / (n.nrm * (SELECT nrm FROM norms WHERE vec_id = 0)), 6)
           AS cosine
  FROM dots d JOIN norms n ON d.vec_id = n.vec_id
  ORDER BY cosine DESC, d.vec_id
  LIMIT 10
)
SELECT vec_id, cosine, TRUE AS recall_ok FROM topk
"""


_ANN_IVF_PLAN_ORACLE = _ANN_IVF_ORACLE.replace(
    "TRUE AS recall_ok FROM topk",
    "TRUE AS recall_ok, TRUE AS plan_ok FROM topk",
)


@query("q_sim_ann_ivf", oracle=_ANN_IVF_PLAN_ORACLE)
def q_sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-10 for vec 0 (nlist=16, nprobe=4) in
    contract-oracle form (VERDICT r5 item 4, the q_agg_approx_cd
    pattern): the emitted rows are the EXACT top-10 — DuckDB
    recomputes them — and ``recall_ok`` certifies the IVF candidate
    set recovered >= 8 of the 10 (floor 0.8, margin under the 0.9
    recall the tests pin at sf0.01 and sf0.1).  A broken IVF routing
    flips the flag on every row and fails the hash gate; at 100 TB
    you keep only the IVF side (rows-only history: r1-r5).

    ``plan_ok`` (r14, VERDICT r13 #8) pins the IVF probe's plan
    fingerprint at the gate: the probe set and query vector BROADCAST
    (they are nprobe- and 1-row-sized by construction — never a
    shuffle of the corpus side), the global top-k plans as
    TakeOrderedAndProject (never a full sort), no cartesian product,
    and the shuffle count stays at the operator's minimum.  Computed
    explain-only from the LAZY ivf_topk frame; TRUE on the oracle
    side, so a plan regression fails the hash gate."""
    from ..plans import formatted_plan, n_exchanges_in

    emb = read_table(spark, sf_dir, "embeddings")
    exact = cosine_topk(emb, 0, k=10)
    pins: list = []  # keeps ivf_topk's plan lazy for the fingerprint;
    # released via _release_after (r14 cache hygiene — pin-less calls
    # checkpoint, which would truncate the probed plan)
    approx_full = ivf_topk(emb, 0, k=10, nlist=16, nprobe=4, pins=pins)
    # ONE plan compile feeds every fingerprint (r15: the helper-per-
    # boolean form re-ran formatted_plan four times)
    plan = formatted_plan(approx_full)
    plan_ok = (
        "CartesianProduct" not in plan
        and "BroadcastHashJoin" in plan
        and "TakeOrderedAndProject" in plan
        and n_exchanges_in(plan) <= 3
    )
    approx = approx_full.select("vec_id")
    rec = exact.join(approx, "vec_id", "left_semi").agg(
        (F.count(F.lit(1)) >= F.lit(8)).alias("recall_ok")
    )
    out = exact.crossJoin(F.broadcast(rec)).withColumn(
        "plan_ok", F.lit(bool(plan_ok))
    )
    return _release_after(out, pins)


_ANN_IVF_APPEND_ORACLE = _ANN_IVF_ORACLE.replace(
    "TRUE AS recall_ok FROM topk",
    "TRUE AS recall_ok, TRUE AS append_ok FROM topk",
)


@query("q_sim_ann_ivf_append", oracle=_ANN_IVF_APPEND_ORACLE)
def q_sim_ann_ivf_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF index MAINTENANCE under appends (r10, VERDICT r9 #6 —
    operators/similarity.ivf_append): the corpus is indexed minus a 2%
    batch (vec_id % 50 == 0, modular = regen-proof), the batch is then
    appended via ``ivf_append`` — which re-registers the existing
    centers under the grown corpus's ADDITIVE fingerprint at
    batch-only cost — and the top-10 query on the FULL corpus must be
    a cache hit: ``append_ok`` certifies zero k-means fits ran between
    the append and the query (pre-r10, any append refit from scratch:
    a full k-means per day on a daily-append embedding table).
    ``recall_ok`` keeps the q_sim_ann_ivf contract: the IVF candidate
    set recovers >= 8 of the exact top-10 even though the index was
    fitted WITHOUT the appended vectors (2% drift, below the refit
    threshold).  The emitted rows are the exact top-10, DuckDB
    recomputes them; both flags are TRUE on the oracle side."""
    from ..operators import similarity as S

    emb = read_table(spark, sf_dir, "embeddings")
    batch = emb.filter(F.col("vec_id") % 50 == 0)
    base = emb.filter(F.col("vec_id") % 50 != 0)
    S.ivf_assign(base, nlist=12)  # fit (or warm-cache hit) on the base
    base_fp = S._corpus_fingerprint(base, "embedding")
    res = S.ivf_append(spark, batch, base_fp, nlist=12)
    assert not res["refit"] and not res["refit_recommended"], res
    fits_after_append = S.IVF_FIT_COUNTER["fits"]
    exact = cosine_topk(emb, 0, k=10)
    approx = ivf_topk(emb, 0, k=10, nlist=12, nprobe=4).select("vec_id")
    rec = exact.join(approx, "vec_id", "left_semi").agg(
        (F.count(F.lit(1)) >= F.lit(8)).alias("recall_ok")
    )
    out = exact.crossJoin(F.broadcast(rec)).withColumn(
        "append_ok",
        F.lit(S.IVF_FIT_COUNTER["fits"] == fits_after_append),
    )
    return out


_EMBED_NORM_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1)
SELECT e.vec_id,
       round(n.nrm, 6) AS l2_norm,
       array_to_string(
         list_transform(
           e.embedding,
           x -> CAST(CAST(round(CAST(x AS DOUBLE) / n.nrm, 6)
                          AS DECIMAL(18,6)) AS VARCHAR)),
         ',') AS unit_vec
FROM embeddings e JOIN norms n ON e.vec_id = n.vec_id
"""


@query("q_embed_norm", oracle=_EMBED_NORM_ORACLE)
def q_embed_norm(spark: SparkSession, sf_dir: str) -> DataFrame:
    # unit_vec goes out as a ','-joined DECIMAL(18,6) string: raw array
    # columns crash the driver's pandas canonicalizer, and double->string
    # rendering diverges between Spark (E-notation under 1e-3) and DuckDB
    # while fixed-point decimal rendering is identical on both sides.
    df = l2_normalize(read_table(spark, sf_dir, "embeddings"))
    return df.select(
        "vec_id",
        "l2_norm",
        F.array_join(
            F.transform(
                F.col("unit_vec"),
                lambda x: x.cast("decimal(18,6)").cast("string"),
            ),
            ",",
        ).alias("unit_vec"),
    )


# ------------------------------------------------------------------ text ----

_TEXT_STATS_ORACLE = """
WITH per_doc AS (
  SELECT lang,
         len(t) AS n_tokens,
         length(text) AS n_chars,
         list_aggregate(list_transform(t, x -> length(x)), 'sum')
           AS token_chars
  FROM (SELECT lang, text,
               list_filter(string_split(lower(trim(text)), ' '), x -> x <> '')
                 AS t
        FROM documents)
)
SELECT lang,
       COUNT(*) AS n_docs,
       CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
       CAST(SUM(n_tokens) AS DOUBLE) / COUNT(*) AS avg_tokens_per_doc,
       CAST(SUM(token_chars) AS DOUBLE) / SUM(n_tokens) AS avg_token_len,
       CAST(MAX(n_chars) AS INT) AS max_chars
FROM per_doc
GROUP BY lang
"""


@query("q_text_stats", oracle=_TEXT_STATS_ORACLE)
def q_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    return doc_stats(read_table(spark, sf_dir, "documents"))


_TEXT_TOKENS_ORACLE = """
WITH tf AS (
  SELECT lang, tok AS term, COUNT(*) AS freq
  FROM (SELECT lang, unnest(list_filter(
           string_split(lower(trim(text)), ' '), x -> x <> '')) AS tok
        FROM documents)
  GROUP BY 1, 2
)
SELECT lang, term, freq, CAST(rank AS INT) AS rank FROM (
  SELECT lang, term, freq,
         ROW_NUMBER() OVER (PARTITION BY lang
                            ORDER BY freq DESC, term) AS rank
  FROM tf
) WHERE rank <= 5
"""


@query("q_text_tokens", oracle=_TEXT_TOKENS_ORACLE)
def q_text_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    return term_frequencies(read_table(spark, sf_dir, "documents"), top_n=5)


# Promoted from rows-only (VERDICT r4 #4): the stopword-profile argmax
# is exactly SQL-expressible.  Tie-break (earliest alphabetical lang)
# is the CASE order; score arithmetic is count/len in IEEE double on
# both sides; confidence rounds to 6 dp on both sides.  Stopword lists
# mirror operators/text.STOPWORDS.
_LANGID_ORACLE = """
WITH toked AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
scored AS (
  SELECT doc_id, lang,
    CAST(len(list_filter(t, x -> list_contains(
      ['the','a','and','of','to'], x))) AS DOUBLE) / len(t) AS score_en,
    CAST(len(list_filter(t, x -> list_contains(
      ['el','la','de','y','que'], x))) AS DOUBLE) / len(t) AS score_es,
    CAST(len(list_filter(t, x -> list_contains(
      ['der','die','das','und','zu'], x))) AS DOUBLE) / len(t) AS score_de,
    CAST(len(list_filter(t, x -> list_contains(
      ['le','la','de','et','que'], x))) AS DOUBLE) / len(t) AS score_fr
  FROM toked
)
SELECT doc_id, lang AS lang_actual,
  CASE WHEN best <= 0 THEN 'und'
       WHEN score_de = best THEN 'de'
       WHEN score_en = best THEN 'en'
       WHEN score_es = best THEN 'es'
       WHEN score_fr = best THEN 'fr'
       ELSE 'und' END AS lang_pred,
  round(best, 6) AS confidence
FROM (SELECT *, GREATEST(score_en, score_es, score_de, score_fr) AS best
      FROM scored)
"""


@query("q_text_langid", oracle=_LANGID_ORACLE)
def q_text_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    return language_id(read_table(spark, sf_dir, "documents"))


_QUALITY_ORACLE = """
SELECT doc_id, lang,
       CAST(length(text) AS INT) AS n_chars,
       CAST(len(t) AS INT) AS n_tokens,
       CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
         / length(text) AS alpha_ratio,
       CAST(len(list_filter(t, x -> list_contains(
           ['the','a','and','of','to','el','la','de','y','que',
            'der','die','das','und','zu','le','et'], x))) AS DOUBLE)
         / len(t) AS stopword_ratio,
       CAST(len(list_distinct(t)) AS DOUBLE) / len(t) AS distinct_ratio,
       CAST(list_aggregate(list_transform(t, x -> length(x)), 'sum')
            AS DOUBLE) / len(t) AS avg_token_len
FROM (SELECT doc_id, lang, text,
             list_filter(string_split(lower(trim(text)), ' '), x -> x <> '')
               AS t
      FROM documents)
"""


@query("q_text_quality", oracle=_QUALITY_ORACLE)
def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    return quality_scores(read_table(spark, sf_dir, "documents"))


_FINGERPRINT_ORACLE = """
SELECT doc_id,
       md5(n) AS md5_hex,
       sha256(n) AS sha256_hex,
       substr(md5(n), 1, 4) AS shard_bucket,
       CAST(length(n) AS INT) AS norm_len
FROM (SELECT doc_id,
             regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS n
      FROM documents)
"""


@query("q_text_fingerprint", oracle=_FINGERPRINT_ORACLE)
def q_text_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    return fingerprints(read_table(spark, sf_dir, "documents"))


_TOKEN_COUNT_ORACLE = """
SELECT doc_id, lang,
       CAST(len(list_filter(string_split(lower(trim(text)), ' '),
                            x -> x <> '')) AS INT) AS ws_tokens,
       CAST(len(list_filter(regexp_split_to_array(lower(text),
                            '[^a-z0-9]+'), x -> x <> '')) AS INT)
         AS bpe_ish_tokens,
       CAST(ceil(length(text) / 4.0) AS BIGINT) AS chars_div4_est
FROM documents
"""


@query("q_text_token_counts", oracle=_TOKEN_COUNT_ORACLE)
def q_text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return token_counts(read_table(spark, sf_dir, "documents"))


# ------------------------------------------------- sampling / chunking ----

# u < 0.2 on the Spark side is exact (N/2^32 with N < 2^32 is an exact
# double), so it's equivalent to the 8-hex-char prefix being <=
# 0x33333333 — which DuckDB can check lexicographically.
_SAMPLE_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <= '33333333'
"""


@query("q_sample_hash", oracle=_SAMPLE_ORACLE)
def q_sample_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~20% sample by content hash of the key — stable
    across cluster sizes and reruns, unlike rand()-based sampling."""
    from ..operators.sampling import hash_sample

    return hash_sample(
        read_table(spark, sf_dir, "documents"), "doc_id", 0.2
    ).select("doc_id", "lang")


_SPLIT_ORACLE = """
SELECT doc_id,
       CASE
         WHEN h <= '19999999' THEN 'test'
         WHEN h <= '33333333' THEN 'eval'
         ELSE 'train'
       END AS split
FROM (
  SELECT doc_id, substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h
  FROM documents
)
"""


@query("q_split_train_eval", oracle=_SPLIT_ORACLE)
def q_split_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable train/eval/test assignment by disjoint hash ranges."""
    from ..operators.sampling import train_eval_split

    return train_eval_split(
        read_table(spark, sf_dir, "documents"), "doc_id", 0.1, 0.1
    ).select("doc_id", "split")


_CHUNK_ORACLE = """
WITH toked AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, lang,
       CAST(i AS INT) AS chunk_id,
       array_to_string(t[i * 50 + 1 : i * 50 + 50], ' ') AS chunk_text,
       CAST(least(50, len(t) - i * 50) AS INT) AS chunk_tokens
FROM toked CROSS JOIN generate_series(0, 63) s(i)
WHERE i < CAST(ceil(len(t) / 50.0) AS BIGINT)
"""


@query("q_text_chunk", oracle=_CHUNK_ORACLE)
def q_text_chunk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking (sequence prep): one row per
    (doc, chunk) with text + token count."""
    from ..operators.sampling import chunk_documents

    return chunk_documents(read_table(spark, sf_dir, "documents"), 50)


# ------------------------------------------------------------ multimodal ----

_MULTIMODAL_ORACLE = """
SELECT doc_id, lang,
       CAST(octet_length(encode(text)) AS INT) AS n_bytes,
       md5(text) AS md5_hex,
       sha256(text) AS sha256_hex,
       upper(hex(encode(substr(text, 1, 4)))) AS magic_hex
FROM documents
"""


@query("q_multimodal", oracle=_MULTIMODAL_ORACLE)
def q_multimodal(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload metadata: size + content hashes + magic bytes,
    all JVM-side (dedup/shard layer for media columns)."""
    return payload_metadata(read_table(spark, sf_dir, "documents"))


# n_bytes is re-derivable in SQL from the generator formula (see the
# features oracle below); content itself is binary, so the scan check
# pins id + exact file size per row.
_BINARYFILE_ORACLE = """
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0
                 THEN 9 + length(CAST(8 + (doc_id % 24) AS VARCHAR))
                        + length(CAST(8 + ((doc_id * 7) % 24) AS VARCHAR))
                        + (8 + (doc_id % 24)) * (8 + ((doc_id * 7) % 24)) * 3
                 ELSE 54 + (((8 + (doc_id % 24)) * 3 + 3) // 4) * 4
                         * (8 + ((doc_id * 7) % 24))
            END AS BIGINT) AS n_bytes
FROM documents
"""


@query("q_scan_binaryfile", oracle=_BINARYFILE_ORACLE)
def q_scan_binaryfile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``spark.read.format("binaryFile")`` source — the media-ingest
    scan (SURVEY §2B-K): planted image files land in a directory
    (written executor-side, one file per doc), the binaryFile reader
    lists them with (path, length, content), and doc ids parse back
    out of the file names.  At 100 TB this is the object-store listing
    + streaming-content scan; only metadata is compared here (content
    is exercised end-to-end by q_multimodal_features)."""
    import hashlib
    import os
    import shutil
    import tempfile

    from ..operators.multimodal import with_planted_images

    out_dir = os.path.join(
        tempfile.gettempdir(),
        "fpl_spark_scratch",
        "binfiles",
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    shutil.rmtree(out_dir, ignore_errors=True)
    os.makedirs(out_dir)

    def dump(rows):
        for r in rows:
            with open(os.path.join(out_dir, f"img_{r.doc_id}.bin"), "wb") as f:
                f.write(bytes(r.payload))

    with_planted_images(
        read_table(spark, sf_dir, "documents")
    ).foreachPartition(dump)
    scanned = spark.read.format("binaryFile").load(out_dir)
    return scanned.select(
        F.regexp_extract(F.col("path"), r"img_(\d+)\.bin$", 1)
        .cast("bigint")
        .alias("doc_id"),
        F.col("length").alias("n_bytes"),
    )


# The planted files are pure functions of doc_id (operators/
# multimodal.planted_image_bytes), so the DECODED features are
# SQL-expressible: the oracle re-derives geometry, file size (PPM
# header arithmetic vs BMP 54-byte header + 4-byte row stride), and
# the mean pixel byte (sum of the three channel values over the w*h
# grid, floor-divided) — hash-matching it proves the decoder parsed
# real bytes correctly, not that a fake echoed the generator.
_MULTIMODAL_FEATURES_ORACLE = """
WITH geom AS (
  SELECT doc_id,
         8 + (doc_id % 24) AS w,
         8 + ((doc_id * 7) % 24) AS h
  FROM documents
),
px AS (
  SELECT doc_id, w, h,
         list_sum(list_transform(range(0, w * h), i ->
             (3 * (i % w) + 5 * (i // w) + doc_id) % 256
           + (3 * (i % w) + 5 * (i // w) + doc_id + 85) % 256
           + (3 * (i % w) + 5 * (i // w) + doc_id + 170) % 256)) AS s
  FROM geom
)
SELECT doc_id,
       CAST(CASE WHEN doc_id % 2 = 0
                 THEN 9 + length(CAST(w AS VARCHAR))
                        + length(CAST(h AS VARCHAR)) + w * h * 3
                 ELSE 54 + ((w * 3 + 3) // 4) * 4 * h
            END AS INT) AS n_bytes,
       TRUE AS decode_ok,
       CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(3 AS INT) AS channels,
       CAST(s // (w * h * 3) AS INT) AS mean_byte,
       '128x128' AS resize_bucket
FROM px
"""


@query("q_multimodal_features", oracle=_MULTIMODAL_FEATURES_ORACLE)
def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInPandas decode/feature pipeline over REAL image bytes:
    deterministic planted PPM/BMP files per doc_id, struct-parsed by
    the pure-Python decoder in operators/multimodal.decode_image
    (PNG/JPEG would slot into the same seam with a codec library)."""
    docs = read_table(spark, sf_dir, "documents")
    return extract_features(with_planted_images(docs))


# ------------------------------------------ round-2 pipeline additions ----

_REPETITION_ORACLE = """
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
grams AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)),
                               i -> t[i] || ' ' || t[i+1])) AS gram
  FROM toked WHERE len(t) >= 2
),
cnt AS (SELECT doc_id, gram, COUNT(*) AS c FROM grams GROUP BY 1, 2)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_bigrams,
       round(MAX(c) * 1.0 / SUM(c), 6) AS top_bigram_frac,
       round(CAST(SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
             / SUM(c), 6) AS dup_bigram_frac
FROM cnt GROUP BY doc_id
"""


# Contract oracle (promoted r6, q_dedup_fuzzy pattern): rows are the
# exact >=0.5 pairs RESTRICTED to pairs touching the batch (the split
# is plain doc_id % 5 so DuckDB can re-derive it); recall_hi_ok
# certifies the incremental banding surfaced every restricted pair at
# Jaccard >= 0.9.  The index round-trip and full-run-restriction
# equality stay pinned in tests.
_INCR_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
)
SELECT doc_id_a, doc_id_b, jaccard, TRUE AS recall_hi_ok FROM (
  SELECT a.doc_id AS doc_id_a, b.doc_id AS doc_id_b,
         len(list_intersect(a.s, b.s)) * 1.0
           / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)))
           AS jaccard
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
) WHERE jaccard >= 0.5
  AND (doc_id_a % 5 = 0 OR doc_id_b % 5 = 0)
"""


@query("q_dedup_incremental", oracle=_INCR_ORACLE)
def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily-increment dedup: a deterministic 20% of documents plays
    the incoming batch, the other 80% the already-indexed corpus.
    The batch is paired against (itself ∪ the TxTable signature
    index) WITHOUT re-reading corpus text — the shape that makes
    near-dup dedup affordable on a 100 TB corpus with daily arrivals
    (operators/dedup.incremental_lsh_pairs).  Contract-oracle form
    (rows-only history: r1-r5)."""
    import hashlib
    import os
    import tempfile

    from ..operators.dedup import incremental_lsh_pairs, minhash_signatures
    from ..sources.txtable import TxTable

    docs = read_table(spark, sf_dir, "documents")
    is_new = F.col("doc_id") % 5 == 0
    old, new = docs.filter(~is_new), docs.filter(is_new)
    root = os.path.join(
        tempfile.gettempdir(),
        "fpl_spark_scratch",
        "lsh_index",
        hashlib.sha1(sf_dir.encode()).hexdigest()[:12],
    )
    # rebuild the index each call so the query is a pure function of
    # the inputs (create = overwrite semantics)
    TxTable.create(spark, root, minhash_signatures(old))
    pins: list = []
    inc = incremental_lsh_pairs(
        new, root, threshold=0.5, update_index=False, pins=pins
    )
    exact = ngram_jaccard_pairs(docs, threshold=0.5, pins=pins).filter(
        (F.col("doc_id_a") % 5 == 0) | (F.col("doc_id_b") % 5 == 0)
    )
    return _lsh_recall_contract(exact, inc, pins)


# Int8 quantization: oracle reproduces the identical stats pass and
# affine bucket arithmetic.  floor (not round) and matching expression
# order keep the IEEE double math bit-identical across engines.
_EMBED_QUANTIZE_ORACLE = """
WITH ex AS (
  SELECT u.i AS pos, u.x AS x
  FROM (
    SELECT unnest(list_transform(range(1, len(embedding) + 1), j ->
             struct_pack(i := j, x := CAST(embedding[j] AS DOUBLE)))) AS u
    FROM embeddings
  )
),
st AS (SELECT pos, MIN(x) AS mn, MAX(x) AS mx FROM ex GROUP BY pos),
stats AS (
  SELECT list(mn ORDER BY pos) AS mns, list(mx ORDER BY pos) AS mxs FROM st
)
SELECT e.vec_id,
       array_to_string(
         list_transform(range(1, len(e.embedding) + 1), j ->
           CAST(CASE WHEN s.mxs[j] > s.mns[j]
                     THEN LEAST(255.0,
                                floor((CAST(e.embedding[j] AS DOUBLE) - s.mns[j])
                                      * 256.0 / (s.mxs[j] - s.mns[j])))
                     ELSE 0.0 END AS INT)), ',') AS qvec
FROM embeddings e CROSS JOIN stats s
"""


@query("q_embed_quantize", oracle=_EMBED_QUANTIZE_ORACLE)
def q_embed_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-dimension affine int8 quantization of the embedding column
    (operators/similarity.quantize_embeddings_int8): stats pass +
    map-only transform, the 4x storage shrink for coarse search.

    qvec is stringified (array_join) at the query boundary: the
    driver's pandas canonicalizer cannot sort list columns (the
    stringify-driver-facing-arrays rule, queries/aggregates.py)."""
    from ..operators.similarity import quantize_embeddings_int8

    q = quantize_embeddings_int8(read_table(spark, sf_dir, "embeddings"))
    return q.select("vec_id", F.array_join("qvec", ",").alias("qvec"))


# Exact duplicated-span coverage (Lee et al. 2022): oracle recomputes
# positional 5-grams, cross-doc dup grams, and the interval-union
# coverage with the same LEAST(n, next-pos) window arithmetic.
_DUP_SPAN_ORACLE = """
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
ex AS (
  SELECT doc_id, u.pos AS pos, u.g AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 3), i ->
             struct_pack(pos := i - 1,
                         g := t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   || ' ' || t[i+3] || ' ' || t[i+4]))) AS u
    FROM toked WHERE len(t) >= 5
  )
),
dup AS (SELECT g FROM ex GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
cov AS (
  SELECT doc_id, COUNT(*) AS n_dup_grams, SUM(c) AS dup_tokens
  FROM (
    SELECT e.doc_id,
           LEAST(5, COALESCE(LEAD(e.pos) OVER (PARTITION BY e.doc_id
                                               ORDER BY e.pos) - e.pos,
                             5)) AS c
    FROM ex e JOIN dup USING (g)
  ) GROUP BY doc_id
)
SELECT t.doc_id,
       CAST(t.n_tokens AS INT) AS n_tokens,
       CAST(COALESCE(c.n_dup_grams, 0) AS BIGINT) AS n_dup_grams,
       CAST(COALESCE(c.dup_tokens, 0) AS BIGINT) AS dup_tokens,
       CASE WHEN t.n_tokens > 0
            THEN round(COALESCE(c.dup_tokens, 0) * 1.0 / t.n_tokens, 6)
            ELSE 0.0 END AS dup_fraction
FROM (SELECT doc_id, len(t) AS n_tokens FROM toked) t
LEFT JOIN cov c USING (doc_id)
"""


@query("q_text_dup_spans", oracle=_DUP_SPAN_ORACLE)
def q_text_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span coverage per doc: fraction of tokens
    covered by word 5-grams occurring in >= 2 documents (the
    substring-level dedup signal whole-doc dedup misses)."""
    from ..operators.text import dup_span_signals

    return dup_span_signals(read_table(spark, sf_dir, "documents"), n=5)


# Exact duplicated-span REMOVAL (Lee et al. 2022 rewrite half): the
# oracle re-derives the surviving tokens declaratively — positional
# 5-grams, cross-doc dup grams, canonical occurrence = min (doc_id,
# pos) via ROW_NUMBER, non-canonical instances expand to their 5
# covered positions, anti-join, ordered string_agg rebuild.  String
# grams on the oracle side vs the engine's 128-bit two-lane hash key:
# collision-free at sf0.01 by construction, so outputs match exactly.
_REMOVE_DUP_SPAN_ORACLE = """
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
inst AS (
  SELECT doc_id, u.pos AS pos, u.g AS g
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) - 3), i ->
             struct_pack(pos := i - 1,
                         g := t[i] || ' ' || t[i+1] || ' ' || t[i+2]
                                   || ' ' || t[i+3] || ' ' || t[i+4]))) AS u
    FROM toked WHERE len(t) >= 5
  )
),
dup AS (SELECT g FROM inst GROUP BY g HAVING COUNT(DISTINCT doc_id) >= 2),
ranked AS (
  SELECT i.doc_id, i.pos,
         ROW_NUMBER() OVER (PARTITION BY i.g
                            ORDER BY i.doc_id, i.pos) AS rn
  FROM inst i JOIN dup USING (g)
),
removed AS (
  SELECT DISTINCT doc_id, pos + k.k AS tpos
  FROM ranked CROSS JOIN generate_series(0, 4) AS k(k)
  WHERE rn > 1
),
tok AS (
  SELECT doc_id, u.tpos AS tpos, u.tok AS tok
  FROM (
    SELECT doc_id,
           unnest(list_transform(range(1, len(t) + 1), j ->
             struct_pack(tpos := j - 1, tok := t[j]))) AS u
    FROM toked
  )
),
rebuilt AS (
  SELECT t.doc_id,
         string_agg(t.tok, ' ' ORDER BY t.tpos) AS text,
         COUNT(*) AS n_after
  FROM tok t LEFT JOIN removed r
    ON t.doc_id = r.doc_id AND t.tpos = r.tpos
  WHERE r.doc_id IS NULL
  GROUP BY t.doc_id
)
SELECT b.doc_id,
       COALESCE(rb.text, '') AS text,
       CAST(b.n_tokens AS INT) AS n_tokens_before,
       CAST(COALESCE(rb.n_after, 0) AS BIGINT) AS n_tokens_after
FROM (SELECT doc_id, len(t) AS n_tokens FROM toked) b
LEFT JOIN rebuilt rb USING (doc_id)
"""


@query("q_text_remove_dup_spans", oracle=_REMOVE_DUP_SPAN_ORACLE)
def q_text_remove_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicated-span REMOVAL (r14, VERDICT r13 #1): every
    cross-doc duplicated word 5-gram keeps its minimum (doc_id, pos)
    occurrence corpus-wide and loses every other occurrence's 5 token
    positions; documents are rebuilt from surviving tokens
    (operators/text.remove_dup_spans — linear stages, 128-bit
    two-lane gram key).  The oracle re-derives the exact surviving
    token sequence per document in DuckDB."""
    from ..operators.text import remove_dup_spans

    return remove_dup_spans(read_table(spark, sf_dir, "documents"), n=5)


@query("q_text_repetition", oracle=_REPETITION_ORACLE)
def q_text_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style bigram repetition signals (top-bigram fraction,
    duplicate-bigram fraction) — the boilerplate/spam filter inputs."""
    from ..operators.text import repetition_signals

    return repetition_signals(read_table(spark, sf_dir, "documents"))


# The synthetic corpus carries no contact data, so PII is planted
# deterministically from doc_id on BOTH sides (same pattern as the
# q_dedup_embed clone planting) and then scrubbed.
_PII_PLANT = """
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN text || ' reach lead' || CAST(doc_id AS VARCHAR)
                   || '@example.com or call +1-202-555-'
                   || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
              ELSE text END AS text
  FROM documents
"""

_PII_ORACLE = f"""
WITH planted AS ({_PII_PLANT}),
rx AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}')) AS INT)
           AS n_emails,
         regexp_replace(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{{2,}}',
           '<EMAIL>', 'g') AS ne
  FROM planted
)
SELECT doc_id, n_emails,
       CAST(len(regexp_extract_all(ne,
         '\\+?[0-9][0-9()\\[\\] .-]{{6,}}[0-9]')) AS INT) AS n_phones,
       regexp_replace(ne, '\\+?[0-9][0-9()\\[\\] .-]{{6,}}[0-9]',
                      '<PHONE>', 'g') AS text_redacted
FROM rx
"""


@query("q_text_pii_redact", oracle=_PII_ORACLE)
def q_text_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing over a lead-contact corpus: plant emails/phones
    deterministically, then redact + count them (operators/text.py
    redact_pii; the reference's whole domain is lead contact data)."""
    from ..operators.text import redact_pii

    docs = read_table(spark, sf_dir, "documents")
    planted = docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.col("text"),
                F.lit(" reach lead"),
                F.col("doc_id").cast("string"),
                F.lit("@example.com or call +1-202-555-"),
                F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
            ),
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return redact_pii(planted)


_CLUSTER_ORACLE = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
),
pairs AS (
  SELECT a.doc_id AS pa, b.doc_id AS pb
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35
),
edges AS (
  SELECT pa AS s, pb AS d FROM pairs
  UNION ALL
  SELECT pb AS s, pa AS d FROM pairs
),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.d
),
lab AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id)
SELECT l.doc_id, l.cluster_id, c.cluster_size,
       l.doc_id = l.cluster_id AS is_canonical
FROM lab l
JOIN (SELECT cluster_id, COUNT(*) AS cluster_size
      FROM lab GROUP BY 1) c USING (cluster_id)
"""


@query("q_dedup_cluster", oracle=_CLUSTER_ORACLE)
def q_dedup_cluster(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pair graph -> connected components -> canonical
    survivor per cluster (operators/graph.py min-label propagation vs
    a DuckDB recursive-CTE oracle over the same ngram pair graph)."""
    from ..operators.graph import dedup_clusters

    docs = read_table(spark, sf_dir, "documents")
    pins: list = []
    # components localCheckpoint internally, so the clusters frame no
    # longer references the shingle cache once dedup_clusters returns
    out = dedup_clusters(
        docs, ngram_jaccard_pairs(docs, threshold=0.35, pins=pins)
    )
    return _release_after(out, pins)


@query("q_dedup_cluster_star", oracle=_CLUSTER_ORACLE)
def q_dedup_cluster_star(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same pair graph clustered by the large-star/small-star
    algorithm (Kiveris et al. SoCC'14; O(log^2 n) rounds regardless of
    diameter — the 100 TB-safe path for adversarial graph shapes).
    Must hash-match the identical recursive-CTE oracle as
    q_dedup_cluster: both algorithms compute exact components."""
    from ..operators.graph import dedup_clusters

    docs = read_table(spark, sf_dir, "documents")
    pins: list = []
    out = dedup_clusters(
        docs,
        ngram_jaccard_pairs(docs, threshold=0.35, pins=pins),
        algorithm="star",
    )
    return _release_after(out, pins)


# Hash-boundary parity (see _SAMPLE_ORACLE note): u < 0.5 <=> prefix
# <= '7fffffff'; u < 0.25 <=> prefix <= '3fffffff'.
_STRATIFIED_ORACLE = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) <=
      CASE WHEN lang = 'en' THEN '7fffffff' ELSE '3fffffff' END
"""


@query("q_sample_stratified", oracle=_STRATIFIED_ORACLE)
def q_sample_stratified(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-mixing downsample: keep 50% of English, 25% of every
    other language, membership a pure function of doc_id
    (operators/sampling.py stratified_sample)."""
    from ..operators.sampling import stratified_sample

    return stratified_sample(
        read_table(spark, sf_dir, "documents"),
        "doc_id",
        "lang",
        {"en": 0.5},
        default_frac=0.25,
    ).select("doc_id", "lang")


_QUALITY_FILTER_ORACLE = """
SELECT d.doc_id, d.lang, d.n_chars, m.lang_median
FROM documents d
JOIN (SELECT lang, median(n_chars) AS lang_median
      FROM documents GROUP BY 1) m USING (lang)
WHERE d.n_chars > m.lang_median
"""


@query("q_quality_filter", oracle=_QUALITY_FILTER_ORACLE)
def q_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative quality gate: keep docs strictly above their
    language's median length — the two-pass shape (aggregate a
    per-group threshold, broadcast it back, filter) every
    quality-percentile cut at scale uses."""
    docs = read_table(spark, sf_dir, "documents")
    med = docs.groupBy("lang").agg(F.median("n_chars").alias("lang_median"))
    return (
        docs.join(F.broadcast(med), "lang")
        .filter(F.col("n_chars") > F.col("lang_median"))
        .select("doc_id", "lang", "n_chars", "lang_median")
    )


# Same chunking arithmetic as _CHUNK_ORACLE, then the pack_chunks
# window cumsum: bin = floor(tokens_before_this_chunk / 256) within a
# (doc_id % 8) bucket ordered by (doc_id, chunk_id).
_PACK_ORACLE = """
WITH toked AS (
  SELECT doc_id,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
),
chunks AS (
  SELECT doc_id, CAST(i AS INT) AS chunk_id,
         CAST(least(50, len(t) - i * 50) AS INT) AS chunk_tokens
  FROM toked CROSS JOIN generate_series(0, 63) s(i)
  WHERE i < CAST(ceil(len(t) / 50.0) AS BIGINT)
)
SELECT CAST(doc_id % 8 AS INT) AS bucket, doc_id, chunk_id, chunk_tokens,
       CAST(floor((SUM(chunk_tokens) OVER (
           PARTITION BY doc_id % 8 ORDER BY doc_id, chunk_id
           ROWS UNBOUNDED PRECEDING) - chunk_tokens) / 256.0) AS INT)
         AS bin_id
FROM chunks
"""


@query("q_pack_chunks", oracle=_PACK_ORACLE)
def q_pack_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: token chunks -> fixed-budget training bins
    (operators/sampling.py pack_chunks; bucketed window cumsum)."""
    from ..operators.sampling import chunk_documents, pack_chunks

    chunks = chunk_documents(
        read_table(spark, sf_dir, "documents"), chunk_tokens=50
    )
    return pack_chunks(chunks, budget=256, n_buckets=8)


_TFIDF_ORACLE = """
WITH toks AS (
  SELECT doc_id, u.term
  FROM (SELECT doc_id,
               list_filter(string_split(lower(trim(text)), ' '),
                           x -> x <> '') AS t
        FROM documents) d,
       unnest(d.t) AS u(term)
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
n AS (SELECT COUNT(*) AS n_docs FROM documents)
SELECT doc_id, term, tf, df,
       round(tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1), 6) AS score,
       CAST(row_number() OVER (
         PARTITION BY doc_id
         ORDER BY round(tf * (ln((n_docs + 1) * 1.0 / (df + 1)) + 1), 6)
                  DESC, term
       ) AS INT) AS rank
FROM tf JOIN dfreq USING (term) CROSS JOIN n
QUALIFY rank <= 3
"""


@query("q_text_tfidf", oracle=_TFIDF_ORACLE)
def q_text_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 terms per doc by smoothed tf-idf (operators/text.py
    tfidf_top_terms — tf shuffle, df from tf, broadcast N)."""
    from ..operators.text import tfidf_top_terms

    return tfidf_top_terms(read_table(spark, sf_dir, "documents"), k=3)


# Split boundary parity with q_split_train_eval / q_sample_hash:
# _hash01(doc_id) < 0.1  <=>  first-8-hex md5 prefix <= '19999999'.
_DECONTAM_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         substr(md5(CAST(doc_id AS VARCHAR)), 1, 8) AS h,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
),
ev AS (
  SELECT DISTINCT g FROM sh, unnest(s) AS u(g) WHERE h <= '19999999'
)
SELECT t.doc_id,
       CAST(len(t.s) AS INT) AS n_grams,
       COUNT(*) AS n_contaminated,
       round(COUNT(*) * 1.0 / len(t.s), 6) AS contamination
FROM (SELECT doc_id, s FROM sh WHERE h > '19999999') t,
     unnest(t.s) AS u(g)
WHERE g IN (SELECT g FROM ev)
GROUP BY t.doc_id, len(t.s)
"""


@query("q_text_decontaminate", oracle=_DECONTAM_ORACLE)
def q_text_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: hold out a deterministic 10% of the
    corpus as the 'eval set' (same md5 hash ranges as
    q_split_train_eval), then report every train doc whose word
    3-grams overlap it (operators/dedup.py decontaminate — broadcast
    eval grams, map-side train join)."""
    from ..operators.dedup import decontaminate
    from ..operators.sampling import _hash01

    docs = read_table(spark, sf_dir, "documents")
    is_eval = _hash01(F.col("doc_id")) < 0.1
    pins: list = []
    return _release_after(
        decontaminate(
            docs.filter(~is_eval), docs.filter(is_eval), n=3, pins=pins
        ),
        pins,
    )


# Same recursive-CTE component labeling as _CLUSTER_ORACLE, applied:
# the deduplicated corpus keeps only each component's min-id survivor.
_DEDUP_APPLY_ORACLE = """
WITH RECURSIVE sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
),
pairs AS (
  SELECT a.doc_id AS pa, b.doc_id AS pb
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35
),
edges AS (
  SELECT pa AS s, pb AS d FROM pairs
  UNION ALL
  SELECT pb AS s, pa AS d FROM pairs
),
reach(doc_id, lbl) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.s, r.lbl FROM edges e JOIN reach r ON r.doc_id = e.d
),
lab AS (SELECT doc_id, MIN(lbl) AS cluster_id FROM reach GROUP BY doc_id)
SELECT d.doc_id, d.lang, d.n_chars
FROM documents d JOIN lab l USING (doc_id)
WHERE l.doc_id = l.cluster_id
"""


@query("q_dedup_apply", oracle=_DEDUP_APPLY_ORACLE)
def q_dedup_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end dedup: pairs -> components -> keep each cluster's
    canonical survivor — the corpus a training run would actually
    consume (q_dedup_cluster reports the clustering; this applies
    it).  The survivor join is a key semi-join, so the apply step
    costs one shuffle over the corpus."""
    from ..operators.graph import dedup_clusters

    docs = read_table(spark, sf_dir, "documents")
    keep = (
        dedup_clusters(docs, ngram_jaccard_pairs(docs, threshold=0.35))
        .filter(F.col("is_canonical"))
        .select("doc_id")
    )
    return docs.join(keep, "doc_id", "left_semi").select(
        "doc_id", "lang", "n_chars"
    )


_SIM_JOIN_IVF_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, SUM(a.x * b.x) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
)
SELECT vec_id_a, vec_id_b,
       round(dot / (x.nrm * y.nrm), 6) AS cosine,
       TRUE AS recall_ok
FROM dots
JOIN norms x ON vec_id_a = x.vec_id
JOIN norms y ON vec_id_b = y.vec_id
WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4
"""


@query("q_sim_join_ivf", oracle=_SIM_JOIN_IVF_ORACLE)
def q_sim_join_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-pruned cosine threshold self-join in contract-oracle form
    (VERDICT r5 item 4): rows are the EXACT pair set (same blocked
    matmul the hash-matched q_sim_join uses); ``recall_ok`` certifies
    the IVF candidate generation recovered >= 80% of those pairs
    (margin under the 0.9 test pin — a missed pair means neither
    endpoint shared any of its 4 replica cells).  Kmeans-dependent
    candidate sets stop mattering: only the recall contract is hashed
    (rows-only history: r1-r5)."""
    from ..operators.similarity import ivf_self_join

    emb = read_table(spark, sf_dir, "embeddings")
    pins: list = []
    # three consumers (rows + both recall aggregates): one matmul, not 3
    exact = cosine_self_join(emb, threshold=0.4).persist()
    exact.count()
    pins.append(exact)
    approx = ivf_self_join(emb, threshold=0.4, pins=pins).select(
        "vec_id_a", "vec_id_b"
    )
    keys = ["vec_id_a", "vec_id_b"]
    rec = (
        exact.select(*keys)
        .join(approx, keys, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .crossJoin(exact.agg(F.count(F.lit(1)).alias("n_tot")))
        .select((F.col("n_hit") * 10 >= F.col("n_tot") * 8).alias("recall_ok"))
    )
    return _release_after(exact.crossJoin(F.broadcast(rec)), pins)


# The routing decisions are part of the hashed contract: the oracle
# re-derives them from COUNT(*) with the SAME cost arithmetic the
# router uses (n * ceil(n / tile_rows) vs the cap), so a corpus whose
# size flips a route flips BOTH sides together.  The row set stays the
# exact pair set on the deterministic vec_id%4 slice (the route the
# default cap picks for it is 'exact', asserted loudly below), and
# recall_ok certifies the IVF-routed full-corpus join against the
# exact full pair set, as in q_sim_join_ivf.
_SIM_JOIN_AUTO_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
  WHERE vec_id % 4 = 0
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
dots AS (
  SELECT a.vec_id AS vec_id_a, b.vec_id AS vec_id_b, SUM(a.x * b.x) AS dot
  FROM flat a JOIN flat b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
ns AS (SELECT COUNT(*) AS n FROM embeddings WHERE vec_id % 4 = 0),
nf AS (SELECT COUNT(*) AS n FROM embeddings),
routes AS (
  SELECT
    CASE WHEN ns.n * CAST(ceil(ns.n / 4096.0) AS BIGINT) <= 2000000
         THEN 'exact' ELSE 'ivf' END AS route_small,
    CASE WHEN nf.n * CAST(ceil(nf.n / 4096.0) AS BIGINT) <= 256
         THEN 'exact' ELSE 'ivf' END AS route_full
  FROM ns, nf
)
SELECT vec_id_a, vec_id_b,
       round(dot / (x.nrm * y.nrm), 6) AS cosine,
       r.route_small, r.route_full,
       TRUE AS recall_ok
FROM dots
JOIN norms x ON vec_id_a = x.vec_id
JOIN norms y ON vec_id_b = y.vec_id
CROSS JOIN routes r
WHERE round(dot / (x.nrm * y.nrm), 6) >= 0.4
"""


@query("q_sim_join_auto", oracle=_SIM_JOIN_AUTO_ORACLE)
def q_sim_join_auto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cost-routed similarity self-join (operators/similarity.py
    ``similarity_join_auto`` — the Spark-idiomatic stand-in for SURVEY
    §4.3's Catalyst ``similarity_join`` rule, VERDICT r7 missing #4).
    Two routings are exercised and their decisions emitted as hashed
    columns: the vec_id%4 slice under the default 2M-row exact-tier
    cap (routes 'exact'; its pair set is the hashed row surface) and
    the full corpus under a 256-row cap — the 100 TB setting scaled to
    test data — which routes 'ivf'; that routed artifact is verified
    by the recall_ok contract against the exact full pair set."""
    from ..operators.similarity import similarity_join_auto

    emb = read_table(spark, sf_dir, "embeddings")
    small = emb.filter(F.col("vec_id") % 4 == 0)
    pins: list = []
    small_df, route_small = similarity_join_auto(small, threshold=0.4)
    full_df, route_full = similarity_join_auto(
        emb, threshold=0.4, exact_cap=256, pins=pins
    )
    if route_small != "exact" or route_full != "ivf":
        for p in pins:  # don't leak the IVF assignment cache on the
            p.unpersist()  # fail-loud path (the _release_after finally
            # never runs when we raise before materialization)
        raise AssertionError(
            f"router contract drifted: route_small={route_small} "
            f"route_full={route_full} — regenerated corpus crossed a "
            "cap boundary; retune the caps (and their oracle twins) "
            "before trusting this contract"
        )
    exact_full = cosine_self_join(emb, threshold=0.4).persist()
    exact_full.count()  # two recall aggregates: one matmul, not 2
    pins.append(exact_full)
    keys = ["vec_id_a", "vec_id_b"]
    rec = (
        exact_full.select(*keys)
        .join(full_df.select(*keys), keys, "left_semi")
        .agg(F.count(F.lit(1)).alias("n_hit"))
        .crossJoin(exact_full.agg(F.count(F.lit(1)).alias("n_tot")))
        .select((F.col("n_hit") * 10 >= F.col("n_tot") * 8).alias("recall_ok"))
    )
    out = (
        small_df.withColumn("route_small", F.lit(route_small))
        .withColumn("route_full", F.lit(route_full))
        .crossJoin(F.broadcast(rec))
    )
    return _release_after(out, pins)


# xxhash64 is unavailable in DuckDB, but the SELECTION is reproducible
# from the Spark side alone; the oracle instead pins the cap semantics
# exactly: per-language row counts = LEAST(k, group size), and every
# kept doc_id belongs to its group — expressed by re-deriving the
# aggregate view.  (The per-row pick is pinned by determinism tests.)
_PER_GROUP_CAP_ORACLE = """
SELECT lang, LEAST(50, COUNT(*)) AS n_kept
FROM documents GROUP BY lang
"""


@query("q_sample_pergroup", oracle=_PER_GROUP_CAP_ORACLE)
def q_sample_pergroup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source cap for corpus mixing: at most 50 docs per language,
    selected by deterministic hash rank (operators/sampling.py
    per_group_cap).  The oracle checks the aggregate cap contract;
    row-level determinism (same picks on any partitioning) is pinned
    in tests."""
    from ..operators.sampling import per_group_cap

    docs = read_table(spark, sf_dir, "documents")
    return (
        per_group_cap(docs, "lang", "doc_id", 50)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_kept"))
    )


_MAP_IN_ARROW_ORACLE = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       round(list_aggregate(list_transform(embedding,
                                           x -> CAST(x AS DOUBLE) ** 2),
             'sum'), 6) AS sq_norm
FROM embeddings
"""


@query("q_map_in_arrow", oracle=_MAP_IN_ARROW_ORACLE)
def q_map_in_arrow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``mapInArrow``: the zero-copy Python boundary — RecordBatches
    reach Python as Arrow, computed on with pyarrow/numpy and returned
    without a pandas detour (the cheapest escape hatch when the
    payload is already columnar, e.g. fixed-size-list embeddings).
    Completes the Python-boundary family next to udf / pandas_udf /
    grouped-agg / mapInPandas / cogroup / applyInPandasWithState /
    @udtf, all driver-gated."""
    import pyarrow as pa

    def sq_norms(batches):
        for batch in batches:
            tbl = pa.table(batch)
            embs = tbl.column("embedding").to_pylist()
            import numpy as np

            out = pa.RecordBatch.from_arrays(
                [
                    tbl.column("vec_id").combine_chunks(),
                    pa.array(
                        [len(e) for e in embs], type=pa.int32()
                    ),
                    pa.array(
                        [
                            round(
                                float(
                                    (np.asarray(e, dtype=np.float64) ** 2).sum()
                                ),
                                6,
                            )
                            for e in embs
                        ],
                        type=pa.float64(),
                    ),
                ],
                names=["vec_id", "dim", "sq_norm"],
            )
            yield out

    vecs = read_table(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    return vecs.mapInArrow(
        sq_norms, "vec_id long, dim int, sq_norm double"
    )


# Temperature mixing: DuckDB reproduces the rate arithmetic (counts →
# pow → round 6dp → cap) and the salted-hash fractional membership.
# '0x'||hex cast replicates Spark's conv(substr(md5),16,10); both
# sides round the rate to 6 dp BEFORE comparing so libm-vs-Math.pow
# last-ulp differences cannot flip a row.
_MIX_ORACLE = """
WITH counts AS (SELECT lang, COUNT(*) AS n FROM documents GROUP BY 1),
rates AS (
  SELECT lang,
         LEAST(round(pow(CAST(n AS DOUBLE) / (SELECT MAX(n) FROM counts),
                         -0.5), 6), 4.0) AS r
  FROM counts
),
ex AS (
  SELECT d.doc_id, d.lang, CAST(s.i AS INT) AS epoch, r.r
  FROM documents d
  JOIN rates r USING (lang)
  CROSS JOIN generate_series(0, 3) s(i)
  WHERE s.i < CAST(ceil(r.r) AS BIGINT)
)
SELECT doc_id, lang, epoch FROM ex
WHERE epoch < floor(r)
   OR CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR), ':',
            CAST(epoch AS VARCHAR))), 1, 8)) AS BIGINT) / 4294967296.0
      < r - floor(r)
"""


@query("q_mix_temperature", oracle=_MIX_ORACLE)
def q_mix_temperature(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-weighted corpus mixing (alpha=0.5): rare languages
    are upsampled by deterministic repetition toward p**alpha shares,
    the dominant language stays at rate 1 (operators/sampling.py
    temperature_mix).  The standard LLM-corpus mixing step — rates
    derive from one #sources-row aggregate broadcast back; the corpus
    side never shuffles and nothing reaches the driver."""
    from ..operators.sampling import temperature_mix

    return temperature_mix(
        read_table(spark, sf_dir, "documents").select("doc_id", "lang"),
        key="doc_id",
        source_col="lang",
        alpha=0.5,
        max_repeat=4,
    ).select("doc_id", "lang", "epoch")


# Pooled (mean) embedding per label, exploded to (label, pos, v) so
# the driver hashes scalars; double sums round 6 dp on both sides.
_EMBED_POOL_ORACLE = """
SELECT label, CAST(i AS INT) AS pos,
       ROUND(SUM(CAST(embedding[i] AS DOUBLE)) / COUNT(*), 6) AS v
FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
GROUP BY label, i
"""


@query("q_embed_pool", oracle=_EMBED_POOL_ORACLE)
def q_embed_pool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding pooling: mean vector per label — the chunk->document
    (or doc->class centroid) pooling step of an embedding pipeline.
    posexplode + one (label, pos) groupBy: the shuffle carries scalar
    components, dim-partitioned, so pooling a 100 TB embedding table
    parallelizes over labels x dimensions, never materializing a
    vector in driver memory."""
    e = read_table(spark, sf_dir, "embeddings")
    ex = e.select(
        "label", F.posexplode("embedding").alias("pos0", "x")
    )
    return ex.groupBy(
        "label", (F.col("pos0") + 1).cast("int").alias("pos")
    ).agg(
        F.round(
            F.sum(F.col("x").cast("double")) / F.count(F.lit(1)), 6
        ).alias("v")
    )


# Sliding-window chunking: stride 40 = 50-token chunks with 10-token
# overlap; same arithmetic as _CHUNK_ORACLE with the stride swapped.
_CHUNK_OVERLAP_ORACLE = """
WITH toked AS (
  SELECT doc_id, lang,
         list_filter(string_split(lower(trim(text)), ' '), x -> x <> '') AS t
  FROM documents
)
SELECT doc_id, lang,
       CAST(i AS INT) AS chunk_id,
       array_to_string(t[i * 40 + 1 : i * 40 + 50], ' ') AS chunk_text,
       CAST(least(50, len(t) - i * 40) AS INT) AS chunk_tokens
FROM toked CROSS JOIN generate_series(0, 79) s(i)
WHERE i < CAST(ceil(len(t) / 40.0) AS BIGINT)
"""


@query("q_text_chunk_overlap", oracle=_CHUNK_OVERLAP_ORACLE)
def q_text_chunk_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (50-token chunks, 10-token overlap):
    consecutive chunks share a boundary region so no token span is
    split without some chunk containing it whole — the RAG-indexing /
    context-sensitive variant of q_text_chunk.  Still a pure explode:
    output rows ~ tokens/stride, no shuffle."""
    from ..operators.sampling import chunk_documents

    return chunk_documents(
        read_table(spark, sf_dir, "documents"), chunk_tokens=50, overlap=10
    )


# Planted WAV files are pure functions of doc_id, so the DECODED
# signal features are SQL-expressible — hash-matching proves the RIFF
# chunk walk + int16 parse read real bytes (same proof style as
# q_multimodal_features).
_AUDIO_ORACLE = """
WITH g AS (SELECT doc_id, 800 + (doc_id % 5) * 160 AS n FROM documents),
s AS (
  SELECT doc_id, n, abs(((doc_id * 31 + i * 7) % 2048) - 1024) AS a
  FROM g CROSS JOIN generate_series(0, 1439) t(i) WHERE i < n
)
SELECT doc_id, TRUE AS decode_ok,
       CAST(8000 AS INT) AS sample_rate, CAST(1 AS INT) AS channels,
       CAST(n AS INT) AS n_samples,
       CAST(n // 8 AS INT) AS duration_ms,
       CAST(MAX(a) AS INT) AS peak,
       CAST(SUM(a) // n AS INT) AS mean_abs
FROM s GROUP BY doc_id, n
"""


@query("q_audio_features", oracle=_AUDIO_ORACLE)
def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio decode + signal features: deterministic REAL RIFF/PCM WAV
    payloads per doc, decoded by the pure-Python chunk walk in
    operators/multimodal.decode_wav inside Arrow-batched mapInPandas
    (duration / peak / mean-abs amplitude — the audio-quality triage
    a speech-corpus pipeline runs before transcription)."""
    from ..operators.multimodal import audio_features, with_planted_audio

    docs = read_table(spark, sf_dir, "documents")
    return audio_features(with_planted_audio(docs))


# Frame sampling over planted y4m clips: 1:N decode plumbing; luma
# means re-derived from the generator formula per sampled frame.
_VIDEO_ORACLE = """
WITH g AS (
  SELECT doc_id, 16 + (doc_id % 8) * 2 AS w,
         16 + ((doc_id * 3) % 8) * 2 AS h,
         3 + doc_id % 4 AS nf
  FROM documents
),
fr AS (
  SELECT doc_id, w, h, CAST(f AS INT) AS frame_idx
  FROM g CROSS JOIN generate_series(0, 6) t(f)
  WHERE f < nf AND f % 2 = 0
),
px AS (
  SELECT doc_id, frame_idx, w, h,
         SUM((x + 2 * y + 5 * frame_idx + doc_id) % 256) AS total
  FROM fr
  CROSS JOIN generate_series(0, 29) tx(x)
  CROSS JOIN generate_series(0, 29) ty(y)
  WHERE x < w AND y < h
  GROUP BY doc_id, frame_idx, w, h
)
SELECT doc_id, frame_idx, CAST(w AS INT) AS width,
       CAST(h AS INT) AS height,
       CAST(total // (w * h) AS INT) AS mean_luma
FROM px
"""


@query("q_video_frames", oracle=_VIDEO_ORACLE)
def q_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling: deterministic REAL YUV4MPEG2 clips per
    doc, every 2nd frame kept, per-frame mean luma — the 1:N
    mapInPandas shape (one clip in, one row per sampled frame out)
    that frame-level dedup/captioning pipelines are built on
    (operators/multimodal.sample_frames)."""
    from ..operators.multimodal import sample_frames, with_planted_video

    docs = read_table(spark, sf_dir, "documents")
    return sample_frames(with_planted_video(docs), every=2)


# Triangle census over the exact ngram pair graph (same pairs CTE as
# _CLUSTER_ORACLE); DuckDB enumerates the ordered triples and the
# per-vertex rollup identically.
_TRIANGLES_ORACLE = """
WITH sh AS (
  SELECT doc_id,
         list_distinct(list_transform(range(1, len(t) - 1),
           i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s
  FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS t
        FROM documents)
  WHERE len(t) >= 3
),
pairs AS (
  SELECT a.doc_id AS pa, b.doc_id AS pb
  FROM sh a JOIN sh b ON a.doc_id < b.doc_id
  WHERE len(list_intersect(a.s, b.s)) * 1.0
          / (len(a.s) + len(b.s) - len(list_intersect(a.s, b.s))) >= 0.35
),
deg AS (
  SELECT v, COUNT(*) AS degree FROM (
    SELECT pa AS v FROM pairs UNION ALL SELECT pb AS v FROM pairs
  ) GROUP BY v
),
tri AS (
  SELECT p1.pa AS x, p1.pb AS y, p2.pb AS z
  FROM pairs p1 JOIN pairs p2 ON p1.pb = p2.pa
                JOIN pairs p3 ON p3.pa = p1.pa AND p3.pb = p2.pb
),
pv AS (
  SELECT v, COUNT(*) AS triangles FROM (
    SELECT x AS v FROM tri UNION ALL SELECT y AS v FROM tri
    UNION ALL SELECT z AS v FROM tri
  ) GROUP BY v
)
SELECT d.v AS doc_id, d.degree,
       CAST(d.degree * (d.degree - 1) / 2 AS BIGINT) AS wedges,
       COALESCE(pv.triangles, 0) AS triangles,
       CASE WHEN d.degree >= 2 THEN
         ROUND(COALESCE(pv.triangles, 0) * 1.0
               / (d.degree * (d.degree - 1) / 2), 6)
       END AS clustering_coef
FROM deg d LEFT JOIN pv ON pv.v = d.v
"""


@query("q_graph_triangles", oracle=_TRIANGLES_ORACLE)
def q_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle census of the near-dup pair graph (operators/graph.py
    triangle_stats): per-doc degree, wedges, triangle membership and
    local clustering coefficient — distinguishes genuine duplicate
    cliques (coef ~1) from boilerplate hubs (high degree, coef ~0)
    before survivor selection.  Ordered-orientation enumeration: two
    equi-joins, no dedup pass, fan-out bounded by ordered degree."""
    from ..operators.graph import triangle_stats

    docs = read_table(spark, sf_dir, "documents")
    return triangle_stats(ngram_jaccard_pairs(docs, threshold=0.35))


# Batch serving shape: 3 query vectors, one corpus pass, top-10 each.
_TOPK_BATCH_ORACLE = """
WITH flat AS (
  SELECT vec_id, i, CAST(embedding[i] AS DOUBLE) AS x
  FROM embeddings CROSS JOIN generate_series(1, 64) t(i)
),
norms AS (SELECT vec_id, sqrt(SUM(x * x)) AS nrm FROM flat GROUP BY 1),
q AS (SELECT vec_id AS query_id, i, x FROM flat WHERE vec_id IN (0, 1, 2)),
dots AS (
  SELECT q.query_id, f.vec_id, SUM(f.x * q.x) AS dot
  FROM flat f JOIN q ON f.i = q.i
  WHERE f.vec_id <> q.query_id
  GROUP BY 1, 2
),
scored AS (
  SELECT d.query_id, d.vec_id,
         round(d.dot / (n.nrm * nq.nrm), 6) AS cosine
  FROM dots d
  JOIN norms n ON d.vec_id = n.vec_id
  JOIN norms nq ON nq.vec_id = d.query_id
),
r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
                               ORDER BY cosine DESC, vec_id) AS rn
  FROM scored
)
SELECT query_id, vec_id, cosine FROM r WHERE rn <= 10
"""


@query("q_sim_topk_batch", oracle=_TOPK_BATCH_ORACLE)
def q_sim_topk_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched exact top-k (operators/similarity.cosine_topk_batch):
    3 query vectors broadcast, ONE corpus pass scores all of them,
    WindowGroupLimit trims per query — the serving-batch shape that
    amortizes the 100 TB scan across the query set."""
    from ..operators.similarity import cosine_topk_batch

    return cosine_topk_batch(
        read_table(spark, sf_dir, "embeddings"), [0, 1, 2], k=10
    )


# Cross-source duplication matrix (r6): which sources mirror each
# other's content — the curation report that decides which feed to
# drop before training.  Planted 'mirror' clones (doc_id % 7, verbatim
# text) guarantee a non-trivial matrix on any corpus; organic
# cross-source duplicates fold into the same exact computation.
_CROSS_SOURCE_ORACLE = """
WITH corpus AS (
  SELECT doc_id, source, text FROM documents
  UNION ALL
  SELECT doc_id + 300000, 'mirror', text FROM documents WHERE doc_id % 7 = 0
),
fp AS (
  SELECT doc_id, source,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS h
  FROM corpus
)
SELECT a.source AS source_a, b.source AS source_b, COUNT(*) AS n_pairs
FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""


@query("q_dedup_cross_source", oracle=_CROSS_SOURCE_ORACLE)
def q_dedup_cross_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source-pair exact-duplicate counts via normalized content
    hash: fingerprint once (md5 of whitespace-collapsed lowercase
    text), self-join on the 16-byte hash — the join key is
    fingerprint-sized however long the documents are, and the matrix
    output is |sources|^2-bounded.  source_a/source_b orientation
    follows doc_id order, deterministic on both engines."""
    docs = read_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    _assert_planted_offset(docs, "doc_id", 300000)
    mirror = docs.filter(F.col("doc_id") % 7 == 0).select(
        (F.col("doc_id") + 300000).alias("doc_id"),
        F.lit("mirror").alias("source"),
        "text",
    )
    fp = docs.unionByName(mirror).select(
        "doc_id",
        "source",
        F.md5(
            F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
        ).alias("h"),
    ).persist()
    fp.count()  # both sides of the self-join must reuse, not recompute
    # the full-text md5 scan (persist-before-self-join rule)
    a, b = fp.alias("a"), fp.alias("b")
    out = (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    # r14 cache hygiene: the fingerprint cache previously leaked for
    # the session (the matrix result is |sources|^2-sized — tiny)
    return _release_after(out, [fp])


_PIPELINE_ORACLE = r"""
SELECT CAST((SELECT COUNT(*) FROM documents) + 200 AS BIGINT) AS n_docs,
       CAST((SELECT COUNT(DISTINCT md5(regexp_replace(lower(trim(text)),
                                        '\s+', ' ', 'g')))
             FROM documents) + 1 AS BIGINT) AS n_exact_groups,
       TRUE AS survivors_le_groups,
       TRUE AS clusters_partition_ok,
       TRUE AS planted_ok
"""


@query("q_dedup_pipeline", oracle=_PIPELINE_ORACLE)
def q_dedup_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline (operators/dedup.dedup_pipeline,
    VERDICT r11 #6): exact-hash collapse -> LSH on exact survivors ->
    connected-components -> canonical survivors, in one call — the
    boilerplate-first ordering enforced in code, not convention.  200
    verbatim clones of one page are planted (offset-asserted): the
    exact tier must collapse them BEFORE banding, so the LSH stages
    see one row for the whole clone pile.  Contract-oracle form: the
    doc count and exact-group count are recomputed exactly in SQL
    (DuckDB md5 over the same whitespace normalization, + the planted
    group); the LSH-tier invariants ride as flags the oracle expects
    TRUE — survivors can only MERGE exact groups (never split),
    clusters partition the corpus with canonical == cluster-min ==
    one survivor per cluster, and the planted pile lands in one
    cluster of exactly its 200 members with the lowest clone id
    canonical."""
    from ..operators.dedup import dedup_pipeline

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    _assert_planted_offset(docs, "doc_id", 400000)
    boiler = (
        "fresh picked produce delivered daily to your local market "
        "subscribe for seasonal updates and exclusive member pricing"
    )
    clones = spark.range(400000, 400200).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    mixed = docs.unionByName(clones)
    pins: list = []
    out = dedup_pipeline(mixed, threshold=0.5, pins=pins)

    clusters = out["clusters"].persist()
    pins.append(clusters)  # CC output feeds three aggregates + the
    # survivor semi-join — materialize once
    n_groups = out["exact_groups"].count()
    n_surv = out["survivors"].count()
    # one aggregate job over the persisted clusters frame (r15: the
    # planted-pile checks previously ran a SECOND agg over a filter of
    # the same cache — conditional aggregates fold them in; values
    # identical, NULL-skipping count_distinct/min/max over the
    # when()-masked columns equals the filtered form)
    planted_c = F.when(F.col("doc_id") >= 400000, F.col("cluster_id"))
    cl_agg = clusters.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.count_distinct("doc_id").alias("n_ids"),
        F.count(F.when(F.col("is_canonical"), 1)).alias("n_canon"),
        F.min(F.col("doc_id") >= F.col("cluster_id")).alias("min_ok"),
        F.count_distinct(planted_c).alias("n_cl"),
        F.min(planted_c).alias("cid"),
        F.max(
            F.when(F.col("doc_id") >= 400000, F.col("cluster_size"))
        ).alias("csize"),
    ).first()
    n_mixed = mixed.count()  # r15: was computed twice (two jobs)
    out_row = spark.createDataFrame(
        [
            (
                n_mixed,
                n_groups,
                bool(n_surv <= n_groups),
                bool(
                    cl_agg.n_rows == n_mixed
                    and cl_agg.n_ids == cl_agg.n_rows
                    and cl_agg.n_canon == n_surv
                    and cl_agg.min_ok
                ),
                bool(
                    cl_agg.n_cl == 1
                    and cl_agg.cid == 400000
                    and cl_agg.csize == 200
                ),
            )
        ],
        "n_docs bigint, n_exact_groups bigint, survivors_le_groups "
        "boolean, clusters_partition_ok boolean, planted_ok boolean",
    )
    return _release_after(out_row, pins)
