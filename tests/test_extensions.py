"""Invariant tests for the rows-only extension operators: LSH recall
vs exact ground truth, IVF recall vs brute force, sketch accuracy
(SURVEY §5.2; §2B-K oracle strategy).
"""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from etl_pipeline_fresh_picked_leads_spark.operators.multimodal import (
    decode_image,
    extract_features,
)
from etl_pipeline_fresh_picked_leads_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)
from etl_pipeline_fresh_picked_leads_spark.operators.text import language_id
from etl_pipeline_fresh_picked_leads_spark.sources.readers import read_table

from conftest import SF_MEDIUM


@pytest.fixture(scope="module")
def docs(spark):
    return read_table(spark, SF_MEDIUM, "documents")


@pytest.fixture(scope="module")
def embeddings(spark):
    return read_table(spark, SF_MEDIUM, "embeddings")


def _pairset(df):
    return {(r.doc_id_a, r.doc_id_b) for r in df.collect()}


def test_lsh_recall_vs_exact(docs):
    """LSH at tau=0.5 must find >=95% of the exact >=0.6 pairs (the
    8x2 banding gives ~0.97 theoretical recall at j=0.6, ~1.0 above
    0.8) and report no pair below its own threshold."""
    exact_06 = _pairset(
        ngram_jaccard_pairs(docs, threshold=0.6).select("doc_id_a", "doc_id_b")
    )
    lsh = minhash_lsh_pairs(docs, threshold=0.5)
    found = _pairset(lsh.select("doc_id_a", "doc_id_b"))
    assert exact_06, "corpus should contain planted near-dups"
    recall = len(exact_06 & found) / len(exact_06)
    assert recall >= 0.95, f"recall {recall} on {len(exact_06)} pairs"
    assert lsh.filter(F.col("jaccard") < 0.5).count() == 0


def test_lsh_deterministic(docs):
    a = _pairset(minhash_lsh_pairs(docs, 0.5).select("doc_id_a", "doc_id_b"))
    b = _pairset(minhash_lsh_pairs(docs, 0.5).select("doc_id_a", "doc_id_b"))
    assert a == b


def test_simhash_finds_exact_dup_clusters(docs):
    """Hamming<=3 simhash pairs must include every identical-text pair
    (hamming 0) and never pair docs with disjoint-ish shingles."""
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    hashed = docs.select("doc_id", F.md5(norm).alias("h"))
    a, b = hashed.alias("a"), hashed.alias("b")
    exact_dups = {
        (r.doc_id_a, r.doc_id_b)
        for r in a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_id_a"),
            F.col("b.doc_id").alias("doc_id_b"),
        )
        .collect()
    }
    sim = simhash_pairs(docs, max_hamming=3)
    found = _pairset(sim.select("doc_id_a", "doc_id_b"))
    assert exact_dups <= found
    zero = sim.filter(F.col("hamming") == 0).count()
    assert zero >= len(exact_dups)


def test_ivf_recall_vs_exact(embeddings):
    exact = [r.vec_id for r in cosine_topk(embeddings, 0, k=10).collect()]
    approx = [r.vec_id for r in ivf_topk(embeddings, 0, k=10, nlist=16, nprobe=4).collect()]
    overlap = len(set(exact) & set(approx)) / 10
    # seeded spherical k-means centroids: recall@10 must clear 0.9 at
    # nprobe=4/nlist=16 (round-1 verdict item 4 done-criterion)
    assert overlap >= 0.9, f"IVF recall {overlap}"
    # full probe must equal exact (sanity: IVF degenerates correctly)
    full = [r.vec_id for r in ivf_topk(embeddings, 0, k=10, nlist=16, nprobe=16).collect()]
    assert full == exact


def test_cosine_self_join_is_distributed(embeddings):
    """The exact all-pairs join must never materialize the corpus on
    the driver (round-1 verdict item 3): the plan is a cogrouped
    Pandas gemm over hash tiles, and the operator source contains no
    collect().  Small tiles force the multi-tile path and must agree
    with the single-tile result."""
    import inspect

    from etl_pipeline_fresh_picked_leads_spark.operators import similarity

    src = inspect.getsource(similarity.cosine_self_join)
    assert ".collect()" not in src and "sc.broadcast" not in src

    joined = similarity.cosine_self_join(embeddings, threshold=0.4)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "FlatMapCoGroupsInPandas" in plan
    assert "CollectLimit" not in plan

    def pairs(tile_rows):
        return {
            (r.vec_id_a, r.vec_id_b)
            for r in similarity.cosine_self_join(
                embeddings, 0.4, tile_rows=tile_rows
            ).collect()
        }

    one_tile = pairs(1 << 20)
    many_tiles = pairs(97)
    assert one_tile == many_tiles and len(one_tile) > 0


def test_approx_count_distinct_error(spark):
    e = read_table(spark, SF_MEDIUM, "events")
    got = (
        e.agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("a"),
            F.countDistinct("user_id").alias("x"),
        )
        .collect()[0]
    )
    assert abs(got.a - got.x) / got.x <= 0.05


def test_language_id_runs_and_is_deterministic(docs):
    out1 = language_id(docs).orderBy("doc_id").collect()
    out2 = language_id(docs).orderBy("doc_id").collect()
    assert out1 == out2
    assert all(r.lang_pred in {"en", "es", "de", "fr", "und"} for r in out1)


def test_multimodal_feature_plumbing(docs):
    feats = extract_features(docs)
    rows = feats.collect()
    assert len(rows) == docs.count()  # 1:1 row alignment
    assert all(r.width >= 64 and r.height >= 64 and r.channels == 3 for r in rows)
    assert all(r.resize_bucket in {"256x256", "256x128", "128x256", "128x128"}
               for r in rows)
    # byte counts must match the payload the JVM produced
    n = docs.select(F.length(F.encode("text", "UTF-8")).alias("n")).collect()
    assert sorted(r.n_bytes for r in rows) == sorted(r.n for r in n)


def test_real_decoder_is_clearly_stubbed():
    with pytest.raises(NotImplementedError):
        decode_image(b"\x89PNG...")
