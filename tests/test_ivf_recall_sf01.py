"""IVF recall curve at sf0.1 (VERDICT r4 item 8): the recall floor was
previously pinned only at sf0.01; this pins the 10x-corpus behavior at
the DEFAULT settings and the monotone nprobe/replicas trade-off that
PLANS.md documents.  Everything is seeded/hash-deterministic (sampled
k-means fit, deterministic tie-breaks), so exact floors are stable.

Measured curve (mean/min recall@10 over the 5 lowest vec_ids, n=2000):

    replicas=1 nprobe=4 -> 0.58 / 0.50
    replicas=4 nprobe=2 -> 0.82 / 0.60
    replicas=4 nprobe=4 -> 0.96 / 0.90   (defaults)
    replicas=4 nprobe=8 -> 0.98 / 0.90
"""

from __future__ import annotations

import pytest

from etl_pipeline_fresh_picked_leads_spark.operators.similarity import (
    cosine_topk,
    ivf_topk,
)

SF_01 = "/root/testdata/sf0.1"


@pytest.fixture(scope="module")
def emb01(spark):
    df = spark.read.parquet(f"{SF_01}/embeddings.parquet").persist()
    df.count()
    yield df
    df.unpersist()


def _recalls(emb, qids, exact, nprobe, replicas):
    out = []
    for q in qids:
        approx = [
            r.vec_id
            for r in ivf_topk(
                emb, q, k=10, nlist=16, nprobe=nprobe, replicas=replicas
            ).collect()
        ]
        out.append(len(set(exact[q]) & set(approx)) / 10)
    return out


def test_ivf_recall_floor_at_defaults_sf01(emb01):
    qids = [
        r.vec_id
        for r in emb01.select("vec_id").orderBy("vec_id").limit(5).collect()
    ]
    exact = {
        q: [r.vec_id for r in cosine_topk(emb01, q, k=10).collect()]
        for q in qids
    }
    # defaults: nprobe=4, replicas=4 — the floor PLANS.md claims
    at_default = _recalls(emb01, qids, exact, nprobe=4, replicas=4)
    assert sum(at_default) / len(at_default) >= 0.9, at_default
    assert min(at_default) >= 0.85, at_default
    # the trade-off is monotone: fewer replicas at the same nprobe
    # must not beat the default (the reason replicas=4 IS the default)
    low_rep = _recalls(emb01, qids, exact, nprobe=4, replicas=1)
    assert sum(low_rep) <= sum(at_default)


def test_two_level_assignment_recall_close_to_flat(spark, emb01):
    """Hierarchical (coarse->fine) centroid routing — the path that
    keeps nlist ∝ n assignment sub-quadratic at 100 TB — may cost only
    a small recall delta vs flat scoring of all centroids.  Measured:
    candidate recall 0.845 (kc=6) vs 0.870 flat at nlist=31."""
    from pyspark.sql import functions as F

    from etl_pipeline_fresh_picked_leads_spark.operators.similarity import (
        cosine_self_join,
        ivf_assign,
    )

    exact = {
        (r.vec_id_a, r.vec_id_b)
        for r in cosine_self_join(emb01, threshold=0.4).collect()
    }

    def recall(two_level):
        _, a = ivf_assign(emb01, nlist=31, use_index=False,
                          two_level=two_level)
        a = a.persist()
        a.count()
        r = a.select("centroid_id", F.col("vec_id").alias("rv"))
        cands = {
            (x.vec_id, x.rv)
            for x in a.join(r, "centroid_id")
            .filter(F.col("vec_id") < F.col("rv"))
            .select("vec_id", "rv")
            .distinct()
            .collect()
        }
        a.unpersist()
        return len(exact & cands) / len(exact)

    flat, hier = recall(None), recall(6)
    assert hier >= flat - 0.05, (flat, hier)
    assert hier >= 0.8


def test_hierarchical_fit_recall_close_to_flat(spark, emb01, monkeypatch):
    """r9 fit-budget cap (VERDICT r8 #5): the two-level centroid FIT
    (coarse sqrt(nlist) k-means + parallel per-group numpy Lloyd) must
    hold recall within 0.03 of the flat Spark-ML fit at the same
    nlist/nprobe/replicas — the fit got sub-linear in nlist, not
    worse at ranking."""
    import etl_pipeline_fresh_picked_leads_spark.operators.similarity as S

    qids = [
        r.vec_id
        for r in emb01.select("vec_id").orderBy("vec_id").limit(5).collect()
    ]
    exact = {
        q: [r.vec_id for r in cosine_topk(emb01, q, k=10).collect()]
        for q in qids
    }

    def mean_recall():
        out = []
        for q in qids:
            approx = [
                r.vec_id
                for r in ivf_topk(
                    emb01, q, k=10, nlist=256, nprobe=48, replicas=4
                ).collect()
            ]
            out.append(len(set(exact[q]) & set(approx)) / 10)
        return sum(out) / len(out)

    # ivf_topk -> ivf_assign uses the corpus-fingerprint center cache;
    # the two fits must not share it
    monkeypatch.setattr(S, "_load_cached_centers", lambda *a: None)
    monkeypatch.setattr(S, "_store_cached_centers", lambda *a: None)

    monkeypatch.setattr(S, "IVF_HIER_FIT_MIN_NLIST", 10**9)  # force flat
    flat = mean_recall()
    monkeypatch.setattr(S, "IVF_HIER_FIT_MIN_NLIST", 256)  # force hier
    hier = mean_recall()
    assert hier >= flat - 0.03, (flat, hier)
    assert hier >= 0.8, hier
