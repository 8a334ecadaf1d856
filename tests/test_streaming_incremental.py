"""Streaming incremental LSH dedup (streaming/dedup.py
stream_incremental_lsh): union of per-batch pair sets must equal the
full-corpus batch run, and replays must be exactly-once.
"""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
    minhash_lsh_pairs,
)
from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES
from etl_pipeline_fresh_picked_leads_spark.sources.readers import read_table
from etl_pipeline_fresh_picked_leads_spark.sources.txtable import TxTable

from conftest import SF_SMALL


def _pairs(df):
    return {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 6)) for r in df.collect()
    }


def test_stream_incremental_union_equals_full_run(spark):
    # run the query for its side effects (it now returns the exact-
    # pairs contract surface); the union-equals-full-run property is
    # asserted on the streamed pairs TxTable itself
    contract = QUERIES["q_stream_dedup_incremental"](spark, SF_SMALL)
    assert all(r.recall_hi_ok for r in contract.collect())
    base = os.path.join("/tmp", "fpl_spark_scratch", "stream_lsh")
    got = _pairs(TxTable(spark, os.path.join(base, "pairs")).read())
    docs = read_table(spark, SF_SMALL, "documents")
    want = _pairs(minhash_lsh_pairs(docs, threshold=0.5))
    assert got == want and len(got) > 0


def test_stream_incremental_replay_is_exactly_once(spark):
    # the query leaves its tables in scratch; re-running the whole
    # streaming job over the same landing dir + checkpoint must not
    # duplicate pairs or signatures (file source skips processed
    # files; txn tags guard foreachBatch re-fires)
    QUERIES["q_stream_dedup_incremental"](spark, SF_SMALL).collect()
    base = os.path.join("/tmp", "fpl_spark_scratch", "stream_lsh")
    before = _pairs(TxTable(spark, os.path.join(base, "pairs")).read())
    from etl_pipeline_fresh_picked_leads_spark.streaming.dedup import (
        stream_incremental_lsh,
    )

    q = stream_incremental_lsh(
        spark,
        os.path.join(base, "landing"),
        index_root=os.path.join(base, "index"),
        pairs_root=os.path.join(base, "pairs"),
        checkpoint=os.path.join(base, "chk"),
    )
    assert q.awaitTermination(300)
    after = _pairs(TxTable(spark, os.path.join(base, "pairs")).read())
    assert after == before

    # harder: lose the CHECKPOINT (crash) — the file source re-lists
    # everything and foreachBatch re-fires with the same batch ids;
    # the per-batch txn tags must make every re-commit a no-op
    import shutil

    shutil.rmtree(os.path.join(base, "chk"))
    q2 = stream_incremental_lsh(
        spark,
        os.path.join(base, "landing"),
        index_root=os.path.join(base, "index"),
        pairs_root=os.path.join(base, "pairs"),
        checkpoint=os.path.join(base, "chk"),
    )
    assert q2.awaitTermination(300)
    pairs_tbl = TxTable(spark, os.path.join(base, "pairs")).read()
    assert _pairs(pairs_tbl) == before
    # ROW count too — a replayed batch-0 append would keep the set
    # equal while doubling the rows
    assert pairs_tbl.count() == len(before)
    # signature index holds each doc exactly once
    sig = TxTable(spark, os.path.join(base, "index")).read()
    n_docs = read_table(spark, SF_SMALL, "documents").count()
    assert sig.count() == n_docs
    assert sig.select("doc_id").distinct().count() == n_docs


def test_incremental_hot_batch_collapses_and_matches_full_run(
    spark, tmp_path
):
    """r12 hot-bucket protection on the incremental path: a verbatim
    clone pile arriving in ONE batch bands as a single representative
    row (the batch side collapses identical shingle sets), and the
    emitted pairs are still exactly the full-corpus run restricted to
    pairs touching the batch — including every clone pair at jaccard
    1.0 re-expanded from the collapse."""
    from pyspark.sql import functions as F

    from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (
        incremental_lsh_pairs,
        minhash_lsh_pairs,
    )
    from etl_pipeline_fresh_picked_leads_spark.sources.readers import (
        read_table,
    )

    root = str(tmp_path / "idx")
    docs = read_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    )
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    boiler = (
        "cloned boilerplate arriving as one hot batch in the "
        "incremental pipeline"
    )
    clones = spark.range(500000, 500200).select(
        F.col("id").alias("doc_id"), F.lit(boiler).alias("text")
    )
    b2 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(clones)
    incremental_lsh_pairs(b1, root, 0.5)
    got = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in incremental_lsh_pairs(b2, root, 0.5).collect()
    }
    full = minhash_lsh_pairs(docs.unionByName(clones), 0.5)
    b2_ids = {r.doc_id for r in b2.select("doc_id").collect()}
    want = {
        (r.doc_id_a, r.doc_id_b, round(r.jaccard, 9))
        for r in full.collect()
        if r.doc_id_a in b2_ids or r.doc_id_b in b2_ids
    }
    assert got == want
    # every clone pair present at exactly 1.0
    clone_pairs = {
        p for p in got if p[0] >= 500000 and p[1] >= 500000
    }
    assert len(clone_pairs) == 200 * 199 // 2
    assert all(p[2] == 1.0 for p in clone_pairs)
