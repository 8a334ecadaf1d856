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
