"""Hot-clone scale probe for the r12 LSH collapse (VERDICT r12 #5).

Plants N verbatim clones of one document into the sf corpus and
measures the collapse path's actual shape at scale:

- distinct-set representatives entering banding (the O(distinct)
  claim: the 10^5-clone pile must contribute ONE row),
- banding candidate-pair count (what verification pays),
- the analytic candidate count banding WOULD have produced without
  the collapse (every clone shares all 8 band keys, so the one
  bucket alone emits >= C(N+1, 2) pairs — never run, derived),
- wall time per stage.

    python tools/probe_collapse_hotclones.py [sf_dir] [n_clones]

Output: one JSON line, recorded in PLANS.md's capacity table.
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_fresh_picked_leads_spark.operators.dedup import (  # noqa: E402
    _band_candidates,
    _collapse_groups,
    minhash_signatures,
)
from etl_pipeline_fresh_picked_leads_spark.session import build_session  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.sources.readers import (  # noqa: E402
    read_table,
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    n_clones = int(sys.argv[2]) if len(sys.argv) > 2 else 100_000
    spark = build_session(app_name="fpl-collapse-probe")
    spark.sparkContext.setLogLevel("ERROR")

    docs = read_table(spark, sf_dir, "documents").select("doc_id", "text")
    n_docs = docs.count()
    picked = (
        docs.filter(F.length("text") > 50)
        .orderBy("doc_id")
        .select("text")
        .first()
        .text
    )
    max_id = docs.agg(F.max("doc_id")).first()[0]
    clones = spark.range(n_clones).select(
        (F.col("id") + max_id + 1).alias("doc_id"),
        F.lit(picked).alias("text"),
    )
    corpus = docs.unionByName(clones).repartition(32)

    t0 = time.time()
    base = minhash_signatures(corpus).persist()
    base.count()
    t_sig = round(time.time() - t0, 2)

    pins: list = []
    t0 = time.time()
    reps, members = _collapse_groups(base, pins)
    n_reps = reps.count()
    t_collapse = round(time.time() - t0, 2)

    # the clone pile (plus its template) must be ONE representative
    rep_of_clones = (
        members.filter(F.col("doc_id") > max_id)
        .select("rep_id")
        .distinct()
        .count()
    )
    pile = members.groupBy("rep_id").count().agg(F.max("count")).first()[0]

    t0 = time.time()
    n_cands = _band_candidates(reps).count()
    t_band = round(time.time() - t0, 2)

    base.unpersist()
    for p in pins:
        p.unpersist()

    out = {
        "sf_dir": sf_dir,
        "n_docs": n_docs,
        "n_clones": n_clones,
        "n_distinct_reps": n_reps,
        "clone_pile_reps": rep_of_clones,  # must be 1
        "largest_group": pile,  # must be n_clones + 1
        "banding_candidates": n_cands,
        "without_collapse_min_candidates": (n_clones + 1)
        * n_clones
        // 2,
        "t_signatures_sec": t_sig,
        "t_collapse_sec": t_collapse,
        "t_banding_sec": t_band,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
