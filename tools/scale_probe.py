"""Scale probe: time registered queries at 1x vs Nx data.

Synthesizes an Nx documents+embeddings corpus from a base sf dir into
/tmp/fpl_spark_scratch/scale_probe/ (replica id folded into the key;
text vowel-rotated and vector COORDINATES permuted per replica so
replicas are NOT near-duplicates of each other — otherwise every doc
gains N exact copies and the dedup/similarity workloads change shape
instead of scale: an early affine perturbation (scale+shift) left
cross-replica cosine ≈ 1, which inflated the 8x sim-join output
11,000x and made the probe measure a near-clique, not a scale-up.
A seeded coordinate permutation preserves norms and within-replica
geometry exactly (within-replica output identical to base) while
cross-replica cosine drops to chance (|cos| ~ 1/sqrt(dim)).  Each
query then runs with the noop sink at base vs scaled.

The PLANS.md "Scale probe" table for the relational core came from the
same method over lineitem; this tool makes the LLM-operator probe
reproducible:

    python tools/scale_probe.py [base_sf_dir] [mult] [qid ...]

Each replica is written as its own parquet append (32 partitions per
replica), so the scaled corpus arrives as many splits — the shape a
real multi-thousand-file deployment has.
"""

from __future__ import annotations

import os
import random
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.session import build_session  # noqa: E402

SCRATCH = "/tmp/fpl_spark_scratch/scale_probe"
KEY_STRIDE = 10_000_000

# vowel rotations per replica: tokens change almost everywhere, so
# cross-replica shingle Jaccard stays near zero (replica 0 = original)
_ROTS = ["aeiou", "eioua", "iouae", "ouaei", "uaeio", "eouia", "iaueo", "oeaui"]

DEFAULT_QIDS = [
    "q_dedup_content_hash",
    "q_dedup_fuzzy",
    "q_dedup_cluster",
    "q_text_quality",
    "q_text_repetition",
    "q_text_tokens",
    "q_sim_topk",
    "q_sim_join_ivf",
    # r4/r5 additions measured in PLANS.md "Round-5 additions"
    "q_text_dup_spans",
    "q_dedup_incremental",
    "q_mix_temperature",
]


def build_scaled(spark, base_dir: str, mult: int) -> str:
    out = os.path.join(SCRATCH, f"{os.path.basename(base_dir.rstrip('/'))}_x{mult}")
    if all(
        os.path.isdir(os.path.join(out, f"{t}.parquet"))
        for t in ("lineitem", "documents", "embeddings")
    ):
        return out  # reuse a previous synthesis
    # relational side: dims copy verbatim, facts replicate with the
    # key stride folded into every join key so replicas join ONLY
    # within themselves (the relational-core probe in PLANS.md used
    # exactly this; having it here makes that table reproducible and
    # lets the composite TPC-H queries run at Nx)
    for t in ("region", "nation", "customer", "supplier", "part"):
        spark.read.parquet(os.path.join(base_dir, f"{t}.parquet")) \
            .write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
    orders = spark.read.parquet(os.path.join(base_dir, "orders.parquet"))
    li = spark.read.parquet(os.path.join(base_dir, "lineitem.parquet"))
    ev = spark.read.parquet(os.path.join(base_dir, "events.parquet"))
    for rep in range(mult):
        off = rep * KEY_STRIDE
        mode = "overwrite" if rep == 0 else "append"
        orders.withColumn("o_orderkey", F.col("o_orderkey") + off) \
            .repartition(8).write.mode(mode) \
            .parquet(os.path.join(out, "orders.parquet"))
        li.withColumn("l_orderkey", F.col("l_orderkey") + off) \
            .repartition(8).write.mode(mode) \
            .parquet(os.path.join(out, "lineitem.parquet"))
        ev.withColumn("event_id", F.col("event_id") + off) \
            .repartition(8).write.mode(mode) \
            .parquet(os.path.join(out, "events.parquet"))
    docs = spark.read.parquet(os.path.join(base_dir, "documents.parquet"))
    emb = spark.read.parquet(os.path.join(base_dir, "embeddings.parquet"))
    dim = len(emb.first()["embedding"])
    for rep in range(mult):
        rot = _ROTS[rep % len(_ROTS)]
        d = docs.select(
            (F.col("doc_id") + rep * KEY_STRIDE).alias("doc_id"),
            "lang",
            (F.col("text") if rep == 0 else F.translate("text", "aeiou", rot)).alias(
                "text"
            ),
        )
        perm = list(range(dim))
        random.Random(rep).shuffle(perm)  # seeded: replica 0 keeps identity
        if rep == 0:
            perm = list(range(dim))
        e = emb.select(
            (F.col("vec_id") + rep * KEY_STRIDE).alias("vec_id"),
            F.array(
                *[F.col("embedding")[p] for p in perm]
            ).alias("embedding"),
            "label",
        )
        mode = "overwrite" if rep == 0 else "append"
        d.repartition(32).write.mode(mode).parquet(
            os.path.join(out, "documents.parquet")
        )
        e.repartition(32).write.mode(mode).parquet(
            os.path.join(out, "embeddings.parquet")
        )
    return out


def time_query(spark, qid: str, sf_dir: str) -> float:
    t0 = time.time()
    QUERIES[qid](spark, sf_dir).write.format("noop").mode("overwrite").save()
    return round(time.time() - t0, 2)


def main() -> None:
    base = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    qids = sys.argv[3:] or DEFAULT_QIDS
    spark = build_session(app_name="fpl-scale-probe")
    spark.sparkContext.setLogLevel("ERROR")
    scaled = build_scaled(spark, base, mult)
    # warm up codegen/JVM so the 1x column isn't paying startup
    time_query(spark, qids[0], base)
    print(f"| query | {os.path.basename(base)} (1x) | {mult}x ({mult*32} splits) |")
    print("|---|---|---|")
    for qid in qids:
        t1 = time_query(spark, qid, base)
        tn = time_query(spark, qid, scaled)
        print(f"| {qid} | {t1} s | {tn} s |")


if __name__ == "__main__":
    main()
