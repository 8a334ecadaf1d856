"""Hot-user skew probe for q_win_rolling_distinct (VERDICT r6 item 7).

The rolling-WAU expand trick multiplies rows x7 — but only AFTER the
distinct (user, day) collapse, so the question is whether a user
holding 20% of raw EVENTS (the production skew shape: a bot, a test
account) survives into the expanded shuffle or is absorbed by
map-side partial aggregation at the distinct.  Uniform probes can't
answer that (PLANS.md's earlier 8x numbers cover uniform keys only).

Synthesizes four event variants under /tmp/fpl_spark_scratch/hotwau —
{1x, 8x} x {uniform, hot} where "hot" reassigns 20% of rows
(event_id % 5 == 0, deterministic) to a single planted user — then
times the registered query (noop sink, min of 2) and cross-checks the
hot-variant result against an independent DataFrame recompute.

    python tools/probe_hot_user_wau.py [base_sf_dir] [mult]

Findings land in PLANS.md ("Round-7 additions").
"""

from __future__ import annotations

import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from pyspark.sql import functions as F  # noqa: E402

from etl_pipeline_fresh_picked_leads_spark.queries import QUERIES  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.session import build_session  # noqa: E402
from etl_pipeline_fresh_picked_leads_spark.sources.readers import read_table  # noqa: E402

SCRATCH = "/tmp/fpl_spark_scratch/hotwau"
HOT_USER = -99
USER_STRIDE = 10_000_000


def main() -> None:
    base_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    mult = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = build_session(app_name="hotwau-probe")
    spark.sparkContext.setLogLevel("ERROR")
    shutil.rmtree(SCRATCH, ignore_errors=True)

    ev = read_table(spark, base_dir, "events")

    def write_variant(name: str, df) -> str:
        out = os.path.join(SCRATCH, name)
        df.write.mode("overwrite").parquet(os.path.join(out, "events.parquet"))
        return out

    # Replicas keep their own user-id space (stride) so the distinct
    # user count scales with the data, like a real corpus.
    def scaled(df, m):
        parts = [
            df.withColumn(
                "user_id", F.col("user_id") + F.lit(i * USER_STRIDE)
            )
            for i in range(m)
        ]
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        return out

    def hot(df):
        return df.withColumn(
            "user_id",
            F.when(F.col("event_id") % 5 == 0, F.lit(HOT_USER)).otherwise(
                F.col("user_id")
            ),
        )

    variants = {
        "1x_uniform": write_variant("1x_uniform", ev),
        "1x_hot": write_variant("1x_hot", hot(ev)),
        f"{mult}x_uniform": write_variant(f"{mult}x_uniform", scaled(ev, mult)),
        f"{mult}x_hot": write_variant(f"{mult}x_hot", hot(scaled(ev, mult))),
    }

    qfn = QUERIES["q_win_rolling_distinct"]
    # codegen warmup
    qfn(spark, variants["1x_uniform"]).write.format("noop").mode(
        "overwrite"
    ).save()
    timings = {}
    for name, d in variants.items():
        runs = []
        for _ in range(2):
            t0 = time.time()
            qfn(spark, d).write.format("noop").mode("overwrite").save()
            runs.append(time.time() - t0)
        timings[name] = round(min(runs), 3)

    # Correctness under skew, via a STRUCTURALLY DIFFERENT method (r7
    # review: recomputing with the same expand-contribution shape
    # would be blind to a bug in that shape): a day spine range-joined
    # against the distinct activity pairs — trailing-window semantics
    # expressed as a non-equi join, no explode anywhere.
    d = variants[f"{mult}x_hot"]
    got = {
        (str(r.day), r.wau_7d) for r in qfn(spark, d).collect()
    }
    ev2 = spark.read.parquet(os.path.join(d, "events.parquet"))
    act = ev2.select("user_id", F.to_date("ts").alias("day")).distinct()
    lo, hi = act.agg(F.min("day"), F.max("day")).collect()[0]
    spine = spark.sql(
        f"SELECT explode(sequence(DATE '{lo}', DATE '{hi}')) AS obs_day"
    )
    exp = {
        (str(r.obs_day), r.n)
        for r in spine.join(
            act,
            (F.col("day") <= F.col("obs_day"))
            & (F.col("day") >= F.date_sub(F.col("obs_day"), 6)),
        )
        .groupBy("obs_day")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    print("exact_under_skew:", got == exp)
    print("timings:", timings)
    u1, h1 = timings["1x_uniform"], timings["1x_hot"]
    um, hm = timings[f"{mult}x_uniform"], timings[f"{mult}x_hot"]
    print(
        f"hot/uniform at 1x: {h1 / u1:.2f}  at {mult}x: {hm / um:.2f}  "
        f"{mult}x/1x uniform: {um / u1:.2f}  hot: {hm / h1:.2f}"
    )


if __name__ == "__main__":
    main()
