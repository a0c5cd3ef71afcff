#!/usr/bin/env python
"""Hot-conversation straggler measurement (docs/SCALE.md "skew is
bounded" evidence; results recorded in BENCH/TUNING.md).

Builds a pathological table — the normal Zipf profile (2,000 convs) plus
ONE conversation with 10^5 turns, EVERY one of which matches the retry
after-rule (sid 1000010), so the full 10^5 rows enter the conv-keyed
stateful replay as a single unsplittable group (state is order-dependent
per conversation; SURVEY §7.4.5 forbids salting it). Then:

1. runs the full pipeline and asserts output ≡ the pure-Python oracle
   (correctness under pathology — the 10^4 twin is a standing pytest,
   tests/test_skew_hot_conv.py);
2. pulls per-task durations for every stage from the Spark UI REST API
   and reports max/median task time — the straggler ratio — for the
   replay exchange stage (identified as the stage holding the longest
   task of the run: that IS the hot conversation's replay partition);
3. reports engine/skew.py salted_repartition balance on the same table's
   stateless prefix (plain conv_id partitioning vs 16-way salting).

Usage: python scripts/skew_bench.py [--hot-turns 100000]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import urllib.request

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import numpy as np  # noqa: E402
import pandas as pd  # noqa: E402
import pyarrow as pa  # noqa: E402
import pyarrow.parquet as pq  # noqa: E402

from sagan_spark.datagen.transcripts import PLANT, SCHEMA, gen_chunk  # noqa: E402
from sagan_spark.session import get_spark  # noqa: E402

HOT_CONV = "convhot00"


def hot_conv_pdf(n_turns: int, seed: int = 3) -> pd.DataFrame:
    rng = np.random.RandomState(seed)
    pdf = pd.DataFrame(
        {
            "conv_id": [HOT_CONV] * n_turns,
            "turn_idx": pd.array(range(n_turns), dtype="int32"),
            "role": ["assistant"] * n_turns,
            "text": [PLANT["p_retry"]] * n_turns,
            "tool": ["none"] * n_turns,
            "ts": pd.Series(
                pd.Timestamp("2025-02-01") + pd.to_timedelta(np.arange(n_turns) * 10, unit="s")
            ).astype("datetime64[us]"),
        }
    )
    return pdf.iloc[rng.permutation(n_turns)].reset_index(drop=True)


def build_table(path: str, n_convs: int, hot_turns: int) -> None:
    os.makedirs(path, exist_ok=True)
    for f in os.listdir(path):
        if f.endswith(".parquet"):
            os.remove(os.path.join(path, f))
    part = 0
    for lo in range(0, n_convs, 500):
        pdf = gen_chunk(lo, min(lo + 500, n_convs), seed=11, hot_cap=5000)
        perm = np.random.default_rng([11, 7919, lo]).permutation(len(pdf))
        pq.write_table(
            pa.Table.from_pandas(pdf.iloc[perm].reset_index(drop=True), schema=SCHEMA,
                                 preserve_index=False),
            os.path.join(path, f"part-{part:05d}.parquet"),
        )
        part += 1
    pq.write_table(
        pa.Table.from_pandas(hot_conv_pdf(hot_turns), schema=SCHEMA, preserve_index=False),
        os.path.join(path, f"part-{part:05d}-hot.parquet"),
    )


def _get(url: str):
    with urllib.request.urlopen(url, timeout=30) as r:
        return json.loads(r.read())


def stage_task_stats(spark) -> list[dict]:
    """(stageId, name, numTasks, median_ms, max_ms, ratio) for every
    completed stage, via the UI REST API (taskList gives raw durations)."""
    base = spark.sparkContext.uiWebUrl
    app = _get(f"{base}/api/v1/applications")[0]["id"]
    out = []
    for st in _get(f"{base}/api/v1/applications/{app}/stages?status=COMPLETE"):
        sid, att = st["stageId"], st["attemptId"]
        tasks = _get(
            f"{base}/api/v1/applications/{app}/stages/{sid}/{att}/taskList?length=1000"
        )
        durs = sorted(t.get("duration", 0) for t in tasks)
        if not durs:
            continue
        med = durs[len(durs) // 2]
        out.append(
            {
                "stage": sid,
                "name": st["name"].split("\n")[0][:60],
                "tasks": len(durs),
                "median_ms": med,
                "max_ms": durs[-1],
                "ratio": round(durs[-1] / max(med, 1), 2),
            }
        )
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--hot-turns", type=int, default=100_000)
    ap.add_argument("--n-convs", type=int, default=2_000)
    ap.add_argument("--skip-oracle", action="store_true")
    args = ap.parse_args()

    path = f"/tmp/sagan_skew_tx_{args.n_convs}_{args.hot_turns}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        build_table(path, args.n_convs, args.hot_turns)
        open(marker, "w").write("ok")

    spark = get_spark(app_name="sagan_skew")
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(0, 128, 1, 32)
        .mapInPandas(lambda it: it, "id: long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    from pyspark.sql import functions as F

    from sagan_spark.engine import pipeline
    from sagan_spark.engine.skew import salted_repartition

    rows = spark.read.parquet(path).count()
    t0 = time.time()
    res = pipeline.run(spark, path)
    alerts = sum(res.sink_counts.values())
    wall = round(time.time() - t0, 3)
    sid_counts = dict(res.sid_counts)

    stats = stage_task_stats(spark)
    # the replay straggler = the stage holding the longest task of the run
    straggler = max(stats, key=lambda s: s["max_ms"])

    got = {
        (r.conv_id, int(r.turn_idx), int(r.sid))
        for r in res.alerts.select("conv_id", "turn_idx", "sid").collect()
    }
    res.unpersist()

    oracle_ok = None
    if not args.skip_oracle:
        from sagan_spark.oracle.pandas_engine import run_oracle
        from sagan_spark.rules.canonical import CANONICAL

        pdf = pd.concat(
            [gen_chunk(lo, min(lo + 500, args.n_convs), seed=11, hot_cap=5000)
             for lo in range(0, args.n_convs, 500)]
            + [hot_conv_pdf(args.hot_turns)],
            ignore_index=True,
        )
        ora = run_oracle(pdf, CANONICAL)
        want = {(a["conv_id"], int(a["turn_idx"]), int(a["sid"])) for a in ora.alerts}
        oracle_ok = got == want and dict(ora.sid_counts) == sid_counts
        assert oracle_ok, (
            f"pipeline != oracle under pathology: {len(got ^ want)} differing alerts"
        )

    df = spark.read.parquet(path)

    def max_part(sdf):
        return (
            sdf.withColumn("_pid", F.spark_partition_id())
            .groupBy("_pid").count().agg(F.max("count")).first()[0]
        )

    plain = max_part(df.repartition(32, "conv_id"))
    salted = max_part(salted_repartition(df, "conv_id", salt_buckets=16, num_partitions=32))

    print(json.dumps({
        "rows": rows,
        "hot_turns": args.hot_turns,
        "pipeline_wall_s": wall,
        "alerts": alerts,
        "oracle_equal": oracle_ok,
        "straggler_stage": straggler,
        "top_stages_by_max_task": sorted(stats, key=lambda s: -s["max_ms"])[:5],
        "stateless_max_partition_rows": {"plain_conv_id": plain, "salted_16": salted},
    }))
    spark.stop()


if __name__ == "__main__":
    main()
