#!/usr/bin/env python
"""Wall-clock measurement of the r6 exchange-free DEFAULT (one JSON line).

r5 proved the zero-shuffle replay plan exists on a conv_id-bucketed table
(tests/test_bucketed_layout.py); r6 made match_mode="auto" pick it by
itself. This script quantifies what the default buys at bench scale:
the SAME all-native ruleset over the SAME rows as

  A. bucketed catalog table, defaults      → auto=hybrid, ZERO conv_id exchange
  B. plain parquet dir, defaults           → fused, one conv_id exchange
  C. bucketed table, explicit fused        → the pre-r6 default (exchange back)

Legs are interleaved (noise windows hit all legs equally), min-of-N,
sink counts asserted equal across all legs every round. On a single box
the exchange is cheap (no network) — the honest expectation is parity;
the 1000-executor claim is about the ~1%-of-input alert slice not
crossing the NETWORK, which a local measurement can only bound, not
show. Results recorded in BENCH/TUNING.md.

Usage: python scripts/bucketed_bench.py [--repeats 3]
Env: SAGAN_BENCH_CONVS (default 15000), SPARK_GRAFT_CPUS (default 32)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import _bench_transcripts, _noise_probe  # noqa: E402
from sagan_spark.engine import pipeline  # noqa: E402
from sagan_spark.engine.match import native_compilable  # noqa: E402
from sagan_spark.rules.bulk import bulk_ruleset  # noqa: E402
from sagan_spark.rules.model import RuleSet  # noqa: E402
from sagan_spark.session import get_spark  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--repeats", type=int, default=3)
    args = ap.parse_args()

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SAGAN_BENCH_CONVS", "15000"))
    spark = get_spark(
        app_name="sagan_bucketed_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    spark.range(1_000_000).selectExpr("sum(id)").collect()  # JVM warmup

    tx_path = _bench_transcripts(n_convs)
    table = f"tx_bucketed_bench_{n_convs}"
    src = spark.read.parquet(tx_path)
    rows = src.count()
    if not spark.catalog.tableExists(table) or spark.table(table).count() != rows:
        # 64 buckets ≈ 2x cores: enough write parallelism, full read
        # parallelism (bucketed scans are one task per bucket)
        (
            src.write.bucketBy(64, "conv_id")
            .sortBy("conv_id", "turn_idx")
            .mode("overwrite")
            .saveAsTable(table)
        )

    native_rs = RuleSet(tuple(r for r in bulk_ruleset().rules if native_compilable(r)))
    n_stateful = sum(1 for r in native_rs.rules if r.stateful)
    assert n_stateful > 0, "measurement needs stateful rules or there is no exchange at all"

    probe_start = _noise_probe(spark)
    legs = {
        "bucketed_auto": lambda: pipeline.run(spark, table, ruleset=native_rs),
        "plain_fused": lambda: pipeline.run(spark, tx_path, ruleset=native_rs),
        "bucketed_fused": lambda: pipeline.run(
            spark, table, ruleset=native_rs, match_mode="fused"
        ),
    }
    walls: dict[str, list[float]] = {k: [] for k in legs}
    counts: set = set()
    for _ in range(args.repeats):
        for name, fn in legs.items():  # interleaved: window noise hits all legs
            t0 = time.time()
            res = fn()
            walls[name].append(round(time.time() - t0, 3))
            counts.add(tuple(sorted(res.sink_counts.items())))
            res.unpersist()
    assert len(counts) == 1, f"legs disagree: {counts}"

    # plan shape evidence alongside the walls
    from sagan_spark.engine.pipeline import build_alerts

    def n_exchanges(df) -> int:
        return (
            df._jdf.queryExecution()
            .executedPlan()
            .toString()
            .count("Exchange hashpartitioning(conv_id")
        )

    shapes = {
        "bucketed_auto": n_exchanges(build_alerts(spark, spark.table(table), native_rs)),
        "plain_fused": n_exchanges(build_alerts(spark, spark.read.parquet(tx_path), native_rs)),
        "bucketed_fused": n_exchanges(
            build_alerts(spark, spark.table(table), native_rs, match_mode="fused")
        ),
    }
    out = {
        "metric": "bucketed-vs-plain pipeline wall (all-native ruleset)",
        "unit": "sec",
        "rows": rows,
        "cpus": cpus,
        "n_rules": len(native_rs.rules),
        "n_stateful": n_stateful,
        "queries": {k: min(v) for k, v in walls.items()},
        "runs": walls,
        "conv_exchanges": shapes,
        "alerts": sum(dict(next(iter(counts))).values()),
        "noise_probe_s": [probe_start, _noise_probe(spark)],
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
